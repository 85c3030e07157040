"""Golden parity: convert reference torch backbones -> flax and compare
forward outputs on identical inputs (SURVEY.md §4 'golden parity').

These tests import the READ-ONLY reference implementation at /root/reference
purely as a numerical oracle; they skip when it is absent.
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = "/root/reference"
SLOW = os.environ.get("UD_SLOW", "") == "1"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not available")


def _install_stubs():
    """Stub torchvision/timm so the reference package imports on this image."""
    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)

    dummy = lambda *a, **k: None
    stub("torchvision")
    stub("torchvision.transforms")
    stub("torchvision.transforms.functional", gaussian_blur=dummy)
    stub("torchvision.datasets", VisionDataset=object)
    stub("timm")
    stub("timm.models")
    stub("timm.models.layers", DropBlock2d=object, DropPath=object, AvgPool2dSame=object,
         BlurPool2d=object, GroupNorm=object, create_attn=dummy, get_attn=dummy,
         create_classifier=lambda *a, **k: (torch.nn.AdaptiveAvgPool2d(1), torch.nn.Identity()))
    stub("timm.models.helpers",
         build_model_with_cfg=lambda cls, variant, pretrained, **kw: cls(**kw),
         checkpoint_seq=dummy)
    if REF not in sys.path:
        sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref_modules():
    _install_stubs()
    from model.efficientnet import EfficientNet as TorchEffNet  # noqa

    return {"effnet": TorchEffNet}


def _forward_flax_effnet(model, variables, x_nhwc):
    return np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x_nhwc)
    )


@pytest.mark.parametrize("freq_norm", [None, "ortho"])
def test_efficientnet_b0_forward_parity(ref_modules, freq_norm):
    """Random-init torch b0 -> convert -> identical pooled features."""
    torch.manual_seed(0)
    tnet = ref_modules["effnet"].from_name(
        "efficientnet-b0", num_classes=2, include_top=False, freq_norm=freq_norm,
        image_size=64,
    )
    tnet.eval()

    from unidefense_tpu.models.convert import load_torch_backbone
    from unidefense_tpu.models.efficientnet import EfficientNet

    fnet = EfficientNet(model_name="efficientnet-b0", include_top=False,
                        freq_norm=freq_norm)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(fnet.init, static_argnames=("train",))(
        rngs, jnp.asarray(x), train=False
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    variables = load_torch_backbone(variables, tnet.state_dict(), "efficientnet",
                                    strict=True)

    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.reshape(ref.shape[0], -1)  # torch include_top=False keeps (N,C,1,1)
    ours = _forward_flax_effnet(fnet, variables, jnp.asarray(x))
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=2e-3)


def test_resnet18_forward_parity(ref_modules):
    """Random-init reference custom_resnet18 (with SFConv) -> convert ->
    identical backbone feature maps (the classifier head is stubbed out in
    the reference import, so we compare forward_features)."""
    from model.resnet.exp import custom_resnet18  # noqa

    torch.manual_seed(0)
    tnet = custom_resnet18(freq_norm="ortho")
    tnet.eval()

    from unidefense_tpu.models.convert import load_torch_backbone
    from unidefense_tpu.models.resnet import ResNet
    from unidefense_tpu.ops.resize import max_pool

    fnet = ResNet(arch="resnet18", num_classes=1000, freq_norm="ortho")
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(fnet.init, static_argnames=("train",))(
        rngs, jnp.asarray(x), train=False
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    variables = load_torch_backbone(variables, tnet.state_dict(), "resnet", strict=False)

    with torch.no_grad():
        ref = tnet.forward_features(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    def feats(m, xx):
        h = m.stem(xx, False)
        h = max_pool(h, 3, 2, 1)
        for s in m.stages:
            h = s(h, False)
        return h

    ours = np.asarray(
        jax.jit(lambda v, xx: fnet.apply(v, xx, method=feats))(variables, jnp.asarray(x))
    )
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=2e-3, rtol=2e-3)


def test_full_udr18_model_parity(ref_modules):
    """Flagship golden test: a randomly-initialised reference
    UniDefenseModelRes18 (full dual-space architecture) converted via the
    'unidefense' mapping must reproduce cls_out, reconstruction, and the
    per-sample loss_dict terms in eval mode."""
    from model.unidefense import UniDefenseModelRes18 as TorchUD  # noqa

    torch.manual_seed(0)
    tnet = TorchUD(extractor="resnet18", num_classes=2)
    tnet.eval()

    from unidefense_tpu.models.convert import load_torch_backbone
    from unidefense_tpu.models.registry import load_model

    fnet = load_model("UDR18")()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x = np.random.default_rng(2).standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.5
    variables = jax.jit(fnet.init, static_argnames=("train",))(
        rngs, jnp.asarray(x), train=False
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    variables = load_torch_backbone(variables, tnet.state_dict(), "unidefense",
                                    strict=True)

    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = jax.jit(lambda v, xx: fnet.apply(v, xx, train=False))(
        variables, jnp.asarray(x)
    )

    np.testing.assert_allclose(
        np.asarray(ours["cls_out"]), ref["cls_out"].numpy(), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours["rec"]).transpose(0, 3, 1, 2), ref["rec"].numpy(),
        atol=5e-3, rtol=5e-3,
    )
    ld_o, ld_r = ours["loss_dict"], ref["loss_dict"]
    np.testing.assert_allclose(
        np.asarray(ld_o["spatial"]), ld_r["spatial"].numpy(), atol=2e-3, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ld_o["freq"]), ld_r["freq"].numpy(), atol=2e-3, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(ld_o["factorization"]), ld_r["factorization"].numpy(),
        atol=5e-3, rtol=5e-3,
    )
    for a, b in zip(ld_o["triplet"], ld_r["triplet"]):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=2e-3, rtol=2e-3)


@pytest.mark.skipif(not SLOW, reason="set UD_SLOW=1 for the flagship golden test")
def test_full_udeb4_model_parity(ref_modules):
    """Flagship UDEB4 golden test (slow: two full b4 forwards on CPU):
    converted reference model reproduces cls_out / rec / per-sample losses."""
    from model.unidefense import UniDefenseModelEb4 as TorchUD  # noqa

    torch.manual_seed(0)
    # from_name path (no pretrained download); image_size matches the input
    tnet = TorchUD.__new__(TorchUD)
    # construct via the public ctor but intercept from_pretrained: build the
    # torch model with from_name through a tiny shim
    import model.efficientnet.model as tm  # noqa

    # image_size=96: the reference computes STATIC SAME padding from the
    # configured image size; pin it to the test input so padding matches the
    # actual spatial trajectory (as it does in real 380^2 training)
    orig = tm.EfficientNet.from_pretrained
    tm.EfficientNet.from_pretrained = classmethod(
        lambda cls, name, weights_path=None, advprop=False, in_channels=3,
        num_classes=1000, **kw: cls.from_name(name, num_classes=num_classes,
                                              image_size=96, **kw)
    )
    try:
        tnet = TorchUD(extractor="efficientnet-b4", num_classes=2)
    finally:
        tm.EfficientNet.from_pretrained = orig
    tnet.eval()

    from unidefense_tpu.models.convert import load_torch_backbone
    from unidefense_tpu.models.registry import load_model

    fnet = load_model("UDEB4")()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x = np.random.default_rng(5).standard_normal((1, 96, 96, 3)).astype(np.float32) * 0.5
    variables = jax.jit(fnet.init, static_argnames=("train",))(
        rngs, jnp.asarray(x), train=False
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    variables = load_torch_backbone(variables, tnet.state_dict(), "unidefense",
                                    strict=True)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = jax.jit(lambda v, xx: fnet.apply(v, xx, train=False))(
        variables, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(ours["cls_out"]), ref["cls_out"].numpy(), atol=1e-2, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(ours["loss_dict"]["spatial"]), ref["loss_dict"]["spatial"].numpy(),
        atol=5e-3, rtol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ours["loss_dict"]["freq"]), ref["loss_dict"]["freq"].numpy(),
        atol=5e-3, rtol=5e-3,
    )


def test_export_round_trip_udr18():
    """flax -> torch export is the exact inverse of the torch -> flax
    conversion: every tensor of the reference UDR18 state_dict survives the
    round trip bitwise (and the export carries num_batches_tracked)."""
    _install_stubs()
    from model.unidefense import UniDefenseModelRes18 as TorchUD  # noqa

    from unidefense_tpu.models.convert import (
        export_torch_state_dict,
        load_torch_backbone,
    )
    from unidefense_tpu.models.registry import load_model

    torch.manual_seed(3)
    tnet = TorchUD(extractor="resnet18", num_classes=2)
    tnet.eval()
    sd_orig = {k: v.detach().cpu().numpy() for k, v in tnet.state_dict().items()}

    fnet = load_model("UDR18")()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = jax.jit(fnet.init, static_argnames=("train",))(
        rngs, jnp.asarray(x), train=False
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    variables = load_torch_backbone(variables, tnet.state_dict(), "unidefense",
                                    strict=True)

    sd_back = export_torch_state_dict(variables, "unidefense")
    missing = [k for k in sd_orig
               if k not in sd_back and "num_batches_tracked" not in k]
    assert not missing, f"export lost keys: {missing[:10]}"
    checked = 0
    for k, v in sd_orig.items():
        if "num_batches_tracked" in k:
            assert k in sd_back  # re-created (zeroed) entries
            continue
        np.testing.assert_array_equal(sd_back[k], v, err_msg=k)
        checked += 1
    assert checked > 100


def test_save_torch_checkpoint_reference_loadable(tmp_path):
    """save_torch_checkpoint writes the reference's {'model': sd} format and
    the reference model load_state_dict-accepts it."""
    _install_stubs()
    from model.unidefense import UniDefenseModelRes18 as TorchUD  # noqa

    from unidefense_tpu.models.convert import (
        load_torch_backbone,
        save_torch_checkpoint,
    )
    from unidefense_tpu.models.registry import load_model

    torch.manual_seed(4)
    tnet = TorchUD(extractor="resnet18", num_classes=2)
    fnet = load_model("UDR18")()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(fnet.init, static_argnames=("train",))(
        rngs, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    variables = load_torch_backbone(variables, tnet.state_dict(), "unidefense",
                                    strict=True)

    path = str(tmp_path / "exported.bin")
    save_torch_checkpoint(variables, path, step=123)
    ckpt = torch.load(path, weights_only=False)
    assert ckpt["step"] == 123
    tnet2 = TorchUD(extractor="resnet18", num_classes=2)
    incompat = tnet2.load_state_dict(ckpt["model"], strict=True)
    assert not incompat.missing_keys and not incompat.unexpected_keys
    for k, v in tnet.state_dict().items():
        if "num_batches_tracked" in k:
            continue
        np.testing.assert_array_equal(
            tnet2.state_dict()[k].numpy(), v.detach().numpy(), err_msg=k)


@pytest.mark.skipif(not SLOW, reason="full b4 init is slow; UD_SLOW=1 enables")
def test_export_round_trip_udeb4():
    """Flagship export round-trip: the EfficientNet-b4 branch of the mapping
    (backbone.* keys) is also a bitwise inverse."""
    _install_stubs()
    import model.efficientnet.model as tm  # noqa
    from model.unidefense import UniDefenseModelEb4 as TorchUD  # noqa

    from unidefense_tpu.models.convert import (
        export_torch_state_dict,
        load_torch_backbone,
    )
    from unidefense_tpu.models.registry import load_model

    torch.manual_seed(5)
    orig = tm.EfficientNet.from_pretrained
    tm.EfficientNet.from_pretrained = classmethod(
        lambda cls, name, weights_path=None, advprop=False, in_channels=3,
        num_classes=1000, **kw: cls.from_name(name, num_classes=num_classes,
                                              image_size=96, **kw)
    )
    try:
        tnet = TorchUD(extractor="efficientnet-b4", num_classes=2)
    finally:
        tm.EfficientNet.from_pretrained = orig

    fnet = load_model("UDEB4")()
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = jax.jit(fnet.init, static_argnames=("train",))(
        rngs, jnp.zeros((1, 96, 96, 3), jnp.float32), train=False
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    variables = load_torch_backbone(variables, tnet.state_dict(), "unidefense",
                                    strict=True)
    sd_back = export_torch_state_dict(variables, "unidefense")
    checked = 0
    for k, v in tnet.state_dict().items():
        if "num_batches_tracked" in k:
            assert k in sd_back
            continue
        np.testing.assert_array_equal(sd_back[k], v.detach().cpu().numpy(),
                                      err_msg=k)
        checked += 1
    assert checked > 500
