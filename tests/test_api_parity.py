"""API-surface parity items from SURVEY.md §2: CDConv, the single-pass
normal train step, AUCMeter, visualisation helpers, EfficientNet endpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from tests.helpers import OPT_CFG, MiniUniDefense, tiny_batch


def test_cdconv_matches_torch_reference():
    """Conv2d_cd (model/resnet/exp.py:57-76) re-derived in torch."""
    from unidefense_tpu.models.layers import CDConv

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    m = CDConv(features=6, kernel_size=3, stride=1, padding=1, theta=0.7, use_bias=True)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))

    w = np.asarray(variables["params"]["kernel"]).transpose(3, 2, 0, 1)  # OIHW
    b = np.asarray(variables["params"]["bias"])
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    wt, bt = torch.from_numpy(w), torch.from_numpy(b)
    out_normal = F.conv2d(xt, wt, bt, 1, 1)
    kernel_diff = wt.sum(2).sum(2)[:, :, None, None]
    out_diff = F.conv2d(xt, kernel_diff, bt, 1, 0)
    ref = (out_normal - 0.7 * out_diff).numpy()
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_conv_transpose_matches_torch():
    """ConvTranspose must exactly reproduce torch ConvTranspose2d(3,2,1,op=1)
    — the decoder upsampling layer (model/unidefense.py:63-64)."""
    from unidefense_tpu.models.layers import ConvTranspose

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 5, 4)).astype(np.float32)
    m = ConvTranspose(6, 3, 2, 1, 1, use_bias=True)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(v, jnp.asarray(x)))
    w = np.asarray(v["params"]["kernel"]).transpose(2, 3, 0, 1).copy()
    b = np.asarray(v["params"]["bias"]).copy()
    tc = torch.nn.ConvTranspose2d(4, 6, 3, 2, 1, output_padding=1, bias=True)
    with torch.no_grad():
        tc.weight.copy_(torch.from_numpy(w))
        tc.bias.copy_(torch.from_numpy(b))
        ref = tc(torch.from_numpy(x.transpose(0, 3, 1, 2).copy())).numpy()
    assert ours.shape == (2, 10, 10, 6)
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_normal_train_step():
    from unidefense_tpu.train.optim import build_optimizer
    from unidefense_tpu.train.step import create_train_state, make_normal_train_step

    model = MiniUniDefense()
    rng = jax.random.PRNGKey(0)
    x, labels = tiny_batch()
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x, train=False)
    )
    tx, _ = build_optimizer(OPT_CFG, shapes["params"])
    state = create_train_state(model, tx, rng, x)
    step = jax.jit(make_normal_train_step(model, tx, OPT_CFG, sum_real=2, sum_fake=2))
    batch = {"image": x, "label": labels}
    first = None
    for i in range(6):
        state, metrics, cls_out = step(state, batch, jax.random.fold_in(rng, i))
        if i == 0:
            first = float(metrics["total_loss"])
            assert np.isfinite(first)
    assert float(metrics["total_loss"]) < first
    assert "fac_loss" not in metrics  # single-pass: no pass-2 losses


def test_auc_meter(tmp_path):
    from unidefense_tpu.utils.meters import AUCMeter

    rng = np.random.default_rng(0)
    m = AUCMeter()
    y = rng.integers(0, 2, 100)
    s = y * 0.6 + rng.random(100) * 0.4
    m.update(s[:50], y[:50])
    m.update(s[50:], y[50:])
    auc = m.mean_auc()
    assert 0.5 < auc <= 1.0
    m.curve(str(tmp_path))
    assert (tmp_path / "roc_curve.pickle").exists()


def test_visualize(tmp_path):
    from unidefense_tpu.utils.visualize import norm_image, plot_recon_figure, save_image

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((8, 8, 8, 3)).astype(np.float32)
    out = norm_image(imgs)
    assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5
    save_image(imgs[0], str(tmp_path / "x.png"))
    assert (tmp_path / "x.png").exists()
    fig = plot_recon_figure(
        list(imgs), ("rgt", "rest"), rng.standard_normal((8, 2)), [0] * 8,
        categories=["real", "fake"],
    )
    assert fig is not None


def test_all_gather_objects_single_process():
    from unidefense_tpu.parallel.mesh import all_gather_objects

    out = all_gather_objects({"a": [1.0]}, {"a": [0.0]})
    assert out == [({"a": [1.0]}, {"a": [0.0]})]


def test_efficientnet_api():
    from unidefense_tpu.models.efficientnet import VALID_MODELS, get_image_size

    assert "efficientnet-b4" in VALID_MODELS
    assert get_image_size("efficientnet-b4") == 380
    assert get_image_size("efficientnet-b0") == 224


def test_json_io_helpers(tmp_path):
    """load_from_json / write_to_json (utils/io.py:8-27 API surface)."""
    from unidefense_tpu.utils import load_from_json, write_to_json

    path = str(tmp_path / "x.json")
    write_to_json(path, {"a": 1, "b": [1, 2]})
    assert load_from_json(path) == {"a": 1, "b": [1, 2]}
    try:
        write_to_json(str(tmp_path / "x.txt"), {})
    except AssertionError:
        pass
    else:
        raise AssertionError("non-.json filename must be rejected")
