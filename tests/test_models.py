"""Model structure tests. Full-size forward passes are expensive to compile
on the 1-core CPU test runner, so the real backbones get shape-only
eval_shape checks (no compile); UD_SLOW=1 enables the full numeric passes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unidefense_tpu.models.efficientnet import EfficientNet, build_block_specs, round_filters, round_repeats
from unidefense_tpu.models.registry import MODEL, load_model

SLOW = os.environ.get("UD_SLOW", "") == "1"
RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}


class TestEfficientNetScaling:
    def test_b4_filters(self):
        # reference: model/unidefense.py:206-226 traced dims
        w = 1.4
        assert round_filters(32, w) == 48
        assert round_filters(16, w) == 24
        assert round_filters(24, w) == 32
        assert round_filters(40, w) == 56
        assert round_filters(80, w) == 112
        assert round_filters(112, w) == 160
        assert round_filters(192, w) == 272
        assert round_filters(320, w) == 448
        assert round_filters(1280, w) == 1792

    def test_b4_repeats_and_delimiters(self):
        d = 1.8
        reps = [round_repeats(r, d) for r in (1, 2, 2, 3, 3, 4, 1)]
        assert reps == [2, 4, 4, 6, 6, 8, 2]
        # cumulative == DELIMITER_DICT (model/unidefense.py:22-24)
        cum = np.cumsum(reps).tolist()
        assert cum == [2, 6, 10, 16, 22, 30, 32]

    def test_sfconv_gating(self):
        specs = build_block_specs("efficientnet-b4", "ortho")
        assert len(specs) == 32
        # groups 0 (blocks 0-1), 1 (2-5), last (30-31) -> no SFConv
        for i in list(range(0, 6)) + [30, 31]:
            assert specs[i].freq_norm is None, i
        for i in range(6, 30):
            assert specs[i].freq_norm == "ortho", i

    def test_param_count_parity(self):
        """EfficientNet-b4 + SFConv must land exactly on the reference's
        parameter count (verified per-module against the vendored torch
        implementation: 127,034,720 with SFConv, 17,548,616 plain)."""
        m = EfficientNet(model_name="efficientnet-b4", include_top=False, freq_norm="ortho")
        shapes = jax.eval_shape(
            lambda: m.init(RNGS, jnp.zeros((1, 96, 96, 3)), train=False)
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
        assert n == 127_034_720, n

    def test_plain_param_count(self):
        m = EfficientNet(model_name="efficientnet-b4", include_top=False, freq_norm=None)
        shapes = jax.eval_shape(
            lambda: m.init(RNGS, jnp.zeros((1, 96, 96, 3)), train=False)
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
        assert n == 17_548_616, n


class TestUniDefenseShapes:
    @pytest.mark.parametrize("name,size,feat", [("UDR18", 64, 512), ("UDR50", 64, 2048), ("UDEB4", 96, 1792)])
    def test_output_contract(self, name, size, feat):
        model = load_model(name)()
        x = jax.ShapeDtypeStruct((2, size, size, 3), jnp.float32)
        out = jax.eval_shape(
            lambda v, x: model.apply(v, x, train=False),
            jax.eval_shape(lambda: model.init(RNGS, jnp.zeros((2, size, size, 3)), train=False)),
            x,
        )
        assert out["cls_out"].shape == (2, 2)
        assert out["rec"].shape == (2, size, size, 3)
        ld = out["loss_dict"]
        assert ld["factorization"].shape == (2, feat)
        assert ld["spatial"].shape == (2,)
        assert ld["freq"].shape == (2,)
        assert isinstance(ld["triplet"], list)
        assert ld["freq_mask"].shape[-1] == 1
        assert ld["spat_mask"].shape[-1] == 1

    def test_registry(self):
        assert set(MODEL) == {"UDEB4", "UDR18", "UDR50"}
        assert load_model("udr18") is MODEL["UDR18"]
        with pytest.raises(KeyError):
            load_model("nope")

    def test_build_model_plumbs_regularization_rates(self):
        """drop_connect_rate / feat_drop_rate must reach the module —
        engines/base.py deterministic_regularization zeroes them in
        model_cfg; silently filtering them in build_model left UDEB4
        training with stochastic depth while the A/B reference side had it
        zeroed (round-5 engine-A/B root cause). Field-gated: UDR18 has no
        drop_connect_rate."""
        from unidefense_tpu.models.registry import build_model

        m = build_model("UDEB4", {"num_classes": 2, "drop_rate": 0.0,
                                  "extractor": "efficientnet-b4",
                                  "drop_connect_rate": 0.0,
                                  "feat_drop_rate": 0.0})
        assert m.drop_connect_rate == 0.0 and m.feat_drop_rate == 0.0
        m = build_model("UDR18", {"num_classes": 2, "extractor": "resnet18",
                                  "drop_connect_rate": 0.0,  # ignored: no field
                                  "feat_drop_rate": 0.0})
        assert m.feat_drop_rate == 0.0

    def test_engine_deterministic_regularization_reaches_model(self):
        """The ENGINE-level contract (where the round-5 bug actually bit):
        config.deterministic_regularization must produce a model with every
        stochastic-regularization rate at 0 — via _build_model's model_cfg
        rewrite AND build_model's pass-through together."""
        from unidefense_tpu.engines.forgery import ForgeryEngine

        eng = object.__new__(ForgeryEngine)  # no __init__: module build only
        eng.model_name = "UDEB4"
        eng.model_cfg = {"num_classes": 2, "drop_rate": 0.2,
                         "extractor": "efficientnet-b4"}
        eng.config_cfg = {"deterministic_regularization": True}
        eng.multi_device = False
        eng.compute_dtype = None
        m = eng._build_model()
        assert m.drop_rate == 0.0
        assert m.feat_drop_rate == 0.0
        assert m.drop_connect_rate == 0.0


@pytest.mark.skipif(not SLOW, reason="set UD_SLOW=1 for full numeric forward passes")
class TestFullForward:
    def test_udr18_numeric(self):
        model = load_model("UDR18")()
        x = jnp.zeros((2, 64, 64, 3), jnp.float32)
        v = model.init(RNGS, x, train=False)
        out = model.apply(v, x, train=False)
        assert np.all(np.isfinite(np.asarray(out["cls_out"])))
