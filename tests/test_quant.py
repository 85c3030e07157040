"""Weight-only int8 quantization (ops/quant.py) + the Predictor int8 path.

TPU-side serving addition — the reference has no quantized or serving path
(its only inference surface is `main.py --test`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import MiniUniDefense
from unidefense_tpu.ops.quant import (
    QArray,
    dequantize_tree,
    quantize_array,
    quantize_tree,
    tree_nbytes,
)


def test_roundtrip_error_bound():
    # per-element error <= scale/2 where scale is the per-out-channel amax/127
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 16, 32)).astype(np.float32))
    qa = quantize_array(w)
    assert qa.q.dtype == jnp.int8 and qa.scale.shape == (32,)
    err = np.abs(np.asarray(qa.dequantize() - w))
    bound = np.asarray(qa.scale) / 2 + 1e-7
    assert np.all(err <= bound[None, None, None, :])


def test_tree_structure_and_small_leaves_untouched():
    tree = {
        "conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.arange(8.0)},
        "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
    }
    qt = quantize_tree(tree)
    assert isinstance(qt["conv"]["kernel"], QArray)
    # 1-D leaves pass through bitwise
    np.testing.assert_array_equal(qt["conv"]["bias"], tree["conv"]["bias"])
    np.testing.assert_array_equal(qt["bn"]["scale"], tree["bn"]["scale"])
    dt = dequantize_tree(qt)
    assert jax.tree.structure(dt) == jax.tree.structure(tree)
    np.testing.assert_allclose(
        np.asarray(dt["conv"]["kernel"]), np.ones((3, 3, 4, 8)), atol=1e-6
    )
    # footprint: kernel stored at 1 byte/elem + 8 fp32 scales
    assert tree_nbytes(qt) == 3 * 3 * 4 * 8 + 8 * 4 + (8 + 8 + 8) * 4


def test_qarray_passes_through_jit():
    w = jnp.asarray(np.random.default_rng(1).normal(0, 1, (4, 6)).astype(np.float32))
    qa = quantize_array(w)

    @jax.jit
    def f(q):
        return dequantize_tree({"w": q})["w"].sum()

    assert np.isfinite(float(f(qa)))


@pytest.fixture
def predictors(monkeypatch):
    from unidefense_tpu.models import registry

    monkeypatch.setitem(registry.MODEL, "MINI", MiniUniDefense)
    from unidefense_tpu.inference import Predictor

    p32 = Predictor("MINI", {"num_classes": 2}, input_size=16, batch_size=4,
                    dtype=jnp.float32)
    pq = Predictor("MINI", {"num_classes": 2},
                   variables={"params": p32.params,
                              "batch_stats": p32.batch_stats},
                   input_size=16, batch_size=4, dtype=jnp.float32,
                   quantize="int8")
    return p32, pq


def test_predictor_int8_prob_parity(predictors):
    p32, pq = predictors
    rng = np.random.default_rng(2)
    frames = (rng.random((8, 16, 16, 3)) * 255).astype(np.uint8)
    probs32 = p32.predict_frames(frames)
    probs8 = pq.predict_frames(frames)
    assert probs8.shape == (8,)
    np.testing.assert_allclose(probs8, probs32, atol=0.05)
    # weights actually stored int8: footprint well under the fp32 predictor's
    assert pq.param_bytes() < 0.5 * p32.param_bytes()


def test_predictor_int8_rejects_unknown_mode():
    from unidefense_tpu.inference import Predictor

    with pytest.raises(ValueError):
        Predictor("UDR18", quantize="fp4")


def test_quantize_validated_on_reinstall(predictors):
    # the alternate constructors (from_run / from_torch_checkpoint) assign
    # self.quantize AFTER __init__ and then reinstall — the mode check must
    # live in _install_params so that path can't silently serve unquantized
    p32, _ = predictors
    p32.quantize = "int4"
    with pytest.raises(ValueError, match="int4"):
        p32._install_params(p32.params)
