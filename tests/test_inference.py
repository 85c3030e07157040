"""Predictor serving API on the mini model."""

import numpy as np
import pytest

from tests.helpers import MiniUniDefense


@pytest.fixture
def predictor(monkeypatch):
    import jax.numpy as jnp

    from unidefense_tpu.models import registry

    monkeypatch.setitem(registry.MODEL, "MINI", MiniUniDefense)
    from unidefense_tpu.inference import Predictor

    return Predictor("MINI", {"num_classes": 2}, input_size=16, batch_size=4,
                     dtype=jnp.float32)


def test_predict_frames(predictor):
    rng = np.random.default_rng(0)
    frames = (rng.random((10, 16, 16, 3)) * 255).astype(np.uint8)
    probs = predictor.predict_frames(frames)
    assert probs.shape == (10,)
    assert np.all((probs >= 0) & (probs <= 1))


def test_predict_resizes(predictor):
    rng = np.random.default_rng(1)
    frames = (rng.random((3, 40, 30, 3)) * 255).astype(np.uint8)
    probs = predictor.predict_frames(frames)
    assert probs.shape == (3,)


def test_predict_video_and_classify(predictor):
    rng = np.random.default_rng(2)
    frames = (rng.random((6, 16, 16, 3)) * 255).astype(np.uint8)
    v = predictor.predict_video(frames)
    assert 0.0 <= v <= 1.0
    cls = predictor.classify(frames)
    assert set(np.unique(cls)).issubset({0, 1})


def test_predict_sharded_matches_single(monkeypatch):
    """Data-parallel serving (num_devices) == single-device probabilities."""
    import jax.numpy as jnp

    from unidefense_tpu.models import registry

    monkeypatch.setitem(registry.MODEL, "MINI", MiniUniDefense)
    from unidefense_tpu.inference import Predictor

    p1 = Predictor("MINI", {"num_classes": 2}, input_size=16, batch_size=8,
                   dtype=jnp.float32)
    p8 = Predictor("MINI", {"num_classes": 2},
                   variables={"params": p1.params, "batch_stats": p1.batch_stats},
                   input_size=16, batch_size=8, dtype=jnp.float32,
                   num_devices=8)
    rng = np.random.default_rng(3)
    frames = (rng.random((11, 16, 16, 3)) * 255).astype(np.uint8)
    np.testing.assert_allclose(
        p8.predict_frames(frames), p1.predict_frames(frames), atol=1e-5
    )
    with pytest.raises(ValueError):
        Predictor("MINI", {"num_classes": 2}, batch_size=6, num_devices=4)
