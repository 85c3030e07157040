"""Pallas preprocessing kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from unidefense_tpu.ops.pallas_preprocess import normalize_flip


def _jnp_ref(u8, rng, mean, std, hflip_p):
    x = u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)
    if hflip_p > 0 and rng is not None:
        flips = jax.random.uniform(rng, (u8.shape[0], 1, 1, 1)) < hflip_p
        x = jnp.where(flips, x[:, :, ::-1, :], x)
    return x


def test_normalize_flip_matches_reference():
    rng = np.random.default_rng(0)
    u8 = jnp.asarray((rng.random((4, 16, 16, 3)) * 255).astype(np.uint8))
    key = jax.random.PRNGKey(3)
    mean, std = (0.5, 0.4, 0.3), (0.5, 0.25, 0.2)
    out = normalize_flip(u8, key, mean=mean, std=std, hflip_p=0.5, interpret=True)
    ref = _jnp_ref(u8, key, mean, std, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_normalize_no_flip():
    rng = np.random.default_rng(1)
    u8 = jnp.asarray((rng.random((2, 8, 8, 3)) * 255).astype(np.uint8))
    out = normalize_flip(u8, None, hflip_p=0.0, interpret=True)
    ref = _jnp_ref(u8, None, (0.5,) * 3, (0.5,) * 3, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
