"""Exactness of the FFT-free SFConv frequency branch (ops/sfconv_spatial.py)
against the literal spectral pipeline, across sizes, norms, and the full
SFConv module in both modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import unidefense_tpu.models.layers as layers_mod
import unidefense_tpu.ops.fft as fft_mod
from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("shape", [(8, 8, 4), (16, 16, 6), (7, 9, 3), (12, 10, 5)])
@pytest.mark.parametrize("norm", ["ortho", None])
def test_identity_vs_spectral(shape, norm):
    h, w, c = shape
    x = jnp.asarray(RNG.standard_normal((2, h, w, c)).astype(np.float32))
    wk = jnp.asarray(RNG.standard_normal((2 * c, 2 * c)).astype(np.float32) * 0.2)
    old = fft_mod._FFT_MODE
    fft_mod._FFT_MODE = "fft"
    try:
        ref = fft_mod.irfft2_packed(
            fft_mod.spectrum_channels(x, norm) @ wk, (h, w), norm
        )
    finally:
        fft_mod._FFT_MODE = old
    ours = sfconv_freq_spatial(x, wk)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-5)


def test_sfconv_module_modes_agree():
    x = jnp.asarray(RNG.standard_normal((2, 16, 16, 6)).astype(np.float32))
    m = layers_mod.SFConv(6, 3, 1, 1, use_bias=False)
    v = m.init(jax.random.PRNGKey(0), x)
    old = layers_mod._SFCONV_MODE
    try:
        layers_mod._SFCONV_MODE = "spatial"
        a = m.apply(v, x)
        layers_mod._SFCONV_MODE = "spectral"
        b = m.apply(v, x)
    finally:
        layers_mod._SFCONV_MODE = old
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("shape", [(8, 8, 4), (7, 9, 3), (12, 10, 5)])
def test_shared_hilbert_identity(shape):
    """UD_SFCONV_HILBERT=shared (H(x̃) = −(H(x))̃, one Hilbert einsum) must
    match the two-einsum 'pair' form exactly up to fp reordering — value AND
    gradient (the variant reroutes the backward through a permutation)."""
    import unidefense_tpu.ops.sfconv_spatial as sp

    h, w, c = shape
    x = jnp.asarray(RNG.standard_normal((2, h, w, c)).astype(np.float32))
    wk = jnp.asarray(RNG.standard_normal((2 * c, 2 * c)).astype(np.float32) * 0.2)
    old = sp._HILBERT_MODE

    def loss(xx, ww):
        return jnp.sum(sfconv_freq_spatial(xx, ww) ** 2)

    try:
        sp._HILBERT_MODE = "pair"
        a = sfconv_freq_spatial(x, wk)
        ga = jax.grad(loss, argnums=(0, 1))(x, wk)
        sp._HILBERT_MODE = "shared"
        b = sfconv_freq_spatial(x, wk)
        gb = jax.grad(loss, argnums=(0, 1))(x, wk)
    finally:
        sp._HILBERT_MODE = old
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for pa, pb in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=2e-4)


def test_gradients_flow():
    x = jnp.asarray(RNG.standard_normal((1, 8, 8, 4)).astype(np.float32))
    wk = jnp.asarray(RNG.standard_normal((8, 8)).astype(np.float32) * 0.2)
    g = jax.grad(lambda w: jnp.sum(sfconv_freq_spatial(x, w) ** 2))(wk)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0
