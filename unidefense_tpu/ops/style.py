"""Style-transfer input perturbations (training pass 2).

Functional JAX re-design of the reference's FrequencyStyleTransfer /
SpatialStyleTransfer callables (model/modules.py:35-76). Randomness (the
per-sample blend factor lambda in [0.5, 1)) is threaded as an explicit PRNG
key instead of torch's global generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unidefense_tpu.ops.fft import irfft2, rfft2


def _sample_lmda(rng: jax.Array, batch: int, dtype) -> jnp.ndarray:
    """lambda ~ U[0.5, 1.0): larger lambda = less perturbation."""
    return (jax.random.uniform(rng, (batch,), dtype=jnp.float32) / 2.0 + 0.5).astype(dtype)


def frequency_style_transfer(
    rng: jax.Array, content: jnp.ndarray, style: jnp.ndarray, norm: str = "ortho"
) -> jnp.ndarray:
    """Mix FFT amplitudes of content/style, keep content phase.

    Parity target: model/modules.py:35-55 (always norm='ortho' there).
    NHWC layout; returns same shape/dtype as `content`.
    """
    n, h, w, c = content.shape
    lmda = _sample_lmda(rng, n, jnp.float32)[:, None, None, None]

    fa = rfft2(content, norm=norm)
    fb = rfft2(style, norm=norm)
    amp = lmda * jnp.abs(fa) + (1.0 - lmda) * jnp.abs(fb)
    phase = jnp.angle(fa)
    mixed = amp * jnp.exp(1j * phase)
    out = irfft2(mixed, s=(h, w), norm=norm)
    return out.astype(content.dtype)


def spatial_style_transfer(
    rng: jax.Array, content: jnp.ndarray, style: jnp.ndarray
) -> jnp.ndarray:
    """Sorted-value (histogram-matching) mix with a straight-through term.

    Parity target: model/modules.py:58-76 — the style values, sorted, are
    scattered into the content's rank order; the blend keeps gradients flowing
    through `content` only (stop_gradient on the subtracted copy).
    """
    n, h, w, c = content.shape
    lmda = _sample_lmda(rng, n, content.dtype)[:, None, None]

    # Work per (sample, channel) over flattened spatial values. The reference
    # uses NCHW (B, C, HW); we transpose NHWC accordingly and restore at the end.
    cf = content.transpose(0, 3, 1, 2).reshape(n, c, h * w)
    sf = style.transpose(0, 3, 1, 2).reshape(n, c, h * w)

    index_content = jnp.argsort(cf, axis=-1)
    value_style = jnp.sort(sf, axis=-1)
    inverse_index = jnp.argsort(index_content, axis=-1)
    matched = jnp.take_along_axis(value_style, inverse_index, axis=-1)

    transferred = cf + (1.0 - lmda) * matched - (1.0 - lmda) * jax.lax.stop_gradient(cf)
    return transferred.reshape(n, c, h, w).transpose(0, 2, 3, 1)
