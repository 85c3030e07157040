"""Style-transfer input perturbations (training pass 2).

Functional JAX re-design of the reference's FrequencyStyleTransfer /
SpatialStyleTransfer callables (model/modules.py:35-76). Randomness (the
per-sample blend factor lambda in [0.5, 1)) is threaded as an explicit PRNG
key instead of torch's global generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unidefense_tpu.ops.fft import abs_angle_packed, irfft2_packed, spectrum_channels


def _sample_lmda(rng: jax.Array, batch: int, dtype) -> jnp.ndarray:
    """lambda ~ U[0.5, 1.0): larger lambda = less perturbation."""
    return (jax.random.uniform(rng, (batch,), dtype=jnp.float32) / 2.0 + 0.5).astype(dtype)


def frequency_style_transfer(
    rng: jax.Array, content: jnp.ndarray, style: jnp.ndarray, norm: str = "ortho"
) -> jnp.ndarray:
    """Mix FFT amplitudes of content/style, keep content phase.

    Parity target: model/modules.py:35-55 (always norm='ortho' there).
    The amplitude/phase math runs on channel-packed real spectra (amp *
    exp(1j*phase) == amp * unit-vector components) — complex dtype appears
    only inside the FFT custom calls, which the axon TPU backend requires.
    NHWC layout; returns same shape/dtype as `content`.
    """
    n, h, w, c = content.shape
    lmda = _sample_lmda(rng, n, jnp.float32)[:, None, None, None]

    fa = spectrum_channels(content, norm=norm)
    fb = spectrum_channels(style, norm=norm)
    amp_a, unit_re, unit_im = abs_angle_packed(fa)
    amp_b, _, _ = abs_angle_packed(fb)
    amp = lmda * amp_a + (1.0 - lmda) * amp_b
    mixed = jnp.concatenate([amp * unit_re, amp * unit_im], axis=-1)
    out = irfft2_packed(mixed, s=(h, w), norm=norm)
    return out.astype(content.dtype)


def spatial_style_transfer(
    rng: jax.Array, content: jnp.ndarray, style: jnp.ndarray
) -> jnp.ndarray:
    """Sorted-value (histogram-matching) mix with a straight-through term.

    Parity target: model/modules.py:58-76 — the style values, sorted, are
    placed into the content's rank order; the blend keeps gradients flowing
    through `content` only (stop_gradient on the subtracted copy).

    TPU note: the reference computes the rank permutation as
    argsort(argsort(content)) + gather — three bitonic sorts. We get the
    identical result with ONE multi-operand sort (keys=content,
    payload=iota) + one sort of the style values + one scatter
    (matched[idx[j]] = sorted_style[j]), since the element at sorted position
    j lands back at its original location idx[j]. Sorts dominate this op's
    cost on TPU, so dropping one of three is a ~1/3 saving.
    """
    n, h, w, c = content.shape
    lmda = _sample_lmda(rng, n, content.dtype)[:, None, None]
    hw = h * w

    cf = content.transpose(0, 3, 1, 2).reshape(n, c, hw)
    sf = style.transpose(0, 3, 1, 2).reshape(n, c, hw)

    iota = jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32), cf.shape)
    _, idx = jax.lax.sort((cf, iota), dimension=2, num_keys=1)
    value_style = jnp.sort(sf, axis=-1)
    matched = jnp.zeros_like(cf)
    batch_i = jnp.arange(n)[:, None, None]
    chan_i = jnp.arange(c)[None, :, None]
    matched = matched.at[batch_i, chan_i, idx].set(value_style)

    transferred = cf + (1.0 - lmda) * matched - (1.0 - lmda) * jax.lax.stop_gradient(cf)
    return transferred.reshape(n, c, h, w).transpose(0, 2, 3, 1)
