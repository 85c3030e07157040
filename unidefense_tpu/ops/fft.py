"""2-D real FFT helpers on NHWC tensors.

The reference packs rFFT2 output as channel-concatenated (real ‖ imag) planes
before running 1x1 convolutions in the frequency domain (e.g.
model/resnet/exp.py:44-48, model/unidefense.py:130-136). We keep the same
"spectrum as channels" convention, but on NHWC with the channel axis last so
the frequency-domain 1x1 conv is a plain trailing-axis matmul for the MXU.

All functions operate on the two spatial axes (1, 2) of an NHWC array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPATIAL_AXES = (1, 2)


def rfft2(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """Real 2-D FFT over the spatial axes of an NHWC array.

    Returns complex64 with shape (N, H, W//2+1, C).
    FFT runs in float32: XLA's TPU FFT lowers bf16 inputs poorly, and the
    spectra feed 1x1 matmuls where bf16 conversion happens afterwards anyway.
    """
    return jnp.fft.rfft2(x.astype(jnp.float32), axes=_SPATIAL_AXES, norm=norm)


def irfft2(z: jnp.ndarray, s: tuple[int, int], norm: str = "ortho") -> jnp.ndarray:
    """Inverse of :func:`rfft2`; `s` is the spatial output size (H, W)."""
    return jnp.fft.irfft2(z, s=s, axes=_SPATIAL_AXES, norm=norm)


def to_real_channels(z: jnp.ndarray) -> jnp.ndarray:
    """Complex (N, H, Wf, C) -> real (N, H, Wf, 2C), real planes first.

    Mirrors torch.cat([z.real, z.imag], dim=channel) from the reference
    (model/unidefense.py:131).
    """
    return jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-1)


def from_real_channels(r: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_real_channels` (torch.complex(*tensor_split(2)))."""
    c = r.shape[-1] // 2
    return jax.lax.complex(r[..., :c], r[..., c:])


def spectrum_channels(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """rfft2 + channel packing in one call: NHWC -> (N, H, W//2+1, 2C)."""
    return to_real_channels(rfft2(x, norm=norm))
