"""2-D real FFT helpers on NHWC tensors.

The reference packs rFFT2 output as channel-concatenated (real ‖ imag) planes
before running 1x1 convolutions in the frequency domain (e.g.
model/resnet/exp.py:44-48, model/unidefense.py:130-136). We keep the same
"spectrum as channels" convention on NHWC so the frequency-domain 1x1 conv is
a plain trailing-axis matmul for the MXU.

Backend note (axon TPU): the C2C FFT is implemented but IRFFT is not, and
some *fused* elementwise ops on complex dtypes hit UNIMPLEMENTED Mosaic
lowerings. All spectrum arithmetic here therefore happens on real-valued
packed arrays; complex values exist only at the jnp.fft.{rfft2,ifft2} custom
call boundaries (whose inputs/outputs materialize, avoiding bad fusions). The
inverse transform is built as hermitian extension + C2C ifft2 + real part,
which is mathematically identical to irfft2.

All functions operate on the two spatial axes (1, 2) of an NHWC array.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_SPATIAL_AXES = (1, 2)


def rfft2(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """Real 2-D FFT over the spatial axes of an NHWC array -> complex64
    (N, H, W//2+1, C). Runs in float32 (TPU FFT precision)."""
    return jnp.fft.rfft2(x.astype(jnp.float32), axes=_SPATIAL_AXES, norm=norm)


def to_real_channels(z: jnp.ndarray) -> jnp.ndarray:
    """Complex (N, H, Wf, C) -> real (N, H, Wf, 2C), real planes first
    (torch.cat([z.real, z.imag], dim=channel), model/unidefense.py:131)."""
    return jnp.concatenate([jnp.real(z), jnp.imag(z)], axis=-1)


def from_real_channels(r: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`to_real_channels` (torch.complex(*tensor_split(2)))."""
    c = r.shape[-1] // 2
    return jax.lax.complex(r[..., :c].astype(jnp.float32), r[..., c:].astype(jnp.float32))


def spectrum_channels(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """rfft2 + channel packing in one call: NHWC -> (N, H, W//2+1, 2C) real."""
    return to_real_channels(rfft2(x, norm=norm))


def irfft2_packed(r: jnp.ndarray, s: tuple[int, int], norm: str = "ortho") -> jnp.ndarray:
    """Inverse rFFT2 from a channel-packed real spectrum (N, H, Wf, 2C) to an
    NHWC array of spatial size `s`.

    The redundant spectrum half is rebuilt from the hermitian symmetry
    Z[k1, k2] = conj(Z[-k1 mod H, -k2 mod W]) using real arithmetic only;
    a single C2C ifft2 then yields the signal as its real part.
    """
    h, w = s
    c = r.shape[-1] // 2
    r = r.astype(jnp.float32)
    re, im = r[..., :c], r[..., c:]
    wf = re.shape[2]

    def mirror(p, sign):
        # columns w' in [wf, w) come from columns (w - w') in [1, w - wf],
        # reversed; rows map h -> (-h) % H == reverse rows then roll by 1.
        tail = p[:, :, 1 : w - wf + 1, :]
        tail = sign * tail[:, ::-1, ::-1, :]
        tail = jnp.roll(tail, 1, axis=1)
        return jnp.concatenate([p, tail], axis=2)

    z = jax.lax.complex(mirror(re, 1.0), mirror(im, -1.0))
    return jnp.real(jnp.fft.ifft2(z, axes=_SPATIAL_AXES, norm=norm))


def irfft2(z: jnp.ndarray, s: tuple[int, int], norm: str = "ortho") -> jnp.ndarray:
    """Inverse of :func:`rfft2` for a complex input; `s` = output (H, W)."""
    return irfft2_packed(to_real_channels(z), s, norm=norm)


def abs_angle_packed(r: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(amplitude, unit_re, unit_im) of a packed spectrum — real arithmetic
    replacement for torch.abs/torch.angle + exp(1j*angle)."""
    c = r.shape[-1] // 2
    re, im = r[..., :c], r[..., c:]
    amp = jnp.sqrt(re * re + im * im)
    safe = jnp.maximum(amp, 1e-20)
    return amp, re / safe, im / safe
