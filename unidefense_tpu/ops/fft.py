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

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_SPATIAL_AXES = (1, 2)

# rFFT2/irFFT2 dispatch: 'auto' uses DFT-as-matmul for small spatial sizes
# (the MXU runs small dense DFTs faster than the FFT custom call, and the
# matmuls fuse with neighbouring ops) and the FFT custom call for large ones.
# Override with UD_FFT_MODE={auto,fft,dft}.
#
# Precision note: the DFT einsums run at the backend's default matmul
# precision (bf16 inputs on TPU, ~1e-2 abs error on O(1) spectra). Every
# auto-dispatched call site (SFConv freq branch, dynamic-filter spectra)
# immediately feeds the spectrum into a bf16 1x1 conv, so this loses nothing;
# precision-critical transforms (reconstruction losses, style transfer at
# full image resolution) are above the size cutoff and keep the f32 FFT
# custom call. Set UD_FFT_MODE=fft for strict-f32 everywhere.
_FFT_MODE = os.environ.get("UD_FFT_MODE", "auto")
_DFT_MIN_SIZE = int(os.environ.get("UD_DFT_MIN_SIZE", "12"))
_DFT_MAX_SIZE = int(os.environ.get("UD_DFT_MAX_SIZE", "64"))


def _use_dft(h: int, w: int) -> bool:
    if _FFT_MODE == "fft":
        return False
    if _FFT_MODE == "dft":
        return True
    # measured on TPU v5e (batch 20): DFT-matmul wins for 16..64 (e.g. 24^2
    # C=672: 1.0 ms vs 2.6 ms FFT; 48^2: 2.4 vs 4.0), the FFT custom call
    # wins at <=8 (0.7 vs 1.4 — 8x8 operands waste most of the 128x128 MXU)
    return _DFT_MIN_SIZE <= max(h, w) <= _DFT_MAX_SIZE


@functools.lru_cache(maxsize=None)
def _fwd_dft_mats(h: int, w: int, norm: str):
    """Real matrices for rfft2 as matmuls. Returns (C_H, S_H) each (H, H) and
    (C_W, S_W) each (Wf, W), with ortho scaling folded in."""
    wf = w // 2 + 1
    k1 = np.arange(h)[:, None] * np.arange(h)[None, :]
    ch = np.cos(2 * np.pi * k1 / h)
    sh = np.sin(2 * np.pi * k1 / h)
    k2 = np.arange(wf)[:, None] * np.arange(w)[None, :]
    cw = np.cos(2 * np.pi * k2 / w)
    sw = np.sin(2 * np.pi * k2 / w)
    scale = 1.0 / np.sqrt(h * w) if norm == "ortho" else 1.0
    # exactly one H-axis matrix multiplies each term, so fold the scale into
    # BOTH (each product uses either C_H or S_H, never both)
    return (
        (ch * scale).astype(np.float32), (sh * scale).astype(np.float32),
        cw.astype(np.float32), sw.astype(np.float32),
    )


@functools.lru_cache(maxsize=None)
def _inv_dft_mats(h: int, w: int, norm: str):
    """Real matrices for irfft2-from-half-spectrum as matmuls: the hermitian
    mirror is absorbed into column weights (1 for DC/Nyquist, 2 otherwise).
    Returns (A_H, B_H) each (H, H) and (A_W, B_W) each (W, Wf)."""
    wf = w // 2 + 1
    k1 = np.arange(h)[:, None] * np.arange(h)[None, :]
    ah = np.cos(2 * np.pi * k1 / h)
    bh = np.sin(2 * np.pi * k1 / h)
    weights = np.full(wf, 2.0)
    weights[0] = 1.0
    if w % 2 == 0:
        weights[-1] = 1.0
    k2 = np.arange(w)[:, None] * np.arange(wf)[None, :]
    aw = np.cos(2 * np.pi * k2 / w) * weights[None, :]
    bw = np.sin(2 * np.pi * k2 / w) * weights[None, :]
    scale = 1.0 / np.sqrt(h * w) if norm == "ortho" else 1.0 / (h * w)
    return (
        (ah * scale).astype(np.float32), (bh * scale).astype(np.float32),
        aw.astype(np.float32), bw.astype(np.float32),
    )


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


def _dft_spectrum_channels(x: jnp.ndarray, norm: str) -> jnp.ndarray:
    """rfft2 on small sizes as four real matmul chains, channel-packed output.

    Z = (C_H - i S_H) x (C_W - i S_W)^T for real x:
      A = C_H x, B = S_H x  ->  re = A Cw^T - B Sw^T, im = -(A Sw^T + B Cw^T)
    """
    n, h, w, c = x.shape
    ch, sh, cw, sw = (jnp.asarray(m) for m in _fwd_dft_mats(h, w, norm))
    xf = x.astype(jnp.float32)
    a = jnp.einsum("kh,nhwc->nkwc", ch, xf)
    b = jnp.einsum("kh,nhwc->nkwc", sh, xf)
    re = jnp.einsum("fw,nkwc->nkfc", cw, a) - jnp.einsum("fw,nkwc->nkfc", sw, b)
    im = -(jnp.einsum("fw,nkwc->nkfc", sw, a) + jnp.einsum("fw,nkwc->nkfc", cw, b))
    return jnp.concatenate([re, im], axis=-1)


def _dft_irfft2_packed(r: jnp.ndarray, s: tuple[int, int], norm: str) -> jnp.ndarray:
    """Half-spectrum inverse as four real matmul chains (hermitian weights
    folded into the W-axis matrices):
      x = A_H (re A_W^T - im B_W^T) - B_H (re B_W^T + im A_W^T).
    """
    h, w = s
    c = r.shape[-1] // 2
    rf = r.astype(jnp.float32)
    re, im = rf[..., :c], rf[..., c:]
    ah, bh, aw, bw = (jnp.asarray(m) for m in _inv_dft_mats(h, w, norm))
    u = jnp.einsum("wf,nkfc->nkwc", aw, re) - jnp.einsum("wf,nkfc->nkwc", bw, im)
    v = jnp.einsum("wf,nkfc->nkwc", bw, re) + jnp.einsum("wf,nkfc->nkwc", aw, im)
    return jnp.einsum("hk,nkwc->nhwc", ah, u) - jnp.einsum("hk,nkwc->nhwc", bh, v)


def spectrum_channels(x: jnp.ndarray, norm: str = "ortho") -> jnp.ndarray:
    """rfft2 + channel packing in one call: NHWC -> (N, H, W//2+1, 2C) real."""
    if _use_dft(x.shape[1], x.shape[2]):
        return _dft_spectrum_channels(x, norm)
    return to_real_channels(rfft2(x, norm=norm))


def irfft2_packed(r: jnp.ndarray, s: tuple[int, int], norm: str = "ortho") -> jnp.ndarray:
    """Inverse rFFT2 from a channel-packed real spectrum (N, H, Wf, 2C) to an
    NHWC array of spatial size `s`.

    The redundant spectrum half is rebuilt from the hermitian symmetry
    Z[k1, k2] = conj(Z[-k1 mod H, -k2 mod W]) using real arithmetic only;
    a single C2C ifft2 then yields the signal as its real part.
    """
    h, w = s
    if _use_dft(h, w):
        return _dft_irfft2_packed(r, s, norm)
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
