"""Fused Pallas kernel for the SFConv frequency branch (TPU).

Computes the exact spatial closed form of ops/sfconv_spatial.py —
    out = x@A1 − H(x)@A2 + R(x)@B1 − H(R(x))@B2
(A/B blocks from the packed 1x1 spectral kernel; H = circular row-Hilbert
matmul; R = circular double reversal) — in ONE pass over x instead of XLA's
several materialized intermediates. The step is HBM-bound
(PROGRESS.md round-2 table), so fewer passes beat fewer FLOPs.

Kernel layout: grid (N, H); each cell loads row x[n, h] and its mirror row
x[n, (−h) mod H] (same array bound twice with different index maps — Mosaic
has no in-kernel reverse, and the mirror row is where R's data lives), runs
the Hilbert (W×W) and channel (C×C) matmuls on the MXU, and applies the
width reversal as a constant permutation matmul:

    out[n, h] = x_h@A1 − (hm@x_h)@A2 + Pw @ (x_m@B1 + (hm@x_m)@B2)

Gradients via custom_vjp:
* dx reuses the SAME kernel — the transpose operator has the identical
  structure with (A1, A2, B1, B2) → (A1ᵀ, −A2ᵀ, B1ᵀ, B2ᵀ), because
  Hᵀ = −H (odd kernel), Rᵀ = R, and H∘R = −R∘H;
* dW is four (C×C) einsums over N·H·W (plain XLA; they are MXU-friendly).

Status: OFF by default (UD_SFCONV_PALLAS=1 opts in). Isolated fwd the kernel
wins up to 1.7× at 32²/C336, but END-TO-END the two-pass UDEB4 step measures
165.1 img/s with XLA vs 154.5 with the kernel (same-conditions A/B,
2026-08-16): the custom-VJP dW einsums re-read x/H(x)/g (extra HBM passes
XLA's AD shares), and pallas_call is a fusion barrier for the surrounding
cast/pool/blend. Kept (with exactness tests) as the starting point for a
future kernel that also fuses the dW contractions.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from unidefense_tpu.ops.sfconv_spatial import _hilbert_row_matrix

_ENABLED = os.environ.get("UD_SFCONV_PALLAS", "0") == "1"
MIN_WIDTH = 32


def pallas_eligible(shape) -> bool:
    """True when the fused kernel is expected to win for (N, H, W, C)."""
    if not _ENABLED:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    n, h, w, c = shape
    # weights (4 C×C bf16 blocks) must fit VMEM comfortably
    return w >= MIN_WIDTH and c * c * 4 * 2 < 8 * 1024 * 1024


@functools.lru_cache(maxsize=None)
def _perm_matrix(k: int) -> np.ndarray:
    """P with (P @ y)[i] = y[(−i) mod k]."""
    p = np.zeros((k, k), np.float32)
    p[np.arange(k), (-np.arange(k)) % k] = 1.0
    return p


def _split_blocks(w_packed: jnp.ndarray, c: int):
    wrr = w_packed[:c, :c]
    wri = w_packed[:c, c:]
    wir = w_packed[c:, :c]
    wii = w_packed[c:, c:]
    a1 = (wrr + wii) * 0.5
    a2 = (wri - wir) * 0.5
    b1 = (wrr - wii) * 0.5
    b2 = (wri + wir) * 0.5
    return a1, a2, b1, b2


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kernel_call(x, a1, a2, b1, b2, interpret=False):
    """out[n,h] = x_h@a1 − (hm@x_h)@a2 + Pw @ (x_m@b1 + (hm@x_m)@b2)."""
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    dt = x.dtype
    hm = jnp.asarray(_hilbert_row_matrix(w), dt)
    pw = jnp.asarray(_perm_matrix(w), dt)
    a1, a2, b1, b2 = (m.astype(dt) for m in (a1, a2, b1, b2))

    def kernel(xh_ref, xm_ref, hm_ref, pw_ref, a1_ref, a2_ref, b1_ref, b2_ref, out_ref):
        f32 = jnp.float32
        xh = xh_ref[0, 0]  # (W, C)
        xm = xm_ref[0, 0]
        hmm = hm_ref[...]
        hxh = jnp.dot(hmm, xh, preferred_element_type=f32).astype(dt)
        hxm = jnp.dot(hmm, xm, preferred_element_type=f32).astype(dt)
        core = (
            jnp.dot(xh, a1_ref[...], preferred_element_type=f32)
            - jnp.dot(hxh, a2_ref[...], preferred_element_type=f32)
        )
        mir = (
            jnp.dot(xm, b1_ref[...], preferred_element_type=f32)
            + jnp.dot(hxm, b2_ref[...], preferred_element_type=f32)
        ).astype(dt)
        out = core + jnp.dot(pw_ref[...], mir, preferred_element_type=f32)
        out_ref[0, 0] = out.astype(out_ref.dtype)

    row = pl.BlockSpec((1, 1, w, c), lambda i, j: (i, j, 0, 0))
    mirror = pl.BlockSpec((1, 1, w, c), lambda i, j: (i, (h - j) % h, 0, 0))
    wmat = pl.BlockSpec((w, w), lambda i, j: (0, 0))
    cmat = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(n, h),
        in_specs=[row, mirror, wmat, wmat, cmat, cmat, cmat, cmat],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dt),
        interpret=interpret,
    )(x, x, hm, pw, a1, a2, b1, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sfconv_freq_pallas(x: jnp.ndarray, w_packed: jnp.ndarray, interpret: bool = False):
    """Drop-in replacement for ops/sfconv_spatial.sfconv_freq_spatial.
    x: (N, H, W, C); w_packed: (2C, 2C). interpret=True runs the Pallas
    interpreter (CPU tests)."""
    c = x.shape[-1]
    a1, a2, b1, b2 = _split_blocks(w_packed, c)
    return _kernel_call(x, a1, a2, b1, b2, interpret=interpret)


def _fwd(x, w_packed, interpret):
    return sfconv_freq_pallas(x, w_packed, interpret), (x, w_packed)


def _bwd(interpret, res, g):
    x, w_packed = res
    c = x.shape[-1]
    a1, a2, b1, b2 = _split_blocks(w_packed, c)
    # dx: same kernel, transposed blocks with the sign flip on A2
    x_bar = _kernel_call(g, a1.T, -a2.T, b1.T, b2.T, interpret=interpret)

    # dW: four C×C contractions over N,H,W (f32 accumulation)
    hm = jnp.asarray(_hilbert_row_matrix(x.shape[2]), x.dtype)
    hx = jnp.einsum("dv,nhvc->nhdc", hm, x)
    rx = jnp.roll(x[:, ::-1, ::-1, :], (1, 1), axis=(1, 2))
    rhx = jnp.roll(hx[:, ::-1, ::-1, :], (1, 1), axis=(1, 2))
    dot = functools.partial(jnp.einsum, "nhwc,nhwd->cd",
                            preferred_element_type=jnp.float32)
    a1_bar = dot(x, g)
    a2_bar = -dot(hx, g)
    b1_bar = dot(rx, g)
    b2_bar = dot(rhx, g)  # −H(R(x)) = +R(H(x))
    wrr_bar = (a1_bar + b1_bar) * 0.5
    wii_bar = (a1_bar - b1_bar) * 0.5
    wri_bar = (a2_bar + b2_bar) * 0.5
    wir_bar = (b2_bar - a2_bar) * 0.5
    w_bar = jnp.block([[wrr_bar, wri_bar], [wir_bar, wii_bar]]).astype(w_packed.dtype)
    return x_bar.astype(x.dtype), w_bar


sfconv_freq_pallas.defvjp(_fwd, _bwd)
