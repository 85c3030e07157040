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

Status and measured regimes (fwd+bwd per op instance, b20 bf16, v5e):

| shape | XLA | fused kernel (v2: dW in-kernel) |
|---|---|---|
| 95²/C192 (UDEB4 @380² group-2) | 6.98 ms | **3.10 ms (2.25×)** |
| 80²/C192 | 5.01 ms | **3.01 ms (1.67×)** |
| 64²/C192, 48²/C336, 32²/C336, 24²/C672, 16²/C672, 12²/C960 | wins | loses (M=W fragments the MXU) |

So the kernel is ON by default for W >= 80 only — exactly the flagship's
380²-training blocks; at 256² nothing qualifies and XLA runs everywhere
(its batched einsums + fused reversal reads win below the crossover; an
earlier v1 whose dW ran as separate XLA einsums lost end-to-end even where
its fwd won, hence the dW contractions are accumulated inside the backward
kernel across the sequential grid). UD_SFCONV_PALLAS=0 disables.

Round-3 NEGATIVE RESULT — row-tiling below W=80 (VERDICT r2 item 3). Two
further kernels were built, verified exact (interpret-mode tests), and
measured with interleaved same-process A/B (tools/bench_sfconv.py
`interleaved`; single adjacent windows drift 2-3x on this tunnel at the ms
scale, so only interleaved minima are comparable):

* v3 (below): grid (N, H/R), (R·W, C) row-stacks so the MXU M dim is R·W
  instead of W, mirror rows from a PRECOMPUTED double reversal (an R-row
  mirror block cannot be block-aligned — row 0 is its own mirror),
  block-diagonal I_R⊗hm Hilbert, fused dW backward.
* v4 (below): split-output form out = [x@A1 − H(x)@A2] + R(x@B1 + H(x)@B2)
  (R commutes with channel mixes, R∘H = −H∘R), which reads x ONCE with no
  materialized reversal and halves the Hilbert matmuls; the double reversal
  of out2 is a fused XLA epilogue.

Interleaved minima, ms per op fwd+bwd, b20 bf16, v5e (2026-08-17):

| shape | XLA | v4 | v2 |
|---|---|---|---|
| 64²/C192  | 2.58 | 2.97 | — |
| 48²/C336  | 2.69 | 2.45 | — |
| 32²/C336  | 1.75 | 2.55 | — |
| 24²/C672  | 2.70 | 2.63 | — |
| 16²/C672  | 1.83 | 2.84 | — |
| 12²/C960  | 2.25 | 2.64 | — |
| 80²/C192  | 3.94 | 3.52 | 3.19 |
| 95²/C192  | 6.11 | (Mosaic compile error) | 3.75 |

v4 only ties/narrowly wins at 2 of 6 small shapes (1.10x / 1.03x) and loses
the rest; v3 is strictly worse than v4 (two Hilbert matmuls + an extra
materialized stream). Root cause: at these sizes the XLA einsums are already
MXU-dense (M = N·H·W in the channel mixes) and the measured per-op times sit
~10x above the HBM roofline for BOTH implementations — the cost is per-op
scheduling overhead inside the program, which a Pallas rewrite does not
remove (pallas_call is additionally a fusion barrier, CLAUDE.md gotcha 11).
The small-W dispatch therefore stays XLA; v2 stays ON for W >= 80. v3/v4 are
kept (tested, exact) as the starting point if a future Mosaic removes the
barriers.

End-to-end coda: an A/B with v4 force-enabled at its two narrow-win shapes
(UD_SFCONV_V4="48,24", full 256² step) could not even be measured — the
full-step compile with the embedded small-shape Mosaic kernels did not
return within a 25-minute window on this runtime (same remote-compile
pathology family as the 95² HTTP 500), vs ~5 min for the XLA-only step.
Adjacent control: 165.0-165.2 img/s. The UD_SFCONV_V4 gate remains for
future runtimes; default stays empty.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from unidefense_tpu.ops.sfconv_spatial import _hilbert_row_matrix

_ENABLED = os.environ.get("UD_SFCONV_PALLAS", "1") != "0"
MIN_WIDTH = 80  # measured crossover: kernel wins at W >= 80, loses below


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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_kernel_call(x, g, a1t, a2tn, b1t, b2t, interpret=False):
    """Fused backward: x_bar (same structure as forward on g with the
    transposed blocks) PLUS the four C×C dW contractions, accumulated across
    the sequential grid — so x and g are each read once instead of feeding
    separate XLA einsum passes (the measured reason v1 lost end-to-end).

    Per cell (n, h):
      x_bar[n,h] = g_h@A1ᵀ + (hm@g_h)@A2ᵀ + Pw@(g_m@B1ᵀ + (hm@g_m)@B2ᵀ)
      A1_bar += x_hᵀ g_h          A2_bar += −(hm@x_h)ᵀ g_h
      B1_bar += (Pw@x_m)ᵀ g_h     B2_bar += (Pw@(hm@x_m))ᵀ g_h
    (a2tn is already −A2ᵀ so the x_bar line is the forward kernel's form.)"""
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    dt = x.dtype
    hm = jnp.asarray(_hilbert_row_matrix(w), dt)
    pw = jnp.asarray(_perm_matrix(w), dt)
    a1t, a2tn, b1t, b2t = (m.astype(dt) for m in (a1t, a2tn, b1t, b2t))
    f32 = jnp.float32

    def kernel(gh_ref, gm_ref, xh_ref, xm_ref, hm_ref, pw_ref,
               a1t_ref, a2tn_ref, b1t_ref, b2t_ref,
               xbar_ref, a1b_ref, a2b_ref, b1b_ref, b2b_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _init():
            a1b_ref[...] = jnp.zeros_like(a1b_ref)
            a2b_ref[...] = jnp.zeros_like(a2b_ref)
            b1b_ref[...] = jnp.zeros_like(b1b_ref)
            b2b_ref[...] = jnp.zeros_like(b2b_ref)

        gh = gh_ref[0, 0]
        gm = gm_ref[0, 0]
        xh = xh_ref[0, 0]
        xm = xm_ref[0, 0]
        hmm = hm_ref[...]
        pww = pw_ref[...]

        # x_bar row (forward structure on g with transposed blocks)
        hgh = jnp.dot(hmm, gh, preferred_element_type=f32).astype(dt)
        hgm = jnp.dot(hmm, gm, preferred_element_type=f32).astype(dt)
        core = (jnp.dot(gh, a1t_ref[...], preferred_element_type=f32)
                - jnp.dot(hgh, a2tn_ref[...], preferred_element_type=f32))
        mir = (jnp.dot(gm, b1t_ref[...], preferred_element_type=f32)
               + jnp.dot(hgm, b2t_ref[...], preferred_element_type=f32)).astype(dt)
        xbar_ref[0, 0] = (core + jnp.dot(pww, mir, preferred_element_type=f32)
                          ).astype(xbar_ref.dtype)

        # dW accumulation
        hxh = jnp.dot(hmm, xh, preferred_element_type=f32).astype(dt)
        rx = jnp.dot(pww, xm, preferred_element_type=f32).astype(dt)
        rhx = jnp.dot(
            pww, jnp.dot(hmm, xm, preferred_element_type=f32).astype(dt),
            preferred_element_type=f32,
        ).astype(dt)
        a1b_ref[...] += jnp.dot(xh.T, gh, preferred_element_type=f32)
        a2b_ref[...] += -jnp.dot(hxh.T, gh, preferred_element_type=f32)
        b1b_ref[...] += jnp.dot(rx.T, gh, preferred_element_type=f32)
        b2b_ref[...] += jnp.dot(rhx.T, gh, preferred_element_type=f32)

    row = pl.BlockSpec((1, 1, w, c), lambda i, j: (i, j, 0, 0))
    mirror = pl.BlockSpec((1, 1, w, c), lambda i, j: (i, (h - j) % h, 0, 0))
    wmat = pl.BlockSpec((w, w), lambda i, j: (0, 0))
    cmat = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    acc = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    xbar, a1b, a2b, b1b, b2b = pl.pallas_call(
        kernel,
        grid=(n, h),
        in_specs=[row, mirror, row, mirror, wmat, wmat, cmat, cmat, cmat, cmat],
        out_specs=[row, acc, acc, acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), dt),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
        ],
        interpret=interpret,
    )(g, g, x, x, hm, pw, a1t, a2tn, b1t, b2t)
    return xbar, a1b, a2b, b1b, b2b


def _fwd(x, w_packed, interpret):
    return sfconv_freq_pallas(x, w_packed, interpret), (x, w_packed)


def _bwd(interpret, res, g):
    x, w_packed = res
    c = x.shape[-1]
    a1, a2, b1, b2 = _split_blocks(w_packed, c)
    x_bar, a1_bar, a2_bar, b1_bar, b2_bar = _bwd_kernel_call(
        x, g, a1.T, -a2.T, b1.T, b2.T, interpret=interpret
    )
    wrr_bar = (a1_bar + b1_bar) * 0.5
    wii_bar = (a1_bar - b1_bar) * 0.5
    wri_bar = (a2_bar + b2_bar) * 0.5
    wir_bar = (b2_bar - a2_bar) * 0.5
    w_bar = jnp.block([[wrr_bar, wri_bar], [wir_bar, wii_bar]]).astype(w_packed.dtype)
    return x_bar.astype(x.dtype), w_bar


sfconv_freq_pallas.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------- v3
# Row-tiled kernel for SMALL widths (the 256² shapes, VERDICT r2 item 3).
#
# v2's grid is (N, H) with per-cell (W, C) matmuls — M = W fragments the
# 128-row MXU below W≈80. v3 tiles R rows per grid cell so every core matmul
# has M = R·W (R = largest divisor of H with R·W ≤ 512):
#
#   out_cell = xs@A1 − (Hb xs)@A2 + rs@B1 − (Hb rs)@B2
#
# with xs the (R·W, C) row-stack, rs the same rows of the PRECOMPUTED double
# reversal rx[n,h,w] = x[n, −h mod H, −w mod W] (one fused XLA
# reverse-and-roll in the prologue — v2's mirror-row double-binding cannot be
# R-row block-aligned because row 0 is its own mirror), and Hb = I_R ⊗ hm the
# block-diagonal per-row Hilbert (R× the FLOPs of per-row hm but one dense
# MXU-tiled matmul; the op is HBM-bound so idle-lane FLOPs are free).
#
# Identity used to push the width reversal onto the input (Pw@hm = −hm@Pw for
# the odd circular Hilbert kernel): Pw@(xm@B1 + (hm@xm)@B2) = rx@B1 −
# (hm@rx)@B2, which is exactly the spatial closed form's x̃ terms.
#
# Backward: x_bar has the SAME structure on g with blocks (A1ᵀ, −A2ᵀ, B1ᵀ,
# B2ᵀ) (Hᵀ = −H, Rᵀ = R, H∘R = −R∘H), and the four C×C dW contractions are
# accumulated in-kernel across the sequential grid like v2.


@functools.lru_cache(maxsize=None)
def _row_tile(h: int, w: int, target: int = 512) -> int:
    """Largest divisor R of h with R·w <= target (always >= 1)."""
    best = 1
    for r in range(1, h + 1):
        if h % r == 0 and r * w <= target:
            best = r
    return best


@functools.lru_cache(maxsize=None)
def _hilbert_block_matrix(w: int, r: int) -> np.ndarray:
    """I_R ⊗ hm — per-row circular Hilbert on an (R·W, C) row-stack."""
    return np.kron(np.eye(r, dtype=np.float32), _hilbert_row_matrix(w))


def _double_reversal(x: jnp.ndarray) -> jnp.ndarray:
    """rx[n, h, w] = x[n, (−h) mod H, (−w) mod W] (one fused XLA pass)."""
    return jnp.roll(x[:, ::-1, ::-1, :], (1, 1), axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kernel_call_v3(x, rx, a1, a2, b1, b2, interpret=False):
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    dt = x.dtype
    r = _row_tile(h, w)
    hmb = jnp.asarray(_hilbert_block_matrix(w, r), dt)
    a1, a2, b1, b2 = (m.astype(dt) for m in (a1, a2, b1, b2))
    f32 = jnp.float32

    def kernel(x_ref, rx_ref, hm_ref, a1_ref, a2_ref, b1_ref, b2_ref, out_ref):
        xs = x_ref[0].reshape(r * w, c)
        rs = rx_ref[0].reshape(r * w, c)
        hmm = hm_ref[...]
        hx = jnp.dot(hmm, xs, preferred_element_type=f32).astype(dt)
        hr = jnp.dot(hmm, rs, preferred_element_type=f32).astype(dt)
        out = (
            jnp.dot(xs, a1_ref[...], preferred_element_type=f32)
            - jnp.dot(hx, a2_ref[...], preferred_element_type=f32)
            + jnp.dot(rs, b1_ref[...], preferred_element_type=f32)
            - jnp.dot(hr, b2_ref[...], preferred_element_type=f32)
        )
        out_ref[0] = out.reshape(r, w, c).astype(out_ref.dtype)

    blk = pl.BlockSpec((1, r, w, c), lambda i, j: (i, j, 0, 0))
    wmat = pl.BlockSpec((r * w, r * w), lambda i, j: (0, 0))
    cmat = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(n, h // r),
        in_specs=[blk, blk, wmat, cmat, cmat, cmat, cmat],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dt),
        interpret=interpret,
    )(x, rx, hmb, a1, a2, b1, b2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_kernel_call_v3(x, rx, g, rg, a1t, a2tn, b1t, b2t, interpret=False):
    """Fused v3 backward. Per cell (row-stacks xs, rs, gs, gr):
      x_bar = gs@A1ᵀ + (Hb gs)@A2ᵀ + gr@B1ᵀ − (Hb gr)@B2ᵀ
              (= forward form with (a1t, a2tn=−A2ᵀ, b1t, b2t))
      A1_bar += xsᵀ gs      A2_bar += −(Hb xs)ᵀ gs
      B1_bar += rsᵀ gs      B2_bar += −(Hb rs)ᵀ gs
    matching v2's accumulation identities (rx = Pw@xm, −H(rx) = Pw@hm@xm)."""
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    dt = x.dtype
    r = _row_tile(h, w)
    hmb = jnp.asarray(_hilbert_block_matrix(w, r), dt)
    a1t, a2tn, b1t, b2t = (m.astype(dt) for m in (a1t, a2tn, b1t, b2t))
    f32 = jnp.float32

    def kernel(g_ref, rg_ref, x_ref, rx_ref, hm_ref,
               a1t_ref, a2tn_ref, b1t_ref, b2t_ref,
               xbar_ref, a1b_ref, a2b_ref, b1b_ref, b2b_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _init():
            a1b_ref[...] = jnp.zeros_like(a1b_ref)
            a2b_ref[...] = jnp.zeros_like(a2b_ref)
            b1b_ref[...] = jnp.zeros_like(b1b_ref)
            b2b_ref[...] = jnp.zeros_like(b2b_ref)

        gs = g_ref[0].reshape(r * w, c)
        gr = rg_ref[0].reshape(r * w, c)
        xs = x_ref[0].reshape(r * w, c)
        rs = rx_ref[0].reshape(r * w, c)
        hmm = hm_ref[...]

        hg = jnp.dot(hmm, gs, preferred_element_type=f32).astype(dt)
        hgr = jnp.dot(hmm, gr, preferred_element_type=f32).astype(dt)
        xbar = (
            jnp.dot(gs, a1t_ref[...], preferred_element_type=f32)
            - jnp.dot(hg, a2tn_ref[...], preferred_element_type=f32)
            + jnp.dot(gr, b1t_ref[...], preferred_element_type=f32)
            - jnp.dot(hgr, b2t_ref[...], preferred_element_type=f32)
        )
        xbar_ref[0] = xbar.reshape(r, w, c).astype(xbar_ref.dtype)

        hx = jnp.dot(hmm, xs, preferred_element_type=f32).astype(dt)
        hr = jnp.dot(hmm, rs, preferred_element_type=f32).astype(dt)
        a1b_ref[...] += jnp.dot(xs.T, gs, preferred_element_type=f32)
        a2b_ref[...] += -jnp.dot(hx.T, gs, preferred_element_type=f32)
        b1b_ref[...] += jnp.dot(rs.T, gs, preferred_element_type=f32)
        b2b_ref[...] += -jnp.dot(hr.T, gs, preferred_element_type=f32)

    blk = pl.BlockSpec((1, r, w, c), lambda i, j: (i, j, 0, 0))
    wmat = pl.BlockSpec((r * w, r * w), lambda i, j: (0, 0))
    cmat = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    acc = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(n, h // r),
        in_specs=[blk, blk, blk, blk, wmat, cmat, cmat, cmat, cmat],
        out_specs=[blk, acc, acc, acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), dt),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
        ],
        interpret=interpret,
    )(g, rg, x, rx, hmb, a1t, a2tn, b1t, b2t)


def _v3_vmem_bytes(shape) -> int:
    """Rough per-cell VMEM footprint of the fused v3 BACKWARD (the larger
    pass): transposed weights (bf16) + f32 dW accumulators + 5 row-stack
    blocks + the block-diagonal Hilbert."""
    n, h, w, c = shape
    r = _row_tile(h, w)
    return (4 * c * c * 2) + (4 * c * c * 4) + 5 * (r * w * c * 2) + (r * w) ** 2 * 2


def v3_eligible(shape) -> bool:
    if not _ENABLED:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    return _v3_vmem_bytes(shape) < 12 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sfconv_freq_pallas_v3(x: jnp.ndarray, w_packed: jnp.ndarray, interpret: bool = False):
    """Row-tiled drop-in for sfconv_freq_spatial (small-W regime)."""
    c = x.shape[-1]
    a1, a2, b1, b2 = _split_blocks(w_packed, c)
    return _kernel_call_v3(x, _double_reversal(x), a1, a2, b1, b2, interpret=interpret)


def _fwd_v3(x, w_packed, interpret):
    return sfconv_freq_pallas_v3(x, w_packed, interpret), (x, w_packed)


def _bwd_v3(interpret, res, g):
    x, w_packed = res
    c = x.shape[-1]
    a1, a2, b1, b2 = _split_blocks(w_packed, c)
    x_bar, a1_bar, a2_bar, b1_bar, b2_bar = _bwd_kernel_call_v3(
        x, _double_reversal(x), g, _double_reversal(g),
        a1.T, -a2.T, b1.T, b2.T, interpret=interpret,
    )
    wrr_bar = (a1_bar + b1_bar) * 0.5
    wii_bar = (a1_bar - b1_bar) * 0.5
    wri_bar = (a2_bar + b2_bar) * 0.5
    wir_bar = (b2_bar - a2_bar) * 0.5
    w_bar = jnp.block([[wrr_bar, wri_bar], [wir_bar, wii_bar]]).astype(w_packed.dtype)
    return x_bar.astype(x.dtype), w_bar


sfconv_freq_pallas_v3.defvjp(_fwd_v3, _bwd_v3)


# --------------------------------------------------------------------- v4
# Split-output kernel: R commutes with the channel matmuls and anticommutes
# with H (R∘H = −H∘R), so
#
#     out = x@A1 − H(x)@A2 + R(x)@B1 − H(R(x))@B2
#         = [x@A1 − H(x)@A2] + R( x@B1 + H(x)@B2 )
#
# The kernel therefore reads x ONCE (aligned R-row blocks, no mirror binding,
# no materialized reversal), performs ONE block-diagonal Hilbert matmul and
# four channel matmuls, and writes TWO outputs; the double reversal of out2
# runs as a fused XLA epilogue (reverse+roll is free to fuse into the
# consumer). Backward has the same split structure on g:
#
#     x_bar = [g@A1ᵀ + H(g)@A2ᵀ] + R( g@B1ᵀ + H(g)@B2ᵀ )
#
# and the dW contractions need one reversed stream (rg = R(g), one XLA pass):
#     dA1 = Σ xᵀg   dA2 = −Σ(Hx)ᵀg   dB1 = Σ xᵀrg   dB2 = Σ(Hx)ᵀrg
# (⟨R(x), g⟩ = ⟨x, R(g)⟩ row-stack-wise; signs fold R∘H = −H∘R.)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _kernel_call_v4(x, m1, m2, m3, m4, interpret=False):
    """Returns (out1, out2) with out1 = x@m1 − H(x)@m2, out2 = x@m3 + H(x)@m4."""
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    dt = x.dtype
    r = _row_tile(h, w)
    hmb = jnp.asarray(_hilbert_block_matrix(w, r), dt)
    m1, m2, m3, m4 = (m.astype(dt) for m in (m1, m2, m3, m4))
    f32 = jnp.float32

    def kernel(x_ref, hm_ref, m1_ref, m2_ref, m3_ref, m4_ref, o1_ref, o2_ref):
        xs = x_ref[0].reshape(r * w, c)
        hx = jnp.dot(hm_ref[...], xs, preferred_element_type=f32).astype(dt)
        o1 = (jnp.dot(xs, m1_ref[...], preferred_element_type=f32)
              - jnp.dot(hx, m2_ref[...], preferred_element_type=f32))
        o2 = (jnp.dot(xs, m3_ref[...], preferred_element_type=f32)
              + jnp.dot(hx, m4_ref[...], preferred_element_type=f32))
        o1_ref[0] = o1.reshape(r, w, c).astype(o1_ref.dtype)
        o2_ref[0] = o2.reshape(r, w, c).astype(o2_ref.dtype)

    blk = pl.BlockSpec((1, r, w, c), lambda i, j: (i, j, 0, 0))
    wmat = pl.BlockSpec((r * w, r * w), lambda i, j: (0, 0))
    cmat = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(n, h // r),
        in_specs=[blk, wmat, cmat, cmat, cmat, cmat],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((n, h, w, c), dt)] * 2,
        interpret=interpret,
    )(x, hmb, m1, m2, m3, m4)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_kernel_call_v4(x, g, rg, a1t, a2t, b1t, b2t, interpret=False):
    """Fused v4 backward: split x_bar halves PLUS the four dW accumulators.
    Per cell: hg = Hb g, hx = Hb x;
      xbar1 = g@A1ᵀ + hg@A2ᵀ        xbar2 = g@B1ᵀ + hg@B2ᵀ
      a1b += xᵀg   a2b += −hxᵀg     b1b += xᵀrg    b2b += hxᵀrg
    Caller: x_bar = xbar1 + R(xbar2); dA2 = a2b, dB2 = b2b (signs folded)."""
    from jax.experimental import pallas as pl

    n, h, w, c = x.shape
    dt = x.dtype
    r = _row_tile(h, w)
    hmb = jnp.asarray(_hilbert_block_matrix(w, r), dt)
    a1t, a2t, b1t, b2t = (m.astype(dt) for m in (a1t, a2t, b1t, b2t))
    f32 = jnp.float32

    def kernel(x_ref, g_ref, rg_ref, hm_ref, a1t_ref, a2t_ref, b1t_ref, b2t_ref,
               x1_ref, x2_ref, a1b_ref, a2b_ref, b1b_ref, b2b_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _init():
            a1b_ref[...] = jnp.zeros_like(a1b_ref)
            a2b_ref[...] = jnp.zeros_like(a2b_ref)
            b1b_ref[...] = jnp.zeros_like(b1b_ref)
            b2b_ref[...] = jnp.zeros_like(b2b_ref)

        xs = x_ref[0].reshape(r * w, c)
        gs = g_ref[0].reshape(r * w, c)
        rs = rg_ref[0].reshape(r * w, c)
        hmm = hm_ref[...]
        hg = jnp.dot(hmm, gs, preferred_element_type=f32).astype(dt)
        hx = jnp.dot(hmm, xs, preferred_element_type=f32).astype(dt)

        x1 = (jnp.dot(gs, a1t_ref[...], preferred_element_type=f32)
              + jnp.dot(hg, a2t_ref[...], preferred_element_type=f32))
        x2 = (jnp.dot(gs, b1t_ref[...], preferred_element_type=f32)
              + jnp.dot(hg, b2t_ref[...], preferred_element_type=f32))
        x1_ref[0] = x1.reshape(r, w, c).astype(x1_ref.dtype)
        x2_ref[0] = x2.reshape(r, w, c).astype(x2_ref.dtype)

        a1b_ref[...] += jnp.dot(xs.T, gs, preferred_element_type=f32)
        a2b_ref[...] += -jnp.dot(hx.T, gs, preferred_element_type=f32)
        b1b_ref[...] += jnp.dot(xs.T, rs, preferred_element_type=f32)
        b2b_ref[...] += jnp.dot(hx.T, rs, preferred_element_type=f32)

    blk = pl.BlockSpec((1, r, w, c), lambda i, j: (i, j, 0, 0))
    wmat = pl.BlockSpec((r * w, r * w), lambda i, j: (0, 0))
    cmat = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    acc = pl.BlockSpec((c, c), lambda i, j: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=(n, h // r),
        in_specs=[blk, blk, blk, wmat, cmat, cmat, cmat, cmat],
        out_specs=[blk, blk, acc, acc, acc, acc],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w, c), dt),
            jax.ShapeDtypeStruct((n, h, w, c), dt),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
        ],
        interpret=interpret,
    )(x, g, rg, hmb, a1t, a2t, b1t, b2t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sfconv_freq_pallas_v4(x: jnp.ndarray, w_packed: jnp.ndarray, interpret: bool = False):
    """Split-output row-tiled drop-in for sfconv_freq_spatial."""
    c = x.shape[-1]
    a1, a2, b1, b2 = _split_blocks(w_packed, c)
    o1, o2 = _kernel_call_v4(x, a1, a2, b1, b2, interpret=interpret)
    return o1 + _double_reversal(o2)


def _fwd_v4(x, w_packed, interpret):
    return sfconv_freq_pallas_v4(x, w_packed, interpret), (x, w_packed)


def _bwd_v4(interpret, res, g):
    x, w_packed = res
    c = x.shape[-1]
    a1, a2, b1, b2 = _split_blocks(w_packed, c)
    x1, x2, a1_bar, a2_bar, b1_bar, b2_bar = _bwd_kernel_call_v4(
        x, g, _double_reversal(g), a1.T, a2.T, b1.T, b2.T, interpret=interpret
    )
    x_bar = x1 + _double_reversal(x2)
    wrr_bar = (a1_bar + b1_bar) * 0.5
    wii_bar = (a1_bar - b1_bar) * 0.5
    wri_bar = (a2_bar + b2_bar) * 0.5
    wir_bar = (b2_bar - a2_bar) * 0.5
    w_bar = jnp.block([[wrr_bar, wri_bar], [wir_bar, wii_bar]]).astype(w_packed.dtype)
    return x_bar.astype(x.dtype), w_bar


sfconv_freq_pallas_v4.defvjp(_fwd_v4, _bwd_v4)


@functools.lru_cache(maxsize=1)
def v4_widths() -> frozenset:
    """Widths for which the v4 split-output kernel is enabled (A/B gate):
    UD_SFCONV_V4="48,24" etc. Default EMPTY — the interleaved per-op A/B
    (docstring table) showed no consistent small-W win, so v4 ships off."""
    raw = os.environ.get("UD_SFCONV_V4", "")
    try:
        if jax.default_backend() != "tpu":
            return frozenset()
    except Exception:
        return frozenset()
    return frozenset(int(t) for t in raw.split(",") if t.strip())
