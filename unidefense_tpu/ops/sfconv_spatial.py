"""Exact spatial-domain form of the SFConv frequency branch — no FFTs.

The reference's SFConv frequency branch (model/resnet/exp.py:42-51) computes

    irfft2( unpack( pack(rfft2(x)) @ W ) )

with a frequency-INDEPENDENT 1x1 channel mix W over the packed (re ‖ im)
spectrum. Because the channel mix is constant across frequencies, the whole
branch is a translation-structured linear operator on x with an exact
closed form (derivation below):

    out = x @ Re(A)  −  H_row(x) @ Im(A)  +  x̃ @ Re(B)  −  H_row(x̃) @ Im(B)

where, writing W = [[Wrr, Wri], [Wir, Wii]] in C x C blocks,

    A = [(Wrr + Wii) + i (Wri − Wir)] / 2        (z-linear part)
    B = [(Wrr − Wii) + i (Wri + Wir)] / 2        (conj(z)-linear part)
    x̃[h, w] = x[−h mod H, −w mod W]             (circular double reversal)
    H_row    = 1-D circular convolution along the width axis with the
               discrete Hilbert-like kernel s(d) = (2/W) Σ_{0<k<W/2} sin(2πkd/W)
               (+ nothing from DC/Nyquist: their sines vanish).

Sketch: decompose the real-packed channel mix as the widely-linear complex
map q[k] = z[k] A + conj(z[k]) B. irfft2 evaluates Σ_{k∈half} w_k Re(q[k]
e^{ik·n}) with hermitian column weights w ∈ {1, 2}. Expanding z[k] =
Σ_m x[m] e^{−ik·m}: the cosine part of Σ_half w_k e^{ik·d} telescopes to the
full-lattice sum HW·δ(d) (the weight-2 terms exactly replace their mirrored
partners' cosines), giving the δ terms x@ReA and x̃@ReB; the sine part
collapses along the full-range k1 axis to δ(d1) times the 1-D kernel s(d2),
giving the row-Hilbert terms. Scaling cancels for every `norm` since forward
and inverse scales multiply to 1/(HW).

This removes every FFT custom call / DFT einsum chain from SFConv while
keeping bit-level-equivalent math (matmul precision aside). Enabled by
default; UD_SFCONV_MODE=spectral restores the FFT path.
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

# UD_SFCONV_HILBERT selects how H_row(x̃) is obtained:
#   "shared": via the identity H(x̃) = −(H(x))̃ — one W×W Hilbert einsum
#       total; the second operand is a pure index permutation of the first.
#   "pair" (default): two independent Hilbert einsums (the round-1 form).
# Both are exact; they differ only in fp summation order. Measured A/B on
# the full jitted UDEB4 two-pass step @256² (tools/bench_hilbert.py,
# interleaved, 2026-08-18): pair 168.2 img/s vs shared 161.4 (0.96×) — the
# rev2 roll of H(x) does NOT fuse into the consuming matmuls' reads; XLA
# materializes the permutation, costing more HBM traffic than the W×W
# einsum it replaces (consistent with the bundled-reformulation negative
# result in PROGRESS.md's attack log). "pair" stays the default.
_HILBERT_MODE = os.environ.get("UD_SFCONV_HILBERT", "pair")


@functools.lru_cache(maxsize=None)
def _hilbert_row_matrix(w: int) -> np.ndarray:
    """M[d, w'] with out[.., d] = Σ_w' x[.., w'] s(d − w'), the circular
    row-Hilbert matmul."""
    d = np.arange(w)
    ks = np.arange(1, (w + 1) // 2)  # 0 < k < W/2 (Nyquist sine vanishes)
    # s(d) = (2/W) Σ sin(2π k d / W)
    s = (2.0 / w) * np.sin(2 * np.pi * np.outer(d, ks) / w).sum(axis=1)
    idx = (d[:, None] - d[None, :]) % w
    return s[idx].astype(np.float32)  # (W, W)


def sfconv_freq_spatial(x: jnp.ndarray, w_packed: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the SFConv frequency branch in the spatial domain.

    x: (N, H, W, C); w_packed: (2C, 2C) — the 1x1 freq-conv kernel with
    packed-input rows [re-block ‖ im-block] and packed-output columns, i.e.
    exactly the reshaped flax kernel of SFConv's `freq_conv`.
    Returns (N, H, W, C), identical to
    irfft2_packed(spectrum_channels(x) @ w_packed).
    """
    n, h, w, c = x.shape
    dtype = x.dtype
    wrr = w_packed[:c, :c]
    wri = w_packed[:c, c:]
    wir = w_packed[c:, :c]
    wii = w_packed[c:, c:]
    re_a = (wrr + wii) * 0.5
    im_a = (wri - wir) * 0.5
    re_b = (wrr - wii) * 0.5
    im_b = (wri + wir) * 0.5

    hm = jnp.asarray(_hilbert_row_matrix(w), dtype)

    x_rev = jnp.roll(x[:, ::-1, ::-1, :], (1, 1), axis=(1, 2))  # x[-h % H, -w % W]
    hx = jnp.einsum("dv,nhvc->nhdc", hm, x)
    if _HILBERT_MODE == "shared":
        # H(x̃) = −(H(x))̃: s is circularly odd, so the width convolution of
        # the double-reversed input is the negated double reversal of H(x).
        # −H(x̃)@ImB therefore becomes +rev2(H(x))@ImB — one Hilbert einsum
        # total instead of two.
        hx_rev = -jnp.roll(hx[:, ::-1, ::-1, :], (1, 1), axis=(1, 2))
    else:
        hx_rev = jnp.einsum("dv,nhvc->nhdc", hm, x_rev)

    # four accumulated matmuls; XLA fuses these better than one wide matmul
    # over a materialized [x ‖ Hx ‖ x̃ ‖ Hx̃] concat (measured: 48.7 vs 53.8 ms
    # for the b4 backbone fwd+bwd)
    out = (
        jnp.einsum("nhwc,cd->nhwd", x, re_a.astype(dtype))
        - jnp.einsum("nhwc,cd->nhwd", hx, im_a.astype(dtype))
        + jnp.einsum("nhwc,cd->nhwd", x_rev, re_b.astype(dtype))
        - jnp.einsum("nhwc,cd->nhwd", hx_rev, im_b.astype(dtype))
    )
    return out
