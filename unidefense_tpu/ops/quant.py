"""Weight-only int8 quantization for serving.

TPU-side addition (the reference has no quantized/serving path at all — its
only inference surface is `main.py --test`). Symmetric per-output-channel
int8: for every >=2-D parameter leaf (conv HWIO kernels, dense (in, out)
kernels, attention projections) the quantizer stores

    q     : int8, same shape as the weight
    scale : float32, shape (out_channels,) — amax over all leading axes / 127

and serving dequantizes `q * scale` inside the jitted eval call, so weights
live in HBM at 1/4 the fp32 footprint (1/2 of bf16) and expand on the fly —
XLA fuses the cheap int8->bf16 multiply into the consumer where it can.
Per-output-channel scaling keeps the worst-case rounding error at
`scale/2 = amax/254` per element, which is empirically invisible on
UniDefense probabilities (see tests/test_quant.py for the bound and the
Predictor-level parity check).

1-D leaves (biases, BN scale/bias) and scalars stay fp32 — they are a
negligible fraction of the bytes and BN affine precision matters.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class QArray:
    """A quantized weight leaf: int8 values + per-output-channel fp32 scale.

    Registered as a pytree node so a param tree with QArray leaves passes
    straight through `jax.jit` boundaries as two device arrays per leaf.
    """

    def __init__(self, q, scale):
        self.q = q
        self.scale = scale

    @property
    def shape(self):
        return self.q.shape

    @property
    def nbytes(self) -> int:
        return int(np.prod(self.q.shape)) + int(np.prod(self.scale.shape)) * 4

    def dequantize(self, dtype=jnp.float32):
        return (self.q.astype(dtype) * self.scale.astype(dtype)).astype(dtype)

    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):  # pragma: no cover
        return f"QArray(shape={tuple(self.q.shape)}, scale={tuple(self.scale.shape)})"


def quantize_array(w: jnp.ndarray) -> QArray:
    """Symmetric per-last-axis-channel int8 quantization of one weight."""
    w = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QArray(q, scale.reshape(w.shape[-1]).astype(jnp.float32))


def _is_q(x: Any) -> bool:
    return isinstance(x, QArray)


@partial(jax.jit, static_argnums=1)
def quantize_tree(params: Any, min_ndim: int = 2) -> Any:
    """Quantize every leaf with ndim >= min_ndim; smaller leaves pass through
    untouched (bitwise). Structure is preserved, so the result drops into the
    same model.apply param slot after `dequantize_tree`.

    Jitted as ONE program over the whole tree: the eager form dispatched ~4
    device ops per leaf, which costs seconds/op through the tunneled axon TPU
    (CLAUDE.md gotcha 3) — minutes for UDEB4's hundreds of leaves."""
    return jax.tree.map(
        lambda w: quantize_array(w) if jnp.ndim(w) >= min_ndim else w, params
    )


def dequantize_tree(params_q: Any, dtype=jnp.float32) -> Any:
    """Expand QArray leaves back to dense weights (inside jit for serving)."""
    return jax.tree.map(
        lambda w: w.dequantize(dtype) if _is_q(w) else w, params_q, is_leaf=_is_q
    )


def tree_nbytes(params: Any) -> int:
    """Parameter bytes as stored (QArray-aware) — for the 4x footprint claim."""
    total = 0
    for leaf in jax.tree.leaves(params, is_leaf=_is_q):
        if _is_q(leaf):
            total += leaf.nbytes
        else:
            total += int(np.prod(jnp.shape(leaf))) * jnp.asarray(leaf).dtype.itemsize
    return total
