"""Resize / pooling primitives, designed for the MXU.

Bilinear (align_corners=True) resize and torch-style adaptive average pooling
are expressed as two static separable matmuls (out = A_h @ x @ A_w^T). The
interpolation matrices are compile-time constants, so XLA folds them into
large batched GEMMs on the systolic array instead of gather/scatter chains.

Reference semantics covered here:
* F.interpolate(mode='bilinear', align_corners=True)   (model/unidefense.py:16)
* F.interpolate(mode='nearest')                        (model/modules.py:19-21)
* F.adaptive_avg_pool2d                                (model/resnet/module_exp.py:30-31)
* nn.MaxPool2d(kernel_size=3, stride=2, padding=1)     (model/resnet/module_exp.py:73)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) interpolation matrix with align_corners=True semantics."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for o in range(out_size):
        pos = o * scale
        lo = int(np.floor(pos))
        hi = min(lo + 1, in_size - 1)
        frac = pos - lo
        m[o, lo] += 1.0 - frac
        m[o, hi] += frac
    return m


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) averaging matrix matching torch adaptive_avg_pool windows:
    window_i = [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for o in range(out_size):
        lo = (o * in_size) // out_size
        hi = -(-((o + 1) * in_size) // out_size)  # ceil
        m[o, lo:hi] = 1.0 / (hi - lo)
    return m


def _separable_apply(x: jnp.ndarray, a_h: np.ndarray, a_w: np.ndarray) -> jnp.ndarray:
    """Apply (out_h,in_h) and (out_w,in_w) matrices over NHWC spatial axes."""
    dtype = x.dtype
    a_h = jnp.asarray(a_h, dtype=dtype)
    a_w = jnp.asarray(a_w, dtype=dtype)
    x = jnp.einsum("Hh,nhwc->nHwc", a_h, x, preferred_element_type=dtype)
    x = jnp.einsum("Ww,nhwc->nhWc", a_w, x, preferred_element_type=dtype)
    return x


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC bilinear resize, align_corners=True (torch F.interpolate parity)."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    return _separable_apply(x, _bilinear_matrix(out_h, h), _bilinear_matrix(out_w, w))


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC adaptive average pool (torch F.adaptive_avg_pool2d parity)."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    return _separable_apply(x, _adaptive_avg_matrix(out_h, h), _adaptive_avg_matrix(out_w, w))


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NC global spatial mean."""
    return jnp.mean(x, axis=(1, 2))


def nearest_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC nearest resize (torch F.interpolate mode='nearest' parity:
    src = floor(dst * in/out))."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    rows = np.floor(np.arange(out_h) * (h / out_h)).astype(np.int32)
    cols = np.floor(np.arange(out_w) * (w / out_w)).astype(np.int32)
    x = jnp.take(x, jnp.asarray(rows), axis=1)
    x = jnp.take(x, jnp.asarray(cols), axis=2)
    return x


def max_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """NHWC max pool with explicit symmetric padding (torch nn.MaxPool2d)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
