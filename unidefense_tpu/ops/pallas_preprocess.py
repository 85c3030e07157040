"""Pallas kernel: fused uint8 -> normalized-float input preprocessing.

The device half of the input pipeline (DevicePipeline: /255, per-channel
mean/std normalize, per-sample horizontal flip) runs once per training batch
on (N, H, W, 3) uint8 frames. As separate XLA HLOs this is a chain of
convert/select/mul/sub ops; this kernel does it in one VMEM pass per sample:
load uint8, flip via a reversed read when the per-sample coin says so,
normalize, and emit the compute dtype directly.

Layout: each image is viewed as (H, W*3) — channels interleaved into the lane
axis — so mean/std are pre-tiled W*3-length rows and normalization is plain
elementwise math. Grid = (N,), one program per sample (a 380x380x3 image is
433 KB u8 in + 866 KB bf16 out — comfortable VMEM residency).

Used by data/transforms.DevicePipeline on plain normalize(+flip) pipelines;
jnp fallback otherwise. The CPU test suite runs it with interpret=True.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, mean_ref, inv_std_ref, o_ref):
    """x (1, H, W*3) uint8; mean/inv_std (1, W*3). The per-sample horizontal
    flip stays outside (Mosaic has no `rev` lowering); flip and normalization
    commute since the mean/std rows are channel-periodic."""
    # Mosaic has no direct u8->f32 cast; widen through int32 first
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    o_ref[0] = ((x - mean_ref[0]) * inv_std_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _normalize(batch_u8_2d, mean_row, inv_std_row, out_dtype=jnp.float32,
               interpret=False):
    n, h, wc = batch_u8_2d.shape
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, wc), out_dtype),
        interpret=interpret,
    )(batch_u8_2d, mean_row, inv_std_row)


def normalize_flip(
    batch_u8: jnp.ndarray,
    rng,
    mean=(0.5, 0.5, 0.5),
    std=(0.5, 0.5, 0.5),
    hflip_p: float = 0.0,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused (u8/255 - mean)/std with optional per-sample horizontal flip.
    batch_u8: (N, H, W, 3) uint8 -> (N, H, W, 3) out_dtype."""
    n, h, w, c = batch_u8.shape
    mean_row = jnp.tile(jnp.asarray(mean, jnp.float32), w)[None, :]
    inv_std_row = jnp.tile(1.0 / jnp.asarray(std, jnp.float32), w)[None, :]
    out = _normalize(
        batch_u8.reshape(n, h, w * c), mean_row, inv_std_row,
        out_dtype=out_dtype, interpret=interpret,
    ).reshape(n, h, w, c)
    if hflip_p > 0 and rng is not None:
        flips = jax.random.uniform(rng, (n, 1, 1, 1)) < hflip_p
        out = jnp.where(flips, out[:, :, ::-1, :], out)
    return out
