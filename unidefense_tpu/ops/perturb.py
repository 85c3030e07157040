"""Pixel-space input perturbations (training pass 2).

JAX equivalents of the reference's random_noise / random_blur / downscale
(model/modules.py:7-21) with explicit PRNG keys.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from unidefense_tpu.ops.resize import nearest_resize


def random_noise(rng: jax.Array, x: jnp.ndarray, mean: float = 0.0, std: float = 1e-4) -> jnp.ndarray:
    """Additive gaussian noise, clipped to [-1, 1] (model/modules.py:7-12;
    the models bind std=1e-4 via pert_noise, model/unidefense.py:17)."""
    noise = mean + std * jax.random.normal(rng, x.shape, dtype=x.dtype)
    return jnp.clip(x + noise, -1.0, 1.0)


@functools.lru_cache(maxsize=None)
def _gaussian_kernel_1d(kernel_size: int) -> np.ndarray:
    """torchvision gaussian_blur default sigma: 0.3*((k-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    half = (kernel_size - 1) / 2
    xs = np.arange(kernel_size, dtype=np.float64) - half
    k = np.exp(-(xs**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, kernel_size: int = 5) -> jnp.ndarray:
    """Separable gaussian blur with reflect padding (torchvision parity;
    reference random_blur, model/modules.py:15-16). NHWC."""
    k = jnp.asarray(_gaussian_kernel_1d(kernel_size), dtype=x.dtype)
    pad = kernel_size // 2
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # Depthwise separable conv via two 1-D convs; feature_group_count=C keeps
    # channels independent (blur acts per channel).
    kh = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(xp.shape, (kernel_size, 1, 1, c), ("NHWC", "HWIO", "NHWC"))
    xp = jax.lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    dn = jax.lax.conv_dimension_numbers(xp.shape, (1, kernel_size, 1, c), ("NHWC", "HWIO", "NHWC"))
    xp = jax.lax.conv_general_dilated(
        xp, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    return xp


def downscale(x: jnp.ndarray, bottleneck_scale: float = 0.75) -> jnp.ndarray:
    """Nearest down-scale then nearest up-scale back (model/modules.py:19-21)."""
    n, h, w, c = x.shape
    dh = int(math.floor(h * bottleneck_scale))
    dw = int(math.floor(w * bottleneck_scale))
    down = nearest_resize(x, dh, dw)
    return nearest_resize(down, h, w)
