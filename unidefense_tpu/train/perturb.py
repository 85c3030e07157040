"""Input-perturbation branch for training pass 2.

Pure-function redesign of the reference's in-model perturbation preamble
(model/unidefense.py:174-200):

    p=0.5  -> style-transfer mixing with a batch-permuted partner
              (real/fake groups permuted separately, optional CORAL color
              preservation, then frequency-amplitude OR sorted-value spatial
              mix chosen uniformly)
    else   -> one of {gaussian noise sigma=1e-4, 5x5 gaussian blur,
              0.75x nearest down-up-scale}

All randomness comes from the explicit `rng`; branching uses lax.cond/switch
so the whole thing lives inside the jitted train step. Both branches are pure
data augmentation (the reference computes them under no_grad / on
parameter-free ops), so the output feeds the backbone while the clean input
remains the reconstruction target.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from unidefense_tpu.ops.coral import coral
from unidefense_tpu.ops.perturb import downscale, gaussian_blur, random_noise
from unidefense_tpu.ops.style import frequency_style_transfer, spatial_style_transfer


def perturb_input(
    rng: jax.Array,
    x: jnp.ndarray,
    sum_real: int,
    sum_fake: int,
    preserve_color: bool = True,
    freq_norm: str = "ortho",
) -> jnp.ndarray:
    """Return the perturbed batch (same shape as x). sum_real/sum_fake are
    static ints; the batch is real-first (engine contract)."""
    k_branch, k_perm_r, k_perm_f, k_style_pick, k_style, k_pix_pick, k_pix = (
        jax.random.split(rng, 7)
    )

    def style_branch(x):
        perm_r = jax.random.permutation(k_perm_r, sum_real)
        perm_f = jax.random.permutation(k_perm_f, sum_fake)
        x_real_s = x[:sum_real][perm_r]
        x_fake_s = x[sum_real:][perm_f]
        x_s = jnp.concatenate([x_real_s, x_fake_s], axis=0)
        if preserve_color:
            x_s = coral(x_s, x)
        x_s = jax.lax.stop_gradient(x_s)
        return jax.lax.cond(
            jax.random.randint(k_style_pick, (), 0, 2) == 0,
            lambda: frequency_style_transfer(k_style, x, x_s, norm=freq_norm),
            lambda: spatial_style_transfer(k_style, x, x_s),
        )

    def pixel_branch(x):
        idx = jax.random.randint(k_pix_pick, (), 0, 3)
        return jax.lax.switch(
            idx,
            [
                lambda x: random_noise(k_pix, x, std=1e-4),
                lambda x: gaussian_blur(x, 5),
                functools.partial(downscale, bottleneck_scale=0.75),
            ],
            x,
        )

    take_style = jax.random.uniform(k_branch, ()) > 0.5
    return jax.lax.cond(take_style, style_branch, pixel_branch, x)
