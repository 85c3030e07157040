"""Dynamic filters and the dual-space attention fusion.

Parity targets:
* FrequencyDynamicFilter / SpatialDynamicFilter — model/modules.py:79-134
* the shared `attention` pattern — model/unidefense.py:125-157 (and the two
  near-identical copies at :329-361, :522-554), collapsed here into a single
  reusable module.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unidefense_tpu.models.layers import BatchNorm, Conv
from unidefense_tpu.ops.fft import irfft2_packed, spectrum_channels
from unidefense_tpu.ops.resize import bilinear_resize


class DynamicFilter(nn.Module):
    """Shared body of the two dynamic filters.

    layer1: conv(depth_mult*C -> depth_mult*C, k) + norm + activation on x.
    mask head: 1x1 conv + sigmoid over [mean(proj), max(proj), diff] channels.
    Returns (mask, mask * x).
    """

    kernel_size: int  # 1 for frequency variant, 3 for spatial variant
    activation: Callable = nn.relu
    use_bias: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, diff, train: bool):
        depth = x.shape[-1]
        proj = Conv(
            depth,
            self.kernel_size,
            1,
            self.kernel_size // 2,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="proj",
        )(x)
        proj = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="proj_norm")(
            proj, use_running_average=not train
        )
        proj = self.activation(proj)

        pre_mask = jnp.concatenate(
            [
                jnp.mean(proj, axis=-1, keepdims=True),
                jnp.max(proj, axis=-1, keepdims=True),
                diff.astype(proj.dtype),
            ],
            axis=-1,
        )
        mask = Conv(1, 1, 1, 0, use_bias=self.use_bias, dtype=self.dtype, name="mask_conv")(
            pre_mask
        )
        mask = jax.nn.sigmoid(mask)
        return mask, mask * x


class DualSpaceAttention(nn.Module):
    """Re-weight a mid-level embedding by frequency- and spatial-domain masks
    conditioned on the reconstruction error, then fuse.

    Inputs: pred (detached recon, N h w 3), x (input image), embedding
    (N H W C). swish_act selects the activation family (EfficientNet variant
    uses swish, ResNet variants use relu).
    """

    activation: Callable = nn.relu
    use_bias: bool = False
    drop_rate: float = 0.2
    freq_norm: str = "ortho"
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, pred, x, embedding, train: bool):
        eh, ew = embedding.shape[1], embedding.shape[2]
        pred = bilinear_resize(pred, eh, ew)
        x = bilinear_resize(x, eh, ew)

        # frequency attention
        pred_freq = spectrum_channels(pred, norm=self.freq_norm)
        x_freq = spectrum_channels(x, norm=self.freq_norm)
        freq_diff = jnp.abs(pred_freq - x_freq)  # (N, h, wf, 6)
        emb_freq = spectrum_channels(embedding, norm=self.freq_norm).astype(
            self.dtype or embedding.dtype
        )

        freq_mask, freq_filtered = DynamicFilter(
            kernel_size=1,
            activation=self.activation,
            use_bias=self.use_bias,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="freq_filter",
        )(emb_freq, freq_diff, train)
        freq_filtered = irfft2_packed(
            freq_filtered, s=(eh, ew), norm=self.freq_norm
        ).astype(embedding.dtype)

        # spatial attention
        spat_diff = jnp.abs(pred - x)
        spat_mask, spat_filtered = DynamicFilter(
            kernel_size=3,
            activation=self.activation,
            use_bias=self.use_bias,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="spat_filter",
        )(embedding, spat_diff, train)

        fuse_coef = self.param("fuse_coef", lambda key: jnp.asarray(0.0, jnp.float32))
        coef = jax.nn.sigmoid(fuse_coef).astype(embedding.dtype)
        out = (1.0 - coef) * spat_filtered + coef * freq_filtered
        out = out + nn.Dropout(self.drop_rate, deterministic=not train)(embedding)
        return {"out": out, "freq_mask": freq_mask, "spat_mask": spat_mask}
