"""Shared flax building blocks: convs with torch-compatible initialisation,
normalisation layers with exact torch semantics, and the SFConv
(spatial-frequency convolution) that is this framework's signature custom op.

Layout is NHWC throughout (TPU-native); channel axis is last.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from unidefense_tpu.ops.fft import irfft2_packed, spectrum_channels
from unidefense_tpu.ops.resize import adaptive_avg_pool
from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

# SFConv frequency-branch evaluation: 'spatial' uses the exact FFT-free
# closed form (ops/sfconv_spatial.py); 'spectral' keeps the literal
# rfft2 -> 1x1 -> irfft2 pipeline. Both are numerically equivalent.
_SFCONV_MODE = os.environ.get("UD_SFCONV_MODE", "spatial")

# torch Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).
torch_default_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
# reference ResNet init_weights: kaiming_normal(fan_out, relu) (model/resnet/exp.py:455-459)
kaiming_out_init = jax.nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def he_normal_out() -> Callable:
    return jax.nn.initializers.variance_scaling(2.0, "fan_out", "normal")


Padding = Union[str, int, Sequence[tuple[int, int]]]


def _pad_arg(padding: Padding):
    if isinstance(padding, int):
        return [(padding, padding), (padding, padding)]
    return padding


class Conv(nn.Module):
    """Thin wrapper over nn.Conv with torch-style defaults.

    padding: 'SAME' (XLA semantics == TF static SAME == the reference's
    Conv2dStaticSamePadding, model/efficientnet/utils.py:250-278), or an int
    for torch symmetric padding.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: Padding = 0
    groups: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_default_init
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=_pad_arg(self.padding),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm with exact torch semantics.

    * training: normalise with biased batch statistics, update running_var
      with the *unbiased* estimate (torch BatchNorm2d behaviour).
    * momentum is the torch convention: new = (1-m)*old + m*batch.
    * optional `axis_name` syncs batch statistics across a mesh axis inside
      shard_map/pmap — the TPU-native replacement for
      SyncBatchNorm.convert_sync_batchnorm (engine/forgery_engine.py:142).
    * `frozen_bias` omits beta (the bottleneck BN freezes bias at zero,
      model/unidefense.py:104-107).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    use_running_average: Optional[bool] = None
    frozen_bias: bool = False
    scale_init: Callable = jax.nn.initializers.ones
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feat = x.shape[-1]
        reduce_axes = tuple(range(x.ndim - 1))

        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(feat, jnp.float32))
        scale = self.param("scale", self.scale_init, (feat,), jnp.float32)
        if self.frozen_bias:
            bias = jnp.zeros(feat, jnp.float32)
        else:
            bias = self.param("bias", jax.nn.initializers.zeros, (feat,), jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            n = 1
            for ax in reduce_axes:
                n *= x.shape[ax]
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(xf * xf, axis=reduce_axes)
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n *= jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - mean * mean, 0.0)
            if not self.is_initializing():
                n = jnp.asarray(n, jnp.float32)
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class InstanceNorm(nn.Module):
    """nn.InstanceNorm2d(affine=True) parity: per-sample, per-channel spatial
    normalisation with no running stats (decoder norm, model/unidefense.py:54)."""

    epsilon: float = 1e-5
    affine: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.var(xf, axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            scale = self.param("scale", jax.nn.initializers.ones, (feat,), jnp.float32)
            bias = self.param("bias", jax.nn.initializers.zeros, (feat,), jnp.float32)
            y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class Classifier(nn.Module):
    """Linear head with N(0, 0.01) weights, zero bias (model/modules.py:24-32)."""

    num_classes: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.num_classes,
            kernel_init=jax.nn.initializers.normal(0.01),
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class _FreqKernel(nn.Module):
    """Bare (1, 1, 2C_in, 2C_out) parameter holder so both SFConv evaluation
    modes share the exact param path/shape of the original 1x1 nn.Conv
    ('freq_conv/kernel')."""

    in2: int
    out2: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", torch_default_init, (1, 1, self.in2, self.out2), jnp.float32
        )


class SFConv(nn.Module):
    """Spatial-Frequency convolution.

    Blend of a spatial KxK conv and a frequency branch (rfft2 -> dense 1x1 on
    the (real ‖ imag) channel stack -> irfft2, average-pooled to the spatial
    branch resolution when strided), gated by sigmoid(sf_coef) with sf_coef
    initialised to -10 so training starts ≈ pure-spatial.

    Parity targets: model/resnet/exp.py:21-54 (int padding variant) and
    model/efficientnet/exp.py:7-65 (TF-SAME variant; padding='SAME' here).
    The frequency 1x1 conv is dense over 2C channels even when the spatial
    conv is grouped/depthwise — that is a trailing-axis matmul, ideal for the
    MXU.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: Padding = 0
    groups: int = 1
    use_bias: bool = False
    freq_norm: Optional[str] = "ortho"
    kernel_init: Callable = torch_default_init
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        in_feat = x.shape[-1]
        spat = Conv(
            self.features,
            self.kernel_size,
            self.stride,
            self.padding,
            groups=self.groups,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)

        # the 1x1 frequency-domain channel mix; same param path/shape as the
        # nn.Conv it replaces so checkpoints are interchangeable
        freq_kernel = _FreqKernel(2 * in_feat, 2 * self.features, name="freq_conv")()
        if _SFCONV_MODE == "spatial":
            # exact FFT-free closed form (see ops/sfconv_spatial.py); on TPU
            # at width >= 32 the fused single-pass Pallas kernel wins
            # (ops/sfconv_pallas.py, measured in PROGRESS.md)
            xc = x.astype(self.dtype or x.dtype)
            from unidefense_tpu.ops.sfconv_pallas import (
                pallas_eligible, sfconv_freq_pallas, v4_widths,
                sfconv_freq_pallas_v4,
            )

            if pallas_eligible(xc.shape):
                freq = sfconv_freq_pallas(xc, freq_kernel[0, 0]).astype(jnp.float32)
            elif xc.shape[2] in v4_widths() and xc.shape[1] == xc.shape[2]:
                # experimental small-W row-tiled kernel, A/B-gated via
                # UD_SFCONV_V4="48,24" (default off — see the negative-result
                # table in ops/sfconv_pallas.py)
                freq = sfconv_freq_pallas_v4(xc, freq_kernel[0, 0]).astype(jnp.float32)
            else:
                freq = sfconv_freq_spatial(
                    xc, freq_kernel[0, 0].astype(self.dtype or x.dtype)
                ).astype(jnp.float32)
        else:
            spec = spectrum_channels(x, norm=self.freq_norm)  # (N, H, Wf, 2C)
            spec = spec.astype(self.dtype or x.dtype) @ freq_kernel[0, 0].astype(
                self.dtype or x.dtype
            )
            freq = irfft2_packed(spec, s=(h, w), norm=self.freq_norm)
        if freq.shape[1:3] != spat.shape[1:3]:
            freq = adaptive_avg_pool(freq, spat.shape[1], spat.shape[2])
        freq = freq.astype(spat.dtype)

        sf_coef = self.param("sf_coef", lambda key: jnp.asarray(-10.0, jnp.float32))
        coef = jax.nn.sigmoid(sf_coef).astype(spat.dtype)
        return (1.0 - coef) * spat + coef * freq


class ConvTranspose(nn.Module):
    """Transposed convolution with exact torch ConvTranspose2d semantics:
    lhs-dilate by `stride`, pad low = k-1-p, pad high = k-1-p+output_padding,
    VALID conv with the spatially-flipped kernel. Kernel is stored
    (kh, kw, in, out); the torch->flax converter flips spatial axes of the
    torch (in, out, kh, kw) weight. The decoder stacks use k=3, s=2, p=1,
    op=1 (= exact 2x upsampling, model/unidefense.py:63-64)."""

    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = False
    kernel_init: Callable = torch_default_init
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, in_feat, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        lo = k - 1 - self.padding
        hi = k - 1 - self.padding + self.output_padding
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel[::-1, ::-1].astype(dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param("bias", jax.nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class CDConv(nn.Module):
    """Central-difference convolution (Conv2d_cd, model/resnet/exp.py:57-76):
    out = conv(x, W) - theta * conv(x, sum_kk(W) as 1x1). Defined for API
    parity; unused by the shipped models, like the reference."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Padding = 0
    theta: float = 0.7
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel", torch_default_init, (k, k, in_feat, self.features), jnp.float32
        )
        bias = (
            self.param("bias", jax.nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        dtype = self.dtype or x.dtype
        xk = x.astype(dtype)
        strides = (self.stride, self.stride)

        def conv(inp, w, padding):
            dn = jax.lax.conv_dimension_numbers(inp.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                inp, w.astype(dtype), strides, padding, dimension_numbers=dn
            )

        out_normal = conv(xk, kernel, _pad_arg(self.padding))
        if bias is not None:
            out_normal = out_normal + bias.astype(dtype)
        if abs(self.theta) < 1e-8:
            return out_normal
        # 1x1 kernel of per-(in,out) kernel sums; torch adds the bias to both
        # conv outputs (model/resnet/exp.py:74-76)
        kernel_diff = jnp.sum(kernel, axis=(0, 1), keepdims=True)
        out_diff = conv(xk, kernel_diff, "VALID")
        if bias is not None:
            out_diff = out_diff + bias.astype(dtype)
        return out_normal - self.theta * out_diff


def conv_or_sfconv(use_sf: bool, **kwargs):
    """SFConv substitution helper mirroring the reference's channel-match gate
    (model/resnet/exp.py:95-98,167-191)."""
    if use_sf:
        return SFConv(**kwargs)
    kwargs.pop("freq_norm", None)
    return Conv(**kwargs)
