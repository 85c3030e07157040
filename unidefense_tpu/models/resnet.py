"""ResNet-18/50 backbones with SFConv substitution, plus the UniDefense
extractor / embedder wrappers.

Re-designed from the reference's timm-style ResNet (model/resnet/exp.py) and
module_exp.py wrappers. Substitution rule parity: SFConv replaces a conv only
in stages 2-4 (stage_idx > 0, model/resnet/exp.py:303) and only where the
conv's in/out channel counts match (exp.py:95-98 BasicBlock, :167-191
Bottleneck). NHWC layout.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unidefense_tpu.models.layers import (
    BatchNorm,
    Classifier,
    Conv,
    SFConv,
    conv_or_sfconv,
    kaiming_out_init,
)
from unidefense_tpu.ops.resize import adaptive_avg_pool, global_avg_pool, max_pool


class BasicBlock(nn.Module):
    """ResNet basic block (model/resnet/exp.py:79-149). expansion = 1."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    freq_norm: Optional[str] = None  # None -> plain convs
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        inplanes = x.shape[-1]
        shortcut = x

        use_sf1 = self.freq_norm is not None and inplanes == self.planes
        y = conv_or_sfconv(
            use_sf1,
            features=self.planes,
            kernel_size=3,
            stride=self.stride,
            padding=1,
            use_bias=False,
            freq_norm=self.freq_norm,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")(
            y, use_running_average=not train
        )
        y = nn.relu(y)

        use_sf2 = self.freq_norm is not None  # planes == planes always
        y = conv_or_sfconv(
            use_sf2,
            features=self.planes,
            kernel_size=3,
            stride=1,
            padding=1,
            use_bias=False,
            freq_norm=self.freq_norm,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            name="conv2",
        )(y)
        # zero_init_last: bn2 scale starts at 0 (model/resnet/exp.py:123-124)
        y = BatchNorm(
            scale_init=jax.nn.initializers.zeros,
            axis_name=self.axis_name, dtype=self.dtype, name="bn2",
        )(y, use_running_average=not train)

        if self.has_downsample:
            shortcut = Conv(
                self.planes,
                1,
                self.stride,
                0,
                use_bias=False,
                kernel_init=kaiming_out_init,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            shortcut = BatchNorm(
                axis_name=self.axis_name, dtype=self.dtype, name="downsample_bn"
            )(shortcut, use_running_average=not train)

        return nn.relu(y + shortcut)


class Bottleneck(nn.Module):
    """ResNet bottleneck block (model/resnet/exp.py:152-232). expansion = 4."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    freq_norm: Optional[str] = None
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool):
        inplanes = x.shape[-1]
        width = self.planes
        outplanes = self.planes * self.expansion
        shortcut = x

        y = conv_or_sfconv(
            self.freq_norm is not None and inplanes == width,
            features=width,
            kernel_size=1,
            stride=1,
            padding=0,
            use_bias=False,
            freq_norm=self.freq_norm,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")(
            y, use_running_average=not train
        )
        y = nn.relu(y)

        y = conv_or_sfconv(
            self.freq_norm is not None,  # width == width
            features=width,
            kernel_size=3,
            stride=self.stride,
            padding=1,
            use_bias=False,
            freq_norm=self.freq_norm,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            name="conv2",
        )(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn2")(
            y, use_running_average=not train
        )
        y = nn.relu(y)

        y = conv_or_sfconv(
            self.freq_norm is not None and width == outplanes,
            features=outplanes,
            kernel_size=1,
            stride=1,
            padding=0,
            use_bias=False,
            freq_norm=self.freq_norm,
            kernel_init=kaiming_out_init,
            dtype=self.dtype,
            name="conv3",
        )(y)
        # zero_init_last (model/resnet/exp.py:202-203)
        y = BatchNorm(
            scale_init=jax.nn.initializers.zeros,
            axis_name=self.axis_name, dtype=self.dtype, name="bn3",
        )(y, use_running_average=not train)

        if self.has_downsample:
            shortcut = Conv(
                outplanes,
                1,
                self.stride,
                0,
                use_bias=False,
                kernel_init=kaiming_out_init,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            shortcut = BatchNorm(
                axis_name=self.axis_name, dtype=self.dtype, name="downsample_bn"
            )(shortcut, use_running_average=not train)

        return nn.relu(y + shortcut)


_ARCH = {
    "resnet18": (BasicBlock, [2, 2, 2, 2], 1),
    "resnet50": (Bottleneck, [3, 4, 6, 3], 4),
}
_CHANNELS = [64, 128, 256, 512]


class ResNetStage(nn.Module):
    """One residual stage (layer1..layer4)."""

    block_cls: type
    planes: int
    num_blocks: int
    stride: int
    freq_norm: Optional[str]
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        expansion = getattr(self.block_cls, "expansion", 1)
        block_cls = (
            nn.remat(self.block_cls, static_argnums=(2,)) if self.remat else self.block_cls
        )
        for i in range(self.num_blocks):
            stride = self.stride if i == 0 else 1
            has_down = i == 0 and (stride != 1 or x.shape[-1] != self.planes * expansion)
            x = block_cls(
                planes=self.planes,
                stride=stride,
                has_downsample=has_down,
                freq_norm=self.freq_norm,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, train)
        return x


class ResNet(nn.Module):
    """Full ResNet with SFConv substitution and a classification head
    (custom_resnet18/50 parity, model/resnet/exp.py:523-550)."""

    arch: str = "resnet18"
    num_classes: int = 1000
    freq_norm: Optional[str] = None
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        block_cls, layers, _ = _ARCH[self.arch]
        self.conv1 = Conv(
            64, 7, 2, 3, use_bias=False, kernel_init=kaiming_out_init, dtype=self.dtype,
            name="conv1",
        )
        self.bn1 = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")
        self.stages = [
            ResNetStage(
                block_cls=block_cls,
                planes=_CHANNELS[i],
                num_blocks=layers[i],
                stride=1 if i == 0 else 2,
                freq_norm=self.freq_norm if i > 0 else None,  # stages 2-4 only
                remat=self.remat,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"layer{i + 1}",
            )
            for i in range(4)
        ]
        self.fc = Classifier(self.num_classes, dtype=self.dtype)

    def stem(self, x, train: bool):
        x = self.conv1(x)
        x = self.bn1(x, use_running_average=not train)
        return nn.relu(x)

    def __call__(self, x, train: bool = False):
        x = self.stem(x, train)
        x = max_pool(x, 3, 2, 1)
        for stage in self.stages:
            x = stage(x, train)
        x = global_avg_pool(x)
        return {"cls_out": self.fc(x)}


class ExtractorRes18(nn.Module):
    """Stem (NO maxpool) + layer1-3; returns layer3 plus a multi-scale concat
    of layers 1-3 pooled to layer3's resolution (module_exp.py:8-32).
    Output channels: 64 + 128 + 256 = 448."""

    freq_norm: Optional[str] = "ortho"
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        net = ResNet(
            arch="resnet18",
            freq_norm=self.freq_norm,
            remat=self.remat,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="net",
        )
        x = net.stem(x, train)
        p1 = net.stages[0](x, train)
        p2 = net.stages[1](p1, train)
        p3 = net.stages[2](p2, train)
        h, w = p3.shape[1], p3.shape[2]
        ds1 = adaptive_avg_pool(p1, h, w)
        ds2 = adaptive_avg_pool(p2, h, w)
        return p3, jnp.concatenate([ds1, ds2, p3], axis=-1)


class ExtractorRes50(nn.Module):
    """Stem + maxpool + layer1-3; returns layer3 output (1024 ch)
    (module_exp.py:35-59)."""

    freq_norm: Optional[str] = "ortho"
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        net = ResNet(
            arch="resnet50",
            freq_norm=self.freq_norm,
            remat=self.remat,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="net",
        )
        x = net.stem(x, train)
        x = max_pool(x, 3, 2, 1)
        x = net.stages[0](x, train)
        x = net.stages[1](x, train)
        return net.stages[2](x, train)


class EmbedderRes18Layer1(nn.Module):
    """448 -> 512 stride-2 residual block with an SFConv second conv and a
    conv+BN+maxpool downsample shortcut (module_exp.py:62-88)."""

    use_bias: bool = False
    affine: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(512, 3, 2, 1, use_bias=self.use_bias, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm1")(
            y, use_running_average=not train
        )
        y = nn.relu(y)
        y = SFConv(512, 3, 1, 1, use_bias=self.use_bias, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm2")(
            y, use_running_average=not train
        )
        s = Conv(512, 1, 1, 0, use_bias=self.use_bias, dtype=self.dtype, name="down_conv")(x)
        s = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="down_norm")(
            s, use_running_average=not train
        )
        s = max_pool(s, 3, 2, 1)
        return nn.relu(y + s)


class EmbedderRes18Layer2(nn.Module):
    """512 -> 512 residual block, SFConv first (module_exp.py:91-111)."""

    use_bias: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = SFConv(512, 3, 1, 1, use_bias=self.use_bias, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm1")(
            y, use_running_average=not train
        )
        y = nn.relu(y)
        y = Conv(512, 3, 1, 1, use_bias=self.use_bias, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm2")(
            y, use_running_average=not train
        )
        return nn.relu(y + x)


class EmbedderRes50Layer1(nn.Module):
    """1024 -> 2048 bottleneck-style stride-2 block with SFConv middle conv
    and conv+BN+maxpool shortcut (module_exp.py:114-147)."""

    use_bias: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(512, 1, 1, 0, use_bias=self.use_bias, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm1")(
            y, use_running_average=not train
        )
        y = nn.relu(y)
        y = SFConv(512, 3, 2, 1, use_bias=self.use_bias, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm2")(
            y, use_running_average=not train
        )
        y = nn.relu(y)
        y = Conv(2048, 1, 1, 0, use_bias=self.use_bias, dtype=self.dtype, name="conv3")(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm3")(
            y, use_running_average=not train
        )
        s = Conv(2048, 1, 1, 0, use_bias=self.use_bias, dtype=self.dtype, name="down_conv")(x)
        s = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="down_norm")(
            s, use_running_average=not train
        )
        s = max_pool(s, 3, 2, 1)
        return nn.relu(y + s)


class EmbedderRes50Layer2(nn.Module):
    """2048 -> 2048 bottleneck-style block, SFConv middle (module_exp.py:150-177)."""

    use_bias: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        y = Conv(512, 1, 1, 0, use_bias=self.use_bias, dtype=self.dtype, name="conv1")(x)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm1")(
            y, use_running_average=not train
        )
        y = nn.relu(y)
        y = SFConv(512, 3, 1, 1, use_bias=self.use_bias, dtype=self.dtype, name="conv2")(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm2")(
            y, use_running_average=not train
        )
        y = nn.relu(y)
        y = Conv(2048, 1, 1, 0, use_bias=self.use_bias, dtype=self.dtype, name="conv3")(y)
        y = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="norm3")(
            y, use_running_average=not train
        )
        return nn.relu(y + x)
