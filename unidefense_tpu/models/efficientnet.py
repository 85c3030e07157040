"""EfficientNet (b0-b8) with SFConv depthwise substitution, NHWC / flax.

Re-designed from the reference's vendored lukemelas implementation
(model/efficientnet/{model,utils}.py). Key parity points:

* compound scaling table (utils.py:461-483) + round_filters/round_repeats
  (utils.py:85-128) reproduce the exact per-block channel/repeat counts;
* TF 'SAME' padding: XLA's 'SAME' conv padding computes the identical
  pad_total = max((ceil(i/s)-1)*s + k - i, 0) split low/high as the
  reference's Conv2dStaticSamePadding (utils.py:250-278), so no custom
  padding module is needed on TPU;
* SFConv replaces the depthwise conv in every block-args group except the
  first two and the last (model.py:201-214);
* drop-connect (stochastic depth) with the linear idx/num_blocks scaling is
  applied by the caller passing the per-block rate (model.py:275-277);
* BatchNorm momentum 0.01 (torch convention), eps 1e-3 (utils.py:524-525).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unidefense_tpu.models.layers import BatchNorm, Classifier, Conv, SFConv
from unidefense_tpu.ops.resize import global_avg_pool

# width, depth, resolution, dropout — utils.py:461-483
PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
    "efficientnet-b5": (1.6, 2.2, 456, 0.4),
    "efficientnet-b6": (1.8, 2.6, 528, 0.5),
    "efficientnet-b7": (2.0, 3.1, 600, 0.5),
    "efficientnet-b8": (2.2, 3.6, 672, 0.5),
    "efficientnet-l2": (4.3, 5.3, 800, 0.5),
}

# b0 block-args groups: (num_repeat, kernel, stride, expand, in, out, se_ratio)
# utils.py:507-515
B0_BLOCKS = [
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
]

VALID_MODELS = tuple(PARAMS)  # model/efficientnet/model.py:26-33

BN_MOMENTUM = 0.01  # torch convention: 1 - 0.99 (utils.py:524)
BN_EPS = 1e-3


def get_image_size(model_name: str) -> int:
    """Native input resolution for a variant (model.py:401-413)."""
    return PARAMS[model_name][2]


def round_filters(filters: int, width_coefficient: float, divisor: int = 8) -> int:
    """utils.py:85-110."""
    if not width_coefficient:
        return filters
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    """utils.py:113-128."""
    if not depth_coefficient:
        return repeats
    return int(math.ceil(depth_coefficient * repeats))


@dataclass(frozen=True)
class BlockSpec:
    kernel_size: int
    stride: int
    expand_ratio: int
    input_filters: int
    output_filters: int
    se_ratio: float
    id_skip: bool
    freq_norm: Optional[str]


def build_block_specs(model_name: str, freq_norm: Optional[str]) -> list[BlockSpec]:
    """Expand the scaled per-block spec list. Matches the construction loop in
    model.py:190-215 including the freq_norm gating (groups 0, 1, last get
    plain depthwise convs)."""
    w, d, _, _ = PARAMS[model_name]
    specs = []
    num_groups = len(B0_BLOCKS)
    for group_id, (r, k, s, e, i, o, se) in enumerate(B0_BLOCKS):
        fin = round_filters(i, w)
        fout = round_filters(o, w)
        reps = round_repeats(r, d)
        fn = freq_norm if group_id not in (0, 1, num_groups - 1) else None
        for rep in range(reps):
            specs.append(
                BlockSpec(
                    kernel_size=k,
                    stride=s if rep == 0 else 1,
                    expand_ratio=e,
                    input_filters=fin if rep == 0 else fout,
                    output_filters=fout,
                    se_ratio=se,
                    id_skip=True,
                    freq_norm=fn,
                )
            )
    return specs


def drop_connect(rng: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Stochastic depth with per-sample binary mask (utils.py:131-156)."""
    keep_prob = 1.0 - rate
    mask = jnp.floor(
        keep_prob + jax.random.uniform(rng, (x.shape[0], 1, 1, 1), dtype=x.dtype)
    )
    return x / keep_prob * mask


class MBConvBlock(nn.Module):
    """Mobile inverted residual bottleneck with SE (model.py:36-135)."""

    spec: BlockSpec
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool, drop_connect_rate: float = 0.0):
        spec = self.spec
        inputs = x
        oup = spec.input_filters * spec.expand_ratio

        if spec.expand_ratio != 1:
            x = Conv(oup, 1, 1, "SAME", use_bias=False, dtype=self.dtype, name="expand_conv")(x)
            x = BatchNorm(
                momentum=BN_MOMENTUM, epsilon=BN_EPS, axis_name=self.axis_name,
                dtype=self.dtype, name="bn0",
            )(x, use_running_average=not train)
            x = nn.silu(x)

        dw_kwargs = dict(
            features=oup,
            kernel_size=spec.kernel_size,
            stride=spec.stride,
            padding="SAME",
            groups=oup,
            use_bias=False,
            dtype=self.dtype,
            name="depthwise_conv",
        )
        if spec.freq_norm is not None:
            x = SFConv(freq_norm=spec.freq_norm, **dw_kwargs)(x)
        else:
            x = Conv(**dw_kwargs)(x)
        x = BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, axis_name=self.axis_name,
            dtype=self.dtype, name="bn1",
        )(x, use_running_average=not train)
        x = nn.silu(x)

        if spec.se_ratio and 0 < spec.se_ratio <= 1:
            squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)
            num_sq = max(1, int(spec.input_filters * spec.se_ratio))
            squeezed = Conv(num_sq, 1, 1, "SAME", use_bias=True, dtype=self.dtype, name="se_reduce")(squeezed)
            squeezed = nn.silu(squeezed)
            squeezed = Conv(oup, 1, 1, "SAME", use_bias=True, dtype=self.dtype, name="se_expand")(squeezed)
            x = jax.nn.sigmoid(squeezed) * x

        x = Conv(
            spec.output_filters, 1, 1, "SAME", use_bias=False, dtype=self.dtype,
            name="project_conv",
        )(x)
        x = BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, axis_name=self.axis_name,
            dtype=self.dtype, name="bn2",
        )(x, use_running_average=not train)

        if spec.id_skip and spec.stride == 1 and spec.input_filters == spec.output_filters:
            if train and drop_connect_rate:
                x = drop_connect(self.make_rng("dropout"), x, drop_connect_rate)
            x = x + inputs
        return x


class EfficientNet(nn.Module):
    """EfficientNet backbone exposing per-block access so wrappers can run
    delimiter-bounded block ranges (model/unidefense.py:159-172)."""

    model_name: str = "efficientnet-b4"
    num_classes: int = 2
    dropout_rate: Optional[float] = None  # None -> table default
    drop_connect_rate: float = 0.2
    freq_norm: Optional[str] = "ortho"
    include_top: bool = False
    remat: bool = False  # rematerialize each block (memory <-> FLOPs)
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        w, d, res, table_dropout = PARAMS[self.model_name]
        self.specs = build_block_specs(self.model_name, self.freq_norm)
        self.stem_filters = round_filters(32, w)
        self.head_filters = round_filters(1280, w)
        self._dropout_rate = self.dropout_rate if self.dropout_rate is not None else table_dropout

        self.conv_stem = Conv(
            self.stem_filters, 3, 2, "SAME", use_bias=False, dtype=self.dtype, name="conv_stem"
        )
        self.bn0 = BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, axis_name=self.axis_name,
            dtype=self.dtype, name="bn0",
        )
        block_cls = (
            nn.remat(MBConvBlock, static_argnums=(2, 3)) if self.remat else MBConvBlock
        )
        self.blocks = [
            block_cls(spec=s, axis_name=self.axis_name, dtype=self.dtype, name=f"block{i}")
            for i, s in enumerate(self.specs)
        ]
        self.conv_head = Conv(
            self.head_filters, 1, 1, "SAME", use_bias=False, dtype=self.dtype, name="conv_head"
        )
        self.bn1 = BatchNorm(
            momentum=BN_MOMENTUM, epsilon=BN_EPS, axis_name=self.axis_name,
            dtype=self.dtype, name="bn1",
        )
        if self.include_top:
            self.top_dropout = nn.Dropout(self._dropout_rate)
            self.fc = Classifier(self.num_classes, dtype=self.dtype)

    @property
    def num_blocks(self) -> int:
        return len(self.specs)

    def stem_forward(self, x, train: bool):
        x = self.conv_stem(x)
        x = self.bn0(x, use_running_average=not train)
        return nn.silu(x)

    def block_range_forward(self, x, start: int, end: int, train: bool):
        """Run blocks [start, end) with linearly-scaled drop-connect
        (model/unidefense.py:159-172)."""
        for idx in range(start, end):
            rate = self.drop_connect_rate
            if rate:
                rate *= float(idx) / len(self.blocks)
            x = self.blocks[idx](x, train, rate)  # positional: remat static args
        return x

    def head_forward(self, x, train: bool):
        x = self.conv_head(x)
        x = self.bn1(x, use_running_average=not train)
        return nn.silu(x)

    def extract_features(self, x, train: bool = False):
        """Stem -> all blocks -> head conv (model.py:295-318)."""
        x = self.stem_forward(x, train)
        x = self.block_range_forward(x, 0, len(self.blocks), train)
        return self.head_forward(x, train)

    def extract_endpoints(self, x, train: bool = False):
        """Per-reduction-level intermediate features (model.py:243-293)."""
        endpoints = {}
        x = self.stem_forward(x, train)
        prev = x
        for idx in range(len(self.blocks)):
            x = self.block_range_forward(x, idx, idx + 1, train)
            if prev.shape[1] > x.shape[1]:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            elif idx == len(self.blocks) - 1:
                endpoints[f"reduction_{len(endpoints) + 1}"] = x
            prev = x
        x = self.head_forward(x, train)
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints

    def __call__(self, x, train: bool = False):
        x = self.extract_features(x, train)
        x = global_avg_pool(x)
        if self.include_top:
            x = self.top_dropout(x, deterministic=not train)
            x = self.fc(x)
        return x
