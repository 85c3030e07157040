"""The UniDefense dual-space reconstruction models (UDEB4 / UDR18 / UDR50).

Topology parity with model/unidefense.py: encoder backbone -> spatial decoder
(reconstruct the input) -> dual-space (FFT + spatial) attention re-weighting
of a mid-level embedding -> remaining backbone -> frozen-bias BN bottleneck ->
linear classifier. Reconstruction losses (pixel + rFFT space) are computed
inside the forward pass and returned per-sample in `loss_dict`.

TPU-first deltas from the reference:
* NHWC layout, bf16-capable compute with fp32 params;
* input perturbation (training pass 2) is a *pure function of an explicit
  PRNG key* computed outside the model (see unidefense_tpu.train.perturb) —
  the model takes the already-perturbed `noise_x` alongside the clean `x`,
  which keeps the whole two-pass step jittable;
* the three near-identical attention copies collapse into one
  DualSpaceAttention module.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from unidefense_tpu.models.efficientnet import EfficientNet
from unidefense_tpu.models.filters import DualSpaceAttention
from unidefense_tpu.models.layers import (
    BatchNorm,
    Classifier,
    Conv,
    ConvTranspose,
    InstanceNorm,
)
from unidefense_tpu.models.resnet import (
    EmbedderRes18Layer1,
    EmbedderRes18Layer2,
    EmbedderRes50Layer1,
    EmbedderRes50Layer2,
    ExtractorRes18,
    ExtractorRes50,
)
from unidefense_tpu.ops.fft import spectrum_channels
from unidefense_tpu.ops.resize import bilinear_resize, global_avg_pool

# EfficientNet-b4 block delimiters (model/unidefense.py:22-24)
DELIMITER_DICT = {"efficientnet-b4": [2, 6, 10, 16, 22, 30, 32]}


class DecoderBlock(nn.Module):
    """conv3x3 -> IN -> act -> convT(x2) -> IN -> act -> conv3x3 -> IN -> act
    [-> conv3x3 -> tanh if final]. Matches the reference decoder stacks
    (model/unidefense.py:59-102, :284-308, :464-500)."""

    features: int
    out_features: Optional[int] = None  # third conv's features (default = features)
    final: bool = False  # append the 3-channel tanh head
    use_swish: bool = False
    use_bias: bool = False
    affine: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        act = nn.silu if self.use_swish else nn.relu
        f = self.features
        x = Conv(f, 3, 1, 1, use_bias=self.use_bias, dtype=self.dtype, name="conv1")(x)
        x = InstanceNorm(affine=self.affine, dtype=self.dtype, name="in1")(x)
        x = act(x)
        x = ConvTranspose(
            f, 3, 2, 1, 1, use_bias=self.use_bias, dtype=self.dtype, name="deconv"
        )(x)
        x = InstanceNorm(affine=self.affine, dtype=self.dtype, name="in2")(x)
        x = act(x)
        x = Conv(
            self.out_features or f, 3, 1, 1, use_bias=self.use_bias, dtype=self.dtype,
            name="conv2",
        )(x)
        x = InstanceNorm(affine=self.affine, dtype=self.dtype, name="in3")(x)
        x = act(x)
        if self.final:
            x = Conv(3, 3, 1, 1, use_bias=self.use_bias, dtype=self.dtype, name="conv_out")(x)
            x = jnp.tanh(x)
        return x


def _recon_losses(rec, x, freq_norm: str):
    """Per-sample L1 reconstruction error in pixel and rFFT space
    (model/unidefense.py:244-253). rec is resized to x's resolution first."""
    rec = bilinear_resize(rec, x.shape[1], x.shape[2])
    spatial = jnp.mean(jnp.abs(rec.astype(jnp.float32) - x.astype(jnp.float32)), axis=(1, 2, 3))
    rec_freq = spectrum_channels(rec, norm=freq_norm)
    x_freq = spectrum_channels(x, norm=freq_norm)
    diff = jnp.abs(rec_freq - x_freq)  # (N, H, Wf, 6)
    c = diff.shape[-1] // 2
    freq = jnp.mean(diff[..., :c] + diff[..., c:], axis=(1, 2, 3))
    return rec, spatial, freq


class UniDefenseModelEb4(nn.Module):
    """UniDefense with EfficientNet-b4 (model/unidefense.py:28-256).

    Forward contract: __call__(x, noise_x=None, train=False) where noise_x is
    the (optionally perturbed) backbone input; recon/attention targets are
    always the clean x. Returns {'cls_out', 'rec', 'loss_dict'} with
    loss_dict = {factorization, triplet (list), freq_mask, spat_mask,
    spatial, freq}.
    """

    extractor: str = "efficientnet-b4"
    num_classes: int = 2
    drop_rate: float = 0.2
    # stochastic-depth rate (reference default 0.2 via GlobalParams) and the
    # hardcoded decoder-input dropout (model/unidefense.py:213 F.dropout 0.2).
    # Exposed so parity experiments can zero ALL stochasticity on both sides
    # (tools/parity_curves.py --deterministic); training defaults unchanged.
    drop_connect_rate: float = 0.2
    feat_drop_rate: float = 0.2
    use_bias: bool = False
    affine: bool = True
    delimiter: Optional[Sequence[int]] = None
    freq_norm: str = "ortho"
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        self.backbone = EfficientNet(
            model_name=self.extractor,
            num_classes=self.num_classes,
            dropout_rate=self.drop_rate,
            drop_connect_rate=self.drop_connect_rate,
            include_top=False,
            freq_norm=self.freq_norm,
            remat=self.remat,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="backbone",
        )
        self._delimiter = list(self.delimiter or DELIMITER_DICT[self.extractor])
        kw = dict(use_bias=self.use_bias, affine=self.affine, use_swish=True, dtype=self.dtype)
        self.dec_block1 = DecoderBlock(features=80, name="dec_block1", **kw)
        self.dec_block2 = DecoderBlock(features=40, name="dec_block2", **kw)
        self.dec_block3 = DecoderBlock(features=20, final=True, name="dec_block3", **kw)
        self.bottleneck = BatchNorm(
            frozen_bias=True, axis_name=self.axis_name, dtype=self.dtype, name="bottleneck"
        )
        self.attention = DualSpaceAttention(
            activation=nn.silu,
            use_bias=self.use_bias,
            drop_rate=self.drop_rate,
            freq_norm=self.freq_norm,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="attention",
        )
        self.classifier = Classifier(self.num_classes, dtype=self.dtype)
        self.dropout = nn.Dropout(self.drop_rate)
        self.feat_dropout = nn.Dropout(self.feat_drop_rate)

    def _block(self, x, block_id: int, train: bool):
        start = self._delimiter[block_id - 1] if block_id > 0 else 0
        end = self._delimiter[block_id]
        return self.backbone.block_range_forward(x, start, end, train)

    def __call__(self, x, noise_x=None, train: bool = False):
        if noise_x is None:
            noise_x = x
        loss_dict = {}

        h = self.backbone.stem_forward(noise_x, train)
        x_b0 = self._block(h, 0, train)      # (N, 190, 190, 24) @380
        x_b1 = self._block(x_b0, 1, train)   # (N, 95, 95, 32)
        x_b2 = self._block(x_b1, 2, train)   # (N, 48, 48, 56)
        x_b3 = self._block(x_b2, 3, train)   # (N, 24, 24, 112)
        x_b4 = self._block(x_b3, 4, train)   # (N, 24, 24, 160)

        dec_in = self.feat_dropout(x_b4, deterministic=not train)
        dec_out1 = self.dec_block1(dec_in)   # (N, 48, 48, 80)
        dec_out2 = self.dec_block2(dec_out1)  # (N, 96, 96, 40)
        dec_out3 = self.dec_block3(dec_out2)  # (N, 192, 192, 3)

        x_b5 = self._block(x_b4, 5, train)   # (N, 12, 12, 272)
        att = self.attention(jax.lax.stop_gradient(dec_out3), x, x_b5, train)
        x_out = self._block(att["out"], 6, train)  # (N, 12, 12, 448)

        x_out = self.backbone.head_forward(x_out, train)  # (N, 12, 12, 1792)
        x_out = global_avg_pool(x_out)
        x_out = self.bottleneck(x_out, use_running_average=not train)

        loss_dict["factorization"] = x_out
        x_out = self.dropout(x_out, deterministic=not train)

        loss_dict["triplet"] = [
            global_avg_pool(x_b4),
            global_avg_pool(dec_out1),
            global_avg_pool(dec_out2),
        ]
        loss_dict["freq_mask"] = att["freq_mask"]
        loss_dict["spat_mask"] = att["spat_mask"]

        cls_out = self.classifier(x_out)

        rec, spatial, freq = _recon_losses(dec_out3, x, self.freq_norm)
        loss_dict["spatial"] = spatial
        loss_dict["freq"] = freq
        return {"cls_out": cls_out, "rec": rec, "loss_dict": loss_dict}


class UniDefenseModelRes18(nn.Module):
    """UniDefense with ResNet-18 multi-scale extractor
    (model/unidefense.py:259-436)."""

    extractor: str = "resnet18"
    mid_depth: int = 448
    num_classes: int = 2
    drop_rate: float = 0.2
    feat_drop_rate: float = 0.2  # hardcoded decoder-input dropout in the reference
    use_bias: bool = False
    affine: bool = True
    freq_norm: str = "ortho"
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        self.extractor_mod = ExtractorRes18(
            freq_norm=self.freq_norm, remat=self.remat,
            axis_name=self.axis_name, dtype=self.dtype,
            name="extractor",
        )
        self.emb_block1 = EmbedderRes18Layer1(
            use_bias=self.use_bias, axis_name=self.axis_name, dtype=self.dtype,
            name="emb_block1",
        )
        self.emb_block2 = EmbedderRes18Layer2(
            use_bias=self.use_bias, axis_name=self.axis_name, dtype=self.dtype,
            name="emb_block2",
        )
        kw = dict(use_bias=self.use_bias, affine=self.affine, use_swish=False, dtype=self.dtype)
        self.dec_block1 = DecoderBlock(features=128, name="dec_block1", **kw)
        self.dec_block2 = DecoderBlock(features=64, out_features=32, final=True, name="dec_block2", **kw)
        self.bottleneck = BatchNorm(
            frozen_bias=True, axis_name=self.axis_name, dtype=self.dtype, name="bottleneck"
        )
        self.attention = DualSpaceAttention(
            activation=nn.relu,
            use_bias=self.use_bias,
            drop_rate=self.drop_rate,
            freq_norm=self.freq_norm,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="attention",
        )
        self.classifier = Classifier(self.num_classes, dtype=self.dtype)
        self.dropout = nn.Dropout(self.drop_rate)
        self.feat_dropout = nn.Dropout(self.feat_drop_rate)

    def __call__(self, x, noise_x=None, train: bool = False):
        if noise_x is None:
            noise_x = x
        loss_dict = {}

        _, ext_feat = self.extractor_mod(noise_x, train)  # (N, 32, 32, 448) @256
        dec_in = self.feat_dropout(ext_feat, deterministic=not train)
        dec_out1 = self.dec_block1(dec_in)     # (N, 64, 64, 128)
        dec_out2 = self.dec_block2(dec_out1)   # (N, 128, 128, 3)

        emb_feat = self.emb_block1(ext_feat, train)  # (N, 16, 16, 512)
        att = self.attention(jax.lax.stop_gradient(dec_out2), x, emb_feat, train)
        emb_feat = self.emb_block2(att["out"], train)
        emb_feat = global_avg_pool(emb_feat)
        emb_feat = self.bottleneck(emb_feat, use_running_average=not train)

        loss_dict["factorization"] = emb_feat
        emb_feat = self.dropout(emb_feat, deterministic=not train)

        loss_dict["triplet"] = [global_avg_pool(ext_feat), global_avg_pool(dec_out1)]
        loss_dict["freq_mask"] = att["freq_mask"]
        loss_dict["spat_mask"] = att["spat_mask"]

        cls_out = self.classifier(emb_feat)

        rec, spatial, freq = _recon_losses(dec_out2, x, self.freq_norm)
        loss_dict["spatial"] = spatial
        loss_dict["freq"] = freq
        return {"cls_out": cls_out, "rec": rec, "loss_dict": loss_dict}


class UniDefenseModelRes50(nn.Module):
    """UniDefense with ResNet-50 extractor (model/unidefense.py:439-631)."""

    extractor: str = "resnet50"
    mid_depth: int = 1024
    num_classes: int = 2
    drop_rate: float = 0.2
    feat_drop_rate: float = 0.2  # hardcoded decoder-input dropout in the reference
    use_bias: bool = False
    affine: bool = True
    freq_norm: str = "ortho"
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    def setup(self):
        self.extractor_mod = ExtractorRes50(
            freq_norm=self.freq_norm, remat=self.remat,
            axis_name=self.axis_name, dtype=self.dtype,
            name="extractor",
        )
        self.emb_block1 = EmbedderRes50Layer1(
            use_bias=self.use_bias, axis_name=self.axis_name, dtype=self.dtype,
            name="emb_block1",
        )
        self.emb_block2 = EmbedderRes50Layer2(
            use_bias=self.use_bias, axis_name=self.axis_name, dtype=self.dtype,
            name="emb_block2",
        )
        kw = dict(use_bias=self.use_bias, affine=self.affine, use_swish=False, dtype=self.dtype)
        self.dec_block1 = DecoderBlock(features=256, name="dec_block1", **kw)
        self.dec_block2 = DecoderBlock(features=128, name="dec_block2", **kw)
        self.dec_block3 = DecoderBlock(features=64, out_features=32, final=True, name="dec_block3", **kw)
        self.bottleneck = BatchNorm(
            frozen_bias=True, axis_name=self.axis_name, dtype=self.dtype, name="bottleneck"
        )
        self.attention = DualSpaceAttention(
            activation=nn.relu,
            use_bias=self.use_bias,
            drop_rate=self.drop_rate,
            freq_norm=self.freq_norm,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="attention",
        )
        self.classifier = Classifier(self.num_classes, dtype=self.dtype)
        self.dropout = nn.Dropout(self.drop_rate)
        self.feat_dropout = nn.Dropout(self.feat_drop_rate)

    def __call__(self, x, noise_x=None, train: bool = False):
        if noise_x is None:
            noise_x = x
        loss_dict = {}

        ext_feat = self.extractor_mod(noise_x, train)  # (N, 16, 16, 1024) @256
        dec_in = self.feat_dropout(ext_feat, deterministic=not train)
        dec_out1 = self.dec_block1(dec_in)     # (N, 32, 32, 256)
        dec_out2 = self.dec_block2(dec_out1)   # (N, 64, 64, 128)
        dec_out3 = self.dec_block3(dec_out2)   # (N, 128, 128, 3)

        emb_feat = self.emb_block1(ext_feat, train)  # (N, 8, 8, 2048)
        att = self.attention(jax.lax.stop_gradient(dec_out3), x, emb_feat, train)
        emb_feat = self.emb_block2(att["out"], train)
        emb_feat = global_avg_pool(emb_feat)
        emb_feat = self.bottleneck(emb_feat, use_running_average=not train)

        loss_dict["factorization"] = emb_feat
        emb_feat = self.dropout(emb_feat, deterministic=not train)

        loss_dict["triplet"] = [global_avg_pool(ext_feat), global_avg_pool(dec_out1)]
        loss_dict["freq_mask"] = att["freq_mask"]
        loss_dict["spat_mask"] = att["spat_mask"]

        cls_out = self.classifier(emb_feat)

        rec, spatial, freq = _recon_losses(dec_out3, x, self.freq_norm)
        loss_dict["spatial"] = spatial
        loss_dict["freq"] = freq
        return {"cls_out": cls_out, "rec": rec, "loss_dict": loss_dict}
