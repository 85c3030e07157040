"""Test helpers: a miniature UniDefense-contract model that compiles in
seconds on CPU, exercising the identical output contract
({'cls_out','rec','loss_dict'}) and all custom ops (SFConv, dual-space
attention, decoder, frozen-bias bottleneck) at toy scale."""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from unidefense_tpu.models.filters import DualSpaceAttention
from unidefense_tpu.models.layers import BatchNorm, Classifier, Conv, SFConv
from unidefense_tpu.models.unidefense import DecoderBlock, _recon_losses
from unidefense_tpu.ops.resize import global_avg_pool


class MiniUniDefense(nn.Module):
    num_classes: int = 2
    depth: int = 8
    axis_name: Optional[str] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, noise_x=None, train: bool = False):
        if noise_x is None:
            noise_x = x
        loss_dict = {}
        d = self.depth
        h = Conv(d, 3, 2, 1, use_bias=False, dtype=self.dtype, name="stem")(noise_x)
        h = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn0")(
            h, use_running_average=not train
        )
        h = nn.relu(h)
        feat = SFConv(d, 3, 1, 1, use_bias=False, dtype=self.dtype, name="sf")(h)
        feat = nn.relu(feat)

        rec = DecoderBlock(features=d, final=True, dtype=self.dtype, name="dec")(feat)

        emb = Conv(2 * d, 3, 2, 1, use_bias=False, dtype=self.dtype, name="down")(feat)
        att = DualSpaceAttention(
            axis_name=self.axis_name, dtype=self.dtype, name="attention"
        )(jax.lax.stop_gradient(rec), x, emb, train)
        emb = global_avg_pool(att["out"])
        emb = BatchNorm(
            frozen_bias=True, axis_name=self.axis_name, dtype=self.dtype, name="bottleneck"
        )(emb, use_running_average=not train)

        loss_dict["factorization"] = emb
        loss_dict["triplet"] = [global_avg_pool(feat)]
        loss_dict["freq_mask"] = att["freq_mask"]
        loss_dict["spat_mask"] = att["spat_mask"]
        cls_out = Classifier(self.num_classes, dtype=self.dtype)(emb)

        rec, spatial, freq = _recon_losses(rec, x, "ortho")
        loss_dict["spatial"] = spatial
        loss_dict["freq"] = freq
        return {"cls_out": cls_out, "rec": rec, "loss_dict": loss_dict}


def tiny_batch(n_real=2, n_fake=2, size=16, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n_real + n_fake, size, size, 3)).astype("float32") * 0.4
    m = (np.arange(size)[:, None] + np.arange(size)[None, :]) % 2
    x[n_real:] += 0.3 * m[None, :, :, None]
    x = np.clip(x, -1, 1)
    labels = np.array([0] * n_real + [1] * n_fake)
    return jnp.asarray(x), jnp.asarray(labels)


OPT_CFG = {
    "optimizer": {"name": "adamw", "lr": 1e-3, "betas": [0.9, 0.999],
                  "weight_decay": 5e-6, "amsgrad": True},
    "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
    "lambda_mask": 0.1, "lambda_fac": 0.1,
}
