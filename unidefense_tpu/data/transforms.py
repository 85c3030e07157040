"""Transform registry — albumentations-compatible YAML surface, split into a
host stage and a fused device stage.

The reference builds albumentations pipelines by name-reflection from the
dataset YAML (dataset/abstract_dataset.py:36-40), then runs decode + augment
synchronously inside the training loop — the known input bottleneck
(SURVEY.md §3.5). The TPU redesign splits each pipeline:

* host stage (numpy/cv2, per image, ragged sizes): Resize to the fixed
  training resolution, plus host-only corruptions (JPEG re-compression);
* device stage (one jitted function over the whole uint8 batch): horizontal
  flip, normalize, gaussian blur/noise, brightness/contrast, saturation
  jitter — everything with fixed shapes fuses into a single XLA program that
  runs on-device, overlapping host decode via the prefetcher.

Supported YAML names (the ones used across config_template/*): Resize,
HorizontalFlip, Normalize, ImageCompression, GaussianBlur, GaussNoise,
RandomBrightnessContrast, ColorJitter, OneOf.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Any, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from unidefense_tpu.ops.perturb import _gaussian_kernel_1d

_RGB_W = np.array([0.299, 0.587, 0.114], dtype=np.float32)  # ITU-R 601 luma


class LockedRNG:
    """Mutex-serialized np.random.Generator proxy.

    BatchPrefetcher (workers>1) and the eval lookahead pool call load_item —
    and through it RandomResizedCrop / jpeg / distorted-OneOf draws — from
    several threads at once, but numpy bit generators are NOT thread-safe:
    concurrent draws can duplicate values or corrupt generator state. Every
    draw here holds a lock, so the stream stays valid under concurrency and
    bit-identical to the bare Generator when single-threaded (workers=1
    remains the fully deterministic mode; with workers>1 only the ORDER of
    draws is scheduling-dependent, which the prefetcher docstring documents).
    """

    def __init__(self, gen_or_seed=2022):
        self._gen = (
            gen_or_seed
            if isinstance(gen_or_seed, np.random.Generator)
            else np.random.default_rng(gen_or_seed)
        )
        self._lock = threading.Lock()

    def __getattr__(self, name):
        fn = getattr(self._gen, name)
        if not callable(fn):
            return fn

        def locked(*args, **kwargs):
            with self._lock:
                return fn(*args, **kwargs)

        return locked


@dataclass
class DevicePipeline:
    """Fused on-device augmentation: uint8 NHWC batch -> float NHWC batch."""

    mean: tuple = (0.5, 0.5, 0.5)
    std: tuple = (0.5, 0.5, 0.5)
    hflip_p: float = 0.0
    # corruption OneOf (UniAttack Protocol I distorted test,
    # dataset/uniattack.py:90-107); host handles ImageCompression.
    corrupt: bool = False
    out_dtype: Any = jnp.float32

    def __call__(self, batch_u8: jnp.ndarray, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        if (
            not self.corrupt
            and batch_u8.dtype == jnp.uint8
            and jax.default_backend() == "tpu"
        ):
            # fused Pallas path: u8 -> normalize -> out_dtype in one VMEM pass
            # (~1.7x the XLA elementwise chain on v5e)
            from unidefense_tpu.ops.pallas_preprocess import normalize_flip

            return normalize_flip(
                batch_u8, rng, mean=self.mean, std=self.std,
                hflip_p=self.hflip_p, out_dtype=self.out_dtype,
            )
        x = batch_u8.astype(jnp.float32) / 255.0
        n = x.shape[0]
        if self.corrupt and rng is not None:
            rng, kc = jax.random.split(rng)
            x = _corrupt_oneof(kc, x)
        if self.hflip_p > 0 and rng is not None:
            rng, kf = jax.random.split(rng)
            flip = jax.random.uniform(kf, (n, 1, 1, 1)) < self.hflip_p
            x = jnp.where(flip, x[:, :, ::-1, :], x)
        mean = jnp.asarray(self.mean, jnp.float32)
        std = jnp.asarray(self.std, jnp.float32)
        x = (x - mean) / std
        return x.astype(self.out_dtype)


def _blur(x, ksize):
    k = jnp.asarray(_gaussian_kernel_1d(ksize), x.dtype)
    pad = ksize // 2
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kh = jnp.tile(k.reshape(ksize, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, ksize, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    xp = jax.lax.conv_general_dilated(xp, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    xp = jax.lax.conv_general_dilated(xp, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c)
    return xp


def _corrupt_oneof(rng, x):
    """PER-SAMPLE random pick among blur / noise / contrast / saturation —
    albumentations OneOf draws independently per image
    (dataset/uniattack.py:90-107), so each sample gets its own corruption and
    parameters. All four variants are computed batch-wide and selected per
    sample (cheap relative to the model; avoids data-dependent control flow).
    Contrast is multiply-only like albumentations' uint8 LUT (alpha*x, no
    pivot); noise sigma is on the 0..255 scale like GaussNoise var_limit."""
    n = x.shape[0]
    kidx, kp, kn, kk = jax.random.split(rng, 4)
    idx = jax.random.randint(kidx, (n, 1, 1, 1), 0, 4)
    u = jax.random.uniform(kp, (n, 1, 1, 1))  # per-sample parameter draw

    blurred = jnp.where(
        jax.random.bernoulli(kk, 0.5, (n, 1, 1, 1)), _blur(x, 11), _blur(x, 9)
    )
    var = 10.0 + 10.0 * u  # U[10, 20] on the uint8 scale
    noised = jnp.clip(x + jnp.sqrt(var) / 255.0 * jax.random.normal(kn, x.shape), 0.0, 1.0)
    alpha = 0.5 + u  # U[0.5, 1.5]
    contrast = jnp.clip(x * alpha, 0.0, 1.0)
    gray = jnp.sum(x * jnp.asarray(_RGB_W), axis=-1, keepdims=True)
    saturation = jnp.clip(alpha * x + (1 - alpha) * gray, 0.0, 1.0)

    return jnp.where(
        idx == 0,
        blurred,
        jnp.where(idx == 1, noised, jnp.where(idx == 2, contrast, saturation)),
    )


@dataclass
class HostPipeline:
    """Per-image host stage. Applied post-crop; outputs fixed-size uint8."""

    height: int = 256
    width: int = 256
    jpeg_compress: Optional[tuple[int, int]] = None  # (q_lo, q_hi) with prob
    jpeg_p: float = 0.0
    # UniAttack Protocol-I distorted test (dataset/uniattack.py:90-107):
    # exactly ONE of {JPEG 50-60, blur 9/11, noise var 10-20, contrast ±0.5,
    # saturation ±0.5} per image, drawn uniformly — albumentations OneOf
    # semantics, applied host-side for exact per-image parity.
    distorted_oneof: bool = False
    # RandomResizedCrop (albumentations semantics): area scale range, aspect
    # ratio range, application prob, cv2 interpolation code
    rrc_scale: Optional[tuple[float, float]] = None
    rrc_ratio: tuple = (0.75, 4.0 / 3.0)
    rrc_p: float = 1.0
    interpolation: int = cv2.INTER_LINEAR
    rng: Any = field(default_factory=lambda: LockedRNG(2022))

    @property
    def is_plain_resize(self) -> bool:
        """True when the stage is a pure resize — eligible for the native
        batched decode fast path."""
        return (
            self.jpeg_compress is None
            and self.rrc_scale is None
            and not self.distorted_oneof
        )

    def _distorted(self, img: np.ndarray) -> np.ndarray:
        """One uniformly-drawn corruption per image (OneOf with five equal
        inner p's normalizes to 1/5 each). Formulas follow the albumentations
        uint8 paths: contrast is a multiply-only LUT, noise sigma on the
        0..255 scale, saturation blends with ITU-R 601 gray."""
        c = int(self.rng.integers(0, 5))
        if c == 0:  # ImageCompression(quality 50..60)
            q = int(self.rng.integers(50, 61))
            ok, enc = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, q])
            if ok:
                img = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]
        elif c == 1:  # GaussianBlur(blur_limit=(9, 11)) -> odd ksize 9 or 11
            k = int(self.rng.choice([9, 11]))
            img = cv2.GaussianBlur(img, (k, k), 0)
        elif c == 2:  # GaussNoise(var_limit=(10, 20))
            sigma = float(np.sqrt(self.rng.uniform(10.0, 20.0)))
            noise = self.rng.normal(0.0, sigma, img.shape)
            img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        elif c == 3:  # RandomBrightnessContrast(contrast_limit=0.5)
            alpha = 1.0 + float(self.rng.uniform(-0.5, 0.5))
            img = np.clip(img.astype(np.float32) * alpha, 0, 255).astype(np.uint8)
        else:  # ColorJitter(saturation=0.5)
            f = float(self.rng.uniform(0.5, 1.5))
            gray = (img.astype(np.float32) @ _RGB_W)[..., None]
            img = np.clip(img.astype(np.float32) * f + gray * (1.0 - f), 0, 255).astype(np.uint8)
        return img

    def _random_resized_crop(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        area = h * w
        for _ in range(10):
            target_area = self.rng.uniform(*self.rrc_scale) * area
            log_ratio = (np.log(self.rrc_ratio[0]), np.log(self.rrc_ratio[1]))
            aspect = np.exp(self.rng.uniform(*log_ratio))
            cw = int(round(np.sqrt(target_area * aspect)))
            ch = int(round(np.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                x = int(self.rng.integers(0, w - cw + 1))
                y = int(self.rng.integers(0, h - ch + 1))
                return img[y : y + ch, x : x + cw]
        # fallback: center crop to in-range aspect
        in_ratio = w / h
        if in_ratio < self.rrc_ratio[0]:
            cw, ch = w, int(round(w / self.rrc_ratio[0]))
        elif in_ratio > self.rrc_ratio[1]:
            cw, ch = int(round(h * self.rrc_ratio[1])), h
        else:
            cw, ch = w, h
        x, y = (w - cw) // 2, (h - ch) // 2
        return img[y : y + ch, x : x + cw]

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.rrc_scale is not None and self.rng.random() < self.rrc_p:
            img = self._random_resized_crop(img)
        if img.shape[0] != self.height or img.shape[1] != self.width:
            img = cv2.resize(img, (self.width, self.height), interpolation=self.interpolation)
        if self.distorted_oneof:
            img = self._distorted(img)
        if self.jpeg_compress is not None and self.rng.random() < self.jpeg_p:
            q = int(self.rng.integers(self.jpeg_compress[0], self.jpeg_compress[1] + 1))
            ok, enc = cv2.imencode(".jpg", img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, q])
            if ok:
                img = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]
        return img


def build_transforms(cfg_list: list[dict], corrupt_distorted: bool = False):
    """Translate an albumentations-style YAML transform list (e.g.
    config_template/forgery/data_ffc23.yml:24-49) into (HostPipeline,
    DevicePipeline)."""
    host = HostPipeline()
    dev_kwargs: dict = {}
    for t in cfg_list or []:
        name = t["name"]
        params = t.get("params", {}) or {}
        if name == "Resize":
            host.height = int(params["height"])
            host.width = int(params["width"])
        elif name == "RandomResizedCrop":
            host.height = int(params["height"])
            host.width = int(params["width"])
            host.rrc_scale = tuple(params.get("scale", (0.08, 1.0)))
            host.rrc_ratio = tuple(params.get("ratio", (0.75, 4.0 / 3.0)))
            host.rrc_p = float(params.get("p", 1.0))
            host.interpolation = int(params.get("interpolation", cv2.INTER_LINEAR))
        elif name == "HorizontalFlip":
            dev_kwargs["hflip_p"] = float(params.get("p", 0.5))
        elif name == "Normalize":
            dev_kwargs["mean"] = tuple(params.get("mean", (0.5, 0.5, 0.5)))
            dev_kwargs["std"] = tuple(params.get("std", (0.5, 0.5, 0.5)))
        elif name == "ImageCompression":
            host.jpeg_compress = (
                int(params.get("quality_lower", 99)),
                int(params.get("quality_upper", 100)),
            )
            host.jpeg_p = float(params.get("p", 0.5))
        elif name in ("GaussianBlur", "GaussNoise", "RandomBrightnessContrast", "ColorJitter", "OneOf"):
            dev_kwargs["corrupt"] = True
        else:
            raise KeyError(f"Transform '{name}' not supported")
    if corrupt_distorted:
        # the whole OneOf (incl. JPEG) runs host-side per image for exact
        # albumentations parity; the device stage only normalizes
        host.distorted_oneof = True
        dev_kwargs.pop("corrupt", None)
    return host, DevicePipeline(**dev_kwargs)
