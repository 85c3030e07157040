#!/usr/bin/env python
"""Run the PyTorch reference's OWN CLI (/root/reference/main.py) on CPU.

The reference hard-codes CUDA (torch.cuda.set_device, torch.device("cuda:r"),
DDP device_ids — engine/abstract_engine.py:43, engine/forgery_engine.py:140-145)
and imports libraries this image lacks (wandb, lmdb, albumentations, timm).
This shim makes the UNMODIFIED reference runnable single-process on CPU with
the gloo backend so tools/engine_ab.py can A/B its full engine loop (loaders,
validation cadence, best-checkpoint rule, threshold carry, printed metrics)
against ours on the same corpus + YAML.

Faithfulness notes:
* albumentations stub implements the REAL library's math for every transform
  the reference constructs by YAML-name reflection (abstract_dataset.py:36-40)
  and for the Protocol-I distorted OneOf (uniattack.py:90-107).
* lmdb stub is a directory-backed env: get(key) reads <env_path>/<key> — the
  corpus builder lays files out under the exact lmdb path the reference opens.
* timm stub provides the real param_groups_weight_decay rule (ndim<=1 or
  .bias -> no decay), which the engines use for optimizer param groups.
* torch itself is real; only the CUDA binding points are redirected to CPU.

Usage: python tools/ref_cpu_shim.py --config model.yml --engine FE [--test]
"""

import os
import random
import runpy
import sys
import types

REF = "/root/reference"


# ------------------------------------------------------------------ stubs

def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _install_wandb():
    class _Cfg:
        def update(self, *a, **k):
            pass

    class _Run:
        def __init__(self):
            self.dir = os.path.abspath("wandb_stub")
            os.makedirs(os.path.join(self.dir, "code"), exist_ok=True)

    mod = _stub("wandb", log=lambda *a, **k: None, finish=lambda *a, **k: None,
                Image=lambda *a, **k: None)
    mod.config = _Cfg()
    mod.run = None

    def init(**kw):
        mod.run = _Run()
        return mod.run

    mod.init = init


def _install_lmdb():
    """Directory-backed lmdb: env path is a directory, keys are relative
    file paths (exactly how the corpus builder writes them)."""

    class _Txn:
        def __init__(self, base):
            self.base = base

        def get(self, key):
            p = os.path.join(self.base, key.decode())
            if not os.path.exists(p):
                return None
            with open(p, "rb") as f:
                return f.read()

        def cursor(self):
            for dirpath, _, files in os.walk(self.base):
                for fn in sorted(files):
                    full = os.path.join(dirpath, fn)
                    with open(full, "rb") as f:
                        yield os.path.relpath(full, self.base).encode(), f.read()

    class _Env:
        def __init__(self, path):
            self.path = path

        def begin(self, write=False):
            return _Txn(self.path)

        def close(self):
            pass

    _stub("lmdb", open=lambda path, **kw: _Env(path))


def _install_albumentations():
    """Faithful re-implementations of the albumentations transforms the
    reference names in YAML / code (real-library uint8 math)."""
    import cv2
    import numpy as np
    import torch

    class _T:
        p = 1.0

        def __call__(self, image=None, **kw):
            if random.random() < self.p:
                image = self.apply(image)
            return {"image": image}

        def apply(self, img):
            return img

    class Resize(_T):
        def __init__(self, height, width, interpolation=cv2.INTER_LINEAR, p=1.0):
            self.h, self.w, self.interp, self.p = height, width, interpolation, p

        def apply(self, img):
            return cv2.resize(img, (self.w, self.h), interpolation=self.interp)

    class HorizontalFlip(_T):
        def __init__(self, p=0.5):
            self.p = p

        def apply(self, img):
            return np.ascontiguousarray(img[:, ::-1])

    class Normalize(_T):
        def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                     max_pixel_value=255.0, p=1.0):
            self.mean = np.asarray(mean, np.float32) * max_pixel_value
            self.std = np.asarray(std, np.float32) * max_pixel_value
            self.p = p

        def apply(self, img):
            return (img.astype(np.float32) - self.mean) / self.std

    class ImageCompression(_T):
        def __init__(self, quality_lower=99, quality_upper=100, p=0.5):
            self.lo, self.hi, self.p = quality_lower, quality_upper, p

        def apply(self, img):
            q = random.randint(self.lo, self.hi)
            ok, enc = cv2.imencode(".jpg", img[:, :, ::-1],
                                   [cv2.IMWRITE_JPEG_QUALITY, q])
            return cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1] if ok else img

    class GaussianBlur(_T):
        def __init__(self, blur_limit=(3, 7), p=0.5):
            self.lim, self.p = blur_limit, p

        def apply(self, img):
            lo, hi = self.lim
            k = random.choice([k for k in range(lo, hi + 1) if k % 2 == 1])
            return cv2.GaussianBlur(img, (k, k), 0)

    class GaussNoise(_T):
        def __init__(self, var_limit=(10.0, 50.0), p=0.5):
            self.lim, self.p = var_limit, p

        def apply(self, img):
            sigma = float(np.sqrt(random.uniform(*self.lim)))
            noise = np.random.normal(0, sigma, img.shape)
            return np.clip(img.astype(np.float32) + noise, 0, 255).astype(img.dtype)

    class RandomBrightnessContrast(_T):
        def __init__(self, brightness_limit=0.2, contrast_limit=0.2, p=0.5):
            self.bl, self.cl, self.p = brightness_limit, contrast_limit, p

        def apply(self, img):
            alpha = 1.0 + random.uniform(-self.cl, self.cl)
            beta = random.uniform(-self.bl, self.bl) * 255.0
            return np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(img.dtype)

    class ColorJitter(_T):
        def __init__(self, brightness=0.2, contrast=0.2, saturation=0.2, hue=0.2, p=0.5):
            self.sat, self.p = saturation, p

        def apply(self, img):
            f = random.uniform(max(0, 1 - self.sat), 1 + self.sat)
            w = np.asarray([0.299, 0.587, 0.114], np.float32)
            gray = (img.astype(np.float32) @ w)[..., None]
            return np.clip(img.astype(np.float32) * f + gray * (1 - f), 0, 255).astype(img.dtype)

    class OneOf(_T):
        def __init__(self, transforms, p=0.5):
            self.transforms, self.p = transforms, p

        def apply(self, img):
            ts = self.transforms
            probs = np.asarray([t.p for t in ts], np.float64)
            probs /= probs.sum()
            t = ts[int(np.random.choice(len(ts), p=probs))]
            return t.apply(img)

    class Compose:
        def __init__(self, transforms, p=1.0):
            self.transforms = transforms

        def __call__(self, image=None, **kw):
            for t in self.transforms:
                image = t(image=image)["image"]
            return {"image": image}

    class ToTensorV2:
        def __call__(self, image=None, **kw):
            img = image
            if img.ndim == 2:
                img = img[:, :, None]
            return {"image": torch.from_numpy(np.ascontiguousarray(img.transpose(2, 0, 1)))}

    names = dict(Resize=Resize, HorizontalFlip=HorizontalFlip, Normalize=Normalize,
                 ImageCompression=ImageCompression, GaussianBlur=GaussianBlur,
                 GaussNoise=GaussNoise, RandomBrightnessContrast=RandomBrightnessContrast,
                 ColorJitter=ColorJitter, OneOf=OneOf, Compose=Compose)
    _stub("albumentations", **names)
    _stub("albumentations.pytorch")
    _stub("albumentations.pytorch.transforms", ToTensorV2=ToTensorV2)


def _install_timm_torchvision():
    import torch

    def param_groups_weight_decay(model, weight_decay=1e-5, no_weight_decay_list=()):
        # real timm.optim.optim_factory rule
        no_weight_decay_list = set(no_weight_decay_list)
        decay, no_decay = [], []
        for name, param in model.named_parameters():
            if not param.requires_grad:
                continue
            if param.ndim <= 1 or name.endswith(".bias") or name in no_weight_decay_list:
                no_decay.append(param)
            else:
                decay.append(param)
        return [{"params": no_decay, "weight_decay": 0.0},
                {"params": decay, "weight_decay": weight_decay}]

    class _UnusedScheduler:
        def __init__(self, *a, **k):
            raise NotImplementedError("timm scheduler stub: not used in the A/B")

    dummy = lambda *a, **k: None
    _stub("timm")
    _stub("timm.optim")
    _stub("timm.optim.optim_factory",
          param_groups_weight_decay=param_groups_weight_decay)
    _stub("timm.scheduler", StepLRScheduler=_UnusedScheduler,
          CosineLRScheduler=_UnusedScheduler)
    _stub("timm.models")
    _stub("timm.models.layers", DropBlock2d=object, DropPath=object,
          AvgPool2dSame=object, BlurPool2d=object, GroupNorm=object,
          create_attn=dummy, get_attn=dummy,
          create_classifier=lambda *a, **k: (torch.nn.AdaptiveAvgPool2d(1),
                                             torch.nn.Identity()))
    _stub("timm.models.helpers",
          build_model_with_cfg=lambda cls, variant, pretrained, **kw: cls(**kw),
          checkpoint_seq=dummy)

    class VisionDataset:
        # functional minimum of torchvision.datasets.VisionDataset: keep the
        # ctor signature and leave self.transforms None when nothing is
        # passed (abstract_dataset.py then builds its own from YAML)
        def __init__(self, root=None, transforms=None, transform=None,
                     target_transform=None):
            self.root = root
            self.transforms = transforms
            self.transform = transform
            self.target_transform = target_transform

    def gaussian_blur(t, kernel_size, sigma=None):
        # real torchvision semantics (the reference's random_blur perturbation
        # runs in pass 2, so this must compute)
        import torch.nn.functional as F

        ks = list(kernel_size) if isinstance(kernel_size, (list, tuple)) else [kernel_size] * 2

        def kern1d(k, s):
            if s is None:
                s = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
            xs = torch.arange(k, dtype=torch.float32) - (k - 1) / 2
            g = torch.exp(-((xs / s) ** 2) / 2)
            return g / g.sum()

        kx, ky = kern1d(ks[0], sigma), kern1d(ks[1], sigma)
        img = t if t.dim() == 4 else t[None]
        c = img.shape[-3]
        img = F.pad(img, [ks[0] // 2, ks[0] // 2, ks[1] // 2, ks[1] // 2], mode="reflect")
        kern = torch.outer(ky, kx)[None, None].expand(c, 1, ks[1], ks[0])
        out = F.conv2d(img, kern, groups=c)
        return out if t.dim() == 4 else out[0]

    _stub("torchvision")
    _stub("torchvision.transforms")
    _stub("torchvision.transforms.functional", gaussian_blur=gaussian_blur)
    _stub("torchvision.datasets", VisionDataset=VisionDataset)


# ------------------------------------------------------------------ torch→cpu

class _TorchProxy(types.ModuleType):
    """Per-engine-module stand-in for `torch`: everything delegates to the
    real module except device(), which maps cuda -> cpu."""

    def __init__(self, real):
        super().__init__("torch")
        self._real = real

    def __getattr__(self, k):
        return getattr(self._real, k)

    def device(self, spec=None, *a):
        if isinstance(spec, str) and spec.startswith("cuda"):
            spec = "cpu"
        return self._real.device(spec, *a)


def _patch_torch():
    import torch

    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.manual_seed = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None

    # single-process CPU: SyncBN == BN numerically (its forward falls back to
    # F.batch_norm when world_size == 1) and DDP refuses SyncBN on CPU
    # modules, so the conversion becomes identity
    torch.nn.SyncBatchNorm.convert_sync_batchnorm = classmethod(
        lambda cls, module, process_group=None: module)

    # the reference uses PyTorch<=1.12's deprecated loader-iterator .next()
    # (engine/forgery_engine.py:251,256); torch 2.x only has __next__
    from torch.utils.data import dataloader as _dl

    _dl._BaseDataLoaderIter.next = _dl._BaseDataLoaderIter.__next__

    # torch>=2.6 defaults weights_only=True; the reference was written for
    # 1.12 and loads its own checkpoints/pickles (numpy scalars inside)
    _real_load = torch.load

    def _load(*a, **k):
        k.setdefault("weights_only", False)
        return _real_load(*a, **k)

    torch.load = _load

    real_ddp = torch.nn.parallel.DistributedDataParallel

    def ddp(module, device_ids=None, output_device=None,
            find_unused_parameters=False, **kw):
        # CPU modules reject device_ids; gloo DDP runs without them
        return real_ddp(module, find_unused_parameters=find_unused_parameters, **kw)

    torch.nn.parallel.DistributedDataParallel = ddp
    return torch


def _wrap_load_model(real_load_model, init_state, deterministic, image_size):
    """Wrap the reference's model registry so tools/engine_ab.py can
    (a) share one init across both A/B sides: the FIRST construction saves
        its state_dict to UD_AB_INIT_STATE in the reference's own
        {'model': sd} format (engine/forgery_engine.py:215-223); later
        constructions (ours converts the same file; the reference --test
        stage reloads then overrides with best_model.bin) load it;
    (b) zero drop-connect for config.deterministic_regularization (same
        patch as tools/parity_curves.py --deterministic);
    (c) build UDEB4 via from_name with the run's image size (no weight
        download on this zero-egress image; static SAME padding pinned to
        the actual input size, matching the UD_SLOW golden shim)."""
    import torch

    def load_model(name):
        if name.upper() == "UDEB4" and image_size:
            import model.efficientnet.model as tm

            tm.EfficientNet.from_pretrained = classmethod(
                lambda cls, nm, weights_path=None, advprop=False,
                in_channels=3, num_classes=1000, **kw: cls.from_name(
                    nm, num_classes=num_classes,
                    image_size=int(image_size), **kw))
        cls = real_load_model(name)
        if not (init_state or deterministic):
            return cls

        class Hooked(cls):
            def __init__(self, *a, **k):
                super().__init__(*a, **k)
                if deterministic and hasattr(self, "backbone") and \
                        hasattr(self.backbone, "_global_params"):
                    self.backbone._global_params = \
                        self.backbone._global_params._replace(
                            drop_connect_rate=None)
                if init_state:
                    if os.path.exists(init_state):
                        sd = torch.load(init_state, map_location="cpu",
                                        weights_only=False)["model"]
                        self.load_state_dict(sd, strict=True)
                        print(f"[shim] loaded shared init from {init_state}")
                    else:
                        torch.save({"model": self.state_dict()}, init_state)
                        print(f"[shim] saved shared init to {init_state}")

        Hooked.__name__ = cls.__name__
        Hooked.__qualname__ = cls.__qualname__
        return Hooked

    return load_model


def _patch_engine_modules(torch_mod, init_state=None, deterministic=False,
                          image_size=None):
    """Import the reference engine modules and swap their module-level
    `torch` binding for the cuda->cpu proxy (and, for the A/B hooks, their
    `load_model` binding)."""
    proxy = _TorchProxy(torch_mod)
    import engine  # noqa: F401 — triggers engine.* imports

    for name in ("engine.abstract_engine", "engine.forgery_engine",
                 "engine.ocim_engine", "engine.uniattack_engine"):
        mod = sys.modules.get(name)
        if mod is not None:
            mod.torch = proxy
            if hasattr(mod, "load_model") and (init_state or deterministic
                                               or image_size):
                mod.load_model = _wrap_load_model(
                    mod.load_model, init_state, deterministic, image_size)


def main():
    _install_wandb()
    _install_lmdb()
    _install_albumentations()
    _install_timm_torchvision()
    torch_mod = _patch_torch()

    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    os.environ.setdefault("MASTER_PORT", str(29500 + (os.getpid() % 500)))
    os.environ.setdefault("RANK", "0")
    os.environ.setdefault("WORLD_SIZE", "1")
    os.environ.setdefault("LOCAL_RANK", "0")
    os.environ["WANDB_MODE"] = "dryrun"

    # --- A/B hooks (tools/engine_ab.py) ---------------------------------
    # deterministic_regularization is read from the SHARED model.yml (the
    # same key our engines honor, engines/base.py:_build_model); init-state
    # sharing and the UDEB4 image-size pin come via env vars.
    deterministic = False
    if "--config" in sys.argv:
        try:
            import yaml

            with open(sys.argv[sys.argv.index("--config") + 1]) as f:
                _cfg = yaml.safe_load(f)
            deterministic = bool(
                _cfg.get("config", {}).get("deterministic_regularization"))
        except Exception:
            pass
    if deterministic:
        import torch.nn.functional as F

        # identity dropout: kills the nn.Dropout modules AND the hardcoded
        # F.dropout of the Eb4 decoder input (model/unidefense.py:213) —
        # same patch as tools/parity_curves.py --deterministic
        F.dropout = lambda x, p=0.5, training=False, inplace=False: x
    seed = os.environ.get("UD_AB_SEED")
    if seed is not None:
        random.seed(int(seed))
        import numpy as _np

        _np.random.seed(int(seed))
        torch_mod.manual_seed(int(seed))

    sys.path.insert(0, REF)
    _patch_engine_modules(
        torch_mod,
        init_state=os.environ.get("UD_AB_INIT_STATE"),
        deterministic=deterministic,
        image_size=os.environ.get("UD_AB_IMAGE_SIZE"),
    )

    sys.argv = [os.path.join(REF, "main.py")] + sys.argv[1:]
    runpy.run_path(os.path.join(REF, "main.py"), run_name="__main__")


if __name__ == "__main__":
    main()
