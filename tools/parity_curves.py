#!/usr/bin/env python
"""Training-behavior parity: reference (torch, eager CPU) vs unidefense_tpu.

Trains the reference UniDefenseModelRes18 with the reference's OWN
two-pass step (`AbstractEngine.train_unidefense_model`,
engine/abstract_engine.py:207-381 — loaded from /root/reference, read-only)
and our jitted `make_train_step` from the SAME converted initial weights on
the SAME synthetic batch sequence, then compares loss curves and val AUC.

Bitwise parity is impossible (different RNGs drive dropout and the pass-2
perturbation branch, SURVEY.md §7 hard-part 4); the claim is statistical:
both implementations optimize the same objective from the same init with the
same optimizer and should trace matching loss/AUC trajectories within noise.

Usage:  python tools/parity_curves.py [--steps 300] [--size 64] [--eval-every 25]
Writes: runs/parity/parity_curves.json (+ .png if matplotlib available)
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


# --------------------------------------------------------------- ref imports

def _install_stubs():
    """Stub wandb/torchvision/timm so the reference package imports here
    (same approach as tests/test_convert.py)."""
    import torch

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)

    dummy = lambda *a, **k: None

    def gaussian_blur(t, kernel_size, sigma=None):
        """Real torchvision.transforms.functional.gaussian_blur semantics —
        the reference's random_blur perturbation (model/modules.py:15-16)
        actually runs during pass 2, so the stub must compute, not no-op."""
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

    stub("wandb", init=dummy, log=dummy, finish=dummy)
    stub("torchvision")
    stub("torchvision.transforms")
    stub("torchvision.transforms.functional", gaussian_blur=gaussian_blur)
    stub("torchvision.datasets", VisionDataset=object)
    stub("timm")
    stub("timm.models")
    stub("timm.models.layers", DropBlock2d=object, DropPath=object, AvgPool2dSame=object,
         BlurPool2d=object, GroupNorm=object, create_attn=dummy, get_attn=dummy,
         create_classifier=lambda *a, **k: (torch.nn.AdaptiveAvgPool2d(1), torch.nn.Identity()))
    stub("timm.models.helpers",
         build_model_with_cfg=lambda cls, variant, pretrained, **kw: cls(**kw),
         checkpoint_seq=dummy)
    if REF not in sys.path:
        sys.path.insert(0, REF)


# --------------------------------------------------------------- data

def make_data(size: int, n_videos: int = 24, frames: int = 4, seed: int = 0,
              artifact: float = 0.10):
    """Separable synthetic set (same construction as
    tools/validate_learning.py): smooth random blobs; fakes carry a faint
    checkerboard (a spectral artifact the dual-space model can latch onto).
    Returns float32 NHWC in [0, 1]."""
    import cv2

    cb = ((np.arange(size)[:, None] + np.arange(size)[None, :]) % 2).astype(np.float32)

    def blob(s):
        g = np.random.default_rng(s)
        img = g.random((size // 8, size // 8, 3)).astype(np.float32)
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
        return np.clip(img, 0, 1)

    reals, fakes = [], []
    for v in range(n_videos):
        for f in range(frames):
            reals.append(blob(hash(("r", v, f, seed)) % 2**31))
            fakes.append(np.clip(blob(hash(("f", v, f, seed)) % 2**31)
                                 + artifact * cb[:, :, None], 0, 1))
    return np.stack(reals), np.stack(fakes)


def batch_stream(reals, fakes, n_steps, bs, seed=7):
    """Fixed batch sequence fed identically to both frameworks
    (normalized (x-0.5)/0.5, real-first)."""
    g = np.random.default_rng(seed)
    for _ in range(n_steps):
        ri = g.integers(0, len(reals), bs)
        fi = g.integers(0, len(fakes), bs)
        x = np.concatenate([reals[ri], fakes[fi]], 0)
        x = (x - 0.5) / 0.5
        y = np.array([0] * bs + [1] * bs, np.int64)
        yield x.astype(np.float32), y


# --------------------------------------------------------------- torch side

def build_torch(cfg, num_steps, lr, wd, seed=0, model_name="udr18", size=64,
                deterministic=False):
    import torch

    _install_stubs()
    import torch.distributed as dist

    dist.barrier = lambda *a, **k: None  # single-process run of the ref step

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_abstract_engine", os.path.join(REF, "engine", "abstract_engine.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from loss import get_loss  # noqa: reference registry

    torch.manual_seed(seed)
    if model_name == "udeb4":
        # flagship: reference Eb4, built via from_name (no weight download)
        # with STATIC SAME padding pinned to the run's image size — exactly
        # the shim the UD_SLOW golden uses (tests/test_convert.py)
        import model.efficientnet.model as tm  # noqa
        from model.unidefense import UniDefenseModelEb4  # noqa

        orig = tm.EfficientNet.from_pretrained
        tm.EfficientNet.from_pretrained = classmethod(
            lambda cls, name, weights_path=None, advprop=False, in_channels=3,
            num_classes=1000, **kw: cls.from_name(
                name, num_classes=num_classes, image_size=size, **kw)
        )
        try:
            model = UniDefenseModelEb4(extractor="efficientnet-b4", num_classes=2)
        finally:
            tm.EfficientNet.from_pretrained = orig
    else:
        from model.unidefense import UniDefenseModelRes18  # noqa

        model = UniDefenseModelRes18(extractor="resnet18", num_classes=2)
    if deterministic:
        # isolation experiment (VERDICT r3 item 5): zero ALL torch-side
        # stochasticity. F.dropout -> identity kills both the nn.Dropout
        # modules and the hardcoded F.dropout(x_b4, 0.2) of the decoder
        # input (model/unidefense.py:213); GlobalParams carries the
        # stochastic-depth rate read per block (model/unidefense.py:166).
        import torch.nn.functional as F

        F.dropout = lambda x, p=0.5, training=False, inplace=False: x
        if hasattr(model, "backbone") and hasattr(model.backbone, "_global_params"):
            model.backbone._global_params = model.backbone._global_params._replace(
                drop_connect_rate=None)
    model.train()

    # timm param_groups_weight_decay semantics (engine/forgery_engine.py:152-154)
    decay, no_decay = [], []
    for name, p in model.named_parameters():
        (no_decay if p.ndim <= 1 or name.endswith(".bias") else decay).append(p)
    optimizer = torch.optim.AdamW(
        [{"params": decay, "weight_decay": wd},
         {"params": no_decay, "weight_decay": 0.0}],
        lr=lr, betas=(0.9, 0.999), amsgrad=True,
    )

    eng = mod.AbstractEngine.__new__(mod.AbstractEngine)
    eng.model = model
    eng.device = "cpu"
    eng.optimizer = optimizer
    eng.config = {"config": cfg}
    eng.num_steps = num_steps
    eng.warmup_step = 0
    eng.loss_criterion = {
        "softmax": get_loss("cross_entropy", device="cpu"),
        "triplet": get_loss("aw_triplet", device="cpu"),
        "kl_div": get_loss("kl_div", device="cpu"),
        "fac": get_loss("factorization", device="cpu"),
    }

    class _ConstSched:  # ConstantLR (scheduler/__init__.py:13-18)
        def step(self):
            pass

    eng.scheduler = _ConstSched()
    scaler = torch.amp.GradScaler("cpu", enabled=False)  # fp32: scaler no-op
    return eng, model, optimizer, scaler


def torch_eval_probs(model, x_val):
    import torch

    model.eval()
    probs = []
    with torch.no_grad():
        for i in range(0, len(x_val), 16):
            xb = torch.from_numpy(x_val[i : i + 16].transpose(0, 3, 1, 2))
            out = model(xb)
            probs.append(torch.softmax(out["cls_out"], -1)[:, 0].numpy())
    model.train()
    return np.concatenate(probs)


# --------------------------------------------------------------- jax side

def build_jax(torch_model, cfg, num_steps, sample_x, bs, model_name="udr18",
              deterministic=False):
    import jax
    import jax.numpy as jnp

    from unidefense_tpu.models.convert import load_torch_backbone
    from unidefense_tpu.models.registry import load_model
    from unidefense_tpu.train.optim import build_optimizer
    from unidefense_tpu.train.step import (
        create_train_state, make_eval_step, make_train_step,
    )

    mkw = {}
    if deterministic:
        mkw = {"drop_rate": 0.0, "feat_drop_rate": 0.0}
        if model_name == "udeb4":
            mkw["drop_connect_rate"] = 0.0
    model = load_model("UDEB4" if model_name == "udeb4" else "UDR18")(**mkw)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": rng, "dropout": rng}, jnp.asarray(sample_x), train=False
    )
    variables = jax.tree.map(np.asarray, dict(variables))
    # SAME initial weights as the torch model
    variables = load_torch_backbone(
        variables, torch_model.state_dict(), "unidefense", strict=True
    )

    tx, _ = build_optimizer(cfg, variables["params"])
    state = create_train_state(model, tx, rng, jnp.asarray(sample_x))
    state = state.replace(params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}))
    step = jax.jit(
        make_train_step(model, tx, cfg, num_steps=num_steps,
                        sum_real=bs, sum_fake=bs,
                        faithful_grad_accumulation=True),
        donate_argnums=0,
    )
    eval_step = jax.jit(make_eval_step(model))
    return model, state, step, eval_step


# --------------------------------------------------------------- driver

def auc(labels, probs_real):
    from unidefense_tpu.utils.metrics import cal_metrics

    return float(cal_metrics(np.asarray(labels, float),
                             np.asarray(probs_real, float), threshold=0.5)["AUC"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--bs", type=int, default=4, help="per-class batch half")
    ap.add_argument("--eval-every", type=int, default=25)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--wd", type=float, default=5e-5)
    ap.add_argument("--out", default="runs/parity")
    ap.add_argument("--artifact", type=float, default=0.10,
                    help="fake-class checkerboard amplitude (lower = harder)")
    ap.add_argument("--model", choices=["udr18", "udeb4"], default="udr18",
                    help="udeb4 = flagship parity at reduced resolution")
    ap.add_argument("--deterministic", action="store_true",
                    help="zero dropout/drop-connect on BOTH sides: isolates "
                         "unalignable stochastic-regularizer RNG from real "
                         "math gaps (expected: correlation jumps)")
    args = ap.parse_args()

    import jax

    if jax.default_backend() not in ("cpu",):
        # fair comparison: both sides on the same CPU (and the torch eager
        # loop cannot run on TPU anyway)
        jax.config.update("jax_platforms", "cpu")

    cfg = {
        "optimizer": {"name": "adamw", "lr": args.lr, "betas": [0.9, 0.999],
                      "weight_decay": args.wd, "amsgrad": True},
        "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
        "lambda_mask": 0.1, "lambda_fac": 0.1,
    }

    print("== generating data ==")
    reals, fakes = make_data(args.size, artifact=args.artifact)
    n_val = 32
    x_val = np.concatenate([reals[-n_val // 2:], fakes[-n_val // 2:]], 0)
    x_val = ((x_val - 0.5) / 0.5).astype(np.float32)
    y_val = np.array([0] * (n_val // 2) + [1] * (n_val // 2))
    train_reals, train_fakes = reals[: -n_val // 2], fakes[: -n_val // 2]

    batches = list(batch_stream(train_reals, train_fakes, args.steps, args.bs))

    print("== building torch reference ==")
    import torch

    eng, tmodel, topt, scaler = build_torch(
        cfg, args.steps, args.lr, args.wd, model_name=args.model, size=args.size,
        deterministic=args.deterministic,
    )
    print("== building unidefense_tpu (same init) ==")
    jmodel, jstate, jstep, jeval = build_jax(
        tmodel, cfg, args.steps, batches[0][0], args.bs, model_name=args.model,
        deterministic=args.deterministic,
    )

    import jax.numpy as jnp

    rng = jax.random.PRNGKey(42)
    hist = {"step": [], "torch_loss": [], "jax_loss": [],
            "eval_step": [], "torch_auc": [], "jax_auc": []}
    t0 = time.time()
    for i, (x, y) in enumerate(batches, start=1):
        topt.zero_grad()  # once per step: pass-2 applies summed grads
        ret = eng.train_unidefense_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(y),
            cur_step=i, grad_scalar=scaler, sum_real=args.bs, sum_fake=args.bs,
        )
        tloss = float(ret["total_loss"])

        jstate, metrics, _ = jstep(
            jstate, {"image": jnp.asarray(x), "label": jnp.asarray(y)},
            jax.random.fold_in(rng, i),
        )
        jloss = float(metrics["total_loss"])
        hist["step"].append(i)
        hist["torch_loss"].append(tloss)
        hist["jax_loss"].append(jloss)

        if i % args.eval_every == 0 or i == args.steps:
            t_probs = torch_eval_probs(tmodel, x_val)
            j_probs = np.asarray(
                jeval(jstate.params, jstate.batch_stats, jnp.asarray(x_val), None)[0]
            )
            t_auc, j_auc = auc(y_val, t_probs), auc(y_val, j_probs)
            hist["eval_step"].append(i)
            hist["torch_auc"].append(t_auc)
            hist["jax_auc"].append(j_auc)
            print(f"step {i:4d}  loss t={tloss:.4f} j={jloss:.4f}  "
                  f"AUC t={t_auc:.4f} j={j_auc:.4f}  ({time.time() - t0:.0f}s)")

    os.makedirs(args.out, exist_ok=True)
    suffix = "_det" if args.deterministic else ""
    out_path = os.path.join(args.out, f"parity_curves{suffix}.json")
    # summary stats: mean |loss gap| over the last half + final AUC gap
    h = len(hist["step"]) // 2
    loss_gap = float(np.mean(np.abs(
        np.asarray(hist["torch_loss"][h:]) - np.asarray(hist["jax_loss"][h:])
    )))
    loss_scale = float(np.mean(np.abs(hist["torch_loss"][h:])))
    summary = {
        "steps": args.steps, "size": args.size, "bs": 2 * args.bs,
        "artifact": args.artifact, "deterministic": args.deterministic,
        "loss_curve_correlation": float(np.corrcoef(
            np.asarray(hist["torch_loss"]), np.asarray(hist["jax_loss"])
        )[0, 1]),
        "final_torch_auc": hist["torch_auc"][-1],
        "final_jax_auc": hist["jax_auc"][-1],
        "auc_gap_final": abs(hist["torch_auc"][-1] - hist["jax_auc"][-1]),
        "mean_abs_loss_gap_last_half": loss_gap,
        "mean_abs_loss_last_half": loss_scale,
        "rel_loss_gap_last_half": loss_gap / max(loss_scale, 1e-9),
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "history": hist}, f)
    print("summary:", json.dumps(summary))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(11, 4))
        a1.plot(hist["step"], hist["torch_loss"], label="reference (torch)", alpha=0.8)
        a1.plot(hist["step"], hist["jax_loss"], label="unidefense_tpu", alpha=0.8)
        a1.set_xlabel("train step"); a1.set_ylabel("pass-1 total loss"); a1.legend()
        a2.plot(hist["eval_step"], hist["torch_auc"], "-o", label="reference (torch)")
        a2.plot(hist["eval_step"], hist["jax_auc"], "-o", label="unidefense_tpu")
        a2.set_xlabel("train step"); a2.set_ylabel("val AUC"); a2.legend()
        fig.tight_layout()
        png_path = os.path.join(args.out, f"parity_curves{suffix}.png")
        fig.savefig(png_path, dpi=120)
        print("wrote", png_path)
    except Exception as e:
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
