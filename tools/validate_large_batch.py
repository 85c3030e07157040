#!/usr/bin/env python
"""Large-batch learning-equivalence proof (VERDICT r4 item 2).

The one live perf lever at 256**2 is batch scaling (210.7 img/s @ b128 vs
163.8 @ b20, BASELINE.md utilization table) — but a bench row is not a
supported configuration until large-batch training is shown to LEARN like
the b10+10 headline. This tool trains the flagship UDEB4 @256**2 through
the real ForgeryEngine on the synthetic separable task (the
validate_learning corpus) at:

  * control:   b10+10  (the headline batch), lr = base
  * treatment: b64+64  (=b128 total, the bench batch), lr = base *
               sqrt(128/20)  — SQRT LR scaling, the standard rule for
               Adam-family optimizers (linear scaling is SGD lore; Adam's
               per-parameter normalization makes sqrt the conservative,
               widely-used choice — documented here as the pick).

Both runs see the SAME NUMBER OF IMAGES and validate at matched
images-seen boundaries, so the comparison is milestone-for-milestone:
images-to-AUC>=0.95, images-to-AUC>=0.99, final AUC, plus finite-BN and
decreasing-triplet checks (per-device batch 128 changes BN batch statistics
and the triplet pool size — the two mechanisms that could break learning).

Equivalence criterion (documented, not post-hoc): the large-batch run must
reach every AUC milestone within 2.0x the control's images-seen and end
within 0.02 final AUC. Either outcome is recorded to
artifacts/large_batch_learning_r05.json.

Reference surface: batch semantics of engine/abstract_engine.py:207-381 at
larger sum_real/sum_fake (the two-pass step splits the batch at the static
real/fake boundary; nothing else in the reference is batch-aware).

Usage (run ALONE on the box — gotcha 7):
  python tools/validate_large_batch.py [--size 256] [--images 6400]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# persistent compile cache (the two UDEB4 programs — b20 and b128 steps with
# different baked kl_switch constants — cost ~5 min each cold)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("UD_JAX_CACHE", "/tmp/ud_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def run_config(tag, root, ds_base, size, batch_half, lr, images, val_every_images,
               workdir, warmup=0):
    """Train UDEB4 through the FE engine; return the val-AUC trajectory
    keyed by images seen."""
    steps = max(1, images // (2 * batch_half))
    val_steps = max(1, val_every_images // (2 * batch_half))
    ds_cfg = dict(ds_base)
    ds_cfg.update(num_steps=steps, val_steps=val_steps,
                  log_steps=max(1, val_steps // 2))
    ds_path = os.path.join(workdir, f"data_{tag}.yml")
    with open(ds_path, "w") as f:
        yaml.dump(ds_cfg, f)

    config = {
        "model": {"name": "UDEB4", "num_classes": 2, "drop_rate": 0.2,
                  "extractor": "efficientnet-b4"},
        "config": {
            "local_rank": 0, "num_devices": 1,
            "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
            "lambda_mask": 0.1, "lambda_fac": 0.1,
            "optimizer": {"name": "adamw", "lr": lr, "betas": [0.9, 0.999],
                          "weight_decay": 5e-6, "amsgrad": True},
            "crop": "nocrop", "warmup_step": warmup, "resume": False,
            "id": f"lb-{tag}", "debug": False, "offline": True,
            "precision": "bf16",
        },
        "data": {"train_batch_size": batch_half, "val_batch_size": 32,
                 "test_batch_size": 32, "file": ds_path},
        "cfg_path": ds_path,
    }

    from unidefense_tpu.engines import get_engine

    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        engine = get_engine("FE")(config, stage="Train")
        engine.train()
    finally:
        os.chdir(cwd)

    # parse the val trajectory from the run's records tee
    import re

    rec = os.path.join(workdir, "runs", "UDEB4", f"lb-{tag}", "records.txt")
    evals = []
    pat = re.compile(r"Eval Step (\d+), EER [\d.naninf-]+, TPR5% [\d.naninf-]+, "
                     r"AUC ([\d.naninf-]+)")
    with open(rec, errors="replace") as f:
        for m in pat.findall(f.read()):
            evals.append({"step": int(m[0]),
                          "images": int(m[0]) * 2 * batch_half,
                          "auc": float(m[1])})
    # triplet trajectory (decreasing-pool sanity at the larger batch)
    tpat = re.compile(r"Train Iter \((\d+)/\d+\), Loss ([\d.naninf-]+), "
                      r"Triplet ([\d.naninf-]+)")
    trips = []
    with open(rec, errors="replace") as f:
        for m in tpat.findall(f.read()):
            trips.append({"step": int(m[0]), "loss": float(m[1]),
                          "triplet": float(m[2])})
    # BN finiteness: the final eval ran through batch_stats — a blown-up BN
    # would NaN the AUC; also check the params/batch_stats trees directly
    import jax
    import jax.numpy as jnp

    finite = bool(jax.tree_util.tree_reduce(
        lambda a, x: a and bool(jnp.all(jnp.isfinite(x))),
        engine.state.batch_stats, True))
    return {"tag": tag, "batch": 2 * batch_half, "lr": lr, "steps": steps,
            "evals": evals, "train": trips, "best_auc": float(engine.best_auc),
            "bn_stats_finite": finite}


def milestone(evals, thresh):
    for e in evals:
        if e["auc"] >= thresh:
            return e["images"]
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--images", type=int, default=6400,
                    help="total train images per run (same for both)")
    ap.add_argument("--val-every-images", type=int, default=1280)
    ap.add_argument("--base-lr", type=float, default=2e-4)
    ap.add_argument("--artifact", type=float, default=0.10)
    ap.add_argument("--lr-rule", choices=["sqrt", "linear"], default="sqrt",
                    help="large-batch LR scaling rule (documented in the "
                         "artifact; the passing rule becomes THE recipe)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="warmup_step for the large-batch run (standard "
                         "large-batch practice alongside linear scaling)")
    ap.add_argument("--reuse-control", default=None,
                    help="path to a prior artifact whose 'control' run is "
                         "reused (the control config is unchanged between "
                         "rule attempts; re-running it is pure cost)")
    ap.add_argument("--batch-half", type=int, default=64,
                    help="large-batch per-class half (64 = the b128 bench "
                         "batch; 32 probes the intermediate b64 rung)")
    ap.add_argument("--out", default=os.path.join(REPO, "artifacts",
                                                  "large_batch_learning_r05.json"))
    args = ap.parse_args()

    from tools.validate_learning import make_dataset

    tmp = tempfile.mkdtemp(prefix="ud_lb_")
    root = os.path.join(tmp, "ffpp")
    make_dataset(root, args.size)

    tf = [{"name": "Resize", "params": {"height": args.size, "width": args.size}},
          {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}}]
    ds_base = {
        "root": root, "name": "FFpp", "use_lmdb": False,
        "real_method": ["Origin"], "fake_method": ["Deepfakes"],
        "compression": "c23",
        "train_transforms": tf[:1] + [{"name": "HorizontalFlip",
                                       "params": {"p": 0.5}}] + tf[1:],
        "val_transforms": tf, "test_transforms": tf,
    }

    big_batch = 2 * args.batch_half
    scale = (float(np.sqrt(big_batch / 20.0)) if args.lr_rule == "sqrt"
             else big_batch / 20.0)
    big_lr = args.base_lr * scale
    # adjacent runs, same process: control first (or reused), then treatment
    if args.reuse_control:
        with open(args.reuse_control) as f:
            ctrl = json.load(f)["control"]
        print(f"reusing control from {args.reuse_control}")
    else:
        ctrl = run_config("b20", root, ds_base, args.size, 10, args.base_lr,
                          args.images, args.val_every_images, tmp)
    big = run_config(f"b{big_batch}", root, ds_base, args.size,
                     args.batch_half, big_lr,
                     args.images, args.val_every_images, tmp,
                     warmup=args.warmup)

    report = {"size": args.size, "images": args.images,
              "lr_rule": "%s (lr * %.3f = %.6f), warmup_step=%d"
                         % (args.lr_rule, scale, big_lr, args.warmup),
              "control": ctrl, "large_batch": big}
    verdict = {"pass": True, "reasons": []}
    for th in (0.95, 0.99):
        mc, mb = milestone(ctrl["evals"], th), milestone(big["evals"], th)
        report[f"images_to_auc_{th}"] = {"control": mc, "large_batch": mb}
        if mc is not None and (mb is None or mb > 2.0 * mc):
            verdict["pass"] = False
            verdict["reasons"].append(
                f"AUC>={th}: control at {mc} images, large-batch at {mb}")
    gap = abs(ctrl["best_auc"] - big["best_auc"])
    report["final_auc_gap"] = gap
    if gap > 0.02:
        verdict["pass"] = False
        verdict["reasons"].append(f"final best-AUC gap {gap:.4f} > 0.02")
    if not big["bn_stats_finite"]:
        verdict["pass"] = False
        verdict["reasons"].append("non-finite BN stats at b128")
    tr = [t["triplet"] for t in big["train"]]
    report["triplet_first_last"] = [tr[0], tr[-1]] if tr else None
    if tr and tr[-1] > tr[0]:
        verdict["reasons"].append(
            "note: running-mean triplet did not decrease (informational)")
    report["verdict"] = verdict

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("control", "large_batch")}, indent=1))
    print("control evals:", ctrl["evals"])
    print("large-batch evals:", big["evals"])
    print("wrote", args.out)
    print("LARGE-BATCH LEARNING:", "EQUIVALENT" if verdict["pass"] else "NOT EQUIVALENT")


if __name__ == "__main__":
    main()
