#!/usr/bin/env python
"""Engine-level A/B: the reference's OWN CLI vs ours, same corpus + YAML.

Step-level parity (tools/parity_curves.py) drives the two train-step
implementations directly; this harness instead runs the FULL engine loops —
`/root/reference/main.py --engine FE|OCIM|UE` (via tools/ref_cpu_shim.py, single
process, gloo, CPU) and this repo's `main.py` — on the same synthetic
learnable corpus with the same YAMLs, then compares:

* val metric trajectories (AUC for FE; frame-ACER/AUC + the EER threshold
  carried to test for UE, engine/uniattack_engine.py:407-476),
* best-checkpoint bookkeeping,
* final `--test` printed metrics.

Round-5 additions (VERDICT r4 items 1+3):
* --same-init (DEFAULT ON): both sides start from IDENTICAL weights. The
  reference side constructs its model first and saves its state_dict in the
  reference's own {'model': sd} format (shim hook, UD_AB_INIT_STATE); our
  side converts that file through the models/convert bridge
  (config.init_weights). Turns band agreement into pointwise claims.
* shipped-config shape: --crop 4p (default for OCIM — the real margin
  protocol, train (0.0,0.5) / val 0.3, engine/ocim_engine.py:84-85),
  --warmup N + --sched-step/--sched-gamma (the shipped FE/UE recipe,
  engine/forgery_engine.py:269-272, config_template/forgery/
  model_udeb4.yml:22-26).
* --model UDEB4: flagship engine-level A/B at small res (reference built
  via from_name with image_size pinned — the UD_SLOW golden shim).
* --distorted: UE Protocol-I corruption OneOf through the full test flow
  (dataset/uniattack.py:90-107).
* --deterministic: zero dropout/drop-connect on BOTH sides via the shared
  config.deterministic_regularization key (r4 isolation precedent).
* train-loss trajectory correlation (running-average 'Train Iter' lines,
  now format-identical on both sides).

Usage:
  python tools/engine_ab.py --engine FE --steps 60 --warmup 10 --sched-step 25
  python tools/engine_ab.py --engine UE --steps 40 --distorted
  python tools/engine_ab.py --engine OCIM --steps 60            # crop 4p
  python tools/engine_ab.py --engine FE --model UDEB4 --deterministic
Writes runs/engine_ab/<engine>/result.json (+ per-side logs); pass --out to
keep earlier runs of record intact.
"""

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# ------------------------------------------------------------------ corpus

def _seed(*parts) -> int:
    """Deterministic per-frame seed. Python's hash() is salted per process
    (PYTHONHASHSEED), which would regenerate a DIFFERENT corpus on every
    invocation and make committed A/B results unreproducible."""
    import zlib

    return zlib.crc32("|".join(map(str, parts)).encode())


def _blob(size, seed):
    import cv2

    g = np.random.default_rng(seed % 2**31)
    img = g.random((size // 8, size // 8, 3)).astype(np.float32)
    img = cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 1)


def _jpg_bytes(size, seed, fake, artifact):
    """Learnable separable classes (same construction as parity_curves):
    fakes carry a checkerboard spectral artifact. JPEG q95 keeps it."""
    import cv2

    img = _blob(size, seed)
    if fake:
        cb = ((np.arange(size)[:, None] + np.arange(size)[None, :]) % 2).astype(np.float32)
        img = np.clip(img + artifact * cb[:, :, None], 0, 1)
    u8 = (img * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", u8[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    return enc.tobytes()


def build_fe_corpus(root, size=64, artifact=0.15,
                    train_videos=12, eval_videos=4, frames=4):
    """File-backed FF++ tree (use_lmdb false on both sides): JPEG files +
    pickle_files/{split}_c23.pickle index (dataset/faceforensics.py:40-55)."""
    import torch

    os.makedirs(os.path.join(root, "pickle_files"), exist_ok=True)
    splits = {"train": range(train_videos),
              "val": range(train_videos, train_videos + eval_videos),
              "test": range(train_videos + eval_videos,
                            train_videos + 2 * eval_videos)}
    for split, vids in splits.items():
        index = []
        for kind, fake in (("original_sequences/youtube", False),
                           ("manipulated_sequences/Deepfakes", True)):
            for v in vids:
                for f in range(frames):
                    rel = f"{kind}/c23/images/{v:03d}/{f:04d}.jpg"
                    full = os.path.join(root, rel)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    with open(full, "wb") as fh:
                        fh.write(_jpg_bytes(size, _seed(kind, v, f), fake, artifact))
                    index.append((rel, 1 if fake else 0))
        torch.save(index, os.path.join(root, "pickle_files", f"{split}_c23.pickle"))


def build_ue_corpus(base, size=64, artifact=0.15, videos=6, frames=4):
    """UniAttack FFpp + OULU subsets in BOTH store formats from the same
    bytes: plain files under <root>/lmdb/<env>/ (read by the shim's
    directory-backed lmdb) and a FrameStore .udb (read by our loader)."""
    import torch

    from unidefense_tpu.data.store import FrameStoreWriter

    ffpp_root = os.path.join(base, "FFpp")
    oulu_root = os.path.join(base, "OULU")

    # FFpp: keys = raw paths (uniattack.py:151-152 nocrop keeps FFpp paths)
    os.makedirs(os.path.join(ffpp_root, "pickle_files"), exist_ok=True)
    env_dir = os.path.join(ffpp_root, "lmdb", "FaceForensics++")
    w = FrameStoreWriter(os.path.join(ffpp_root, "lmdb", "FaceForensics++.udb"))
    for split in ("train", "val", "test"):
        index = []
        for kind, fake in (("original_sequences/youtube", False),
                           ("manipulated_sequences/Deepfakes", True)):
            for v in range(videos):
                for f in range(frames):
                    rel = f"{kind}/c23/images/{split}_{v:03d}/{f:04d}.jpg"
                    data = _jpg_bytes(size, _seed("ff", split, kind, v, f), fake, artifact)
                    full = os.path.join(env_dir, rel)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    with open(full, "wb") as fh:
                        fh.write(data)
                    w.add(rel, data)
                    index.append((rel, 1 if fake else 0))
        torch.save(index, os.path.join(ffpp_root, "pickle_files", f"{split}_c23.pickle"))
    w.close()

    # OULU: lists/{real,fake}_5points.pickle, split by Train/Dev/Test_files in
    # the path; keys carry the Oulu_NPU -> Oulu_NPU_crop rewrite
    os.makedirs(os.path.join(oulu_root, "lists"), exist_ok=True)
    env_dir = os.path.join(oulu_root, "lmdb", "Oulu_NPU")
    w = FrameStoreWriter(os.path.join(oulu_root, "lmdb", "Oulu_NPU.udb"))
    for label, fake in (("real", False), ("fake", True)):
        items = []
        for split_dir in ("Train_files", "Dev_files", "Test_files"):
            for v in range(videos):
                for f in range(frames):
                    rel = f"Oulu_NPU/{split_dir}/{label}_v{v}/f{f}.jpg"
                    items.append(f"{rel} lm 5 5 25 25")
                    key = rel.replace("Oulu_NPU", "Oulu_NPU_crop")
                    data = _jpg_bytes(size, _seed("ou", split_dir, label, v, f), fake, artifact)
                    full = os.path.join(env_dir, key)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    with open(full, "wb") as fh:
                        fh.write(data)
                    w.add(key, data)
        torch.save(items, os.path.join(oulu_root, "lists", f"{label}_5points.pickle"))
    w.close()
    return ffpp_root, oulu_root


OCIM_DOMAINS = {"O": "Oulu_NPU", "C": "CASIA_database",
                "I": "replayattack", "M": "MSU-MFSD"}


def build_ocim_corpus(base, size=64, artifact=0.15, videos=6, frames=4):
    """OCIM 4-domain FAS corpus under ONE shared root (dataset/ocim.py:11-49:
    lists at <root>/<D_root>/lists/{real,fake}_5points.pickle, lmdb env at
    <root>/lmdb/<D_root> with crop-rewritten keys,
    dataset/abstract_dataset.py:83-98). Images land in BOTH store formats:
    plain files for the shim's directory-backed lmdb and a FrameStore .udb
    for our loader. Domains get a per-domain seed stream so coral/triplet
    see distinct styles."""
    import torch

    from unidefense_tpu.data.store import FrameStoreWriter

    for domain_dir in OCIM_DOMAINS.values():
        os.makedirs(os.path.join(base, domain_dir, "lists"), exist_ok=True)
        env_dir = os.path.join(base, "lmdb", domain_dir)
        w = FrameStoreWriter(os.path.join(base, "lmdb", f"{domain_dir}.udb"))
        for label, fake in (("real", False), ("fake", True)):
            items = []
            for v in range(videos):
                for f in range(frames):
                    rel = f"{domain_dir}/videos/{label}_v{v}/f{f}.jpg"
                    items.append(f"{rel} lm 5 5 25 25")
                    key = rel.replace(domain_dir, f"{domain_dir}_crop")
                    data = _jpg_bytes(size, _seed("ocim", domain_dir, label, v, f),
                                      fake, artifact)
                    full = os.path.join(env_dir, key)
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    with open(full, "wb") as fh:
                        fh.write(data)
                    w.add(key, data)
            torch.save(items, os.path.join(
                base, domain_dir, "lists", f"{label}_5points.pickle"))
        w.close()
    return base


# ------------------------------------------------------------------ configs

def _transforms(size, flip=True):
    train = [
        {"name": "Resize", "params": {"height": size, "width": size}},
        {"name": "HorizontalFlip", "params": {"p": 0.5}},
        {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
    ]
    eval_ = [train[0], train[2]]
    if not flip:
        # maximum-alignment mode: drop the only stochastic train transform so
        # (with --deterministic) the residual divergence between sides is
        # batch ORDER alone — the tightest engine-level comparison the
        # unalignable-RNG boundary permits
        train = eval_
    return train, eval_


def _model_section(model_name):
    if model_name == "UDEB4":
        return {"name": "UDEB4", "num_classes": 2, "drop_rate": 0.2,
                "extractor": "efficientnet-b4"}
    return {"name": "UDR18", "num_classes": 2, "extractor": "resnet18"}


def _config_section(work, args, extra=None):
    """The shared `config:` block. init_weights / deterministic_regularization
    are additive keys OUR engine honors (engines/base.py); the reference
    ignores the former and the shim honors the latter — one YAML drives both
    sides."""
    cfg = {
        "distribute": {"backend": "gloo"}, "find_unused": True,
        "warmup_step": args.warmup,
        "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
        "lambda_mask": 0.1, "lambda_fac": 0.1,
        "optimizer": {"name": "adamw", "lr": 1e-4, "betas": [0.9, 0.999],
                      "weight_decay": 5e-5, "amsgrad": True},
        "crop": args.crop, "resume": False, "id": "ab", "debug": False,
    }
    if args.sched_step:
        cfg["scheduler"] = {"name": "StepLR", "step_size": args.sched_step,
                            "gamma": args.sched_gamma}
    if args.same_init:
        cfg["init_weights"] = os.path.join(work, "init_state.pth")
    if args.deterministic:
        cfg["deterministic_regularization"] = True
    cfg.update(extra or {})
    return cfg


def _write_yamls(work, ds, model):
    import yaml

    with open(os.path.join(work, "data.yml"), "w") as f:
        yaml.dump(ds, f)
    with open(os.path.join(work, "model.yml"), "w") as f:
        yaml.dump(model, f)
    return os.path.join(work, "model.yml")


def write_fe_configs(work, corpus_root, size, steps, val_steps, bs, args):
    train_tf, eval_tf = _transforms(size, flip=not args.no_flip)
    ds = {
        "name": "FFpp", "root": corpus_root, "use_lmdb": False,
        "real_method": ["Origin"], "fake_method": ["Deepfakes"],
        "compression": "c23",
        "num_steps": steps, "log_steps": max(1, val_steps // 2), "val_steps": val_steps,
        "train_transforms": train_tf, "val_transforms": eval_tf,
        "test_transforms": eval_tf,
    }
    model = {
        "model": _model_section(args.model),
        "config": _config_section(work, args),
        "data": {"train_batch_size": bs, "val_batch_size": 8,
                 "test_batch_size": 8, "num_workers": 0,
                 "file": os.path.join(work, "data.yml")},
    }
    return _write_yamls(work, ds, model)


def write_ue_configs(work, ffpp_root, oulu_root, size, steps, val_steps, bs, args):
    train_tf, eval_tf = _transforms(size, flip=not args.no_flip)
    ds = {
        "name": "UniAttack", "root": work,
        "FFpp_root": ffpp_root, "OULU_root": oulu_root,
        "CDF_root": None, "SeqDF_root": None, "HQ_root": None,
        "SiWMv2_root": None,
        "train_real_method": ["FFpp-Real", "OULU-Real"],
        "train_fake_method": ["FFpp-DF", "OULU-Fake"],
        "val_real_method": ["FFpp-Real"], "val_fake_method": ["FFpp-DF"],
        "test_method": ["OULU-Real", "OULU-Fake"],
        "num_steps": steps, "log_steps": max(1, val_steps // 2), "val_steps": val_steps,
        "train_transforms": train_tf, "val_transforms": eval_tf,
        "test_transforms": eval_tf,
    }
    if args.distorted:
        # Protocol-I corruption OneOf applied to the test split on BOTH
        # sides (dataset/uniattack.py:90-107)
        ds["distorted"] = True
    model = {
        "model": _model_section(args.model),
        "config": _config_section(work, args, {"use_domain_label": False}),
        "data": {"train_batch_size": bs, "val_batch_size": 8,
                 "test_batch_size": 8, "num_workers": 0,
                 "file": os.path.join(work, "data.yml")},
    }
    return _write_yamls(work, ds, model)


def write_ocim_configs(work, corpus_root, size, steps, val_steps, bs, args):
    """Mirror config_template/ocim/{model_udr18,data_*}.yml: train on three
    domains, dev/test on the held-out fourth (leave-one-out protocol). The
    per-sub-loader train_batch_size makes the step batch 6*bs (3 domains x
    real/fake pairs, engine/ocim_engine.py:235-252). With crop '4p' (the
    round-5 default) the real margin protocol runs on both sides: random
    train margin drawn per batch from (0.0, 0.5), fixed val margin 0.3
    (engine/ocim_engine.py:84-85 defaults, taken by both engines)."""
    train_tf, eval_tf = _transforms(size, flip=not args.no_flip)
    ds = {
        "root": corpus_root, "use_lmdb": True,
        **{f"{k}_root": v for k, v in OCIM_DOMAINS.items()},
        "train_dataset": ["C", "I", "M"],
        "dev_dataset": ["O"], "test_dataset": ["O"],
        "num_steps": steps, "log_steps": max(1, val_steps // 2), "val_steps": val_steps,
        "train_transforms": train_tf, "dev_transforms": eval_tf,
        "test_transforms": eval_tf,
    }
    model = {
        "model": _model_section(args.model),
        "config": _config_section(work, args),
        "data": {"train_batch_size": bs, "val_batch_size": 8,
                 "test_batch_size": 8, "num_workers": 0,
                 "file": os.path.join(work, "data.yml")},
    }
    return _write_yamls(work, ds, model)


# ------------------------------------------------------------------ running

def _run(cmd, cwd, log_path, timeout, env_extra=None):
    os.makedirs(cwd, exist_ok=True)
    env = None
    if env_extra:
        env = dict(os.environ)
        env.update(env_extra)
    with open(log_path, "w") as log:
        proc = subprocess.run(cmd, cwd=cwd, stdout=log, stderr=subprocess.STDOUT,
                              timeout=timeout, env=env)
    if proc.returncode != 0:
        with open(log_path) as f:
            tail = f.read()[-4000:]
        raise RuntimeError(f"{' '.join(cmd[:4])}... failed rc={proc.returncode}\n{tail}")


def run_reference(engine, model_yml, cwd, timeout, test=False, env_extra=None):
    cmd = [sys.executable, os.path.join(REPO, "tools", "ref_cpu_shim.py"),
           "--config", model_yml, "--engine", engine]
    if test:
        cmd.append("--test")
    _run(cmd, cwd, os.path.join(cwd, "test_stdout.log" if test else "train_stdout.log"),
         timeout, env_extra=env_extra)


def run_ours(engine, model_yml, cwd, timeout, test=False, env_extra=None):
    # force CPU before any jax use (the baked sitecustomize overrides the
    # JAX_PLATFORMS env var, CLAUDE.md gotcha 1)
    code = (
        f"import sys; sys.path.insert(0, {REPO!r});"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys, runpy;"
        f"sys.argv=['main.py','--config',{model_yml!r},'--engine',{engine!r}"
        + (",'--test'" if test else "") + "];"
        f"runpy.run_path({os.path.join(REPO, 'main.py')!r}, run_name='__main__')"
    )
    _run([sys.executable, "-c", code], cwd,
         os.path.join(cwd, "test_stdout.log" if test else "train_stdout.log"),
         timeout, env_extra=env_extra)


# ------------------------------------------------------------------ parsing

FE_EVAL = re.compile(
    r"Eval Step (\d+), EER ([\d.naninf-]+), TPR5% ([\d.naninf-]+), "
    r"AUC ([\d.naninf-]+), ACC ([\d.naninf-]+)")
FE_BEST = re.compile(r"Best Step (\d+), Best AUC ([\d.]+), Best ACC ([\d.]+)")
FE_TEST = re.compile(
    r"Test \| EER ([\d.naninf-]+), HTER ([\d.naninf-]+), TPR 5% ([\d.naninf-]+), "
    r"AUC ([\d.naninf-]+), Thres ([\d.naninf-]+), ACC ([\d.naninf-]+)")

OCIM_EVAL = re.compile(
    r"Eval Step (\d+), EER ([\d.naninf-]+), HTER ([\d.naninf-]+), "
    r"TPR5% ([\d.naninf-]+), AUC ([\d.naninf-]+), Thres ([\d.naninf-]+), "
    r"ACC ([\d.naninf-]+)")
OCIM_BEST = re.compile(r"Best Step (\d+), Best AUC ([\d.]+), Best HTER ([\d.]+)")
# the OCIM test line has the same shape as FE's (both engines print
# "Test | EER .., HTER .., TPR 5% .., AUC .., Thres .., ACC ..") — FE_TEST
# is reused for it below.

UE_EVAL = re.compile(
    r"Eval(?: Step (-?\d+))? \[Frame\], ACER ([\d.naninf-]+), AUC ([\d.naninf-]+), "
    r"Thres ([\d.naninf-]+)")
UE_TEST = re.compile(
    r"Test(?: Step (-?\d+))? \[(Video|Frame)\], EER ([\d.naninf-]+), "
    r"APCER ([\d.naninf-]+), BPCER ([\d.naninf-]+), ACER ([\d.naninf-]+), "
    r"TPR5% ([\d.naninf-]+), AUC ([\d.naninf-]+), Thres ([\d.naninf-]+)")


# running-average train loss ("Train Iter (N/M), Loss X, ..."): both sides
# print the reference's exact line (AverageMeter .avg semantics). The
# reference's copy lives in tqdm bar redraws -> parse the raw stdout log;
# the last occurrence per step wins.
TRAIN_ITER = re.compile(
    r"Train Iter \((\d+)/\d+\), Loss ([\d.naninf-]+)"
    r"(?:.*?LR ([\d.naninf-]+))?")


def parse_loss_curve(*paths):
    d = {}
    for p in paths:
        if p and os.path.exists(p):
            with open(p, errors="replace") as f:
                for m in TRAIN_ITER.findall(f.read()):
                    d[int(m[0])] = (float(m[1]),
                                    float(m[2]) if m[2] else None)
    return d


def compare_losses(ref_losses, ours_losses):
    steps = sorted(set(ref_losses) & set(ours_losses))
    r = [ref_losses[s][0] for s in steps]
    o = [ours_losses[s][0] for s in steps]
    # per-step LR gap: pointwise check of the warmup-ramp + scheduler wiring
    # (reference sets warmup LR on the param groups per step and steps the
    # scheduler once per train step after warmup; ours folds both into the
    # optax schedule — train/optim.py:build_lr_schedule)
    lr_gaps = [abs(ref_losses[s][1] - ours_losses[s][1]) for s in steps
               if ref_losses[s][1] is not None and ours_losses[s][1] is not None]
    return {
        "n_common_steps": len(steps),
        "steps": steps,
        "ref": r,
        "ours": o,
        "train_loss_correlation": _corr(r, o),
        "final_train_loss_gap": abs(r[-1] - o[-1]) if steps else None,
        "max_lr_gap": max(lr_gaps) if lr_gaps else None,
    }


def parse_fe(records_txt, test_txt):
    text = open(records_txt).read()
    evals = [{"step": int(m[0]), "EER": float(m[1]), "AUC": float(m[3]),
              "ACC": float(m[4])} for m in FE_EVAL.findall(text)]
    bests = FE_BEST.findall(text)
    best = ({"step": int(bests[-1][0]), "AUC": float(bests[-1][1]),
             "ACC": float(bests[-1][2])} if bests else None)
    test = None
    if test_txt and os.path.exists(test_txt):
        m = FE_TEST.findall(open(test_txt).read())
        if m:
            m = m[-1]
            test = {"EER": float(m[0]), "HTER": float(m[1]), "AUC": float(m[3]),
                    "ACC": float(m[5])}
    return {"evals": evals, "best": best, "test": test}


def parse_ocim(records_txt, test_txt):
    text = open(records_txt).read()
    evals = [{"step": int(m[0]), "EER": float(m[1]), "HTER": float(m[2]),
              "AUC": float(m[4]), "ACC": float(m[6])}
             for m in OCIM_EVAL.findall(text)]
    bests = OCIM_BEST.findall(text)
    best = ({"step": int(bests[-1][0]), "AUC": float(bests[-1][1]),
             "HTER": float(bests[-1][2])} if bests else None)
    test = None
    if test_txt and os.path.exists(test_txt):
        m = FE_TEST.findall(open(test_txt).read())
        if m:
            m = m[-1]
            test = {"EER": float(m[0]), "HTER": float(m[1]), "AUC": float(m[3]),
                    "ACC": float(m[5])}
    return {"evals": evals, "best": best, "test": test}


def parse_ue(records_txt, test_txt):
    text = open(records_txt).read()
    evals = [{"step": int(m[0]) if m[0] else None, "ACER": float(m[1]),
              "AUC": float(m[2]), "Thres": float(m[3])}
             for m in UE_EVAL.findall(text)]
    tests = [{"step": int(m[0]) if m[0] else None, "level": m[1],
              "ACER": float(m[5]), "AUC": float(m[7]), "Thres": float(m[8])}
             for m in UE_TEST.findall(text)]
    final = {}
    if test_txt and os.path.exists(test_txt):
        for m in UE_TEST.findall(open(test_txt).read()):
            final[m[1]] = {"ACER": float(m[5]), "AUC": float(m[7])}
    return {"evals": evals, "tests": tests, "final_test": final}


# ------------------------------------------------------------------ compare

def _corr(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    if n < 2 or np.std(a) < 1e-12 or np.std(b) < 1e-12:
        return None
    return float(np.corrcoef(a, b)[0, 1])


def _max_gap(a, b):
    """Pointwise max |ref-ours| over the common prefix — the stat that stays
    meaningful when a trajectory saturates (constant series make correlation
    undefined; identical-constant series are max_gap 0, the strongest case)."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    n = min(len(a), len(b))
    if n == 0:
        return None
    return float(np.max(np.abs(a[:n] - b[:n])))


def compare_fe(ref, ours):
    r_auc = [e["AUC"] for e in ref["evals"]]
    o_auc = [e["AUC"] for e in ours["evals"]]
    out = {
        "n_evals": {"ref": len(r_auc), "ours": len(o_auc)},
        "val_auc_trajectory": {"ref": r_auc, "ours": o_auc},
        "val_auc_correlation": _corr(r_auc, o_auc),
        "val_auc_max_gap": _max_gap(r_auc, o_auc),
        "final_val_auc_gap": (abs(r_auc[-1] - o_auc[-1])
                              if r_auc and o_auc else None),
        "best": {"ref": ref["best"], "ours": ours["best"]},
        "test": {"ref": ref["test"], "ours": ours["test"]},
    }
    if ref["test"] and ours["test"]:
        out["test_auc_gap"] = abs(ref["test"]["AUC"] - ours["test"]["AUC"])
        out["test_acc_gap"] = abs(ref["test"]["ACC"] - ours["test"]["ACC"])
    return out


def compare_ocim(ref, ours):
    """val-AUC + val-(AUC-HTER) trajectories (the best-checkpoint rule is
    max(AUC-HTER), engine/ocim_engine.py:393-397) and final --test gaps."""
    r_auc = [e["AUC"] for e in ref["evals"]]
    o_auc = [e["AUC"] for e in ours["evals"]]
    r_sel = [e["AUC"] - e["HTER"] for e in ref["evals"]]
    o_sel = [e["AUC"] - e["HTER"] for e in ours["evals"]]
    out = {
        "n_evals": {"ref": len(r_auc), "ours": len(o_auc)},
        "val_auc_trajectory": {"ref": r_auc, "ours": o_auc},
        "val_auc_correlation": _corr(r_auc, o_auc),
        "val_auc_max_gap": _max_gap(r_auc, o_auc),
        "val_selection_metric_correlation": _corr(r_sel, o_sel),
        "final_val_auc_gap": (abs(r_auc[-1] - o_auc[-1])
                              if r_auc and o_auc else None),
        "best": {"ref": ref["best"], "ours": ours["best"]},
        "test": {"ref": ref["test"], "ours": ours["test"]},
    }
    if ref["test"] and ours["test"]:
        out["test_auc_gap"] = abs(ref["test"]["AUC"] - ours["test"]["AUC"])
        out["test_hter_gap"] = abs(ref["test"]["HTER"] - ours["test"]["HTER"])
        out["test_acc_gap"] = abs(ref["test"]["ACC"] - ours["test"]["ACC"])
    return out


def compare_ue(ref, ours):
    r_auc = [e["AUC"] for e in ref["evals"]]
    o_auc = [e["AUC"] for e in ours["evals"]]
    r_tacer = [t["ACER"] for t in ref["tests"] if t["level"] == "Frame"]
    o_tacer = [t["ACER"] for t in ours["tests"] if t["level"] == "Frame"]
    out = {
        "n_evals": {"ref": len(r_auc), "ours": len(o_auc)},
        "val_auc_trajectory": {"ref": r_auc, "ours": o_auc},
        "val_auc_correlation": _corr(r_auc, o_auc),
        "val_auc_max_gap": _max_gap(r_auc, o_auc),
        "test_frame_acer_trajectory": {"ref": r_tacer, "ours": o_tacer},
        "test_frame_acer_correlation": _corr(r_tacer, o_tacer),
        "test_frame_acer_max_gap": _max_gap(r_tacer, o_tacer),
        "final_test": {"ref": ref["final_test"], "ours": ours["final_test"]},
    }
    for lvl in ("Frame", "Video"):
        if lvl in ref["final_test"] and lvl in ours["final_test"]:
            out[f"final_{lvl.lower()}_auc_gap"] = abs(
                ref["final_test"][lvl]["AUC"] - ours["final_test"][lvl]["AUC"])
            out[f"final_{lvl.lower()}_acer_gap"] = abs(
                ref["final_test"][lvl]["ACER"] - ours["final_test"][lvl]["ACER"])
    return out


# ------------------------------------------------------------------ main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", choices=["FE", "UE", "OCIM"], default="FE")
    ap.add_argument("--model", choices=["UDR18", "UDEB4"], default="UDR18")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--val-steps", type=int, default=15)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--bs", type=int, default=3, help="per-class batch half")
    ap.add_argument("--artifact", type=float, default=0.15)
    ap.add_argument("--train-videos", type=int, default=12)
    ap.add_argument("--eval-videos", type=int, default=4,
                    help="videos per class per eval split (FE) / per list (UE)")
    ap.add_argument("--crop", choices=["nocrop", "4p"], default=None,
                    help="default: 4p for OCIM (the shipped margin protocol), "
                         "nocrop otherwise (FE pickles carry no bbox points)")
    ap.add_argument("--warmup", type=int, default=0,
                    help="warmup_step (reference per-step LR ramp)")
    ap.add_argument("--sched-step", type=int, default=0,
                    help="StepLR step_size (0 = no scheduler)")
    ap.add_argument("--sched-gamma", type=float, default=0.5)
    ap.add_argument("--distorted", action="store_true",
                    help="UE only: Protocol-I corruption OneOf on the test split")
    ap.add_argument("--same-init", dest="same_init", action="store_true",
                    default=True,
                    help="seed both sides from the SAME weights (default on): "
                         "reference saves its init, ours converts it")
    ap.add_argument("--no-same-init", dest="same_init", action="store_false")
    ap.add_argument("--no-flip", action="store_true",
                    help="drop HorizontalFlip from train transforms "
                         "(maximum-alignment rung with --deterministic)")
    ap.add_argument("--deterministic", action="store_true",
                    help="zero dropout/drop-connect on both sides "
                         "(config.deterministic_regularization)")
    ap.add_argument("--align-order", dest="align_order", action="store_true",
                    help="make OUR sampler emit the reference's exact "
                         "DistributedSampler shuffle order "
                         "(UD_SAMPLER_TORCH_ORDER) and force the cv2 decode "
                         "path (UD_DISABLE_NATIVE) so both sides consume "
                         "identical per-step batches. With --no-flip "
                         "--deterministic this is the maximum-alignment "
                         "rung: the residual gap is pure numerics.")
    ap.add_argument("--timeout", type=int, default=5400, help="per subprocess")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.crop is None:
        args.crop = "4p" if args.engine == "OCIM" else "nocrop"

    work = os.path.abspath(args.out or os.path.join("runs", "engine_ab", args.engine.lower()))
    os.makedirs(work, exist_ok=True)

    print(f"== building corpus under {work} ==")
    if args.engine == "FE":
        corpus = os.path.join(work, "corpus")
        build_fe_corpus(corpus, size=args.size, artifact=args.artifact,
                        train_videos=args.train_videos,
                        eval_videos=args.eval_videos)
        model_yml = write_fe_configs(work, corpus, args.size, args.steps,
                                     args.val_steps, args.bs, args)
    elif args.engine == "OCIM":
        corpus = build_ocim_corpus(os.path.join(work, "corpus"),
                                   size=args.size, artifact=args.artifact,
                                   videos=args.eval_videos)
        model_yml = write_ocim_configs(work, corpus, args.size, args.steps,
                                       args.val_steps, args.bs, args)
    else:
        ffpp, oulu = build_ue_corpus(os.path.join(work, "corpus"),
                                     size=args.size, artifact=args.artifact,
                                     videos=args.eval_videos)
        model_yml = write_ue_configs(work, ffpp, oulu, args.size, args.steps,
                                     args.val_steps, args.bs, args)

    ref_cwd = os.path.join(work, "ref")
    ours_cwd = os.path.join(work, "ours")
    # fresh slate: both engines refuse to reuse an existing run id, so a
    # re-run into the same --out must clear the previous run dirs (and a
    # stale shared-init file must not leak into a new corpus/model shape)
    import shutil

    for d in (ref_cwd, ours_cwd):
        shutil.rmtree(d, ignore_errors=True)
    init_path = os.path.join(work, "init_state.pth")
    if os.path.exists(init_path):
        os.remove(init_path)

    # reference-side env: seeded for reproducibility of the committed
    # results; UD_AB_INIT_STATE makes the first model construction save its
    # init (our side then converts the same file via config.init_weights);
    # UD_AB_IMAGE_SIZE pins UDEB4's static SAME padding to the run's size
    ref_env = {"UD_AB_SEED": "0"}
    if args.same_init:
        ref_env["UD_AB_INIT_STATE"] = init_path
    if args.model == "UDEB4":
        ref_env["UD_AB_IMAGE_SIZE"] = str(args.size)

    print("== reference train (torch CPU, gloo, via ref_cpu_shim) ==")
    run_reference(args.engine, model_yml, ref_cwd, args.timeout, env_extra=ref_env)
    if args.same_init:
        assert os.path.exists(init_path), "shim did not save the shared init"
    print("== reference test ==")
    run_reference(args.engine, model_yml, ref_cwd, args.timeout, test=True,
                  env_extra=ref_env)
    ours_env = None
    if args.align_order:
        ours_env = {"UD_SAMPLER_TORCH_ORDER": "1", "UD_DISABLE_NATIVE": "1"}
    print("== ours train (jax CPU) ==")
    run_ours(args.engine, model_yml, ours_cwd, args.timeout, env_extra=ours_env)
    print("== ours test ==")
    run_ours(args.engine, model_yml, ours_cwd, args.timeout, test=True,
             env_extra=ours_env)

    run_rel = os.path.join("runs", args.model, "ab")
    if args.engine == "FE":
        ref = parse_fe(os.path.join(ref_cwd, run_rel, "records.txt"),
                       os.path.join(ref_cwd, run_rel, "test.txt"))
        ours = parse_fe(os.path.join(ours_cwd, run_rel, "records.txt"),
                        os.path.join(ours_cwd, run_rel, "test.txt"))
        result = compare_fe(ref, ours)
    elif args.engine == "OCIM":
        ref = parse_ocim(os.path.join(ref_cwd, run_rel, "records.txt"),
                         os.path.join(ref_cwd, run_rel, "test.txt"))
        ours = parse_ocim(os.path.join(ours_cwd, run_rel, "records.txt"),
                          os.path.join(ours_cwd, run_rel, "test.txt"))
        result = compare_ocim(ref, ours)
    else:
        ref = parse_ue(os.path.join(ref_cwd, run_rel, "records.txt"),
                       os.path.join(ref_cwd, run_rel, "test.txt"))
        ours = parse_ue(os.path.join(ours_cwd, run_rel, "records.txt"),
                        os.path.join(ours_cwd, run_rel, "test.txt"))
        result = compare_ue(ref, ours)

    # pointwise train-loss trajectory (reference: tqdm redraws in the raw
    # stdout log; ours: records.txt lines — parse both for each side)
    result["train_loss"] = compare_losses(
        parse_loss_curve(os.path.join(ref_cwd, "train_stdout.log"),
                         os.path.join(ref_cwd, run_rel, "records.txt")),
        parse_loss_curve(os.path.join(ours_cwd, "train_stdout.log"),
                         os.path.join(ours_cwd, run_rel, "records.txt")),
    )

    # step batch: 2*bs for FE/UE (real+fake), 6*bs for OCIM (3 train
    # domains x real/fake sub-loaders)
    step_batch = (6 if args.engine == "OCIM" else 2) * args.bs
    result["config"] = {"engine": args.engine, "model": args.model,
                        "steps": args.steps,
                        "val_steps": args.val_steps, "size": args.size,
                        "bs": step_batch, "artifact": args.artifact,
                        "crop": args.crop, "warmup_step": args.warmup,
                        "scheduler": ({"name": "StepLR",
                                       "step_size": args.sched_step,
                                       "gamma": args.sched_gamma}
                                      if args.sched_step else None),
                        "same_init": args.same_init,
                        "deterministic": args.deterministic,
                        "no_flip": args.no_flip,
                        "align_order": args.align_order,
                        "distorted": args.distorted}
    out_path = os.path.join(work, "result.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    brief = {k: v for k, v in result.items()
             if k not in ("val_auc_trajectory", "test_frame_acer_trajectory")}
    brief["train_loss"] = {k: v for k, v in result["train_loss"].items()
                           if k not in ("steps", "ref", "ours")}
    print(json.dumps(brief, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
