#!/usr/bin/env python
"""End-to-end learning validation: train UDR18 through the ForgeryEngine on
synthetic separable data and confirm the validation AUC climbs.

Real frames: smooth random blobs. Fake frames: the same plus a faint
high-frequency checkerboard — exactly the kind of spectral artifact the
dual-space architecture is built to catch. A healthy pipeline should reach
AUC ≈ 1.0 within a few hundred steps; a broken loss/step/data path will not.

Usage: python tools/validate_learning.py [--steps 150] [--size 64]
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np
import yaml


def make_dataset(root: str, size: int, n_videos: int = 24, frames: int = 4):
    import torch

    rng = np.random.default_rng(0)
    index = []
    cb = ((np.arange(size)[:, None] + np.arange(size)[None, :]) % 2).astype(np.float32)

    def blob(seed):
        g = np.random.default_rng(seed)
        img = g.random((size // 8, size // 8, 3)).astype(np.float32)
        img = cv2.resize(img, (size, size), interpolation=cv2.INTER_CUBIC)
        return np.clip(img, 0, 1)

    import zlib

    for kind, fake in (("original_sequences/youtube", False),
                       ("manipulated_sequences/Deepfakes", True)):
        for v in range(n_videos):
            for f in range(frames):
                # crc32, not hash(): Python's hash is salted per process, so
                # the corpus must not depend on it or runs stop being
                # reproducible across invocations (validate_large_batch
                # reuses a prior control run against a regenerated corpus)
                img = blob(zlib.crc32(f"{kind}|{v}|{f}".encode()) % 2**31)
                if fake:
                    img = np.clip(img + 0.10 * cb[:, :, None], 0, 1)
                rel = f"{kind}/c23/images/{v:03d}/{f:04d}.jpg"
                path = os.path.join(root, rel)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                cv2.imwrite(path, (img[:, :, ::-1] * 255).astype(np.uint8),
                            [cv2.IMWRITE_JPEG_QUALITY, 98])
                index.append((rel, int(fake)))
    os.makedirs(os.path.join(root, "pickle_files"), exist_ok=True)
    for split in ("train", "val", "test"):
        torch.save(index, os.path.join(root, "pickle_files", f"{split}_c23.pickle"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--model", default="UDR18")
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="ud_learn_")
    root = os.path.join(tmp, "ffpp")
    make_dataset(root, args.size)

    tf = [{"name": "Resize", "params": {"height": args.size, "width": args.size}},
          {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}}]
    ds_cfg = {
        "root": root, "name": "FFpp", "use_lmdb": False,
        "real_method": ["Origin"], "fake_method": ["Deepfakes"],
        "compression": "c23",
        "num_steps": args.steps, "log_steps": 25, "val_steps": args.steps // 2,
        "train_transforms": tf[:1] + [{"name": "HorizontalFlip", "params": {"p": 0.5}}] + tf[1:],
        "val_transforms": tf, "test_transforms": tf,
    }
    ds_path = os.path.join(tmp, "data.yml")
    with open(ds_path, "w") as f:
        yaml.dump(ds_cfg, f)

    os.chdir(tmp)
    config = {
        "model": {"name": args.model, "num_classes": 2, "drop_rate": 0.2},
        "config": {
            "local_rank": 0, "num_devices": 1,
            "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
            "lambda_mask": 0.1, "lambda_fac": 0.1,
            "optimizer": {"name": "adamw", "lr": 2e-4, "betas": [0.9, 0.999],
                          "weight_decay": 5e-6, "amsgrad": True},
            "crop": "nocrop", "warmup_step": 0, "resume": False,
            "id": "learn-check", "debug": False, "offline": True,
            "precision": "bf16",
        },
        "data": {"train_batch_size": 4, "val_batch_size": 16,
                 "test_batch_size": 16, "file": ds_path},
        "cfg_path": ds_path,
    }

    from unidefense_tpu.engines import get_engine

    engine = get_engine("FE")(config, stage="Train")
    engine.train()
    print(f"FINAL best AUC: {engine.best_auc:.4f}, best ACC: {engine.best_acc:.4f}")
    assert engine.best_auc > 0.95, f"pipeline failed to learn (AUC={engine.best_auc})"
    print("LEARNING VALIDATION PASSED")


if __name__ == "__main__":
    main()
