"""Real-model engine smoke (round-1 gap: all engine lifecycle tests used
MiniUniDefense, so a registry/wiring regression in the real models' engine
path would pass CI). Runs the actual UDR18 — full dual-space architecture —
through the ForgeryEngine for 2 steps + 1 validation at 32² on CPU.
Bounded (~2 min: one two-pass UDR18 compile) but real."""

import os

import numpy as np
import pytest
import yaml

from tests.test_data import _write_jpg


@pytest.fixture
def fe_udr18_config(tmp_path, monkeypatch):
    import torch

    root = tmp_path / "ffpp"
    index = []
    for vid in range(3):
        for frame in range(4):
            rel = f"original_sequences/youtube/c23/images/{vid:03d}/{frame:04d}.jpg"
            _write_jpg(str(root / rel), seed=vid * 10 + frame, size=40)
            index.append((rel, 0))
    for vid in range(3):
        for frame in range(4):
            rel = f"manipulated_sequences/Deepfakes/c23/images/{vid:03d}_x/{frame:04d}.jpg"
            _write_jpg(str(root / rel), seed=500 + vid * 10 + frame, size=40)
            index.append((rel, 1))
    os.makedirs(root / "pickle_files", exist_ok=True)
    for split in ("train", "val", "test"):
        torch.save(index, root / "pickle_files" / f"{split}_c23.pickle")

    tf = [
        {"name": "Resize", "params": {"height": 32, "width": 32}},
        {"name": "HorizontalFlip", "params": {"p": 0.5}},
        {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
    ]
    ds_cfg = {
        "root": str(root), "name": "FFpp", "use_lmdb": False,
        "real_method": ["Origin"], "fake_method": ["Deepfakes"],
        "compression": "c23", "num_steps": 2, "log_steps": 1, "val_steps": 2,
        "train_transforms": tf, "val_transforms": tf[:1] + tf[2:],
        "test_transforms": tf[:1] + tf[2:],
    }
    ds_path = tmp_path / "data.yml"
    with open(ds_path, "w") as f:
        yaml.dump(ds_cfg, f)
    run_root = tmp_path / "work"
    os.makedirs(run_root)
    monkeypatch.chdir(run_root)
    return {
        "model": {"name": "UDR18", "num_classes": 2, "mid_depth": 448},
        "config": {
            "local_rank": 0, "num_devices": 1,
            "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
            "lambda_mask": 0.1, "lambda_fac": 0.1,
            "optimizer": {"name": "adamw", "lr": 1e-3, "betas": [0.9, 0.999],
                          "weight_decay": 5e-6, "amsgrad": True},
            "crop": "nocrop", "warmup_step": 0, "resume": False,
            "id": "pytest-udr18", "debug": False, "offline": True,
        },
        "data": {"train_batch_size": 2, "val_batch_size": 8, "test_batch_size": 8,
                 "file": str(ds_path)},
        "cfg_path": str(ds_path),
    }


def test_forgery_engine_udr18_smoke(fe_udr18_config):
    import copy

    from unidefense_tpu.engines import get_engine

    engine = get_engine("FE")(copy.deepcopy(fe_udr18_config), stage="Train")
    engine.train()
    assert int(engine.state.step) == 2
    assert engine.ckpt.exists(best=True)  # validation at step 2 saved best
    assert 0.0 <= engine.best_auc <= 1.0
    assert np.isfinite(engine.best_acc)
