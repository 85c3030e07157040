"""Real-model CI for the OCIM and UniAttack engines (VERDICT r2 item 5):
the lifecycle tests in test_engine_protocols.py use MiniUniDefense, so a
wiring/registry regression in the OCIM per-domain batch interleave
(engines/ocim.py vs engine/ocim_engine.py:229-255) or the UE
threshold-calibration path (engine/uniattack_engine.py:407-476) could pass
the suite. These run the actual UDR18 — full dual-space architecture — for
2 steps + 1 validation at 32² on CPU, mirroring test_real_model_engine.py."""

import os

import numpy as np
import pytest
import yaml

from tests.test_engine_protocols import (
    _make_fas_domain,
    _make_ffpp_subset,
    _make_oulu_subset,
)

TF32 = [
    {"name": "Resize", "params": {"height": 32, "width": 32}},
    {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
]
TF32_TRAIN = TF32[:1] + [{"name": "HorizontalFlip", "params": {"p": 0.5}}] + TF32[1:]

_COMMON_CFG = {
    "local_rank": 0, "num_devices": 1,
    "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
    "lambda_mask": 0.1, "lambda_fac": 0.1,
    "optimizer": {"name": "adamw", "lr": 1e-3, "betas": [0.9, 0.999],
                  "weight_decay": 5e-6, "amsgrad": True},
    "warmup_step": 0, "resume": False, "debug": False, "offline": True,
}


@pytest.fixture
def ocim_udr18_config(tmp_path, monkeypatch):
    root = str(tmp_path / "fas")
    for dom in ("Oulu_NPU", "CASIA_database", "MSU-MFSD"):
        _make_fas_domain(root, dom)
    ds_cfg = {
        "root": root, "O_root": "Oulu_NPU", "C_root": "CASIA_database",
        "M_root": "MSU-MFSD", "use_lmdb": True,
        "train_dataset": ["C", "O"], "dev_dataset": ["M"], "test_dataset": ["M"],
        "num_steps": 2, "log_steps": 1, "val_steps": 2,
        "train_transforms": TF32_TRAIN, "dev_transforms": TF32,
        "test_transforms": TF32,
    }
    ds_path = tmp_path / "ocim_data.yml"
    with open(ds_path, "w") as f:
        yaml.dump(ds_cfg, f)
    run_root = tmp_path / "work"
    os.makedirs(run_root)
    monkeypatch.chdir(run_root)
    return {
        "model": {"name": "UDR18", "num_classes": 2, "mid_depth": 448},
        "config": {**_COMMON_CFG, "crop": "4p", "id": "pytest-ocim-udr18"},
        "data": {"train_batch_size": 1, "val_batch_size": 6, "test_batch_size": 6,
                 "file": str(ds_path)},
        "cfg_path": str(ds_path),
    }


@pytest.fixture
def ue_udr18_config(tmp_path, monkeypatch):
    ffpp_root = str(tmp_path / "FFpp")
    oulu_root = str(tmp_path / "OULU")
    _make_ffpp_subset(ffpp_root)
    _make_oulu_subset(oulu_root)
    ds_cfg = {
        "root": str(tmp_path), "name": "UniAttack",
        "FFpp_root": ffpp_root, "OULU_root": oulu_root,
        "train_real_method": ["FFpp-Real", "OULU-Real"],
        "train_fake_method": ["FFpp-DF", "OULU-Fake"],
        "val_real_method": ["FFpp-Real"], "val_fake_method": ["FFpp-DF"],
        "test_method": ["OULU-Real", "OULU-Fake"],
        "num_steps": 2, "log_steps": 1, "val_steps": 2,
        "train_transforms": TF32_TRAIN, "val_transforms": TF32,
        "test_transforms": TF32,
    }
    ds_path = tmp_path / "ue_data.yml"
    with open(ds_path, "w") as f:
        yaml.dump(ds_cfg, f)
    run_root = tmp_path / "work"
    os.makedirs(run_root)
    monkeypatch.chdir(run_root)
    return {
        "model": {"name": "UDR18", "num_classes": 2, "mid_depth": 448},
        "config": {**_COMMON_CFG, "crop": "nocrop", "id": "pytest-ue-udr18",
                   "use_domain_label": False},
        "data": {"train_batch_size": 2, "val_batch_size": 6, "test_batch_size": 6,
                 "file": str(ds_path)},
        "cfg_path": str(ds_path),
    }


def test_ocim_engine_udr18_smoke(ocim_udr18_config):
    import copy

    from unidefense_tpu.engines import get_engine

    engine = get_engine("OCIM")(copy.deepcopy(ocim_udr18_config), stage="Train")
    assert len(engine.batchers) == 4  # 2 domains x (real, fake)
    engine.train()
    assert int(engine.state.step) == 2
    assert engine.ckpt.exists(best=True)
    assert 0.0 <= engine.best_auc <= 1.0 and engine.best_hter <= 1.0
    assert np.isfinite(engine.best_hter)


def test_uniattack_engine_udr18_smoke(ue_udr18_config):
    import copy

    from unidefense_tpu.engines import get_engine

    engine = get_engine("UE")(copy.deepcopy(ue_udr18_config), stage="Train")
    engine.train()
    assert int(engine.state.step) == 2
    assert engine.ckpt.exists(best=True)
    # the val-EER threshold was computed and applied to the test split
    assert np.isfinite(engine.best_thres)
    assert engine.best_hter_frame <= 1.0
