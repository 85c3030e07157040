"""OCIM and UniAttack engine lifecycles on synthetic FrameStore data —
exercises the LMDB-replacement blob path, 4p crops with random margins,
multi-domain batch topology, and the val-threshold-to-test protocol."""

import os

import cv2
import numpy as np
import pytest
import yaml

from tests.helpers import MiniUniDefense
from unidefense_tpu.data.store import FrameStoreWriter

TF16 = [
    {"name": "Resize", "params": {"height": 16, "width": 16}},
    {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
]
TF16_TRAIN = TF16[:1] + [{"name": "HorizontalFlip", "params": {"p": 0.5}}] + TF16[1:]


def _jpg_bytes(seed, size=40):
    rng = np.random.default_rng(seed)
    img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    return enc.tobytes()


def _make_fas_domain(root, domain_dir, n_videos=2, frames=3, store_name=None):
    """Synthetic anti-spoofing domain: 5-point list pickles + FrameStore with
    crop-suffixed keys (dataset/abstract_dataset.py path conventions)."""
    import torch

    store_name = store_name or domain_dir
    os.makedirs(os.path.join(root, domain_dir, "lists"), exist_ok=True)
    os.makedirs(os.path.join(root, "lmdb"), exist_ok=True)
    writer = FrameStoreWriter(os.path.join(root, "lmdb", f"{store_name}.udb"))
    lists = {}
    for label in ("real", "fake"):
        items = []
        for v in range(n_videos):
            for f in range(frames):
                rel = f"{domain_dir}/videos/{label}_v{v}/f{f}.jpg"
                items.append(f"{rel} lm 5 5 25 25")
                crop_key = rel.replace(domain_dir, f"{domain_dir}_crop")
                writer.add(crop_key, _jpg_bytes(hash((domain_dir, label, v, f)) % 2**31))
        lists[label] = items
        torch.save(items, os.path.join(root, domain_dir, "lists", f"{label}_5points.pickle"))
    writer.close()
    return lists


@pytest.fixture
def ocim_config(tmp_path, monkeypatch):
    from unidefense_tpu.models import registry

    monkeypatch.setitem(registry.MODEL, "MINI", MiniUniDefense)
    root = str(tmp_path / "fas")
    for dom in ("Oulu_NPU", "CASIA_database", "MSU-MFSD"):
        _make_fas_domain(root, dom)

    ds_cfg = {
        "root": root,
        "O_root": "Oulu_NPU",
        "C_root": "CASIA_database",
        "M_root": "MSU-MFSD",
        "use_lmdb": True,
        "train_dataset": ["C", "O"],
        "dev_dataset": ["M"],
        "test_dataset": ["M"],
        "num_steps": 2,
        "log_steps": 1,
        "val_steps": 2,
        "train_transforms": TF16_TRAIN,
        "dev_transforms": TF16,
        "test_transforms": TF16,
    }
    ds_path = tmp_path / "ocim_data.yml"
    with open(ds_path, "w") as f:
        yaml.dump(ds_cfg, f)
    run_root = tmp_path / "work"
    os.makedirs(run_root)
    monkeypatch.chdir(run_root)
    return {
        "model": {"name": "MINI", "num_classes": 2},
        "config": {
            "local_rank": 0, "num_devices": 1,
            "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
            "lambda_mask": 0.1, "lambda_fac": 0.1,
            "optimizer": {"name": "adamw", "lr": 1e-3, "betas": [0.9, 0.999],
                          "weight_decay": 5e-6, "amsgrad": True},
            "crop": "4p", "warmup_step": 0, "resume": False,
            "id": "pytest-ocim", "debug": False, "offline": True,
        },
        "data": {"train_batch_size": 2, "val_batch_size": 6, "test_batch_size": 6,
                 "file": str(ds_path)},
        "cfg_path": str(ds_path),
    }


def test_ocim_engine_lifecycle(ocim_config):
    import copy

    from unidefense_tpu.engines import get_engine

    engine = get_engine("OCIM")(copy.deepcopy(ocim_config), stage="Train")
    # 2 source domains -> 4 streams, even=real odd=fake
    assert len(engine.batchers) == 4
    engine.train()
    assert int(engine.state.step) == 2
    assert engine.ckpt.exists(best=True)
    assert 0.0 <= engine.best_auc <= 1.0 and engine.best_hter <= 1.0

    cfg2 = copy.deepcopy(ocim_config)
    engine2 = get_engine("OCIM")(cfg2, stage="Test")
    metrics = engine2.test()
    assert "ACER" in metrics


def _make_ffpp_subset(root, n_videos=2, frames=3):
    import torch

    os.makedirs(os.path.join(root, "pickle_files"), exist_ok=True)
    os.makedirs(os.path.join(root, "lmdb"), exist_ok=True)
    writer = FrameStoreWriter(os.path.join(root, "lmdb", "FaceForensics++.udb"))
    index = []
    for kind, label in (("original_sequences/youtube", 0), ("manipulated_sequences/Deepfakes", 1)):
        for v in range(n_videos):
            for f in range(frames):
                rel = f"{kind}/c23/images/{v:03d}/{f:04d}.jpg"
                index.append((rel, label))
                writer.add(rel, _jpg_bytes(hash((kind, v, f)) % 2**31))
    writer.close()
    for split in ("train", "val", "test"):
        torch.save(index, os.path.join(root, "pickle_files", f"{split}_c23.pickle"))


def _make_oulu_subset(root, n_videos=2, frames=3):
    import torch

    os.makedirs(os.path.join(root, "lists"), exist_ok=True)
    os.makedirs(os.path.join(root, "lmdb"), exist_ok=True)
    writer = FrameStoreWriter(os.path.join(root, "lmdb", "Oulu_NPU.udb"))
    for label in ("real", "fake"):
        items = []
        for split_dir in ("Train_files", "Dev_files", "Test_files"):
            for v in range(n_videos):
                for f in range(frames):
                    rel = f"Oulu_NPU/{split_dir}/{label}_v{v}/f{f}.jpg"
                    items.append(f"{rel} lm 5 5 25 25")
                    writer.add(rel.replace("Oulu_NPU", "Oulu_NPU_crop"),
                               _jpg_bytes(hash((split_dir, label, v, f)) % 2**31))
        torch.save(items, os.path.join(root, "lists", f"{label}_5points.pickle"))
    writer.close()


@pytest.fixture
def ue_config(tmp_path, monkeypatch):
    from unidefense_tpu.models import registry

    monkeypatch.setitem(registry.MODEL, "MINI", MiniUniDefense)
    ffpp_root = str(tmp_path / "FFpp")
    oulu_root = str(tmp_path / "OULU")
    _make_ffpp_subset(ffpp_root)
    _make_oulu_subset(oulu_root)

    ds_cfg = {
        "root": str(tmp_path),
        "name": "UniAttack",
        "FFpp_root": ffpp_root,
        "OULU_root": oulu_root,
        "train_real_method": ["FFpp-Real", "OULU-Real"],
        "train_fake_method": ["FFpp-DF", "OULU-Fake"],
        "val_real_method": ["FFpp-Real"],
        "val_fake_method": ["FFpp-DF"],
        "test_method": ["OULU-Real", "OULU-Fake"],
        "num_steps": 2,
        "log_steps": 1,
        "val_steps": 2,
        "train_transforms": TF16_TRAIN,
        "val_transforms": TF16,
        "test_transforms": TF16,
    }
    ds_path = tmp_path / "ue_data.yml"
    with open(ds_path, "w") as f:
        yaml.dump(ds_cfg, f)
    run_root = tmp_path / "work"
    os.makedirs(run_root)
    monkeypatch.chdir(run_root)
    return {
        "model": {"name": "MINI", "num_classes": 2},
        "config": {
            "local_rank": 0, "num_devices": 1,
            "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
            "lambda_mask": 0.1, "lambda_fac": 0.1,
            "optimizer": {"name": "adamw", "lr": 1e-3, "betas": [0.9, 0.999],
                          "weight_decay": 5e-6, "amsgrad": True},
            "crop": "nocrop", "warmup_step": 0, "resume": False,
            "id": "pytest-ue", "debug": False, "offline": True,
            "use_domain_label": False,
        },
        "data": {"train_batch_size": 2, "val_batch_size": 6, "test_batch_size": 6,
                 "file": str(ds_path)},
        "cfg_path": str(ds_path),
    }


def test_uniattack_engine_lifecycle(ue_config):
    import copy

    from unidefense_tpu.engines import get_engine

    engine = get_engine("UE")(copy.deepcopy(ue_config), stage="Train")
    engine.train()
    assert int(engine.state.step) == 2
    assert engine.ckpt.exists(best=True)
    assert engine.best_hter_frame <= 1.0  # a validation ran and updated best

    cfg2 = copy.deepcopy(ue_config)
    engine2 = get_engine("UE")(cfg2, stage="Test")
    out = engine2.test()
    assert "frame" in out and "ACER" in out["frame"]
