"""UniAttack per-subset index loaders that the engine-protocol tests don't
reach (CDF / SeqDF / HQ-WMCA / SiW-Mv2) — protocol-artifact parsing parity
with dataset/uniattack.py:296-420 (path-substring routing, CSV protocol
rows, record.pickle expansion, live/all list naming)."""

import os
from os.path import join

import numpy as np
import pytest

from unidefense_tpu.data.store import FrameStoreWriter

TF = [
    {"name": "Resize", "params": {"height": 16, "width": 16}},
    {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
]


def _store(root, name):
    os.makedirs(join(root, "lmdb"), exist_ok=True)
    with FrameStoreWriter(join(root, "lmdb", f"{name}.udb")) as w:
        w.add("placeholder", b"\x00")


@pytest.fixture
def ua_roots(tmp_path):
    import torch

    # --- Celeb-DF: one pickle per split, routed by path substring
    cdf = str(tmp_path / "CDF")
    os.makedirs(join(cdf, "pickle_files"), exist_ok=True)
    cdf_paths = [
        "YouTube-real/images/00000/0.png",
        "Celeb-real/images/id0_0000/0.png",
        "Celeb-synthesis/images/id0_id1_0000/0.png",
        "Celeb-synthesis/images/id2_id3_0000/0.png",
    ]
    torch.save(cdf_paths, join(cdf, "pickle_files", "train.pickle"))
    _store(cdf, "Celeb-DF")

    # --- Seq-DeepFake: per-split/label pickles, frame-level (no fpv)
    seqdf = str(tmp_path / "SeqDF")
    os.makedirs(join(seqdf, "pickle_files"), exist_ok=True)
    torch.save([f"real/{i}.jpg" for i in range(3)],
               join(seqdf, "pickle_files", "train_real.pickle"))
    torch.save([f"fake/{i}.jpg" for i in range(5)],
               join(seqdf, "pickle_files", "train_fake.pickle"))
    _store(seqdf, "Seq-DeepFake")

    # --- HQ-WMCA: CSV protocol rows + record.pickle dir -> frame list
    hq = str(tmp_path / "HQ")
    os.makedirs(hq, exist_ok=True)
    with open(join(hq, "PROTOCOL-grand_test-curated.csv"), "w") as f:
        f.write("sess01/dirA,0,bonafide,x,train\n")
        f.write("sess01/dirB,1,attack/Glasses,x,train\n")
        f.write("sess01/dirC,1,attack/Tattoo,x,train\n")
        f.write("sess02/dirD,0,bonafide,x,eval\n")
    torch.save({
        "dirA": ["dirA/f0.jpg", "dirA/f1.jpg"],
        "dirB": ["dirB/f0.jpg"],
        "dirC": ["dirC/f0.jpg", "dirC/f1.jpg", "dirC/f2.jpg"],
        "dirD": ["dirD/f0.jpg"],
    }, join(hq, "record.pickle"))
    _store(hq, "HQ_WMCA")

    # --- SiW-Mv2: <split>list_{live,all}.pickle
    siw = str(tmp_path / "SiWMv2")
    os.makedirs(join(siw, "lists"), exist_ok=True)
    torch.save([f"live/{i}.jpg 1 2 3 4" for i in range(2)],
               join(siw, "lists", "trainlist_live.pickle"))
    torch.save([f"spoof/{i}.jpg 1 2 3 4" for i in range(4)],
               join(siw, "lists", "trainlist_all.pickle"))
    _store(siw, "SiW-Mv2")

    return {"CDF_root": cdf, "SeqDF_root": seqdf, "HQ_root": hq, "SiWMv2_root": siw}


def _make(ua_roots, methods, **extra):
    from unidefense_tpu.data.datasets import UniAttack

    cfg = {"root": "/", "name": "UniAttack",
           "train_transforms": TF, "val_transforms": TF, "test_transforms": TF}
    cfg.update(ua_roots)
    cfg.update(extra)
    return UniAttack(cfg, "train", methods)


def test_cdf_routing(ua_roots):
    real = _make(ua_roots, ["CDF-Real"])
    assert len(real) == 2 and all(t == 0 for t in real.targets)
    assert all(("YouTube-real" in p) or ("Celeb-real" in p) for p in real.images)
    fake = _make(ua_roots, ["CDF-Fake"])
    assert len(fake) == 2 and all(t == 1 for t in fake.targets)
    assert all("Celeb-synthesis" in p for p in fake.images)


def test_seqdf_frame_level_no_fpv(ua_roots):
    # fpv must NOT resample Seq-DeepFake (frame-level dataset,
    # dataset/uniattack.py:336-343)
    ds = _make(ua_roots, ["SeqDF-Fake"], train_fake_fpv=1)
    assert len(ds) == 5
    assert all(t == 1 for t in ds.targets)
    real = _make(ua_roots, ["SeqDF-Real"])
    assert len(real) == 3 and all(t == 0 for t in real.targets)


def test_hq_protocol_rows(ua_roots):
    real = _make(ua_roots, ["HQ-Real"])
    assert sorted(real.images) == ["dirA/f0.jpg", "dirA/f1.jpg"]  # train split only
    glasses = _make(ua_roots, ["HQ-Glasses"])
    assert glasses.images == ["dirB/f0.jpg"] and glasses.targets == [1]
    tattoo = _make(ua_roots, ["HQ-Tattoo"])
    assert len(tattoo) == 3


def test_siwmv2_live_vs_all(ua_roots):
    real = _make(ua_roots, ["SiWMv2-Real"])
    assert len(real) == 2 and all(t == 0 for t in real.targets)
    fake = _make(ua_roots, ["SiWMv2-Fake"])
    assert len(fake) == 4 and all(t == 1 for t in fake.targets)


def test_combined_methods_concatenate(ua_roots):
    ds = _make(ua_roots, ["CDF-Real", "SiWMv2-Real", "SeqDF-Fake"])
    assert len(ds) == 2 + 2 + 5
    assert sum(ds.targets) == 5
