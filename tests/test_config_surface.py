"""Protocol config surface: every shipped config_template YAML loads through
the real config/transform machinery, and every reference uniatt protocol file
has a protocol-equal twin here (VERDICT r2 item 2 — the UniAttack benchmark
is DEFINED by these YAMLs; /root/reference/README.md:110-146 commands must be
reproducible against this framework)."""

import os
from glob import glob

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_ROOT = os.path.join(REPO, "config_template")
REF_ROOT = "/root/reference/config_template"

DATA_YMLS = sorted(glob(os.path.join(CFG_ROOT, "**", "data_*.yml"), recursive=True))
MODEL_YMLS = sorted(glob(os.path.join(CFG_ROOT, "**", "model_*.yml"), recursive=True))


def _load(path):
    with open(path) as f:
        return yaml.load(f, Loader=yaml.FullLoader)


@pytest.mark.parametrize("path", DATA_YMLS, ids=lambda p: os.path.relpath(p, CFG_ROOT))
def test_data_yaml_loads_and_transforms_build(path):
    from unidefense_tpu.data.transforms import build_transforms

    cfg = _load(path)
    assert isinstance(cfg.get("num_steps"), int) and cfg["num_steps"] > 0
    assert isinstance(cfg.get("log_steps"), int)
    assert isinstance(cfg.get("val_steps"), int)
    tf_keys = [k for k in cfg if k.endswith("_transforms")]
    assert "train_transforms" in tf_keys and "test_transforms" in tf_keys
    for k in tf_keys:
        host, dev = build_transforms(cfg[k])
        assert host.height > 0 and host.width > 0

    family = os.path.relpath(path, CFG_ROOT).split(os.sep)[0]
    if family == "uniatt":
        from unidefense_tpu.data.datasets import UniAttack

        for mk in ("train_real_method", "train_fake_method", "val_real_method",
                   "val_fake_method", "test_method"):
            assert mk in cfg, mk
            for m in cfg[mk]:
                assert m in UniAttack.METHOD, (mk, m)
        for fk in ("train_real_fpv", "train_fake_fpv", "val_real_fpv",
                   "val_fake_fpv", "test_real_fpv", "test_fake_fpv"):
            assert fk in cfg, fk
        for rk in ("FFpp_root", "CDF_root", "SeqDF_root", "HQ_root",
                   "OULU_root", "SiWMv2_root"):
            assert rk in cfg, rk
    elif family == "forgery":
        from unidefense_tpu.data.datasets import LOADERS

        assert cfg["name"] in LOADERS
        assert isinstance(cfg["real_method"], list)
        assert isinstance(cfg["fake_method"], list)
    elif family == "ocim":
        for dk in ("train_dataset", "dev_dataset", "test_dataset"):
            assert dk in cfg
        for d in cfg["train_dataset"]:
            assert d in ("O", "C", "I", "M")
            assert f"{d}_root" in cfg


@pytest.mark.parametrize("path", MODEL_YMLS, ids=lambda p: os.path.relpath(p, CFG_ROOT))
def test_model_yaml_loads_and_model_resolves(path):
    import optax

    from unidefense_tpu.config import load_config
    from unidefense_tpu.models.registry import load_model
    from unidefense_tpu.train.optim import get_optimizer

    cfg = load_config(path, engine="UE")
    assert load_model(cfg["model"]["name"]) is not None
    opt = dict((cfg.get("config") or {}).get("optimizer") or {})
    if opt.get("name"):
        tx = get_optimizer(opt.pop("name"), optax.constant_schedule(opt.pop("lr", 1e-4)),
                           **{k: v for k, v in opt.items() if k != "lr"})
        assert tx is not None
    assert "data" in cfg


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="reference tree absent")
def test_uniatt_protocol_parity_with_reference():
    """File-for-file superset of the reference's 40 uniatt protocol files,
    every protocol-defining field equal, (roots are placeholders on both
    sides; distorted compares truthiness — the reference writes `null`)."""
    ref_files = sorted(glob(os.path.join(REF_ROOT, "uniatt", "Prot*", "data_*.yml")))
    assert len(ref_files) == 40
    checked = 0
    for rf in ref_files:
        rel = os.path.relpath(rf, REF_ROOT)
        mine_path = os.path.join(CFG_ROOT, rel)
        assert os.path.exists(mine_path), f"missing protocol config {rel}"
        ref, mine = _load(rf), _load(mine_path)
        for k, v in ref.items():
            if k == "root" or k.endswith("_root"):
                continue
            if k == "distorted":
                assert bool(mine.get(k)) == bool(v), (rel, k)
            else:
                assert mine.get(k) == v, (rel, k)
        checked += 1
    assert checked == 40
