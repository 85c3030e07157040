"""CLI-level integration: drive `main.main()` exactly as a user would
(reference main.py:8-59 surface) — two-level YAML load, CLI overrides
(--exp_id, --ds_config, --offline, --num_devices), engine dispatch, and the
--test path loading the best checkpoint. The engine lifecycle itself is
covered by test_engine.py; this pins the entry-point wiring above it."""

import os
import sys

import pytest
import yaml

from tests.helpers import MiniUniDefense
from tests.test_engine import TRANSFORMS, synthetic_ffpp  # noqa: F401 (fixture)


@pytest.fixture
def cli_configs(tmp_path, synthetic_ffpp, monkeypatch):  # noqa: F811
    from unidefense_tpu.models import registry

    monkeypatch.setitem(registry.MODEL, "MINI", MiniUniDefense)

    ds_cfg = {
        "root": synthetic_ffpp,
        "name": "FFpp",
        "use_lmdb": False,
        "real_method": ["Origin"],
        "fake_method": ["Deepfakes"],
        "compression": "c23",
        "num_steps": 3,
        "log_steps": 2,
        "val_steps": 3,
        "train_transforms": TRANSFORMS,
        "val_transforms": TRANSFORMS[:1] + TRANSFORMS[2:],
        "test_transforms": TRANSFORMS[:1] + TRANSFORMS[2:],
    }
    ds_path = tmp_path / "data.yml"
    ds_path.write_text(yaml.dump(ds_cfg))

    # second dataset YAML for the --ds_config override (differs in num_steps)
    ds_cfg2 = dict(ds_cfg, num_steps=2, val_steps=2)
    ds_path2 = tmp_path / "data_override.yml"
    ds_path2.write_text(yaml.dump(ds_cfg2))

    model_cfg = {
        "model": {"name": "MINI", "num_classes": 2},
        "config": {
            "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
            "lambda_mask": 0.1, "lambda_fac": 0.1,
            "optimizer": {"name": "adamw", "lr": 1e-3, "betas": [0.9, 0.999],
                          "weight_decay": 5e-6, "amsgrad": True},
            "crop": "nocrop",
            "warmup_step": 0,
            "resume": False,
            "id": "yaml-id",
            "debug": False,
        },
        "data": {"train_batch_size": 2, "val_batch_size": 8,
                 "test_batch_size": 8, "file": str(ds_path)},
    }
    model_path = tmp_path / "model.yml"
    model_path.write_text(yaml.dump(model_cfg))

    run_root = tmp_path / "work"
    os.makedirs(run_root)
    monkeypatch.chdir(run_root)
    return {"model": str(model_path), "ds_override": str(ds_path2)}


def _run_main(monkeypatch, argv):
    import main as entry

    monkeypatch.setattr(sys, "argv", ["main.py"] + argv)
    entry.main()


def test_cli_train_then_test(cli_configs, monkeypatch):
    # train: --exp_id overrides the YAML id; --offline; --num_devices 1
    _run_main(monkeypatch, [
        "--config", cli_configs["model"], "--engine", "FE",
        "--exp_id", "cli-run", "--offline", "--num_devices", "1",
    ])
    run_dir = os.path.join("runs", "MINI", "cli-run")
    assert os.path.isdir(run_dir), "exp_id override not honored by run dir"
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))

    # --test dispatches Test stage and loads the best checkpoint
    _run_main(monkeypatch, [
        "--config", cli_configs["model"], "--engine", "FE",
        "--exp_id", "cli-run", "--offline", "--test",
    ])
    assert os.path.exists(os.path.join(run_dir, "test.txt"))


def test_cli_ds_config_override(cli_configs, monkeypatch):
    # --ds_config replaces data.file (main.py:50-53 semantics): the override
    # file trains 2 steps instead of 3
    _run_main(monkeypatch, [
        "--config", cli_configs["model"], "--engine", "FE",
        "--exp_id", "cli-ds", "--offline",
        "--ds_config", cli_configs["ds_override"],
    ])
    import json

    with open(os.path.join("runs", "MINI", "cli-ds", "metrics.jsonl")) as f:
        steps = [json.loads(line).get("step", 0) for line in f]
    assert max(steps) == 2, "ds_config override did not drive the run"
