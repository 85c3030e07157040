"""Round-3 regression tests for input-pipeline correctness:

* FE partial-batch safety: EpochSampler(pad_last=True) never yields a short
  chunk, so the jitted step's static real/fake split boundary stays correct
  across epoch boundaries and shapes never change (no retrace) — the
  reference tolerates short batches because its split is dynamic
  (engine/abstract_engine.py:241-253); this rebuild pads instead.
* One crop-margin draw PER load_item BATCH (the reference rebinds the margin
  tuple to a float after the first 4p item, abstract_dataset.py:126-135).
* split_device_batch refuses non-divisible batches instead of silently
  truncating.
* LockedRNG: deterministic single-threaded, safe under concurrent draws.
* ReduceLROnPlateau default metric direction per engine.
* DeviceMetricAccumulator matches per-step host AverageMeter/AccMeter math.
"""

import threading

import numpy as np
import pytest

from unidefense_tpu.data.pipeline import EpochSampler, InfiniteBatcher


class TestPadLast:
    def test_constant_shapes_with_wraparound(self):
        s = EpochSampler(10, 4, shuffle=False, pad_last=True)
        chunks = list(iter(s))
        assert [len(c) for c in chunks] == [4, 4, 4]
        # final chunk: the 2 leftover indices + wrap-around from shard start
        assert list(chunks[2]) == [8, 9, 0, 1]

    def test_every_index_seen_once_before_padding(self):
        s = EpochSampler(10, 4, shuffle=True, pad_last=True)
        seen = np.concatenate(list(iter(s)))
        assert len(seen) == 12
        assert sorted(seen[:10].tolist()) == list(range(10))

    def test_dataset_smaller_than_batch(self):
        s = EpochSampler(3, 8, shuffle=False, pad_last=True)
        chunks = list(iter(s))
        assert len(chunks) == 1
        assert list(chunks[0]) == [0, 1, 2, 0, 1, 2, 0, 1]

    def test_divisible_dataset_unchanged(self):
        a = list(iter(EpochSampler(12, 4, shuffle=False, pad_last=True)))
        b = list(iter(EpochSampler(12, 4, shuffle=False)))
        assert all((x == y).all() for x, y in zip(a, b))


def test_torch_order_matches_distributed_sampler(monkeypatch):
    """UD_SAMPLER_TORCH_ORDER (tools/engine_ab.py --align-order) must emit
    the EXACT shuffle order the reference's train loaders use: a single-rank
    DistributedSampler re-seeded with set_epoch(cur_step)
    (engine/forgery_engine.py:243-248; torch.randperm with generator seed
    `seed + epoch`, seed default 0). Pinned against the real torch sampler,
    including across a set_epoch refresh."""
    import torch
    from torch.utils.data import distributed as tdist

    monkeypatch.setenv("UD_SAMPLER_TORCH_ORDER", "1")
    for n, epoch in ((48, 1), (48, 17), (23, 5)):
        ref = tdist.DistributedSampler(list(range(n)), num_replicas=1, rank=0)
        ref.set_epoch(epoch)
        ours = EpochSampler(n, n, shuffle=True)
        ours.set_epoch(epoch)
        assert np.concatenate(list(iter(ours))).tolist() == list(iter(ref))


def test_torch_order_off_by_default(monkeypatch):
    monkeypatch.delenv("UD_SAMPLER_TORCH_ORDER", raising=False)
    s = EpochSampler(16, 16, shuffle=True)
    s.set_epoch(3)
    expect = np.random.default_rng(3).permutation(16)
    assert (np.concatenate(list(iter(s))) == expect).all()


class _ListDS:
    """Minimal dataset stub for sampler-level tests."""

    def __init__(self, n):
        self.n = n
        self.targets = [i % 2 for i in range(n)]

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return f"item{i}", self.targets[i]

    def load_item(self, items, labels, **kw):
        return {"images": np.zeros((len(items), 2, 2, 3), np.uint8)}


def test_fe_partial_batch_full_selections_across_epochs():
    """The FE engine contract: with a dataset NOT divisible by the global
    batch, every selection across epoch boundaries is still full size — the
    static-shape step never sees a short batch (regression for the round-2
    silent mis-split bug)."""
    ds = _ListDS(10)
    ib = InfiniteBatcher(ds, EpochSampler(10, 4, shuffle=True, pad_last=True))
    shapes = set()
    for step in range(1, 12):  # crosses several epoch boundaries (3 chunks ea)
        items, labels = ib.select(step)
        assert len(items) == 4 and len(labels) == 4
        shapes.add(ib.load((items, labels))["images"].shape)
    assert shapes == {(4, 2, 2, 3)}  # constant shapes -> no retrace


def test_split_device_batch_rejects_non_divisible():
    from unidefense_tpu.parallel.mesh import split_device_batch

    r, f = np.zeros((6, 2)), np.zeros((8, 2))
    with pytest.raises(ValueError):
        split_device_batch(r, np.zeros(6), f, np.zeros(8), 4)
    # divisible passes
    imgs, lbls = split_device_batch(
        np.arange(8).reshape(8, 1), np.arange(8),
        np.arange(8).reshape(8, 1) + 100, np.arange(8) + 100, 4,
    )
    assert imgs.shape[0] == 16


class _CountingRNG:
    def __init__(self):
        self.calls = 0

    def integers(self, lo, hi):
        self.calls += 1
        return 3


def test_margin_drawn_once_per_batch(monkeypatch):
    """Reference granularity: one random margin per load_item call
    (abstract_dataset.py:126-135 rebinds the tuple after the first item)."""
    from unidefense_tpu.data import native
    from unidefense_tpu.data.datasets import AbstractDataset
    from unidefense_tpu.data.transforms import HostPipeline

    ds = AbstractDataset.__new__(AbstractDataset)
    ds.rng = _CountingRNG()
    ds.use_lmdb = False
    ds.host_tf = HostPipeline(height=8, width=8)
    monkeypatch.setattr(native, "get_lib", lambda: None)  # force cv2 path
    monkeypatch.setattr(
        AbstractDataset, "_read_image",
        lambda self, p: np.zeros((32, 32, 3), np.uint8),
    )
    items = [f"img{i}.jpg lm 4 4 10 10" for i in range(6)]
    ds.load_item(items, [0] * 6, margin=(0.0, 0.5), crop="4p")
    assert ds.rng.calls == 1  # six items, ONE draw
    ds.load_item(items, [0] * 6, margin=(0.0, 0.5), crop="4p")
    assert ds.rng.calls == 2  # next batch draws again
    ds.load_item(items, [0] * 6, margin=0.3, crop="4p")
    assert ds.rng.calls == 2  # fixed float margin: no draw
    ds.load_item(items, [0] * 6, crop="nocrop")
    assert ds.rng.calls == 2  # nocrop: no draw


class TestLockedRNG:
    def test_single_thread_matches_bare_generator(self):
        from unidefense_tpu.data.transforms import LockedRNG

        a, b = LockedRNG(123), np.random.default_rng(123)
        assert [int(a.integers(0, 100)) for _ in range(5)] == [
            int(b.integers(0, 100)) for _ in range(5)
        ]
        assert a.random() == b.random()
        assert a.uniform(0.0, 1.0) == b.uniform(0.0, 1.0)

    def test_concurrent_draws_complete_and_advance(self):
        from unidefense_tpu.data.transforms import LockedRNG

        rng = LockedRNG(7)
        out: list = []
        lock = threading.Lock()

        def worker():
            vals = [float(rng.random()) for _ in range(250)]
            with lock:
                out.extend(vals)

        threads = [threading.Thread(target=worker) for _ in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(out) == 1000
        assert all(0.0 <= v < 1.0 for v in out)
        # serialized draws -> the full stream is a permutation of the bare
        # generator's first 1000 draws (no corruption, no duplication)
        ref = np.random.default_rng(7).random(1000)
        assert sorted(out) == pytest.approx(sorted(ref.tolist()))


def test_plateau_default_mode_follows_engine_metric():
    from unidefense_tpu.engines.forgery import ForgeryEngine
    from unidefense_tpu.engines.ocim import OCIMEngine
    from unidefense_tpu.engines.uniattack import UniAttackEngine
    from unidefense_tpu.train.optim import build_plateau

    assert ForgeryEngine.plateau_default_mode == "max"
    assert OCIMEngine.plateau_default_mode == "max"
    assert UniAttackEngine.plateau_default_mode == "min"

    cfg = {"optimizer": {"lr": 1e-3},
           "scheduler": {"name": "ReduceLROnPlateau", "patience": 0}}
    p = build_plateau(cfg, default_mode="max")
    assert p.mode == "max"
    scale = 1.0
    for m in (0.1, 0.2, 0.3, 0.4):  # steadily improving AUC never decays
        scale = p.step(m)
    assert scale == 1.0
    # explicit YAML mode still wins over the engine default
    cfg2 = {"optimizer": {"lr": 1e-3},
            "scheduler": {"name": "ReduceLROnPlateau", "mode": "min"}}
    assert build_plateau(cfg2, default_mode="max").mode == "min"


class TestDeviceMetricAccumulator:
    def test_matches_per_step_host_meters(self):
        import jax.numpy as jnp

        from unidefense_tpu.utils.meters import (
            AccMeter,
            AverageMeter,
            DeviceMetricAccumulator,
        )

        rng = np.random.default_rng(0)
        dev = DeviceMetricAccumulator()
        host: dict = {}
        host_acc = AccMeter()
        for _ in range(5):
            metrics = {"total_loss": float(rng.random()),
                       "triplet_loss": float(rng.random())}
            logits = rng.normal(size=(6, 2)).astype(np.float32)
            labels = rng.integers(0, 2, 6)
            dev.update({k: jnp.float32(v) for k, v in metrics.items()},
                       jnp.asarray(logits), jnp.asarray(labels))
            for k, v in metrics.items():
                host.setdefault(k, AverageMeter()).update(v)
            host_acc.update(logits, labels)
        snap = dev.snapshot()
        assert snap["count"] == 5
        for k, m in host.items():
            assert snap["means"][k] == pytest.approx(m.avg, abs=1e-6)
        assert snap["acc"] == pytest.approx(host_acc.mean_acc())

    def test_single_logit_head(self):
        import jax.numpy as jnp

        from unidefense_tpu.utils.meters import AccMeter, DeviceMetricAccumulator

        rng = np.random.default_rng(1)
        dev = DeviceMetricAccumulator()
        host_acc = AccMeter()
        for _ in range(3):
            logits = rng.normal(size=(8, 1)).astype(np.float32)
            labels = rng.integers(0, 2, 8)
            dev.update({"l": jnp.float32(0.0)}, jnp.asarray(logits),
                       jnp.asarray(labels))
            host_acc.update(logits, labels)
        assert dev.snapshot()["acc"] == pytest.approx(host_acc.mean_acc())


def test_make_prefetcher_honors_prefetch_depth():
    """`data.prefetch_depth` (round-4 knob for multi-core hosts) reaches the
    BatchPrefetcher; default stays 2 (the measured best on the 1-core box,
    BASELINE.md round-4 e2e row)."""
    from types import SimpleNamespace

    from unidefense_tpu.engines.base import AbstractEngine

    def mk(data_cfg):
        eng = SimpleNamespace(
            data_cfg=data_cfg, num_steps=5, start_step=1,
            _select_batch=lambda s: s, _load_batch=lambda s: {"step": s},
            _batchers=lambda: [],
        )
        return AbstractEngine._make_prefetcher(eng)

    assert mk({}).depth == 2
    # explicit 0 means "minimum decode-ahead" (depth 1), not the default;
    # a null YAML value falls back to the default 2
    assert mk({"prefetch_depth": 0}).depth == 1
    assert mk({"prefetch_depth": None}).depth == 2
    pf = mk({"prefetch_depth": 4, "num_workers": 3})
    assert pf.depth == 4 and pf.workers == 3
    # the deeper prefetcher still yields in step order
    assert [b["step"] for b in pf] == [1, 2, 3, 4, 5]
