"""Data-layer tests: FrameStore, transforms, synthetic FFpp dataset,
samplers (SURVEY.md §4 'synthetic LMDB in a tmpdir')."""

import os
import pickle

import cv2
import numpy as np
import pytest

from unidefense_tpu.data.pipeline import EpochSampler, InfiniteBatcher
from unidefense_tpu.data.store import FrameStore, FrameStoreWriter
from unidefense_tpu.data.transforms import DevicePipeline, HostPipeline, build_transforms


def _write_jpg(path, seed, size=48):
    rng = np.random.default_rng(seed)
    img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, img)
    return img


class TestFrameStore:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "test.udb")
        blobs = {f"key/{i}": bytes([i]) * (i + 1) for i in range(10)}
        with FrameStoreWriter(p) as w:
            for k, v in blobs.items():
                w.add(k, v)
        store = FrameStore(p)
        assert len(store) == 10
        for k, v in blobs.items():
            assert store.get(k) == v
        assert store.get("missing") is None
        off, length = store.get_view("key/3")
        assert length == 4


class TestTransforms:
    def test_normalize_parity(self):
        # albumentations Normalize: (img/255 - mean) / std
        dev = DevicePipeline(mean=(0.5, 0.5, 0.5), std=(0.5, 0.5, 0.5))
        u8 = np.array([[[[0, 128, 255]]]], np.uint8)
        out = np.asarray(dev(u8))
        np.testing.assert_allclose(
            out[0, 0, 0], [(v / 255 - 0.5) / 0.5 for v in (0, 128, 255)], atol=1e-6
        )

    def test_hflip(self):
        import jax

        dev = DevicePipeline(hflip_p=1.0)
        u8 = np.arange(2 * 1 * 4 * 3, dtype=np.uint8).reshape(2, 1, 4, 3)
        out = np.asarray(dev(u8, jax.random.PRNGKey(0)))
        ref = np.asarray(dev(u8[:, :, ::-1, :], None))
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_build_from_yaml_list(self):
        cfg = [
            {"name": "Resize", "params": {"height": 64, "width": 64}},
            {"name": "HorizontalFlip", "params": {"p": 0.5}},
            {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
        ]
        host, dev = build_transforms(cfg)
        assert (host.height, host.width) == (64, 64)
        assert dev.hflip_p == 0.5
        img = np.zeros((30, 20, 3), np.uint8)
        assert host(img).shape == (64, 64, 3)

    def test_corruption_finite(self):
        import jax

        dev = DevicePipeline(corrupt=True)
        u8 = (np.random.default_rng(0).random((4, 16, 16, 3)) * 255).astype(np.uint8)
        for seed in range(4):
            out = np.asarray(dev(u8, jax.random.PRNGKey(seed)))
            assert np.all(np.isfinite(out))


@pytest.fixture
def ffpp_root(tmp_path):
    """Synthetic FF++ layout: jpgs + pickle index (dataset/faceforensics.py)."""
    import torch

    root = tmp_path / "ffpp"
    index = []
    for vid in range(3):
        for frame in range(4):
            rel = f"original_sequences/youtube/c23/images/{vid:03d}/{frame:04d}.jpg"
            _write_jpg(str(root / rel), seed=vid * 10 + frame)
            index.append((rel, 0))
    for vid in range(2):
        for frame in range(4):
            rel = f"manipulated_sequences/Deepfakes/c23/images/{vid:03d}_x/{frame:04d}.jpg"
            _write_jpg(str(root / rel), seed=100 + vid * 10 + frame)
            index.append((rel, 1))
    os.makedirs(root / "pickle_files", exist_ok=True)
    torch.save(index, root / "pickle_files" / "train_c23.pickle")
    torch.save(index, root / "pickle_files" / "test_c23.pickle")
    return str(root)


TRANSFORMS = [
    {"name": "Resize", "params": {"height": 32, "width": 32}},
    {"name": "HorizontalFlip", "params": {"p": 0.5}},
    {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
]


def _ffpp_cfg(root, **kw):
    cfg = {
        "root": root,
        "use_lmdb": False,
        "compression": "c23",
        "train_transforms": TRANSFORMS,
        "test_transforms": TRANSFORMS,
    }
    cfg.update(kw)
    return cfg


class TestFaceForensics:
    def test_index_and_labels(self, ffpp_root):
        from unidefense_tpu.data.datasets import FaceForensics

        ds = FaceForensics(_ffpp_cfg(ffpp_root, method=["Origin", "Deepfakes"]), "train")
        assert len(ds) == 20
        assert sum(ds.targets) == 8  # 2 fake videos x 4 frames
        ds_real = FaceForensics(_ffpp_cfg(ffpp_root, method=["Origin"]), "train")
        assert len(ds_real) == 12 and sum(ds_real.targets) == 0

    def test_fpv_resample(self, ffpp_root):
        from unidefense_tpu.data.datasets import FaceForensics

        ds = FaceForensics(
            _ffpp_cfg(ffpp_root, method=["Origin"], train_fpv=2), "train"
        )
        assert len(ds) == 6  # 3 videos x 2 fpv

    def test_load_item_nocrop(self, ffpp_root):
        from unidefense_tpu.data.datasets import FaceForensics

        ds = FaceForensics(_ffpp_cfg(ffpp_root, method=["Origin", "Deepfakes"]), "train")
        items = [ds[i][0] for i in range(4)]
        labels = [ds[i][1] for i in range(4)]
        out = ds.load_item(items, labels, crop="nocrop")
        assert out["images"].shape == (4, 32, 32, 3)
        assert out["images"].dtype == np.uint8
        assert len(out["path"]) == 4

    def test_load_item_4p_margin(self, ffpp_root):
        from unidefense_tpu.data.datasets import FaceForensics

        ds = FaceForensics(_ffpp_cfg(ffpp_root, method=["Origin"]), "train")
        items = [f"{ds[0][0]} lm 10 10 20 20"]
        out = ds.load_item(items, [0], margin=0.3, crop="4p")
        assert out["images"].shape == (1, 32, 32, 3)
        out2 = ds.load_item(items, [0], margin=(0.0, 0.5), crop="4p")
        assert out2["images"].shape == (1, 32, 32, 3)


class TestSampler:
    def test_epoch_reshuffle(self):
        s = EpochSampler(20, 4, shuffle=True)
        s.set_epoch(1)
        b1 = [b.tolist() for b in s]
        s.set_epoch(2)
        b2 = [b.tolist() for b in s]
        assert b1 != b2
        assert sorted(sum(b1, [])) == list(range(20))

    def test_sharding(self):
        shards = []
        for sid in range(4):
            s = EpochSampler(16, 2, shuffle=False, shard_id=sid, num_shards=4)
            shards.append(sorted(sum((b.tolist() for b in s), [])))
        all_idx = sorted(sum(shards, []))
        assert all_idx == list(range(16))
        assert all(len(s) == 4 for s in shards)

    def test_drop_last(self):
        s = EpochSampler(10, 4, shuffle=False, drop_last=True)
        assert len(s) == 2
        batches = list(s)
        assert all(len(b) == 4 for b in batches)

    def test_infinite_batcher(self, ffpp_root):
        from unidefense_tpu.data.datasets import FaceForensics

        ds = FaceForensics(_ffpp_cfg(ffpp_root, method=["Origin", "Deepfakes"]), "train")
        sampler = EpochSampler(len(ds), 4, shuffle=True, drop_last=True)
        b = InfiniteBatcher(ds, sampler, load_kwargs={"crop": "nocrop"})
        for step in range(1, 12):  # crosses an epoch boundary (5 batches/epoch)
            out = b.next_batch(step)
            assert out["images"].shape == (4, 32, 32, 3)
            assert out["label"].shape == (4,)


class TestDistortedOneOf:
    """Per-image corruption semantics (albumentations OneOf parity,
    dataset/uniattack.py:90-107)."""

    def test_device_corrupt_is_per_sample(self):
        import jax
        import jax.numpy as jnp

        from unidefense_tpu.data.transforms import _corrupt_oneof

        # identical images in every batch slot: any cross-sample output
        # difference must come from per-sample draws
        rng = np.random.default_rng(0)
        one = rng.random((16, 16, 3)).astype(np.float32)
        x = jnp.asarray(np.stack([one] * 8))
        out = np.asarray(_corrupt_oneof(jax.random.PRNGKey(3), x))
        assert np.isfinite(out).all()
        diffs = [
            not np.allclose(out[i], out[j], atol=1e-6)
            for i in range(8) for j in range(i + 1, 8)
        ]
        assert any(diffs), "all samples got the identical corruption (per-batch draw)"

    def test_host_distorted_applies_exactly_one(self):
        from unidefense_tpu.data.transforms import HostPipeline

        hp = HostPipeline(height=24, width=24, distorted_oneof=True,
                          rng=np.random.default_rng(5))
        img = np.random.default_rng(1).integers(0, 256, (24, 24, 3), np.uint8)
        outs = [hp(img.copy()) for _ in range(50)]
        # every output is a valid uint8 image of the target size
        for o in outs:
            assert o.shape == (24, 24, 3) and o.dtype == np.uint8
        # over 50 draws the choices vary (not one fixed corruption)
        distinct = {o.tobytes() for o in outs}
        assert len(distinct) > 5
        assert not hp.is_plain_resize  # native fast path must be bypassed

    def test_build_transforms_distorted_moves_oneof_to_host(self):
        from unidefense_tpu.data.transforms import build_transforms

        tf = [{"name": "Resize", "params": {"height": 16, "width": 16}},
              {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}}]
        host, dev = build_transforms(tf, corrupt_distorted=True)
        assert host.distorted_oneof
        assert not dev.corrupt
        assert not host.is_plain_resize


class TestPrefetcher:
    def test_multiworker_yields_in_step_order(self):
        import time as _time

        from unidefense_tpu.data.pipeline import BatchPrefetcher

        def select(step):
            return step

        def load(step):
            _time.sleep(0.02 if step % 3 == 0 else 0.001)  # jittered decode
            return {"step": step}

        pf = BatchPrefetcher(select=select, load=load, depth=3, workers=4,
                             num_steps=20, start_step=1)
        steps = [b["step"] for b in pf]
        assert steps == list(range(1, 21))

    def test_two_phase_matches_single_phase_selection(self):
        """select()/load() split yields the same item sequence as the old
        next_batch path (sampler state advances identically)."""
        from unidefense_tpu.data.pipeline import EpochSampler, InfiniteBatcher

        class DS:
            targets = list(range(20))

            def __getitem__(self, i):
                return f"item{i}", self.targets[i]

            def load_item(self, items, labels, **kw):
                return {"images": np.zeros((len(items), 2, 2, 3)), "path": items}

        a = InfiniteBatcher(DS(), EpochSampler(20, 4, shuffle=True))
        b = InfiniteBatcher(DS(), EpochSampler(20, 4, shuffle=True))
        for step in range(1, 12):
            out_a = a.next_batch(step)
            out_b = b.load(b.select(step))
            assert out_a["path"] == out_b["path"]

    def test_prefetcher_propagates_exceptions(self):
        from unidefense_tpu.data.pipeline import BatchPrefetcher

        def load(step):
            if step == 3:
                raise RuntimeError("decode failed")
            return step

        pf = BatchPrefetcher(select=lambda s: s, load=load, depth=2, workers=2,
                             num_steps=5, start_step=1)
        got = []
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="decode failed"):
            for b in pf:
                got.append(b)
        assert got == [1, 2]


def test_fast_forward_reproduces_stream(ffpp_root):
    """A resumed batcher (fast_forward to step k) yields the same selections
    as an uninterrupted one — deterministic data-stream resume."""
    from unidefense_tpu.data.datasets import FaceForensics
    from unidefense_tpu.data.pipeline import EpochSampler, InfiniteBatcher

    def make():
        ds = FaceForensics(_ffpp_cfg(ffpp_root, method=["Origin", "Deepfakes"]), "train")
        return InfiniteBatcher(
            ds, EpochSampler(len(ds), 4, shuffle=True, drop_last=True),
            load_kwargs={"crop": "nocrop"},
        )

    a, b = make(), make()
    seq_a = [a.select(s) for s in range(1, 13)]  # crosses an epoch boundary
    b.fast_forward(7)
    for s in range(7, 13):
        items_b, labels_b = b.select(s)
        items_a, labels_a = seq_a[s - 1]
        assert items_a == items_b
        assert (labels_a == labels_b).all()


class TestCelebDF:
    @pytest.fixture
    def cdf_root(self, tmp_path):
        """Celeb-DF v2 layout: method dirs with per-video PNG frame folders +
        List_of_testing_videos.txt (dataset/celeb_df.py)."""
        root = tmp_path / "cdf"
        vids = {
            "YouTube-real": ["00000", "00001", "00002"],
            "Celeb-real": ["id0_0000", "id1_0000"],
            "Celeb-synthesis": ["id0_id1_0000", "id1_id2_0000"],
        }
        for m, vs in vids.items():
            for v in vs:
                for f in range(3):
                    p = root / m / "images" / v / f"{f}.png"
                    os.makedirs(p.parent, exist_ok=True)
                    img = (np.random.default_rng(hash((m, v, f)) % 2**31)
                           .random((20, 20, 3)) * 255).astype(np.uint8)
                    cv2.imwrite(str(p), img)
        with open(root / "List_of_testing_videos.txt", "w") as f:
            f.write("1 YouTube-real/00000.mp4\n")
            f.write("0 Celeb-synthesis/id0_id1_0000.mp4\n")
        return str(root)

    def test_split_complement_and_labels(self, cdf_root):
        from unidefense_tpu.data.datasets import CelebDF

        cfg = {"root": cdf_root, "use_lmdb": False,
               "method": ["YouTube-real", "Celeb-real", "Celeb-synthesis"],
               "train_transforms": TRANSFORMS, "test_transforms": TRANSFORMS}
        test = CelebDF(cfg, "test")
        # test split: exactly the listed videos (1 real + 1 fake) x 3 frames
        assert len(test) == 6
        assert sum(test.targets) == 3
        train = CelebDF(cfg, "train")
        # complement: (3+2+2 - 2 listed) videos x 3 frames
        assert len(train) == 15
        # no overlap between splits
        assert not set(train.images) & set(test.images)
        # label rule: 'real' in path -> 0
        for p, t in zip(train.images, train.targets):
            assert t == (0 if "real" in p else 1)

    def test_load_item(self, cdf_root):
        from unidefense_tpu.data.datasets import CelebDF

        cfg = {"root": cdf_root, "use_lmdb": False, "method": ["Celeb-real"],
               "train_transforms": TRANSFORMS, "test_transforms": TRANSFORMS}
        ds = CelebDF(cfg, "train")
        out = ds.load_item([ds[i][0] for i in range(2)], [0, 0], crop="nocrop")
        assert out["images"].shape == (2, 32, 32, 3)


class TestWildDeepfake:
    @pytest.fixture
    def wdf_root(self, tmp_path):
        """WildDeepfake layout: <root>/<split>/{real,fake}.pickle with
        split-relative frame paths (dataset/wild_deepfake.py)."""
        import torch

        root = tmp_path / "wdf"
        for split in ("train", "test"):
            for m, n_vids in (("real", 2), ("fake", 3)):
                items = []
                for v in range(n_vids):
                    for f in range(2):
                        rel = f"{m}_videos/{v:03d}/{f:04d}.png"
                        p = root / split / rel
                        os.makedirs(p.parent, exist_ok=True)
                        img = (np.random.default_rng(hash((split, m, v, f)) % 2**31)
                               .random((20, 20, 3)) * 255).astype(np.uint8)
                        cv2.imwrite(str(p), img)
                        items.append(rel)
                os.makedirs(root / split, exist_ok=True)
                torch.save(items, root / split / f"{m}.pickle")
        return str(root)

    def test_index_and_root_joined_items(self, wdf_root):
        from unidefense_tpu.data.datasets import WildDeepfake

        cfg = {"root": wdf_root, "use_lmdb": False, "method": ["real", "fake"],
               "train_transforms": TRANSFORMS, "test_transforms": TRANSFORMS}
        ds = WildDeepfake(cfg, "train")
        assert len(ds) == 10  # (2+3) videos x 2 frames
        assert sum(ds.targets) == 6
        item0, tgt0 = ds[0]
        assert item0.startswith(wdf_root)  # __getitem__ joins root/split
        # loads through the batcher contract used by the engines
        from unidefense_tpu.data.pipeline import EpochSampler, InfiniteBatcher

        b = InfiniteBatcher(ds, EpochSampler(len(ds), 4, shuffle=True),
                            load_kwargs={"crop": "nocrop"})
        out = b.next_batch(1)
        assert out["images"].shape == (4, 32, 32, 3)

    def test_fpv(self, wdf_root):
        from unidefense_tpu.data.datasets import WildDeepfake

        cfg = {"root": wdf_root, "use_lmdb": False, "method": ["fake"],
               "train_fpv": 1,
               "train_transforms": TRANSFORMS, "test_transforms": TRANSFORMS}
        ds = WildDeepfake(cfg, "train")
        assert len(ds) == 3  # 3 fake videos x 1 fpv
