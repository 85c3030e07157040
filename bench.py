"""Benchmark: EfficientNet-b4 UniDefense two-pass training throughput.

Two measurements (BASELINE.md, VERDICT round-1 items 3+4):

1. device-only: the full training step (two forward/backward passes + two
   optimizer updates, batch 10 real + 10 fake @256² — the reference's
   per-GPU workload, README.md:110-120 + config_template/forgery/
   model_udeb4.yml:33) on a device-resident uint8 batch, with FLOPs/step from
   XLA cost analysis and MFU vs the chip's peak;
2. engine end-to-end: the REAL ForgeryEngine input path (FrameStore JPEG
   blobs -> native/cv2 decode -> resize -> prefetch threads -> fused device
   preprocessing) feeding the same step at the reference's actual FE
   resolution 380², so host decode is in the timed loop.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Set UD_BENCH_FAST=1 to skip the e2e half (e.g. quick regression checks).

Timing note: block_until_ready can return before execution completes on this
tunneled runtime; every window ends with a forced value fetch.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: the two UDEB4 programs (256² step + 380²
# engine step) take ~5 min each to compile cold on this runtime; cached
# recompiles are seconds, keeping the whole benchmark bounded
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("UD_JAX_CACHE", "/tmp/ud_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# Reference denominators (BASELINE.md "Denominators" section):
#
# 1. H100 ESTIMATE — the reference repo ships no benchmark harness and no
#    H100 is reachable from this zero-egress environment, so the denominator
#    is a spec-derived estimate for the reference's own workload (eager
#    PyTorch UniDefense-b4 two-pass step, batch 10+10 @256²): ~400 img/s.
#    Full derivation (three independent methods: MFU bound, HBM roofline,
#    bandwidth-scaled same-chip measurement) in BASELINE.md; override with
#    UD_BASELINE_IPS once a real H100 measurement exists.
H100_BASELINE_IMG_PER_SEC = float(os.environ.get("UD_BASELINE_IPS", "400") or 0)
# 2. FAITHFUL-PORT — same chip, same harness, literal reference compute
#    pipeline (complex-FFT custom calls everywhere, no DFT-as-matmul
#    dispatch, spectral SFConv): measured 104.9 img/s @256² b10+10
#    (BASELINE.md ablation row). Reproduce with UD_BENCH_FAITHFUL=1
#    (re-measures instead of reporting the main metric); override the
#    recorded denominator with UD_FAITHFUL_IPS.
FAITHFUL_PORT_IMG_PER_SEC = float(os.environ.get("UD_FAITHFUL_IPS", "104.9") or 0)
# TPU v5e peak dense bf16 throughput per chip.
PEAK_FLOPS = float(os.environ.get("UD_PEAK_FLOPS", 197e12))
# v5e HBM bandwidth peak; used for the roofline-utilization row. cost_analysis
# 'bytes accessed' is a PRE-fusion estimate (CLAUDE.md gotcha 9) and can
# EXCEED real HBM traffic, so utilization computed from it is an UPPER bound
# on the true utilization of the bytes XLA thought it needed and should be
# read next to BASELINE.md's manual activation-traffic bracket.
PEAK_HBM_BPS = float(os.environ.get("UD_PEAK_HBM_BPS", 819e9))

CFG = {
    "optimizer": {"name": "adamw", "lr": 1e-4, "betas": [0.9, 0.999],
                  "weight_decay": 5e-6, "amsgrad": True},
    "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
    "lambda_mask": 0.1, "lambda_fac": 0.1,
}


def _build(size: int, batch_real: int = 10, batch_fake: int = 10):
    """State + jitted two-pass step on UDEB4 (bf16 compute, uint8 input +
    fused device preprocessing — how the engines run it)."""
    from unidefense_tpu.data.transforms import DevicePipeline
    from unidefense_tpu.models.registry import load_model
    from unidefense_tpu.train.optim import build_optimizer
    from unidefense_tpu.train.step import create_train_state, make_train_step

    n = batch_real + batch_fake
    model = load_model("UDEB4")(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    device_tf = DevicePipeline(hflip_p=0.5, out_dtype=jnp.float32)
    x_u8 = jax.random.randint(rng, (n, size, size, 3), 0, 256, jnp.int32).astype(jnp.uint8)
    x = device_tf(x_u8, None)  # float shapes for init

    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x, train=False)
    )
    tx, _ = build_optimizer(CFG, shapes["params"])
    state = create_train_state(model, tx, rng, x)
    step_fn = jax.jit(
        make_train_step(model, tx, CFG, num_steps=90000,
                        sum_real=batch_real, sum_fake=batch_fake,
                        preprocess=device_tf),
        donate_argnums=0,
    )
    labels = jnp.array([0] * batch_real + [1] * batch_fake)
    return state, step_fn, {"image": x_u8, "label": labels}, rng


def _cost_per_step(step_fn, state, batch, rng) -> tuple[float, float]:
    """(flops, bytes accessed) per step from XLA cost analysis."""
    try:
        ca = step_fn.lower(state, batch, rng).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def bench_device_only(size: int = 256, steps: int = 20, windows: int = 3,
                      batch_real: int = 10, batch_fake: int = 10):
    state, step_fn, batch, rng = _build(size, batch_real, batch_fake)
    n = int(batch["label"].shape[0])
    flops, bytes_accessed = _cost_per_step(step_fn, state, batch, rng)

    rngs = list(jax.random.split(rng, windows * steps + 10))
    jax.block_until_ready(rngs)
    for i in range(10):  # compile + warmup (absorbs donation recompile)
        state, metrics, _ = step_fn(state, batch, rngs[i])
    assert bool(jnp.isfinite(float(metrics["total_loss"])))

    best_dt, k = float("inf"), 10
    for _ in range(windows):
        t0 = time.time()
        for _ in range(steps):
            state, metrics, _ = step_fn(state, batch, rngs[k])
            k += 1
        loss = float(metrics["total_loss"])  # forced fetch closes the window
        best_dt = min(best_dt, time.time() - t0)
    assert np.isfinite(loss), "non-finite loss in bench"
    ips = n * steps / best_dt
    sec_per_step = best_dt / steps
    mfu = flops / sec_per_step / PEAK_FLOPS if flops else None
    hbm = bytes_accessed / sec_per_step / PEAK_HBM_BPS if bytes_accessed else None
    return ips, flops, mfu, bytes_accessed, hbm


# ------------------------------------------------------------------ engine e2e

E2E_STORE = os.environ.get("UD_BENCH_STORE", "/tmp/ud_bench_ffpp")


def _make_store(root: str, size: int = 380, videos: int = 20, frames: int = 30):
    """Synthetic FF++-layout JPEG tree at the target resolution (the
    reference reads FF++ frames from plain files too —
    dataset/abstract_dataset.py:121-123 — so decode cost is like-for-like)."""
    import cv2
    import torch

    os.makedirs(os.path.join(root, "pickle_files"), exist_ok=True)
    index = []
    rng = np.random.default_rng(0)
    for kind, _label in (("original_sequences/youtube", 0),
                         ("manipulated_sequences/Deepfakes", 1)):
        for v in range(videos):
            base = rng.integers(0, 200, (size, size, 3))
            for f in range(frames):
                img = np.clip(base + rng.integers(0, 56, (size, size, 3)), 0, 255)
                rel = f"{kind}/c23/images/{v:03d}/{f:04d}.jpg"
                full = os.path.join(root, rel)
                os.makedirs(os.path.dirname(full), exist_ok=True)
                cv2.imwrite(full, img.astype(np.uint8),
                            [cv2.IMWRITE_JPEG_QUALITY, 90])
                index.append((rel, _label))
    for split in ("train", "val", "test"):
        torch.save(index, os.path.join(root, "pickle_files", f"{split}_c23.pickle"))


def bench_engine_e2e(size: int = 380, steps: int = 10, windows: int = 5,
                     warmup: int = 6):
    # best-of-5 short windows: the decode half runs on the shared 1-core
    # host, whose load varies — a single long window under-reports badly
    # (observed 48-69 img/s spread across runs)
    """Sustained img/s of the FE engine's real input path + train step:
    FrameStore blob read -> JPEG decode -> resize -> 2-thread prefetch ->
    H2D uint8 -> fused device preprocess -> two-pass step."""
    # the native decoder (gitignored .so) may not be built in a fresh
    # checkout; build it best-effort so e2e measures the real fast path
    native_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
    if not os.path.exists(os.path.join(native_dir, "libudjpeg.so")):
        import subprocess

        subprocess.run(["make", "-C", native_dir], capture_output=True, timeout=120)

    if not os.path.exists(os.path.join(E2E_STORE, "pickle_files", "train_c23.pickle")):
        _make_store(E2E_STORE, size=size)

    transforms = [
        {"name": "Resize", "params": {"height": size, "width": size}},
        {"name": "HorizontalFlip", "params": {"p": 0.5}},
        {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
    ]
    total = warmup + windows * steps + 2
    config = {
        "model": {"name": "UDEB4", "num_classes": 2},
        "config": {**CFG, "crop": "nocrop", "warmup_step": 0, "resume": False,
                   "id": "bench", "debug": True, "offline": True,
                   "precision": "bf16"},
        "data": {"train_batch_size": 10, "val_batch_size": 20,
                 "num_workers": int(os.environ.get("UD_E2E_WORKERS", "2")),
                 "prefetch_depth": int(os.environ.get("UD_E2E_DEPTH", "2")),
                 "file": "<inline>"},
    }
    ds_options = {
        "root": E2E_STORE, "name": "FFpp", "use_lmdb": False,
        "real_method": ["Origin"], "fake_method": ["Deepfakes"],
        "compression": "c23", "num_steps": total, "log_steps": 10**9,
        "val_steps": 10**9,
        "train_transforms": transforms, "val_transforms": transforms,
        "test_transforms": transforms,
    }

    from unidefense_tpu.engines.forgery import ForgeryEngine

    class _BenchFE(ForgeryEngine):
        # inline the dataset options instead of a YAML file on disk
        # (patch the name bound inside engines.forgery, not the config module)
        def _train_settings(self, model_cfg, data_cfg, config_cfg):
            import unidefense_tpu.engines.forgery as fe_mod

            orig = fe_mod.load_dataset_config
            fe_mod.load_dataset_config = lambda _cfg: dict(ds_options)
            try:
                super()._train_settings(model_cfg, data_cfg, config_cfg)
            finally:
                fe_mod.load_dataset_config = orig

    eng = _BenchFE(config, stage="Train")
    prefetch = eng._make_prefetcher()
    rng = jax.random.fold_in(eng.base_rng, 12345)
    it = iter(prefetch)
    n = 20  # 10 real + 10 fake per step

    for i in range(warmup):
        batch = next(it)
        eng.state, metrics, _ = eng.train_step(
            eng.state, batch, jax.random.fold_in(rng, i)
        )
    assert bool(jnp.isfinite(float(metrics["total_loss"])))

    best_dt = float("inf")
    k = warmup
    for _ in range(windows):
        t0 = time.time()
        for _ in range(steps):
            batch = next(it)
            eng.state, metrics, _ = eng.train_step(
                eng.state, batch, jax.random.fold_in(rng, k)
            )
            k += 1
        loss = float(metrics["total_loss"])  # forced fetch
        best_dt = min(best_dt, time.time() - t0)
    prefetch.close()
    assert np.isfinite(loss)
    return n * steps / best_dt


def main():
    import contextlib

    if os.environ.get("UD_BENCH_FAITHFUL"):
        # re-measure the faithful-port denominator: literal reference compute
        # pipeline (spectral SFConv + complex-FFT custom calls, no
        # DFT-as-matmul dispatch) on the same chip/harness. Must be set
        # BEFORE unidefense_tpu model modules import (they read these at
        # import time), which holds here because _build imports lazily.
        os.environ["UD_SFCONV_MODE"] = "spectral"
        os.environ["UD_FFT_MODE"] = "fft"
        with contextlib.redirect_stdout(sys.stderr):
            ips, flops, mfu, _, _ = bench_device_only()
        print(json.dumps({
            "metric": "udeb4_faithful_port_images_per_sec_per_chip_256",
            "value": round(ips, 2), "unit": "images/sec",
            "vs_baseline": None,
            "note": "denominator run: set UD_FAITHFUL_IPS to this value",
        }))
        return

    # b128 is a SUPPORTED training configuration only if the large-batch
    # learning-equivalence proof passed (tools/validate_large_batch.py,
    # VERDICT r4 item 2) — until then the amortized number stays out of the
    # headline output. UD_BENCH_B128=0 force-skips (e.g. cold-cache runs).
    b128_supported = False
    lb_art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "artifacts", "large_batch_learning_r05.json")
    if os.environ.get("UD_BENCH_B128", "1") != "0" and os.path.exists(lb_art):
        try:
            with open(lb_art) as f:
                b128_supported = bool(json.load(f)["verdict"]["pass"])
        except Exception:
            pass

    # engines print settings lines; the driver contract is ONE JSON line on
    # stdout, so everything before the final dump goes to stderr
    with contextlib.redirect_stdout(sys.stderr):
        ips, flops, mfu, bytes_accessed, hbm_util = bench_device_only()
        b128 = None
        if b128_supported and not os.environ.get("UD_BENCH_FAST"):
            try:
                b128_ips, b128_flops, b128_mfu, _, _ = bench_device_only(
                    256, steps=6, windows=3, batch_real=64, batch_fake=64)
                b128 = {"ips": round(b128_ips, 2),
                        "mfu": round(b128_mfu, 4) if b128_mfu else None}
            except Exception as e:
                b128 = {"error": f"{type(e).__name__}: {e}"[:200]}
        e2e, e2e_err = None, None
        if not os.environ.get("UD_BENCH_FAST"):
            try:
                e2e = bench_engine_e2e()
            except Exception as e:  # e2e failure must not hide the primary metric
                e2e_err = f"{type(e).__name__}: {e}"[:200]
    out = {
        "metric": "udeb4_train_images_per_sec_per_chip_256",
        "value": round(ips, 2),
        "unit": "images/sec",
        # vs the spec-derived H100 estimate for the reference's own eager
        # step (~400 img/s, derivation in BASELINE.md "Denominators")
        "vs_baseline": (round(ips / H100_BASELINE_IMG_PER_SEC, 3)
                        if H100_BASELINE_IMG_PER_SEC else None),
        # vs the same-chip literal-reference-pipeline ablation
        # (104.9 img/s measured; reproduce with UD_BENCH_FAITHFUL=1)
        "vs_faithful_port": (round(ips / FAITHFUL_PORT_IMG_PER_SEC, 3)
                             if FAITHFUL_PORT_IMG_PER_SEC else None),
        "flops_per_step": flops,
        "mfu": round(mfu, 4) if mfu is not None else None,
        # roofline proof row (VERDICT r3 item 3): achieved HBM bandwidth from
        # XLA 'bytes accessed' / measured step time vs the 819 GB/s v5e peak.
        # Pre-fusion bytes estimate => utilization is an upper bound; the
        # manual activation-traffic bracket lives in BASELINE.md.
        "bytes_per_step": bytes_accessed,
        "hbm_util_upper": round(hbm_util, 4) if hbm_util is not None else None,
    }
    if b128 is not None:
        # supported large-batch configuration (learning-equivalence proven,
        # artifacts/large_batch_learning_r05.json): the amortization path of
        # the BASELINE.md batch-scaling table as a headline row
        out["b128_images_per_sec"] = b128.get("ips")
        out["b128_mfu"] = b128.get("mfu")
        if "error" in b128:
            out["b128_error"] = b128["error"]
    if e2e is not None:
        out["engine_e2e_ips_380"] = round(e2e, 2)
    if e2e_err is not None:
        out["engine_e2e_error"] = e2e_err
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
