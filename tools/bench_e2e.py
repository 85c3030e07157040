"""380-squared engine-e2e experiments (VERDICT r3 item 4). Run ALONE.

mode host: pure input-path rate (FrameStore read -> native decode -> resize
  -> prefetch threads -> H2D jnp.asarray), no model — the ceiling the device
  step can see. Sweeps workers.
mode e2e: full engine e2e (bench.bench_engine_e2e) sweeping UD_E2E_WORKERS.
mode ab:  same-session device-only @380^2 followed by e2e worker/depth
  variants with a REPEATED baseline last (tunnel/host drift control,
  CLAUDE.md gotcha 8). Round-4 run of record:
  artifacts/e2e_ab_380_r04.json — e2e 67.0 vs device-only 72.48 (92.4%),
  all variants flat, host-only 108.8 img/s => the floor is the shared
  single host core, not decode throughput (BASELINE.md round-4 e2e row).

Usage: python tools/bench_e2e.py [host|e2e|ab]
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # builds the store if missing; brings E2E_STORE/CFG

SIZE = 380
TRANSFORMS = [
    {"name": "Resize", "params": {"height": SIZE, "width": SIZE}},
    {"name": "HorizontalFlip", "params": {"p": 0.5}},
    {"name": "Normalize", "params": {"mean": [0.5] * 3, "std": [0.5] * 3}},
]


def build_batchers():
    import numpy as np
    from unidefense_tpu.data.datasets import get_dataset
    from unidefense_tpu.data.pipeline import EpochSampler, InfiniteBatcher

    if not os.path.exists(os.path.join(bench.E2E_STORE, "pickle_files", "train_c23.pickle")):
        bench._make_store(bench.E2E_STORE, size=SIZE)
    opts = {
        "root": bench.E2E_STORE, "name": "FFpp", "use_lmdb": False,
        "compression": "c23",
        "train_transforms": TRANSFORMS, "val_transforms": TRANSFORMS,
        "test_transforms": TRANSFORMS,
    }
    ds_cls = get_dataset("FFpp")
    real = ds_cls({**opts, "method": ["Origin"]}, split="train")
    fake = ds_cls({**opts, "method": ["Deepfakes"]}, split="train")
    bs = 10
    mk = lambda ds: InfiniteBatcher(
        ds, EpochSampler(len(ds), bs, shuffle=True, pad_last=True),
        load_kwargs={"crop": "nocrop"})
    return mk(real), mk(fake), bs


def host_only_rate(workers: int, steps: int = 30) -> float:
    import numpy as np
    import jax.numpy as jnp
    from unidefense_tpu.data.pipeline import BatchPrefetcher

    rb, fb, bs = build_batchers()

    def select(s):
        return rb.select(s), fb.select(s)

    def load(sels):
        r = rb.load(sels[0]); f = fb.load(sels[1])
        imgs = np.concatenate([r["images"], f["images"]], axis=0)
        lbls = np.concatenate([r["label"], f["label"]], axis=0)
        # same H2D the engine's assemble_batch does
        return {"image": jnp.asarray(imgs), "label": jnp.asarray(lbls)}

    total = steps + 8
    pf = BatchPrefetcher(select=select, load=load, depth=2,
                         num_steps=total, start_step=1, workers=workers)
    it = iter(pf)
    for _ in range(6):
        next(it)
    t0 = time.time()
    last = None
    for _ in range(steps):
        last = next(it)
    float(last["image"][0, 0, 0, 0])  # force the last transfer complete
    dt = time.time() - t0
    pf.close()
    return 2 * bs * steps / dt  # real + fake streams, bs each


def ab():
    ips, flops, mfu, _, _ = bench.bench_device_only(size=SIZE, steps=10, windows=4)
    print(json.dumps({"kind": "device_only_380", "ips": round(ips, 2),
                      "mfu": round(mfu, 4) if mfu else None}), flush=True)
    # variants with the baseline repeated LAST: host noise within a session
    # is real (observed 56.7 -> 67.0 for the SAME config 20 min apart)
    for w, d in ((2, 2), (3, 2), (2, 4), (3, 4), (2, 2)):
        os.environ["UD_E2E_WORKERS"] = str(w)
        os.environ["UD_E2E_DEPTH"] = str(d)
        e = bench.bench_engine_e2e()
        print(json.dumps({"kind": "e2e_380", "workers": w, "depth": d,
                          "ips": round(e, 2),
                          "pct_of_device": round(100 * e / ips, 1)}), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "host"
    if mode == "host":
        for w in (2, 1, 3, 2):
            print(json.dumps({"host_only_ips": round(host_only_rate(w), 2),
                              "workers": w}), flush=True)
    elif mode == "ab":
        ab()
    else:
        for w in (2, 3, 2, 1):
            os.environ["UD_E2E_WORKERS"] = str(w)
            print(json.dumps({"e2e_ips": round(bench.bench_engine_e2e(), 2),
                              "workers": w}), flush=True)
