#!/usr/bin/env python
"""Per-component timing attribution for the UDEB4 two-pass train step.

The tunneled runtime has no tensorboard profile viewer, so attribution is by
ablation: time the full step, then variants with one component removed or
reduced, on the same shapes. Differences bound each component's share.
Also reports XLA cost-analysis FLOPs + bytes for a roofline check
(v5e: ~197 TFLOPS bf16, ~819 GB/s HBM).

Usage: python tools/profile_step.py [--size 256] [--batch 10] [--steps 12]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# persistent compile cache (same as bench.py): the lambda-ablation variants
# are each a fresh UDEB4 program, ~5 min cold on this runtime
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("UD_JAX_CACHE", "/tmp/ud_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

PEAK_FLOPS = 197e12
PEAK_BW = 819e9

CFG = {
    "optimizer": {"name": "adamw", "lr": 1e-4, "betas": [0.9, 0.999],
                  "weight_decay": 5e-6, "amsgrad": True},
    "lambda_triplet": 0.1, "lambda_recons": 0.1, "lambda_freq": 1.0,
    "lambda_mask": 0.1, "lambda_fac": 0.1,
}


def _cost(fn, *args):
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0)), float(ca.get("bytes accessed", 0))
    except Exception:
        return 0.0, 0.0


def _time(fn, state, batch, rng, steps, rethread=True):
    """Time fn over `steps` calls. rethread=True treats fn as a train step
    returning (new_state, ...) with donated input state — a fresh copy of
    `state` is made so the caller's buffers survive donation."""
    rngs = list(jax.random.split(rng, steps + 6))
    jax.block_until_ready(rngs)
    if rethread:
        state = jax.tree.map(jnp.array, state)  # private donatable copy
    out = None
    for i in range(6):
        r = fn(state, batch, rngs[i])
        state, out = (r[0], r[1]) if rethread else (state, r)
    _force(out)
    t0 = time.time()
    for i in range(steps):
        r = fn(state, batch, rngs[6 + i])
        state, out = (r[0], r[1]) if rethread else (state, r)
    _force(out)
    return (time.time() - t0) / steps


def _force(out):
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)) if hasattr(leaf, "astype") else leaf)


def build(size, batch_real, batch_fake, cfg=None, **model_kw):
    from unidefense_tpu.data.transforms import DevicePipeline
    from unidefense_tpu.models.registry import load_model
    from unidefense_tpu.train.optim import build_optimizer
    from unidefense_tpu.train.step import create_train_state, make_train_step

    cfg = cfg or CFG
    model = load_model("UDEB4")(dtype=jnp.bfloat16, **model_kw)
    rng = jax.random.PRNGKey(0)
    device_tf = DevicePipeline(hflip_p=0.5, out_dtype=jnp.float32)
    n = batch_real + batch_fake
    x_u8 = jax.random.randint(rng, (n, size, size, 3), 0, 256, jnp.int32).astype(jnp.uint8)
    x = device_tf(x_u8, None)
    shapes = jax.eval_shape(lambda: model.init({"params": rng, "dropout": rng}, x, train=False))
    tx, _ = build_optimizer(cfg, shapes["params"])
    state = create_train_state(model, tx, rng, x)
    step = jax.jit(
        make_train_step(model, tx, cfg, num_steps=90000, sum_real=batch_real,
                        sum_fake=batch_fake, preprocess=device_tf),
        donate_argnums=0,
    )
    batch = {"image": x_u8, "label": jnp.array([0] * batch_real + [1] * batch_fake)}
    return model, state, step, batch, rng, x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()
    b = args.batch
    n = 2 * b
    rows = []

    # ---- full step (baseline)
    model, state, step, batch, rng, x = build(args.size, b, b)
    flops, bbytes = _cost(step, state, batch, rng)
    dt = _time(step, state, batch, rng, args.steps)
    rows.append(("full two-pass step", dt, flops, bbytes))
    base_dt = dt

    def report(name, dt2):
        rows.append((name, dt2, None, None))
        print(f"{name:42s} {dt2 * 1e3:8.1f} ms  (Δ vs full {1e3 * (base_dt - dt2):+7.1f} ms)")

    print(f"{'full two-pass step':42s} {dt * 1e3:8.1f} ms   "
          f"flops/step={flops / 1e12:.2f}T  bytes={bbytes / 1e9:.1f}GB")
    print(f"  roofline: compute-min {flops / PEAK_FLOPS * 1e3:.1f} ms, "
          f"HBM-min {bbytes / PEAK_BW * 1e3:.1f} ms")

    # ---- eval fwd only (no grads, no updates): bounds the fwd cost
    from unidefense_tpu.train.step import make_eval_step
    from unidefense_tpu.data.transforms import DevicePipeline

    ev = jax.jit(make_eval_step(model, preprocess=DevicePipeline(hflip_p=0.0, out_dtype=jnp.float32)))
    ev_fn = lambda s, bb, r: ev(s.params, s.batch_stats, bb["image"], r)
    dt = _time(ev_fn, state, batch, rng, args.steps, rethread=False)
    report("eval forward only", dt)

    # ---- single-pass train step (one fwd+bwd+update): pass-2 share
    from unidefense_tpu.train.optim import build_optimizer
    from unidefense_tpu.train.step import make_normal_train_step

    tx, _ = build_optimizer(CFG, jax.eval_shape(lambda: state.params))
    one = jax.jit(
        make_normal_train_step(model, tx, CFG, sum_real=b, sum_fake=b,
                               preprocess=DevicePipeline(hflip_p=0.5, out_dtype=jnp.float32)),
        donate_argnums=0,
    )
    dt = _time(one, state, batch, rng, args.steps)
    report("single-pass step (1x fwd+bwd+update)", dt)

    # ---- SFConv branch ablation: pure-spatial conv (sf off via mode env is
    # compile-time; approximate with freq_norm=None model, which builds plain
    # convs where SFConv would be)
    try:
        model2, state2, step2, batch2, rng2, _ = build(args.size, b, b, freq_norm=None)
        dt = _time(step2, state2, batch2, rng2, args.steps)
        report("no SFConv anywhere (freq_norm=None)", dt)
    except Exception as e:
        print("sfconv ablation failed:", e)

    # ---- loss-term ablations: a literal-0.0 lambda lets XLA constant-fold
    # and DCE the whole term's forward+backward subgraph, bounding its cost
    # (recon/freq losses carry rfft chains; triplet carries the distance
    # matrices + softmax weights; perturbation branch is structural and NOT
    # removable this way)
    for key, label in (("lambda_freq", "no freq-recon loss (lambda_freq=0)"),
                       ("lambda_recons", "no pixel-recon loss (lambda_recons=0)"),
                       ("lambda_triplet", "no triplet loss (lambda_triplet=0)"),
                       ("lambda_fac", "no factorization loss (lambda_fac=0)"),
                       ("lambda_mask", "no mask losses (lambda_mask=0)")):
        try:
            cfg0 = dict(CFG); cfg0[key] = 0.0
            model3, state3, step3, batch3, rng3, _ = build(
                args.size, b, b, cfg=cfg0)
            dt = _time(step3, state3, batch3, rng3, args.steps)
            report(label, dt)
        except Exception as e:
            print(f"{key} ablation failed:", e)

    print()
    print(json.dumps({
        "size": args.size, "batch": n,
        "rows": [{"name": r[0], "ms": round(r[1] * 1e3, 2)} for r in rows],
        "flops_per_step": flops, "bytes_per_step": bbytes,
        "mfu": flops / base_dt / PEAK_FLOPS,
        "hbm_util": bbytes / base_dt / PEAK_BW,
    }))


if __name__ == "__main__":
    main()
