#!/usr/bin/env python
"""Whole-program XLA compiler-option sweep for the 256² headline step.

The per-op Pallas route below W=80 is measured dead (ops/sfconv_pallas.py
negative-result table), and profiling attributes the remaining 256² headroom
to per-op scheduling overhead across the many small SFConv/attention ops —
i.e. a whole-program compiler problem, not a kernel problem. This tool A/Bs
per-compile `compiler_options` against the default compile of the SAME jitted
two-pass UDEB4 step, interleaving timing windows (default, variant, default,
variant, ...) so the ±7% tunnel drift (CLAUDE.md gotcha 8) cancels.

Knobs swept (the standard TPU whole-program levers):
  * xla_tpu_enable_latency_hiding_scheduler — overlap DMA with compute
  * xla_tpu_scoped_vmem_limit_kib — deeper fusion via a bigger scoped VMEM
Unknown/unsupported options fail the compile; failures are reported per
variant, not fatal.

Usage: python tools/xla_sweep.py [--size 256] [--steps 10] [--rounds 4]
Run ALONE on the box. Prints one JSON line per variant + a summary line.

MEASURED (2026-08-17, v5e, 256² b10+10; artifact artifacts/xla_sweep_256.json):
every variant LOSES — lhs 0.97×, vmem64 0.92×, vmem128 0.71×, lhs+vmem64
0.90×. The default compile already wins: LHS is evidently on by default on
this runtime, and raising the scoped-VMEM limit crowds out the working
buffers of the large conv fusions (the bigger the limit, the worse). The
256² headroom is architectural, not a compiler-knob problem.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("UD_JAX_CACHE", "/tmp/ud_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

VARIANTS = [
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("vmem64", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem128", {"xla_tpu_scoped_vmem_limit_kib": "131072"}),
    ("lhs+vmem64", {"xla_tpu_enable_latency_hiding_scheduler": "true",
                    "xla_tpu_scoped_vmem_limit_kib": "65536"}),
]


def _time_compiled(compiled, state, batch, rngs, steps, k0):
    t0 = time.time()
    k = k0
    for _ in range(steps):
        state, metrics, _ = compiled(state, batch, rngs[k])
        k += 1
    float(metrics["total_loss"])  # forced fetch closes the window
    return time.time() - t0, state, k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--variants", nargs="*", default=None,
                    help="subset of variant names to sweep")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    state, step_fn, batch, rng = bench._build(args.size)
    n = int(batch["label"].shape[0])
    rngs = list(jax.random.split(rng, 4096))

    lowered = step_fn.lower(state, batch, rngs[0])
    print("compiling default...", file=sys.stderr)
    t0 = time.time()
    base = lowered.compile()
    print(f"default compiled in {time.time()-t0:.0f}s", file=sys.stderr)

    # NOTE: donate_argnums on the jit means each compiled call donates state;
    # we thread state through sequentially so buffers stay valid.
    k = 0
    for _ in range(4):  # warmup
        dt, state, k = _time_compiled(base, state, batch, rngs, 2, k)

    results = []
    todo = [v for v in VARIANTS if args.variants is None or v[0] in args.variants]
    for name, opts in todo:
        try:
            print(f"compiling {name}: {opts} ...", file=sys.stderr)
            t0 = time.time()
            var = step_fn.lower(state, batch, rngs[k]).compile(
                compiler_options=opts
            )
            compile_s = time.time() - t0
        except Exception as e:
            results.append({"variant": name, "error": f"{type(e).__name__}: {e}"[:200]})
            print(json.dumps(results[-1]))
            continue

        # interleaved windows: base, var, base, var ... best-of each
        base_best, var_best = float("inf"), float("inf")
        # one warmup call per executable (absorbs any lazy init)
        _, state, k = _time_compiled(var, state, batch, rngs, 2, k)
        _, state, k = _time_compiled(base, state, batch, rngs, 2, k)
        for _ in range(args.rounds):
            dt, state, k = _time_compiled(base, state, batch, rngs, args.steps, k)
            base_best = min(base_best, dt)
            dt, state, k = _time_compiled(var, state, batch, rngs, args.steps, k)
            var_best = min(var_best, dt)
        rec = {
            "variant": name, "opts": opts,
            "base_ips": round(n * args.steps / base_best, 2),
            "var_ips": round(n * args.steps / var_best, 2),
            "speedup": round(base_best / var_best, 4),
            "compile_s": round(compile_s, 1),
        }
        results.append(rec)
        print(json.dumps(rec))

    wins = [r for r in results if r.get("speedup", 0) > 1.02]
    print(json.dumps({
        "summary": "xla_sweep", "size": args.size,
        "winners": [r["variant"] for r in wins],
        "best": max((r.get("speedup", 0) for r in results), default=0),
    }))


if __name__ == "__main__":
    main()
