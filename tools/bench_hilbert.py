#!/usr/bin/env python
"""Interleaved A/B of the shared-Hilbert SFConv identity on the full step.

`ops/sfconv_spatial.py` can obtain the second Hilbert term H(x̃) either by a
second W×W einsum ("pair", the round-1 form) or via the circular-odd identity
H(x̃) = −(H(x))̃ ("shared") — one Hilbert matmul per block instead of two,
with the second operand a pure index permutation of the first. The earlier
round-3 reformulation experiment bundled this identity with a C→4C matmul
restructure and lost; this tool measures the identity IN ISOLATION, keeping
the 4-accumulated-matmul structure untouched.

Protocol (CLAUDE.md gotcha 8): two compiled executables of the SAME jitted
two-pass UDEB4 step (traced under each mode), timing windows interleaved
pair/shared/pair/shared so tunnel drift cancels; best-of per executable.

Usage: python tools/bench_hilbert.py [--size 256] [--steps 10] [--rounds 4]
Run ALONE on the box. Prints one JSON line.
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
    args = ap.parse_args()

    import bench
    import unidefense_tpu.ops.sfconv_spatial as sp

    state, step_fn, batch, rng = bench._build(args.size)
    n = int(batch["label"].shape[0])
    rngs = list(jax.random.split(rng, 4096))

    exes = {}
    for mode in ("pair", "shared"):
        sp._HILBERT_MODE = mode
        # The module global is read at TRACE time; without clearing the jit
        # cache the second .lower() returns the first mode's cached trace and
        # the A/B silently measures mode-1 against itself.
        step_fn.clear_cache()
        print(f"compiling {mode}...", file=sys.stderr)
        t0 = time.time()
        exes[mode] = step_fn.lower(state, batch, rngs[0]).compile()
        print(f"{mode} compiled in {time.time()-t0:.0f}s", file=sys.stderr)

    # donation: thread state sequentially through every call
    k = 0
    for mode in ("pair", "shared"):
        for _ in range(3):  # warmup per executable
            _, state, k = _time_compiled(exes[mode], state, batch, rngs, 2, k)

    best = {"pair": float("inf"), "shared": float("inf")}
    for _ in range(args.rounds):
        for mode in ("pair", "shared"):
            dt, state, k = _time_compiled(exes[mode], state, batch, rngs,
                                          args.steps, k)
            best[mode] = min(best[mode], dt)

    rec = {
        "bench": "hilbert_shared_ab", "size": args.size,
        "pair_ips": round(n * args.steps / best["pair"], 2),
        "shared_ips": round(n * args.steps / best["shared"], 2),
        "speedup": round(best["pair"] / best["shared"], 4),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
