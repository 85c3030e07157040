"""Is an INNER lax.scan viable on this runtime, or does every while-loop
iteration round-trip the host (CLAUDE.md gotcha 6)?

Gotcha 6 measured scan-over-TRAIN-STEPS at ~10x slower than per-call
dispatch.  That result is ambiguous between two mechanisms:
  (a) while-loop iterations intrinsically round-trip the host on the
      tunneled axon runtime (scan is dead everywhere), or
  (b) only the outer-loop structure (device-loop of giant bodies with
      donated carries) hits a slow path, and small inner scans are fine.

This experiment decides it.  The round-4 diagnosis of the flat 256cc
headline is serial per-op latency (~8k top-level ops x ~4us,
BASELINE.md utilization table); the one unmeasured structural lever is
op-count reduction by scanning the repeated same-shape EfficientNet
blocks.  That lever is live iff an inner scan's per-iteration overhead
is comparable to the per-op latency of the unrolled chain.

Protocol: one jitted program per variant, K dependent (B,C)@(C,C)
matmuls + bias + relu (tiny compute => the chain is op-latency-bound,
exactly the regime of the fixed 31 ms block).  Interleaved windows
U,S,U,S,... so tunnel drift cancels; forced value fetch closes every
window.  Run ALONE on the box (CLAUDE.md bench rule).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def timed(fn, args, reps, windows=3, tag=""):
    t0 = time.time()
    out = fn(*args)  # compile
    float(out.sum())
    print(f"# {tag}: compile+first {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        float(out.sum())  # forced fetch
        best = min(best, time.time() - t0)
        print(f"# {tag}: window {(time.time()-t0)/reps*1e3:.2f} ms/call",
              file=sys.stderr, flush=True)
    return best / reps


def build(k: int, c: int, b: int):
    key = jax.random.PRNGKey(0)
    ws = jax.random.normal(key, (k, c, c), jnp.bfloat16) * 0.05
    bs = jax.random.normal(key, (k, c), jnp.bfloat16) * 0.01
    x = jax.random.normal(key, (b, c), jnp.bfloat16)

    @jax.jit
    def unrolled(x, ws, bs):
        for i in range(k):
            x = jax.nn.relu(x @ ws[i] + bs[i])
        return x

    @jax.jit
    def scanned(x, ws, bs):
        def body(h, wb):
            w, bias = wb
            return jax.nn.relu(h @ w + bias), None

        h, _ = jax.lax.scan(body, x, (ws, bs))
        return h

    return unrolled, scanned, (x, ws, bs)


def main():
    rows = []
    for k, c, b, reps in ((200, 256, 10, 5), (50, 1024, 10, 5)):
        unrolled, scanned, args = build(k, c, b)
        # interleave at the whole-measurement level too: U S U S
        tu1 = timed(unrolled, args, reps, tag=f"unrolled K={k}")
        ts1 = timed(scanned, args, reps, tag=f"scan K={k}")
        tu2 = timed(unrolled, args, reps, tag=f"unrolled K={k}")
        ts2 = timed(scanned, args, reps, tag=f"scan K={k}")
        tu, ts = min(tu1, tu2), min(ts1, ts2)
        rows.append({
            "K": k, "C": c, "B": b,
            "unrolled_ms": round(tu * 1e3, 3),
            "scan_ms": round(ts * 1e3, 3),
            "scan_over_unrolled": round(ts / tu, 3),
            "unrolled_us_per_op": round(tu * 1e6 / k, 2),
            "scan_us_per_iter": round(ts * 1e6 / k, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    # Lever viability is judged from the NEUTRALITY of the ratio (~1.0), not a
    # mere "< 1.5": scan being execution-neutral vs unrolled means per-executed
    # -op cost is identical, so op-count reduction via scan CANNOT move the
    # headline — its only win is compile time (PROGRESS.md r4b conclusion).
    ratios = [r["scan_over_unrolled"] for r in rows]
    if all(0.8 < x < 1.25 for x in ratios):
        verdict = ("inner scan device-resident and EXECUTION-NEUTRAL vs "
                   "unrolled (ratio ~1.0): per-executed-op cost unchanged; "
                   "scan collapses compile time only — op-count lever CLOSED")
    elif all(x < 0.8 for x in ratios):
        verdict = ("inner scan FASTER than unrolled on this runtime — "
                   "op-count reduction has become a live lever; re-open the "
                   "r4b conclusion")
    else:
        verdict = ("inner scan SLOWER than unrolled (gotcha 6 applies to "
                   "inner loops too on this runtime)")
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    sys.exit(main())
