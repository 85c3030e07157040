"""Per-shape SFConv frequency-branch microbenchmark: XLA spatial form vs the
Pallas kernels (v2 per-row, v3 row-tiled) — fwd+bwd per op instance.

Run ALONE on the box (CLAUDE.md gotcha 7/8); compare only numbers from the
same invocation. Shapes default to the UDEB4 SFConv instances at 256² and
380² training (the two bench resolutions).

    python tools/bench_sfconv.py            # all shapes, all impls
    python tools/bench_sfconv.py --n 20     # batch override
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# (H, W, C) SFConv instances; N is the batch (10 real + 10 fake)
SHAPES_256 = [(64, 64, 192), (48, 48, 336), (32, 32, 336), (24, 24, 672),
              (16, 16, 672), (12, 12, 960)]
SHAPES_380 = [(95, 95, 192), (80, 80, 192)]


def _time_fwd_bwd(fn, x, wp, iters=30):
    cot = jnp.ones_like(x)

    @jax.jit
    def step(x, wp):
        def loss(x, wp):
            return jnp.sum(fn(x, wp) * cot)

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, wp)
        return jnp.sum(gx) + jnp.sum(gw)

    v = step(x, wp)
    float(v)  # compile + forced fetch
    t0 = time.time()
    for _ in range(iters):
        v = step(x, wp)
    float(v)
    return (time.time() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from unidefense_tpu.ops.sfconv_pallas import (
        _row_tile,
        pallas_eligible,
        sfconv_freq_pallas,
        sfconv_freq_pallas_v3,
        sfconv_freq_pallas_v4,
        v3_eligible,
    )
    from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={args.n} (ms per fwd+bwd)")
    print(f"{'shape':>16} {'xla':>8} {'v2':>8} {'v3':>8} {'v4':>8}  notes")
    for h, w, c in SHAPES_256 + SHAPES_380:
        x = jnp.asarray(rng.normal(size=(args.n, h, w, c)).astype(np.float32),
                        jnp.bfloat16)
        wp = jnp.asarray(rng.normal(size=(2 * c, 2 * c)).astype(np.float32),
                         jnp.bfloat16)
        # time every eligible impl independently; a compile failure becomes
        # an ERR cell for that column only (never drops the others' numbers)
        impls = [("xla", sfconv_freq_spatial, True),
                 ("v2", sfconv_freq_pallas, pallas_eligible(x.shape)),
                 ("v3", sfconv_freq_pallas_v3, v3_eligible(x.shape)),
                 ("v4", sfconv_freq_pallas_v4, True)]
        times: dict = {}
        errs = []
        row = f"{h}x{w}/C{c:<4}"
        for name, fn, eligible in impls:
            if not eligible:
                row += f" {'-':>8}"
                continue
            try:
                times[name] = _time_fwd_bwd(fn, x, wp, args.iters)
                row += f" {times[name]:8.2f}"
            except Exception as e:
                row += f" {'ERR':>8}"
                errs.append(f"{name}: {type(e).__name__}: {str(e)[:60]}")
        if times:
            best_name = min(times, key=times.get)
            best = times[best_name]
            row += (f"  R={_row_tile(h, w)} win={best_name} "
                    f"({times['xla'] / best:.2f}x)" if "xla" in times else "")
        if errs:
            row += "  [" + "; ".join(errs) + "]"
        print(row)


if __name__ == "__main__" and not os.environ.get("UD_SFB_INTERLEAVED"):
    main()


def interleaved(shapes=None, n=20, iters=20, rounds=3):
    """Noise-robust per-shape A/B: alternate xla/v4 timing windows within one
    process and take each impl's MIN across rounds (tunnel drift at the ms
    scale is 2-3x, so single adjacent windows are not trustworthy)."""
    from unidefense_tpu.ops.sfconv_pallas import (
        pallas_eligible,
        sfconv_freq_pallas,
        sfconv_freq_pallas_v4,
    )
    from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

    shapes = shapes or (SHAPES_256 + SHAPES_380)
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={n} interleaved x{rounds} "
          f"(min ms per fwd+bwd)")
    results = {}
    for h, w, c in shapes:
        x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32),
                        jnp.bfloat16)
        wp = jnp.asarray(rng.normal(size=(2 * c, 2 * c)).astype(np.float32),
                         jnp.bfloat16)
        impls = {"xla": sfconv_freq_spatial}
        if pallas_eligible(x.shape):
            impls["v2"] = lambda a, b: sfconv_freq_pallas(a, b)
        try:
            sfconv_freq_pallas_v4(x, wp)  # compile probe
            impls["v4"] = lambda a, b: sfconv_freq_pallas_v4(a, b)
        except Exception as e:
            print(f"{h}x{w}/C{c}: v4 compile failed: {type(e).__name__}")
        best = {k: float("inf") for k in impls}
        for _ in range(rounds):
            for k, fn in impls.items():
                best[k] = min(best[k], _time_fwd_bwd(fn, x, wp, iters))
        results[(h, w, c)] = best
        msg = " ".join(f"{k}={v:.2f}" for k, v in best.items())
        ref = best["xla"]
        fastest = min(best, key=best.get)
        print(f"{h}x{w}/C{c:<4} {msg}  win={fastest} ({ref / best[fastest]:.2f}x)")
    return results


if __name__ == "__main__" and os.environ.get("UD_SFB_INTERLEAVED"):
    interleaved()
    raise SystemExit(0)
