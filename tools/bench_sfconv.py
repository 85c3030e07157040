"""Per-shape SFConv frequency-branch microbenchmark: XLA spatial form vs the
Pallas kernels (v2 per-row, v3 row-tiled) — fwd+bwd per op instance.

Run ALONE on the box (CLAUDE.md gotcha 7/8); compare only numbers from the
same invocation. Shapes default to the UDEB4 SFConv instances at 256² and
380² training (the two bench resolutions).

    python tools/bench_sfconv.py            # all shapes, all impls
    python tools/bench_sfconv.py --n 20     # batch override
"""

import argparse
import time

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
        v3_eligible,
    )
    from unidefense_tpu.ops.sfconv_spatial import sfconv_freq_spatial

    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} n={args.n} (ms per fwd+bwd)")
    print(f"{'shape':>16} {'xla':>8} {'v2':>8} {'v3':>8}  notes")
    for h, w, c in SHAPES_256 + SHAPES_380:
        x = jnp.asarray(rng.normal(size=(args.n, h, w, c)).astype(np.float32),
                        jnp.bfloat16)
        wp = jnp.asarray(rng.normal(size=(2 * c, 2 * c)).astype(np.float32),
                         jnp.bfloat16)
        t_xla = _time_fwd_bwd(sfconv_freq_spatial, x, wp, args.iters)
        row = f"{h}x{w}/C{c:<4} {t_xla:8.2f}"
        t_v2 = t_v3 = None
        if pallas_eligible(x.shape):
            t_v2 = _time_fwd_bwd(lambda a, b: sfconv_freq_pallas(a, b), x, wp,
                                 args.iters)
        row += f" {t_v2:8.2f}" if t_v2 is not None else f" {'-':>8}"
        if v3_eligible(x.shape):
            try:
                t_v3 = _time_fwd_bwd(lambda a, b: sfconv_freq_pallas_v3(a, b),
                                     x, wp, args.iters)
            except Exception as e:
                row += f" {'ERR':>8}  {type(e).__name__}: {str(e)[:80]}"
                print(row)
                continue
        row += f" {t_v3:8.2f}" if t_v3 is not None else f" {'-':>8}"
        best = min(v for v in (t_xla, t_v2, t_v3) if v is not None)
        winner = ("xla" if best == t_xla else "v2" if best == t_v2 else "v3")
        row += f"  R={_row_tile(h, w)} win={winner} ({t_xla / best:.2f}x)"
        print(row)


if __name__ == "__main__":
    main()
