#!/usr/bin/env python
"""A/B the two-pass step's optimizer-update cost: tree-form vs flattened.

Round-4 investigation of the 256² headline's batch-independent component.
Batch-scaling decomposition (t(b20)=121 ms, t(b128)=607 ms) implies the step
splits into ~31 ms fixed + ~4.5 ms/img marginal; a null-program execution
probe measures launch overhead at ~0.9 ms, and a b1+1 step (same op count,
tiny data) still costs ~34 ms — so the fixed cost lives INSIDE the program,
and the two optimizer updates (504 param leaves × an AdamW+amsgrad chain
each, twice per step) are its dominant batch-independent block.

This tool measures that block in isolation, then the 'obvious' fix — running
the chain over flattened parameter groups (one vector per (decay, dtype)
group, so ~500 fragmented leaf kernels become ~10 big fused ones; weight
decay keeps exact semantics because the groups are partitioned BY the decay
mask, no mask traffic at all).

Measured verdict (2026-08-19, same-session adjacent runs, v5e):

    tree  adamw+amsgrad+wd : 31.16 ms/pair (first run) / 25.72 (re-run; ±10%
                             tunnel drift, CLAUDE.md gotcha 8)
    grouped-flat           : 34.97 ms/pair (adjacent to the 25.72 tree run)

NEGATIVE RESULT: grouped-flat LOSES ~36%. The per-update ravel/unravel
(concat grads + params in, slice updates out: ~6 GB/step of conversion
traffic at 128.3M fp32 params) costs more than the per-leaf kernel
fragmentation it removes — i.e. XLA already schedules the ~500-leaf tree
chain near its traffic floor (~12 GB/pair → ~400 GB/s achieved on fragmented
buffers). A full-vector variant with the mask as a captured constant is not
even compilable here (the 512 MB constant exceeds the remote-compile request
limit, HTTP 413). Keeping state flat PERSISTENTLY (no per-step conversion)
would still pay grad-concat + param-unravel each step — bounded by the same
measurement — and would break the checkpoint/export/Predictor param-tree
surface for a ceiling of a few ms. The tree form stays.

Usage: python tools/bench_optimizer.py [--mode tree|flat|both]
Run ALONE on the box (CLAUDE.md gotcha 7/8).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("UD_JAX_CACHE", "/tmp/ud_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from unidefense_tpu.models.registry import load_model
from unidefense_tpu.train.optim import build_optimizer, build_lr_schedule, _wd_mask

CFG = {"optimizer": {"name": "adamw", "lr": 1e-4, "betas": [0.9, 0.999],
                     "weight_decay": 5e-6, "amsgrad": True}}


def grouped_flat_tx(pshapes, lr=1e-4, wd=5e-6):
    """The flattened candidate: leaves partitioned by (decay-mask, dtype),
    each group raveled into one vector; the optax chain runs on the 2-leaf
    group dict with a plain boolean mask. Exact same elementwise math as the
    tree form (concat/slice reorder no arithmetic)."""
    mask_leaves = jax.tree.leaves(_wd_mask(pshapes))
    leaf_shapes = jax.tree.leaves(pshapes)
    treedef = jax.tree.structure(pshapes)
    groups: dict = {}
    for i, (m, s) in enumerate(zip(mask_leaves, leaf_shapes)):
        groups.setdefault((bool(m), str(s.dtype)), []).append(i)
    gkeys = sorted(groups)

    def to_flat(tree):
        leaves = jax.tree.leaves(tree)
        return {f"g{j}": jnp.concatenate([leaves[i].reshape(-1) for i in groups[k]])
                for j, k in enumerate(gkeys)}

    def from_flat(flat):
        out = [None] * len(leaf_shapes)
        for j, k in enumerate(gkeys):
            vec, off = flat[f"g{j}"], 0
            for i in groups[k]:
                n = leaf_shapes[i].size
                out[i] = vec[off:off + n].reshape(leaf_shapes[i].shape)
                off += n
        return jax.tree.unflatten(treedef, out)

    sched = build_lr_schedule(lr, 0, None)
    flat_mask = {f"g{j}": k[0] for j, k in enumerate(gkeys)}
    inner = optax.chain(
        optax.scale_by_amsgrad(b1=0.9, b2=0.999, eps=1e-8),
        optax.add_decayed_weights(wd, mask=flat_mask),
        optax.scale_by_schedule(lambda c: -sched(c)),
    )
    return optax.GradientTransformation(
        lambda p: inner.init(to_flat(p)),
        lambda u, s, p=None: (lambda r: (from_flat(r[0]), r[1]))(
            inner.update(to_flat(u), s, to_flat(p) if p is not None else None)),
    )


def timeit(name, tx, params, grads, iters=20):
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def two_updates(p, s, g):
        u1, s1 = tx.update(g, s, p)
        p1 = optax.apply_updates(p, u1)
        u2, s2 = tx.update(g, s1, p1)
        return optax.apply_updates(p1, u2), s2

    p, s = params, opt_state
    for _ in range(3):
        p, s = two_updates(p, s, grads)
    float(jax.tree.leaves(p)[0].reshape(-1)[0])  # forced fetch (gotcha 2)
    t0 = time.time()
    for _ in range(iters):
        p, s = two_updates(p, s, grads)
    float(jax.tree.leaves(p)[0].reshape(-1)[0])
    ms = (time.time() - t0) / iters * 1e3
    print(f"{name}: {ms:.2f} ms per 2-update pair", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both", choices=["tree", "flat", "both"])
    args = ap.parse_args()

    model = load_model("UDEB4")(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 256, 256, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, x, train=False))
    pshapes = shapes["params"]
    leaves = jax.tree.leaves(pshapes)
    print(f"param leaves: {len(leaves)}, params M: "
          f"{sum(l.size for l in leaves) / 1e6:.3f}", flush=True)

    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 1e-3, s.dtype), pshapes))()
    grads = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.full(s.shape, 1e-4, s.dtype), pshapes))()

    if args.mode in ("tree", "both"):
        tx_tree, _ = build_optimizer(CFG, pshapes)
        timeit("tree adamw+amsgrad+wd", tx_tree, params, grads)
    if args.mode in ("flat", "both"):
        timeit("grouped-flat adamw+amsgrad+wd", grouped_flat_tx(pshapes),
               params, grads)
    if args.mode == "both":
        tx_tree, _ = build_optimizer(CFG, pshapes)
        timeit("tree (drift check)", tx_tree, params, grads)


if __name__ == "__main__":
    main()
