#!/usr/bin/env python
"""Post-fusion HBM traffic estimate for the UDEB4 two-pass train step.

Why: XLA `cost_analysis()['bytes accessed']` is a PRE-fusion estimate
(CLAUDE.md gotcha 9) — on this step it exceeds the physical 819 GB/s peak
(i.e. the implied "utilization" is >100%), so it cannot prove or refute the
memory-bound claim on its own. This tool computes the POST-fusion bracket:
parse the optimized HLO, and for every top-level instruction (everything
except fusion-body computations) count

    traffic = output bytes (one HBM write) + sum(operand bytes) (HBM reads)

which is exactly the HBM traffic model of a fused TPU program under perfect
intra-fusion reuse: each fusion reads its operands from HBM, computes in
VMEM, and writes its result to HBM once. Zero-traffic aliasing ops
(bitcast, tuple plumbing, get-tuple-element, parameter declarations) are
skipped. This is a *lower bracket* on real traffic (it assumes no VMEM
spills, perfect reuse inside every fusion, and ignores DMA inefficiency on
strided/small transfers); the pre-fusion cost_analysis number is the upper
bracket. Achieved bandwidth = bracket / measured step time.

Usage: python tools/hbm_traffic.py [--size 256] [--batch 10] [--steps 12]
Run ALONE on the box (CLAUDE.md). Prints one JSON line.
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("UD_JAX_CACHE", "/tmp/ud_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

PEAK_BW = float(os.environ.get("UD_PEAK_HBM_BPS", 819e9))
PEAK_FLOPS = float(os.environ.get("UD_PEAK_FLOPS", 197e12))

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16, "token": 0, "opaque": 0,
}

# ops that move no HBM bytes themselves (aliasing / metadata / plumbing).
# `copy` IS counted (it is a real HBM->HBM move on TPU).
_FREE_OPS = {
    "bitcast", "get-tuple-element", "tuple", "parameter", "after-all",
    "constant",  # small VMEM/SMEM-resident literals; large ones are rare here
    "partition-id", "replica-id", "opt-barrier",
}


# shape WITH optional layout braces: f32[20,3]{1,0:T(8,128)S(1)}. The layout
# carries the memory space: no S(k) (or S(0)) = default = HBM; S(1) = VMEM
# alternate memory, S(2) = SMEM, etc. Non-HBM buffers move no HBM bytes.
_SHAPE_LAYOUT_RE = re.compile(
    r"\b(pred|[su](?:8|16|32|64)|bf16|f16|f32|f64|c64|c128|token)"
    r"\[([0-9,]*)\](\{[^}]*\})?")


def _hbm_bytes(text: str) -> int:
    """Bytes of the shape's elements that live in DEFAULT memory (HBM)."""
    total = 0
    for dt, dims, layout in _SHAPE_LAYOUT_RE.findall(text):
        if layout and re.search(r"S\([1-9]", layout):
            continue  # VMEM/SMEM/host resident — no HBM traffic
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def analyze_hlo(hlo_text: str) -> dict:
    """Walk the optimized HLO text; return post-fusion traffic stats."""
    # 1) find computations that are fusion bodies (skip their instructions):
    #    fusion instructions reference them via calls=%name or calls={...}
    fusion_bodies = set()
    for m in re.finditer(r"fusion\([^)]*\)[^\n]*?calls=([%\w.\-]+)", hlo_text):
        fusion_bodies.add(m.group(1).lstrip("%"))

    traffic = 0
    writes = 0
    per_op = {}
    cur_comp = None
    cur_skip = False
    # name -> output bytes, per computation (operand lookup)
    sizes = {}

    # computation headers are UNINDENTED and end with '{'; parameter lists
    # can contain nested tuple parens (the ENTRY arg tuple), so match only
    # the leading name
    comp_re = re.compile(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(")
    # instruction: "  %name = <shape> opcode(...operands...)," possibly with
    # attrs. Tuple shapes may contain parens from TPU tile layouts
    # (e.g. {3,2,1,0:T(8,128)(2,1)}), hence the one-level-nested alternative.
    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
        r"(\((?:[^()]|\([^()]*\))*\)|\S+)\s+([\w\-]+)\((.*)$")

    for line in hlo_text.splitlines():
        if line and not line[0].isspace() and line.rstrip().endswith("{"):
            cm = comp_re.match(line)
            if cm:
                cur_comp = cm.group(1)
                cur_skip = cur_comp in fusion_bodies
                sizes = {}
            continue
        if line.startswith("}"):
            cur_comp = None
            continue
        if cur_comp is None:
            continue
        im = inst_re.match(line)
        if not im:
            continue
        name, shape_s, opcode, rest = im.groups()
        out_hbm = _hbm_bytes(shape_s)
        sizes[name] = out_hbm
        if cur_skip or opcode in _FREE_OPS:
            continue
        refs = [r for r in re.findall(r"%([\w.\-]+)", rest) if r in sizes]
        # async pairs: -start performs the source read, -done the dest write
        # (each side's other half lives in VMEM/SMEM for prefetch copies and
        # is already excluded by the memory-space filter on shapes)
        if opcode.endswith("-start") or opcode.endswith("-update"):
            reads = sum(sizes[r] for r in refs)
            out_hbm = 0
        elif opcode.endswith("-done"):
            reads = 0
        elif opcode in ("slice", "dynamic-slice", "gather"):
            # element-access ops touch only the bytes they produce
            reads = min(out_hbm, max((sizes[r] for r in refs), default=0))
        elif opcode == "dynamic-update-slice":
            upd = sizes[refs[1]] if len(refs) >= 2 else 0
            reads = upd
            out_hbm = min(out_hbm, upd)  # in-place DUS writes the update only
        else:
            reads = sum(sizes[r] for r in refs)
        t = out_hbm + reads
        traffic += t
        writes += out_hbm
        per_op[opcode] = per_op.get(opcode, 0) + t
    return {"traffic_bytes": traffic, "write_bytes": writes, "per_op": per_op}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--hlo-file", default=None,
                    help="analyze a saved compiled-HLO dump offline (no TPU); "
                         "pair with --ms-per-step from a measured run")
    ap.add_argument("--ms-per-step", type=float, default=None)
    args = ap.parse_args()

    if args.hlo_file:
        stats = analyze_hlo(open(args.hlo_file).read())
        dt = (args.ms_per_step or 0.0) / 1e3
        top = sorted(stats["per_op"].items(), key=lambda kv: -kv[1])[:12]
        out = {"post_fusion_bytes": stats["traffic_bytes"],
               "post_fusion_write_bytes": stats["write_bytes"],
               "top_ops_gb": {k: round(v / 1e9, 2) for k, v in top}}
        if dt:
            out["post_fusion_gbps"] = round(stats["traffic_bytes"] / dt / 1e9, 1)
            out["post_fusion_util"] = round(stats["traffic_bytes"] / dt / PEAK_BW, 3)
        print(json.dumps(out))
        return

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import _time, build

    model, state, step, batch, rng, x = build(args.size, args.batch, args.batch)
    lowered = step.lower(state, batch, rng)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    pre_bytes = float(ca.get("bytes accessed", 0.0))

    hlo = compiled.as_text()
    stats = analyze_hlo(hlo)
    post_bytes = stats["traffic_bytes"]

    dt = _time(step, state, batch, rng, args.steps)

    top = sorted(stats["per_op"].items(), key=lambda kv: -kv[1])[:12]
    print(json.dumps({
        "size": args.size, "batch": 2 * args.batch,
        "ms_per_step": round(dt * 1e3, 2),
        "images_per_sec": round(2 * args.batch / dt, 2),
        "flops_per_step": flops,
        "mfu": round(flops / dt / PEAK_FLOPS, 4),
        "pre_fusion_bytes": pre_bytes,
        "pre_fusion_gbps": round(pre_bytes / dt / 1e9, 1),
        "pre_fusion_util": round(pre_bytes / dt / PEAK_BW, 3),
        "post_fusion_bytes": post_bytes,
        "post_fusion_write_bytes": stats["write_bytes"],
        "post_fusion_gbps": round(post_bytes / dt / 1e9, 1),
        "post_fusion_util": round(post_bytes / dt / PEAK_BW, 3),
        "hlo_mb": round(len(hlo) / 2**20, 1),
        "top_ops_gb": {k: round(v / 1e9, 2) for k, v in top},
    }))


if __name__ == "__main__":
    main()
