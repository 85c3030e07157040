#!/usr/bin/env python
"""Pack encoded frames into a FrameStore (.udb) — the LMDB replacement.

The reference stores pre-cropped FAS frames in LMDB environments keyed by the
frame's relative path (dataset/abstract_dataset.py:28-31,117-124). This tool
builds the equivalent store from a directory tree (keys = paths relative to
--root, with the same `_crop` suffix conventions already applied by your
cropping step), or converts an existing LMDB if py-lmdb is available.

Usage:
  python tools/build_store.py --root /data/Oulu_NPU --out /data/lmdb/Oulu_NPU.udb
  python tools/build_store.py --from-lmdb /data/lmdb/Oulu_NPU --out /data/lmdb/Oulu_NPU.udb
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unidefense_tpu.data.store import FrameStoreWriter  # noqa: E402


def from_tree(root: str, out: str, exts=(".jpg", ".jpeg", ".png")):
    n = 0
    with FrameStoreWriter(out) as w:
        for dirpath, _, files in os.walk(root):
            for fn in sorted(files):
                if not fn.lower().endswith(exts):
                    continue
                full = os.path.join(dirpath, fn)
                key = os.path.relpath(full, root)
                with open(full, "rb") as f:
                    w.add(key, f.read())
                n += 1
                if n % 10000 == 0:
                    print(f"  {n} frames packed...")
    print(f"Packed {n} frames into {out}")


def from_lmdb(lmdb_path: str, out: str):
    import lmdb  # type: ignore

    env = lmdb.open(lmdb_path, readonly=True, max_readers=16)
    n = 0
    with env.begin(write=False) as txn, FrameStoreWriter(out) as w:
        for key, value in txn.cursor():
            w.add(key.decode(), bytes(value))
            n += 1
            if n % 10000 == 0:
                print(f"  {n} entries converted...")
    print(f"Converted {n} entries from {lmdb_path} into {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", help="Directory tree of encoded frames to pack.")
    p.add_argument("--from-lmdb", help="Existing LMDB environment to convert.")
    p.add_argument("--out", required=True, help="Output .udb path.")
    args = p.parse_args()
    if args.from_lmdb:
        from_lmdb(args.from_lmdb, args.out)
    elif args.root:
        from_tree(args.root, args.out)
    else:
        p.error("one of --root or --from-lmdb is required")
