#!/usr/bin/env python
"""Opt-in, checksum-pinned pretrained-weight fetcher.

The reference auto-downloads backbone weights inside model construction
(/root/reference/model/efficientnet/model.py:366-399, utils.py:594-634 via
torch.hub). This rebuild never downloads implicitly (zero-egress default;
`extractor_weights` loads local files) — run THIS tool once, explicitly, on a
machine with network access:

    python tools/fetch_weights.py --out ckpt            # all three
    python tools/fetch_weights.py --out ckpt --only udeb4

Files and URLs are the reference README's exact pins
(/root/reference/README.md:100-107). Integrity: torch-hub filename
convention — the trailing hex fragment is the first 8 chars of the file's
sha256; verified after download, mismatches are deleted and reported.
"""

import argparse
import hashlib
import os
import sys
import urllib.request

WEIGHTS = {
    "udeb4": (
        "adv-efficientnet-b4-44fb3a87.pth",
        "https://github.com/lukemelas/EfficientNet-PyTorch/releases/download/1.0/"
        "adv-efficientnet-b4-44fb3a87.pth",
    ),
    "udr18": (
        "resnet18-5c106cde.pth",
        "https://download.pytorch.org/models/resnet18-5c106cde.pth",
    ),
    "udr50": (
        "resnet50_a1_0-14fe96d1.pth",
        "https://github.com/rwightman/pytorch-image-models/releases/download/"
        "v0.1-rsb-weights/resnet50_a1_0-14fe96d1.pth",
    ),
}


def expected_prefix(filename: str) -> str:
    """torch-hub convention: '<name>-<hex8+>.pth' -> sha256 prefix."""
    stem = filename.rsplit(".", 1)[0]
    return stem.rsplit("-", 1)[-1].rsplit("_", 1)[-1]


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(key: str, out_dir: str) -> str:
    filename, url = WEIGHTS[key]
    dest = os.path.join(out_dir, filename)
    want = expected_prefix(filename)
    if os.path.exists(dest):
        got = sha256_of(dest)
        if got.startswith(want):
            print(f"[ok] {filename} already present (sha256 {got[:8]})")
            return dest
        print(f"[!!] {filename} exists but sha256 {got[:8]} != {want}; refetching")
        os.remove(dest)
    print(f"[..] downloading {url}")
    tmp = dest + ".part"
    urllib.request.urlretrieve(url, tmp)  # noqa: S310 — pinned https URLs
    got = sha256_of(tmp)
    if not got.startswith(want):
        os.remove(tmp)
        raise RuntimeError(
            f"checksum mismatch for {filename}: sha256 {got[:8]} != expected {want}"
        )
    os.replace(tmp, dest)
    print(f"[ok] {filename} (sha256 {got[:8]})")
    return dest


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ckpt", help="destination directory")
    ap.add_argument("--only", choices=sorted(WEIGHTS), action="append",
                    help="fetch only this model's weights (repeatable)")
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    keys = args.only or sorted(WEIGHTS)
    failures = 0
    for k in keys:
        try:
            fetch(k, args.out)
        except Exception as e:
            failures += 1
            print(f"[!!] {k}: {type(e).__name__}: {e}", file=sys.stderr)
    if failures:
        print(f"{failures} fetch(es) failed — this environment may have no "
              "egress; run on a networked machine and copy the ckpt/ dir over.",
              file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
