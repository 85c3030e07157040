"""ctypes binding for the native batched JPEG decoder (native/udjpeg.cc).

`decode_batch(blobs, boxes, out_h, out_w)` decodes a whole batch of encoded
JPEG frames with a C++ thread pool — crop + bilinear resize included — into
one contiguous uint8 NHWC array. Falls back to per-image cv2 when the shared
library is missing or an input is not a JPEG (e.g. PNG frames in Celeb-DF).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libudjpeg.so"),
        os.path.join(os.path.dirname(here), "native", "libudjpeg.so"),
    ]
    env = os.environ.get("UDJPEG_LIB")
    if env:
        candidates.insert(0, env)
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("UD_DISABLE_NATIVE"):
        # Force the cv2 fallback (A/B alignment: the reference decodes with
        # cv2; libjpeg-turbo IDCT variants can differ by ±1 LSB per pixel,
        # which is noise normally but a confound when comparing engines
        # batch-for-batch — tools/engine_ab.py --align-order sets this).
        return None
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.ud_decode_batch.restype = ctypes.c_int
        lib.ud_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _is_jpeg(blob: bytes) -> bool:
    return len(blob) > 2 and blob[0] == 0xFF and blob[1] == 0xD8


def decode_batch(
    blobs: Sequence[bytes],
    boxes: Optional[np.ndarray],
    out_h: int,
    out_w: int,
    n_threads: int = 0,
) -> np.ndarray:
    """Decode encoded frames to (N, out_h, out_w, 3) RGB uint8.

    boxes: int32 (N, 4) [x1, y1, x2, y2] crop rectangles (x2<=x1 = no crop),
    or None. Uses the native pool for JPEGs; cv2 otherwise.
    """
    n = len(blobs)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    lib = get_lib()
    all_jpeg = all(_is_jpeg(b) for b in blobs)
    if lib is not None and all_jpeg and n > 0:
        if n_threads <= 0:
            n_threads = min(os.cpu_count() or 1, n)
        blob_ptrs = (ctypes.c_char_p * n)(*blobs)
        sizes = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
        if boxes is not None:
            boxes_arr = np.ascontiguousarray(boxes, np.int32)
            boxes_ptr = boxes_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        else:
            boxes_ptr = None
        lib.ud_decode_batch(
            ctypes.cast(blob_ptrs, ctypes.POINTER(ctypes.c_char_p)),
            sizes,
            n,
            boxes_ptr,
            out_h,
            out_w,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_threads,
        )
        return out

    import cv2

    for i, blob in enumerate(blobs):
        img = cv2.imdecode(np.frombuffer(blob, np.uint8), cv2.IMREAD_COLOR)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if boxes is not None:
            x1, y1, x2, y2 = boxes[i]
            if x2 > x1 and y2 > y1:
                h, w = img.shape[:2]
                img = img[max(0, y1) : min(h, y2), max(0, x1) : min(w, x2)]
        out[i] = cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    return out
