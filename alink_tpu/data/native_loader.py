"""ctypes binding for the native C++ batched image loader.

``native/loader.cc`` decodes JPEG/PNG with libjpeg/libpng on a C++ thread
pool and bilinear-resizes (cv2 half-pixel semantics) straight into a
float32 (N, H, W, 3) buffer — the native replacement for the reference's
per-image PIL+cv2 Python loop (readDFW.py:82).  Built with
``make -C native`` (auto-attempted on first use); ``data.loader`` falls
back to the PIL path when the library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liballoader.so")

_lib = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.alink_decode_resize_batch.restype = ctypes.c_int
        lib.alink_decode_resize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        if hasattr(lib, "alink_decode_resize_batch_v2"):
            lib.alink_decode_resize_batch_v2.restype = ctypes.c_int
            lib.alink_decode_resize_batch_v2.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.c_int,
            ]
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def available() -> bool:
    return get_lib() is not None


def decode_resize_batch(
    paths: Sequence[str],
    image_res: tuple[int, int],
    threads: int | None = None,
    dct_scale: bool = False,
) -> tuple[np.ndarray, int]:
    """Decode+resize a path list -> ((N, H, W, 3) float32, n_failures).

    ``image_res`` is (width, height), the reference's cv2 dsize convention
    (matching ``loader.load_image_list``).  Failed slots are zero-filled.

    ``dct_scale=True`` lets libjpeg decode at the largest 1/2^k scale
    that still covers the target before the bilinear resize — a ~4-16x
    per-core ingest speedup on photos >=2x the target resolution (see
    BENCHMARKS.md "Host ingest").  Off by default: the scaled decode is
    a box-filtered approximation, so bit-parity with the PIL fallback
    path only holds when it is off.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable (build failed)")
    w, h = image_res
    n = len(paths)
    out = np.zeros((n, h, w, 3), np.float32)
    if n == 0:
        return out, 0
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if threads is None:
        threads = min(16, os.cpu_count() or 1)
    buf = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if dct_scale and not hasattr(lib, "alink_decode_resize_batch_v2"):
        raise RuntimeError("dct_scale requires a rebuilt liballoader.so "
                           "(make -C native)")
    if dct_scale:
        failures = lib.alink_decode_resize_batch_v2(
            arr, n, h, w, buf, threads, 1)
    else:
        failures = lib.alink_decode_resize_batch(arr, n, h, w, buf, threads)
    return out, int(failures)
