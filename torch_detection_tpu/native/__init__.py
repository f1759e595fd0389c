"""Native (C++) host-side kernels, loaded via ctypes with a lazy g++ build.

The TPU compute path is JAX/XLA/Pallas; this tier covers host-side hot loops
the reference would have needed native code for (its eval tier never
existed): greedy detection<->gt matching and the host IoU matrix.  Falls
back to the pure-numpy implementations in ``engine/eval.py`` when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "eval_match.cpp")
_LIB = os.path.join(_DIR, "libtd_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # no compiler / failed build -> numpy fallback
        logger.warning("native build failed (%s); using numpy fallback", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    stale = not os.path.exists(_LIB) or (
        os.path.exists(_SRC) and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    )
    if stale and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        logger.warning("native load failed (%s); using numpy fallback", e)
        return None
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64 = ctypes.c_int64
    lib.td_match_image.argtypes = [dp, i64, dp, i64, u8p, dp, i64,
                                   ctypes.c_double, ctypes.c_double, u8p, u8p]
    lib.td_match_image.restype = None
    lib.td_iou_matrix.argtypes = [dp, i64, dp, i64, ctypes.c_double, dp]
    lib.td_iou_matrix.restype = None
    lib.td_coco_match.argtypes = [dp, i64, i64, u8p, u8p, dp, i64, u8p, u8p]
    lib.td_coco_match.restype = None
    _lib = lib
    return _lib


def _as_c(arr: np.ndarray, dtype):
    a = np.ascontiguousarray(arr, dtype=dtype)
    return a, a.ctypes.data_as(
        ctypes.POINTER(ctypes.c_double if dtype == np.float64 else ctypes.c_uint8)
    )


def match_image(
    det_boxes: np.ndarray,
    gt_boxes: np.ndarray,
    gt_ignore: np.ndarray,
    ignore_regions: np.ndarray,
    iou_thr: float,
    offset: float = 1.0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native greedy matcher; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d = len(det_boxes)
    g = len(gt_boxes)
    r = len(ignore_regions)
    det_a, det_p = _as_c(det_boxes.reshape(-1, 4), np.float64)
    gt_a, gt_p = _as_c(gt_boxes.reshape(-1, 4), np.float64)
    gi_a, gi_p = _as_c(np.asarray(gt_ignore, np.uint8).reshape(-1), np.uint8)
    rg_a, rg_p = _as_c(np.asarray(ignore_regions, np.float64).reshape(-1, 4), np.float64)
    matched = np.zeros(d, np.uint8)
    det_ignored = np.zeros(d, np.uint8)
    lib.td_match_image(
        det_p, d, gt_p, g, gi_p, rg_p, r,
        ctypes.c_double(iou_thr), ctypes.c_double(offset),
        matched.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        det_ignored.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return matched.astype(bool), det_ignored.astype(bool)


def coco_match(
    iou: np.ndarray,  # (D, G) float, gt columns sorted non-ignored first
    gt_ig: np.ndarray,  # (G,) bool
    gt_crowd: np.ndarray,  # (G,) bool
    iou_thrs: np.ndarray,  # (T,)
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native COCO evaluateImg matcher; returns (matched, ignored) each
    (T, D) bool, or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    d, g = iou.shape
    t = len(iou_thrs)
    iou_a, iou_p = _as_c(iou.reshape(d, g), np.float64)
    gi_a, gi_p = _as_c(np.asarray(gt_ig, np.uint8).reshape(-1), np.uint8)
    gc_a, gc_p = _as_c(np.asarray(gt_crowd, np.uint8).reshape(-1), np.uint8)
    th_a, th_p = _as_c(np.asarray(iou_thrs, np.float64).reshape(-1), np.float64)
    matched = np.zeros((t, d), np.uint8)
    ignored = np.zeros((t, d), np.uint8)
    lib.td_coco_match(
        iou_p, d, g, gi_p, gc_p, th_p, t,
        matched.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ignored.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return matched.astype(bool), ignored.astype(bool)


def iou_matrix(a: np.ndarray, b: np.ndarray, offset: float = 1.0) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    n, m = len(a), len(b)
    a_a, a_p = _as_c(a.reshape(-1, 4), np.float64)
    b_a, b_p = _as_c(b.reshape(-1, 4), np.float64)
    out = np.zeros((n, m), np.float64)
    lib.td_iou_matrix(a_p, n, b_p, m, ctypes.c_double(offset),
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
