"""ctypes bindings to the C++ evaluation kernels (native/).

Replaces the host-side hot loops of the evaluator — per-(image, category)
box IoU and the greedy matcher over 10 IoU thresholds (lvis-api eval.py's
slowest component) — with -O3 C++. Falls back to the numpy implementations
transparently when the shared library hasn't been built
(`make -C native`); `build()` compiles it on demand.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbags_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile the library (g++). Returns True on success."""
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=quiet,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i64 = ctypes.c_int64
    dp = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32 = ctypes.c_int32
    i32p = ctypes.POINTER(ctypes.c_int32)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.box_iou_xywh.argtypes = [dp, i64, dp, i64, u8p, dp]
    lib.greedy_match.argtypes = [dp, i64, i64, dp, i64, i8p, dp, dp, i8p]
    lib.rle_decode.argtypes = [i64p, i64, i64, i64, u8p]
    lib.mask_iou.argtypes = [u8p, i64, u8p, i64, i64, u8p, dp]
    lib.bags_jpeg_dims.argtypes = [u8p, i64, i32p, i32p]
    lib.bags_jpeg_dims.restype = ctypes.c_int
    lib.bags_preprocess_jpeg.argtypes = [
        u8p, i64, i32, i32, i32, fp, fp, fp, i32, i32,
    ]
    lib.bags_preprocess_jpeg.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def box_iou_xywh(dt, gt, iscrowd=None) -> np.ndarray:
    """(D, G) IoU; numpy-fallback-compatible with eval.lvis_eval."""
    lib = _load()
    dt = np.ascontiguousarray(dt, np.float64).reshape(-1, 4)
    gt = np.ascontiguousarray(gt, np.float64).reshape(-1, 4)
    nd, ng = len(dt), len(gt)
    if nd == 0 or ng == 0:
        return np.zeros((nd, ng))
    if lib is None:
        from .eval.lvis_eval import box_iou_xywh as np_iou

        return np_iou(dt, gt, iscrowd)
    crowd = np.ascontiguousarray(
        iscrowd if iscrowd is not None else np.zeros(ng), np.uint8
    )
    out = np.zeros((nd, ng), np.float64)
    lib.box_iou_xywh(
        _dptr(dt), nd, _dptr(gt), ng,
        crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _dptr(out),
    )
    return out


def greedy_match(ious, iou_thrs, gt_ig):
    """(dt_m, gt_m, dt_ig) each (T, D)/(T, G) — eval.py matcher semantics.

    dt_m/gt_m hold 1-based matched indices (0 = unmatched). Returns None if
    the native library is unavailable (caller falls back to python).
    """
    lib = _load()
    if lib is None:
        return None
    ious = np.ascontiguousarray(ious, np.float64)
    nd, ng = ious.shape
    thrs = np.ascontiguousarray(iou_thrs, np.float64)
    nt = len(thrs)
    gt_ig8 = np.ascontiguousarray(gt_ig, np.int8)
    dt_m = np.zeros((nt, nd), np.float64)
    gt_m = np.zeros((nt, ng), np.float64)
    dt_ig = np.zeros((nt, nd), np.int8)
    lib.greedy_match(
        _dptr(ious), nd, ng, _dptr(thrs), nt,
        gt_ig8.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        _dptr(dt_m), _dptr(gt_m),
        dt_ig.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return dt_m, gt_m, dt_ig


def jpeg_dims(data: bytes):
    """(width, height) of a JPEG byte stream, or None if not decodable."""
    lib = _load()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    rc = lib.bags_jpeg_dims(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    return int(w.value), int(h.value)


def preprocess_jpeg(
    data: bytes,
    new_w: int,
    new_h: int,
    flip: bool,
    mean: np.ndarray,
    std: np.ndarray,
    out: np.ndarray,  # (out_h, out_w, 3) f32, C-contiguous, pre-zeroed
) -> bool:
    """Decode + fused resize/flip/normalize into `out`'s top-left.

    The whole pixel path runs in C++ with the GIL released (ctypes), so a
    ThreadPoolExecutor parallelizes it across cores. Returns False if the
    native library is missing or the stream isn't a decodable RGB/gray JPEG
    (caller falls back to the cv2 path).
    """
    lib = _load()
    if lib is None:
        return False
    assert out.dtype == np.float32 and out.flags["C_CONTIGUOUS"]
    buf = np.frombuffer(data, np.uint8)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.bags_preprocess_jpeg(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(buf),
        int(new_w), int(new_h), int(bool(flip)),
        mean32.ctypes.data_as(fp), std32.ctypes.data_as(fp),
        out.ctypes.data_as(fp), out.shape[0], out.shape[1],
    )
    return rc == 0


def mask_iou_bitmaps(a: np.ndarray, b: np.ndarray, iscrowd=None) -> np.ndarray:
    """(A, B) IoU over flattened uint8 bitmasks (A, P) x (B, P)."""
    lib = _load()
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    na, nb = len(a), len(b)
    if na == 0 or nb == 0:
        return np.zeros((na, nb))
    if lib is None:
        inter = (a[:, None, :] & b[None, :, :]).sum(-1).astype(np.float64)
        sa = a.sum(-1)[:, None]
        sb = b.sum(-1)[None, :]
        union = sa + sb - inter
        return np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    crowd = np.ascontiguousarray(
        iscrowd if iscrowd is not None else np.zeros(nb), np.uint8
    )
    out = np.zeros((na, nb), np.float64)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.mask_iou(
        a.ctypes.data_as(u8), na, b.ctypes.data_as(u8), nb, a.shape[1],
        crowd.ctypes.data_as(u8), _dptr(out),
    )
    return out
