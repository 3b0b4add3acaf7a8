"""ctypes bindings for the native host kernels (native/fastlivo_native.cpp).

Auto-builds the shared library with `make` on first import if a compiler
is present; every entry point has a numpy fallback so the engine runs
without the native lib (slower host-side ingestion only — the device
compute path is unaffected).
"""

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfastlivo_native.so"))

_lib = None


def _try_load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.flv_decode_strided.restype = ctypes.c_int
    lib.flv_decode_strided.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        ctypes.c_int32, ctypes.c_float, f32p, f32p,
    ]
    lib.flv_voxel_downsample.restype = ctypes.c_int
    lib.flv_voxel_downsample.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, f32p, ctypes.c_int64,
    ]
    lib.flv_undistort_check.restype = None
    lib.flv_undistort_check.argtypes = [
        f32p, f32p, ctypes.c_int64, f64p, f64p, f64p, f64p, f64p, f64p, f64p,
        ctypes.c_int32, f64p, f64p, f64p, f64p, f32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _try_load() is not None


def decode_strided(data: bytes, n: int, stride: int, off_xyz: Tuple[int, int, int],
                   off_t: int = -1, time_mode: int = 0, blind: float = 0.8,
                   filter_num: int = 1, time_scale: float = 1.0):
    """Strided decode of a raw point buffer -> (pts (k,3) f32, t (k,) f32)."""
    lib = _try_load()
    buf = np.frombuffer(data, np.uint8)
    if lib is None:
        # numpy fallback
        idx = np.arange(n) * stride
        def fld(off, dt, size):
            return np.stack([
                np.frombuffer(data, dt, count=1, offset=int(i + off))[0]
                for i in idx
            ]) if n else np.zeros(0, dt)
        x = buf.view(np.uint8)
        xyz = np.zeros((n, 3), np.float32)
        for j, off in enumerate(off_xyz):
            xyz[:, j] = np.frombuffer(
                np.ascontiguousarray(
                    buf.reshape(n, stride)[:, off:off + 4]
                ).tobytes(), np.float32)
        if time_mode == 0 or off_t < 0:
            t = np.zeros(n, np.float32)
        else:
            sz, dt = {1: (4, np.float32), 2: (8, np.float64), 3: (4, np.uint32)}[time_mode]
            t = np.frombuffer(
                np.ascontiguousarray(buf.reshape(n, stride)[:, off_t:off_t + sz]).tobytes(),
                dt).astype(np.float64)
            if time_mode == 3:
                t = t * 1e-9
            t = (t * time_scale).astype(np.float32)
        keep = np.isfinite(xyz).all(1) & ((xyz * xyz).sum(1) > blind * blind)
        sel = np.flatnonzero(keep)[::max(filter_num, 1)]
        return xyz[sel], t[sel]
    out_xyz = np.empty((n, 3), np.float32)
    out_t = np.empty(n, np.float32)
    k = lib.flv_decode_strided(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, stride,
        off_xyz[0], off_xyz[1], off_xyz[2], off_t, time_mode,
        blind, filter_num, time_scale,
        out_xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out_xyz[:k].copy(), out_t[:k].copy()


def voxel_downsample(pts: np.ndarray, leaf: float, max_out: int = 1 << 22):
    """Centroid voxel-grid downsample (host). Falls back to numpy."""
    pts = np.ascontiguousarray(pts, np.float32)
    lib = _try_load()
    if lib is None:
        keys = np.floor(pts / leaf).astype(np.int64)
        _, inv = np.unique(keys, axis=0, return_inverse=True)
        k = inv.max() + 1 if len(inv) else 0
        sums = np.zeros((k, 3), np.float64)
        np.add.at(sums, inv, pts)
        cnt = np.bincount(inv, minlength=k)[:, None]
        return (sums / np.maximum(cnt, 1)).astype(np.float32)
    out = np.empty((min(len(pts), max_out), 3), np.float32)
    k = lib.flv_voxel_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts), leaf,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(out),
    )
    return out[:k].copy()


def undistort_oracle(pts, t_offs, seg_t0, seg_t1, seg_R, seg_p, seg_v, seg_a,
                     seg_w, R_end, p_end, ext_R, ext_T):
    """Float64 CPU oracle of the device undistortion kernel (tests)."""
    lib = _try_load()
    assert lib is not None, "native library unavailable"
    pts = np.ascontiguousarray(pts, np.float32)
    t_offs = np.ascontiguousarray(t_offs, np.float32)
    out = np.empty_like(pts)
    c = np.ascontiguousarray
    f64p = ctypes.POINTER(ctypes.c_double)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.flv_undistort_check(
        pts.ctypes.data_as(f32p), t_offs.ctypes.data_as(f32p), len(pts),
        c(seg_t0, np.float64).ctypes.data_as(f64p),
        c(seg_t1, np.float64).ctypes.data_as(f64p),
        c(seg_R, np.float64).ctypes.data_as(f64p),
        c(seg_p, np.float64).ctypes.data_as(f64p),
        c(seg_v, np.float64).ctypes.data_as(f64p),
        c(seg_a, np.float64).ctypes.data_as(f64p),
        c(seg_w, np.float64).ctypes.data_as(f64p),
        len(seg_t0),
        c(R_end, np.float64).ctypes.data_as(f64p),
        c(p_end, np.float64).ctypes.data_as(f64p),
        c(ext_R, np.float64).ctypes.data_as(f64p),
        c(ext_T, np.float64).ctypes.data_as(f64p),
        out.ctypes.data_as(f32p),
    )
    return out
