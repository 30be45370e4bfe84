"""ctypes bindings for the native host runtime (libcugraph_tpu_host.so).

Auto-builds via make on first import if a compiler is available; all entry
points have numpy fallbacks so the package works without a toolchain.
The native path owns ingest ETL: degree histograms, degree-sorted
renumbering, CSR compression, symmetrization — the layers the reference
implements in C++/CUDA (SURVEY.md §2.1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcugraph_tpu_host.so")

_lib = None


def _try_load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.ct_degree_histogram.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32, i64p]
    lib.ct_renumber_map.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32, i32p]
    lib.ct_apply_map.argtypes = [i32p, ctypes.c_int32, i32p, ctypes.c_int64, i32p]
    lib.ct_build_csr.argtypes = [
        i32p, i32p, f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        i32p, i32p, i32p, f32p,
    ]
    lib.ct_symmetrize.argtypes = [i32p, i32p, f32p, ctypes.c_int64, i32p, i32p, f32p]
    lib.ct_symmetrize.restype = ctypes.c_int64
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.ct_benes_route.argtypes = [i64p, ctypes.c_int64, u8p]
    if hasattr(lib, "ct_radix_argsort_u64"):
        lib.ct_radix_argsort_u64.argtypes = [u64p, ctypes.c_int64, i64p]
        lib.ct_lane_fix_words.argtypes = [i64p, ctypes.c_int64, i32p]
    _lib = lib
    return lib



def available() -> bool:
    return _try_load() is not None


def _ptr(a: Optional[np.ndarray], typ):
    if a is None:
        return ctypes.cast(None, ctypes.POINTER(typ))
    return a.ctypes.data_as(ctypes.POINTER(typ))


def degree_histogram(src: np.ndarray, dst: np.ndarray, num_vertices: int) -> np.ndarray:
    lib = _try_load()
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    if lib is None:
        return np.bincount(src, minlength=num_vertices).astype(np.int64) + np.bincount(
            dst, minlength=num_vertices
        )
    out = np.empty(num_vertices, dtype=np.int64)
    lib.ct_degree_histogram(
        _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
        len(src), num_vertices, _ptr(out, ctypes.c_int64),
    )
    return out


def renumber_map(src: np.ndarray, dst: np.ndarray, num_vertices: int) -> np.ndarray:
    lib = _try_load()
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst = np.ascontiguousarray(dst, dtype=np.int32)
    if lib is None:
        deg = np.bincount(src, minlength=num_vertices) + np.bincount(
            dst, minlength=num_vertices
        )
        return np.argsort(-deg, kind="stable").astype(np.int32)
    out = np.empty(num_vertices, dtype=np.int32)
    lib.ct_renumber_map(
        _ptr(src, ctypes.c_int32), _ptr(dst, ctypes.c_int32),
        len(src), num_vertices, _ptr(out, ctypes.c_int32),
    )
    return out


def apply_map(new_to_old: np.ndarray, arr: np.ndarray) -> np.ndarray:
    lib = _try_load()
    new_to_old = np.ascontiguousarray(new_to_old, dtype=np.int32)
    arr = np.ascontiguousarray(arr, dtype=np.int32)
    if lib is None:
        old_to_new = np.empty_like(new_to_old)
        old_to_new[new_to_old] = np.arange(len(new_to_old), dtype=np.int32)
        return old_to_new[arr]
    out = np.empty_like(arr)
    lib.ct_apply_map(
        _ptr(new_to_old, ctypes.c_int32), len(new_to_old),
        _ptr(arr, ctypes.c_int32), len(arr), _ptr(out, ctypes.c_int32),
    )
    return out


def build_csr(
    majors: np.ndarray,
    minors: np.ndarray,
    weights: Optional[np.ndarray],
    num_majors: int,
    e_pad: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Returns (offsets, padded_majors, padded_minors, padded_weights)."""
    lib = _try_load()
    majors = np.ascontiguousarray(majors, dtype=np.int32)
    minors = np.ascontiguousarray(minors, dtype=np.int32)
    if weights is not None:
        weights = np.ascontiguousarray(weights, dtype=np.float32)
    e = len(majors)
    if lib is None:
        order = np.lexsort((minors, majors))
        sm, sn = majors[order], minors[order]
        sw = weights[order] if weights is not None else None
        offsets = np.zeros(num_majors + 1, dtype=np.int32)
        np.cumsum(np.bincount(sm, minlength=num_majors), out=offsets[1:])
        pm = np.concatenate([sm, np.full(e_pad - e, num_majors, np.int32)])
        pn = np.concatenate([sn, np.zeros(e_pad - e, np.int32)])
        pw = (
            None
            if sw is None
            else np.concatenate([sw, np.zeros(e_pad - e, np.float32)])
        )
        return offsets, pm, pn, pw
    offsets = np.empty(num_majors + 1, dtype=np.int32)
    pm = np.empty(e_pad, dtype=np.int32)
    pn = np.empty(e_pad, dtype=np.int32)
    pw = np.empty(e_pad, dtype=np.float32) if weights is not None else None
    lib.ct_build_csr(
        _ptr(majors, ctypes.c_int32), _ptr(minors, ctypes.c_int32),
        _ptr(weights, ctypes.c_float), e, num_majors, e_pad,
        _ptr(offsets, ctypes.c_int32), _ptr(pm, ctypes.c_int32),
        _ptr(pn, ctypes.c_int32), _ptr(pw, ctypes.c_float),
    )
    return offsets, pm, pn, pw


def radix_argsort(keys: np.ndarray):
    """Stable argsort of uint64 keys (C++ LSD radix); None without the lib.
    Composite-key replacement for np.lexsort in the layout builder."""
    lib = _try_load()
    if lib is None or not hasattr(lib, "ct_radix_argsort_u64"):
        return None
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    out = np.empty(len(keys), dtype=np.int64)
    lib.ct_radix_argsort_u64(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int64(len(keys)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out


def lane_fix_words(perms: np.ndarray):
    """Batched 128-wide Benes routing packed into 13-bit words; None
    without the lib. perms: (count, 128) int64."""
    lib = _try_load()
    if lib is None or not hasattr(lib, "ct_lane_fix_words"):
        return None
    perms = np.ascontiguousarray(perms, dtype=np.int64)
    out = np.empty(perms.shape, dtype=np.int32)
    lib.ct_lane_fix_words(
        perms.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(perms.shape[0]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def benes_route(perm: np.ndarray):
    """C++ Benes switch-bit routing; None if the native lib is missing."""
    lib = _try_load()
    if lib is None or not hasattr(lib, "ct_benes_route"):
        return None
    n = len(perm)
    k = max(n.bit_length() - 1, 1)
    assert (1 << k) == n, "benes_route requires power-of-two length"
    perm = np.ascontiguousarray(perm, dtype=np.int64)
    bits = np.zeros((2 * k - 1, n), dtype=np.uint8)
    lib.ct_benes_route(
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(n),
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return bits
