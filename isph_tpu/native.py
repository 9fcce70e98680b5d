"""ctypes bindings to the native host runtime (native/isph_host.cpp).

Builds the shared library on demand (g++ is part of the toolchain); every
entry point has a pure-Python fallback so the package works without a
compiler.  See native/isph_host.cpp for the C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libisph_host.so")

_lib = None


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "isph_host.cpp")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _LIB_PATH, src],
                check=True, capture_output=True,
            )
        except Exception:
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.isph_build_neighbors.restype = ctypes.c_int
    lib.isph_build_neighbors.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.isph_write_dump_frame.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def build_neighbors_host(
    x: np.ndarray,  # (N, D) host convention
    valid: np.ndarray,
    lo: Sequence[float],
    hi: Sequence[float],
    periodic: Sequence[bool],
    cutoff: float,
    max_neighbors: int,
):
    """Native cell-list neighbor build; returns (idx (K, N), mask (K, N),
    count (N,), max_count) in the device layout."""
    lib = _ensure_built()
    n, dim = x.shape
    x = np.ascontiguousarray(x, np.float64)
    validb = np.ascontiguousarray(valid, np.uint8)
    lo_a = np.asarray(lo, np.float64)
    hi_a = np.asarray(hi, np.float64)
    per = np.asarray(periodic, np.uint8)
    idx = np.empty((n, max_neighbors), np.int32)
    mask = np.empty((n, max_neighbors), np.uint8)
    count = np.empty(n, np.int32)

    if lib is None:
        # Python fallback: brute force (tests/tiny systems only)
        from isph_tpu.state import Domain
        from isph_tpu.ops.neighbors import build_neighbor_list_bruteforce
        import jax.numpy as jnp

        dom = Domain(lo=tuple(lo), hi=tuple(hi), periodic=tuple(bool(p) for p in periodic))
        nl = build_neighbor_list_bruteforce(
            jnp.asarray(x.T), jnp.asarray(valid), dom, cutoff, max_neighbors
        )
        return (np.asarray(nl.idx), np.asarray(nl.mask), np.asarray(nl.count),
                int(np.asarray(nl.count).max()))

    maxcnt = lib.isph_build_neighbors(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        validb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int(dim),
        lo_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hi_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        per.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_double(cutoff), ctypes.c_int(max_neighbors),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    # device layout: (K, N)
    return idx.T.copy(), mask.T.astype(bool).copy(), count, int(maxcnt)


def write_dump_frame_native(
    path: str, append: bool, timestep: int,
    cols: Sequence[np.ndarray], names: str,
    lo, hi, periodic, dim: int,
) -> bool:
    lib = _ensure_built()
    if lib is None:
        return False
    n = len(cols[0])
    arrs = [np.ascontiguousarray(c, np.float64) for c in cols]
    ptrs = (ctypes.POINTER(ctypes.c_double) * len(arrs))(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) for a in arrs]
    )
    lo_a = np.asarray(lo, np.float64)
    hi_a = np.asarray(hi, np.float64)
    per = np.asarray(periodic, np.uint8)
    rc = lib.isph_write_dump_frame(
        path.encode(), ctypes.c_int(1 if append else 0), ctypes.c_int64(timestep),
        ctypes.c_int64(n), ctypes.c_int(len(arrs)), ptrs, names.encode(),
        lo_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        hi_a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        per.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(dim),
    )
    return rc == 0
