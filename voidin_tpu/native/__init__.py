"""Native (C++) host-path acceleration, loaded via ctypes.

The BVH/TLAS builders are the host-side hot loops of scene setup (the
reference builds them in Rust; SURVEY.md flags them [C++] for our build).
The shared library is compiled on first use with the system compiler; all
callers fall back to the vectorized numpy builders when unavailable
(VOIDIN_NATIVE=0 forces the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [
    os.path.join(_DIR, "bvh_builder.cpp"),
    os.path.join(_DIR, "texture_packer.cpp"),
]
_SRC = _SRCS[0]  # back-compat alias
_LIB = os.path.join(_DIR, "libvoidin_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> bool:
    for cc in ("g++", "c++", "clang++"):
        try:
            subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS,
                 "-o", _LIB],
                check=True,
                capture_output=True,
            )
            return True
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if os.environ.get("VOIDIN_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # The .so is never shipped (gitignored): a fresh checkout always
        # compiles from source on first use; the mtime check only skips
        # recompiles of a local build.
        if not os.path.exists(_LIB) or any(
            os.path.getmtime(_LIB) < os.path.getmtime(s) for s in _SRCS
        ):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.voidin_build_blas.restype = ctypes.c_int32
        lib.voidin_build_blas.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.voidin_build_tlas.restype = ctypes.c_int32
        lib.voidin_build_tlas.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.voidin_pack_texture.restype = ctypes.c_int32
        lib.voidin_pack_texture.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def pack_texture(img: np.ndarray, base: int, total: int) -> Optional[np.ndarray]:
    """Native texel-quad mip packer; None when the library is unavailable.

    img: (h, w, 4) u8. Returns (total, 32) u8 rows matching the numpy
    packer in scene/texture.py (exact at fine mip levels; the deepest mips
    may differ by a few u8 steps from float accumulation order)."""
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    out = np.zeros((total, 32), np.uint8)
    rc = lib.voidin_pack_texture(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0],
        img.shape[1],
        base,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def build_blas_native(vertices: np.ndarray, indices: np.ndarray):
    """C++ binned-SAH BLAS; returns (nodes structured array, permuted indices)
    or None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    from ..rt.bvh import NODE_DTYPE

    verts = np.ascontiguousarray(vertices, np.float32)
    idx = np.ascontiguousarray(indices, np.int32).copy()
    n_tris = idx.size // 3
    nodes = np.zeros(2 * n_tris + 2, NODE_DTYPE)
    n = lib.voidin_build_blas(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(verts),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_tris,
        nodes.ctypes.data,
    )
    if n <= 0:
        return None
    return nodes[:n].copy(), idx


def build_tlas_native(inst_min: np.ndarray, inst_max: np.ndarray):
    lib = load()
    if lib is None:
        return None
    from ..rt.bvh import TLAS_DTYPE

    mn = np.ascontiguousarray(inst_min, np.float32)
    mx = np.ascontiguousarray(inst_max, np.float32)
    nodes = np.zeros(2 * len(mn) + 1, TLAS_DTYPE)
    n = lib.voidin_build_tlas(
        mn.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(mn),
        nodes.ctypes.data,
    )
    if n <= 0:
        return None
    return nodes[:n].copy()
