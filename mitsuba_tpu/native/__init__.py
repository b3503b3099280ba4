"""ctypes bindings for the native C++ components (native/*.cpp).

The native library accelerates host-side work the reference also does in
C++: OBJ parsing (src/shapes/obj.cpp) and acceleration-structure building
(gkdtree.h's threaded builder). Everything degrades gracefully to the
pure-Python implementations when the shared library isn't built; `make -C
native` (or the automatic on-demand build below) produces it.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO = _NATIVE_DIR / "libmitsuba_native.so"
_lib = None
_build_attempted = False


def _load():
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _SO.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not _SO.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.parse_obj.restype = ctypes.c_int
    lib.build_lbvh.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_obj(path: str):
    """Native OBJ parse -> dict of numpy arrays, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    pos, nrm, uv = fp(), fp(), fp()
    idx = ip()
    nverts = ctypes.c_int64()
    ntris = ctypes.c_int64()
    has_n = ctypes.c_int32()
    has_uv = ctypes.c_int32()
    rc = lib.parse_obj(
        str(path).encode(), ctypes.byref(pos), ctypes.byref(nrm),
        ctypes.byref(uv), ctypes.byref(idx), ctypes.byref(nverts),
        ctypes.byref(ntris), ctypes.byref(has_n), ctypes.byref(has_uv),
    )
    if rc != 0:
        return None
    nv, nt = nverts.value, ntris.value
    out = {
        "vertices": np.ctypeslib.as_array(pos, (nv, 3)).copy(),
        "normals": np.ctypeslib.as_array(nrm, (nv, 3)).copy()
        if has_n.value else None,
        "uvs": np.ctypeslib.as_array(uv, (nv, 2)).copy()
        if has_uv.value else None,
        "indices": np.ctypeslib.as_array(idx, (nt, 3)).copy(),
    }
    lib.mesh_free(pos, nrm, uv, idx)
    return out


def build_lbvh(vertices: np.ndarray, indices: np.ndarray, leaf_size: int):
    """Native BVH build -> (aabb_min, aabb_max, miss, order) or None."""
    lib = _load()
    if lib is None:
        return None
    vertices = np.ascontiguousarray(vertices, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    amin, amax = fp(), fp()
    miss, order = ip(), ip()
    nodes = ctypes.c_int64()
    cap = ctypes.c_int64()
    rc = lib.build_lbvh(
        vertices.ctypes.data_as(fp), ctypes.c_int64(vertices.shape[0]),
        indices.ctypes.data_as(ip), ctypes.c_int64(indices.shape[0]),
        ctypes.c_int32(leaf_size),
        ctypes.byref(amin), ctypes.byref(amax), ctypes.byref(miss),
        ctypes.byref(order), ctypes.byref(nodes), ctypes.byref(cap),
    )
    if rc != 0:
        return None
    m_ = nodes.value
    c_ = cap.value
    out = (
        np.ctypeslib.as_array(amin, (m_, 3)).copy(),
        np.ctypeslib.as_array(amax, (m_, 3)).copy(),
        np.ctypeslib.as_array(miss, (m_,)).copy(),
        np.ctypeslib.as_array(order, (c_,)).copy(),
    )
    lib.bvh_free(amin, amax, miss, order)
    return out
