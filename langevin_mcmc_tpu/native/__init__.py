"""ctypes bindings for the native host components (numpy fallback if the
shared library hasn't been built — `make -C langevin_mcmc_tpu/native`)."""

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    so = os.path.join(here, 'libnative.so')
    if not os.path.exists(so):
        try:
            subprocess.run(['make', '-C', here], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.lmcmc_build_bvh.restype = ctypes.c_int
    lib.lmcmc_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    lib.lmcmc_vertex_normals.restype = None
    lib.lmcmc_vertex_normals.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.lmcmc_woop_tables.restype = None
    lib.lmcmc_woop_tables.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8)]
    _LIB = lib
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def build_bvh_native(tri_lo, tri_hi):
    """Binned-SAH build; returns (nodes [N,8] f32, prim_ids [T] i32) or None."""
    lib = _load()
    if lib is None:
        return None
    T = tri_lo.shape[0]
    lo = np.ascontiguousarray(tri_lo, np.float32)
    hi = np.ascontiguousarray(tri_hi, np.float32)
    cap = max(4 * T, 64)
    nodes = np.empty((cap, 8), np.float32)
    prims = np.empty(T, np.int32)
    n = lib.lmcmc_build_bvh(_fptr(lo), _fptr(hi), T, _fptr(nodes), cap,
                            prims.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if n < 0:
        return None
    return nodes[:n].copy(), prims


def vertex_normals_native(verts, indices, flip=False):
    """Angle-weighted vertex normals; returns [V,3] f32 or None."""
    lib = _load()
    if lib is None:
        return None
    v = np.ascontiguousarray(verts, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    out = np.empty_like(v)
    lib.lmcmc_vertex_normals(
        _fptr(v), v.shape[0],
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), idx.shape[0],
        1 if flip else 0, _fptr(out))
    return out


def woop_tables_native(tri):
    """Per-triangle inverse frames; returns (B [3,3T], C [3T], ok [T]) or None."""
    lib = _load()
    if lib is None:
        return None
    t = np.ascontiguousarray(tri, np.float32)
    T = t.shape[0]
    B = np.empty((3, 3 * T), np.float32)
    C = np.empty(3 * T, np.float32)
    ok = np.empty(T, np.uint8)
    lib.lmcmc_woop_tables(_fptr(t), T, _fptr(B), _fptr(C),
                          ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return B, C, ok.astype(bool)
