"""ctypes bindings to the native C++ CPU geodesic engine.

Builds `native/libgeodesic.so` on demand (g++, OpenMP) and exposes the
batch tracers with the same result contract as ops.trace_batch. Used as a
fast float64 host-side oracle for large-sample cross-checks and as the
CPU comparison engine in benchmarks. Gated: `available()` is False when
no compiler/library is present, and all callers must skip gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgeodesic.so")
_lib = None


def _build() -> bool:
    if not os.path.exists(os.path.join(_NATIVE_DIR, "geodesic_engine.cpp")):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.kerr_trace_batch.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        ctypes.c_double, ctypes.c_double,
        np.ctypeslib.ndpointer(np.uint8),
        ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
    ]
    lib.schwarzschild_trace_batch.argtypes = [
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float64),
        ctypes.c_double, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32),
    ]
    lib.engine_num_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def num_threads() -> int:
    lib = _load()
    return int(lib.engine_num_threads()) if lib else 0


def kerr_trace_batch(M, a, r_obs, alphas, screen_thetas,
                     theta_obs=np.pi / 2, lambda_max=None, refine=None,
                     hermite_events=True, max_steps=200000):
    """Native Kerr batch trace; returns (final_alpha, winding, status)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    alphas = np.ascontiguousarray(alphas, np.float64)
    thetas = np.ascontiguousarray(screen_thetas, np.float64)
    n = alphas.size
    if refine is None:
        refine = np.zeros(n, np.uint8)
    else:
        refine = np.ascontiguousarray(refine, np.uint8)
    if lambda_max is None:
        lambda_max = max(5000.0, 6.0 * float(r_obs))
    fa = np.empty(n, np.float64)
    wind = np.empty(n, np.int32)
    status = np.empty(n, np.int32)
    lib.kerr_trace_batch(
        float(M), float(a), float(r_obs), n, alphas, thetas,
        float(theta_obs), float(lambda_max), refine,
        1 if hermite_events else 0, int(max_steps), fa, wind, status)
    return fa, wind, status


def schwarzschild_trace_batch(M, r_obs, alphas, phi_max=50.0, h=0.05):
    """Native Schwarzschild batch trace; returns (final_alpha, winding,
    status)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    alphas = np.ascontiguousarray(alphas, np.float64)
    n = alphas.size
    fa = np.empty(n, np.float64)
    wind = np.empty(n, np.int32)
    status = np.empty(n, np.int32)
    lib.schwarzschild_trace_batch(
        float(M), float(r_obs), n, alphas, float(phi_max), float(h),
        fa, wind, status)
    return fa, wind, status
