"""Native (C++) geometry kernels with lazy build + ctypes bindings.

The reference implements its runtime geometry in C++ (ros_tools Spline2D
fit + closest point, Douglas-Rachford projection, decomp_util polytopes);
this package is the TPU-framework's native equivalent. The shared library
builds on first import with g++ (cached next to the sources); every entry
point has a numpy fallback in the pure-Python modules, so a missing
toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "geometry.cpp")
_LIB = os.path.join(_HERE, "_geometry.so")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O2", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            return proc.stderr[-2000:]
        return None
    except Exception as e:  # pragma: no cover
        return str(e)


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded library, building it if needed. None if unavailable."""
    global _lib, _build_error
    if _lib is not None:
        return _lib
    if _build_error is not None:
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        err = _build()
        if err is not None:
            _build_error = err
            print(f"mpc_planner_tpu.native: build failed, using numpy fallbacks:\n{err}",
                  file=sys.stderr)
            return None
    lib = ctypes.CDLL(_LIB)
    c_d = ctypes.POINTER(ctypes.c_double)
    lib.fit_natural_cubic.restype = ctypes.c_int
    lib.fit_natural_cubic.argtypes = [c_d, c_d, ctypes.c_int64, c_d]
    lib.closest_point.restype = ctypes.c_double
    lib.closest_point.argtypes = [c_d, c_d, c_d, ctypes.c_int64,
                                  ctypes.c_double, ctypes.c_double,
                                  ctypes.c_double, ctypes.c_double,
                                  ctypes.c_int64]
    lib.dr_project.restype = None
    lib.dr_project.argtypes = [c_d, ctypes.c_int64, c_d, c_d,
                               ctypes.c_int64, ctypes.c_int]
    lib.free_polytope.restype = None
    lib.free_polytope.argtypes = [ctypes.c_double, ctypes.c_double, c_d,
                                  ctypes.c_int64, ctypes.c_int64,
                                  ctypes.c_double, c_d]
    c_i = ctypes.POINTER(ctypes.c_int64)
    lib.prm_search.restype = ctypes.c_int
    lib.prm_search.argtypes = [c_d, c_i, ctypes.c_int64, ctypes.c_int64,
                               c_d, c_d, c_d, ctypes.c_int64, ctypes.c_int64,
                               ctypes.c_double, ctypes.c_double,
                               ctypes.c_int64, ctypes.c_int64,
                               c_i, c_d, c_i, c_i]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def fit_natural_cubic(t: np.ndarray, y: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    t = np.ascontiguousarray(t, dtype=np.float64)
    y = np.ascontiguousarray(y, dtype=np.float64)
    n = len(t)
    out = np.empty(((n - 1), 4), dtype=np.float64)
    rc = lib.fit_natural_cubic(_ptr(t), _ptr(y), n, _ptr(out))
    if rc != 0:
        raise ValueError(f"fit_natural_cubic failed with code {rc}")
    return out


def closest_point(coeffs_x, coeffs_y, knots, px, py, lo, hi, samples=200) -> Optional[float]:
    lib = get_lib()
    if lib is None:
        return None
    cx = np.ascontiguousarray(coeffs_x, dtype=np.float64)
    cy = np.ascontiguousarray(coeffs_y, dtype=np.float64)
    kn = np.ascontiguousarray(knots, dtype=np.float64)
    return float(
        lib.closest_point(_ptr(cx), _ptr(cy), _ptr(kn), len(kn) - 1,
                          px, py, lo, hi, samples)
    )


def dr_project(points, obstacles, radii, iters: int = 3) -> Optional[np.ndarray]:
    """points [K,2] (copied), obstacles [K,M,2], radii [M]."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64).copy()
    obs = np.ascontiguousarray(obstacles, dtype=np.float64)
    rad = np.ascontiguousarray(radii, dtype=np.float64)
    lib.dr_project(_ptr(pts), pts.shape[0], _ptr(obs), _ptr(rad),
                   rad.shape[0], iters)
    return pts


def prm_search(pos, tk, n_goals: int, pred, clear, dt: float, v_max: float,
               labels_per_node: int, max_out: int, goal_cost=None):
    """Space-time Visibility-PRM core (guidance/prm.py hot loop).

    pos [n, 2], tk [n] stage indices (node 0 = start, last n_goals nodes =
    goals), pred [M, N+1, 2] obstacle tracks, clear [M] clearance radii,
    goal_cost [n_goals] optional additive per-goal penalty (applied before
    the homology dedup). Returns a list of (cost, node_index_chain)
    sorted by penalized cost, homology-key distinct — or None when the
    native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, dtype=np.float64)
    tk = np.ascontiguousarray(tk, dtype=np.int64)
    pred = np.ascontiguousarray(pred, dtype=np.float64)
    clear = np.ascontiguousarray(clear, dtype=np.float64)
    gc = np.ascontiguousarray(
        np.zeros(n_goals) if goal_cost is None else goal_cost, dtype=np.float64
    )
    n = pos.shape[0]
    out_count = np.zeros(1, dtype=np.int64)
    out_cost = np.empty(max_out, dtype=np.float64)
    out_len = np.empty(max_out, dtype=np.int64)
    out_nodes = np.empty((max_out, n), dtype=np.int64)
    i_ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    rc = lib.prm_search(
        _ptr(pos), i_ptr(tk), n, n_goals, _ptr(gc), _ptr(pred), _ptr(clear),
        pred.shape[0], pred.shape[1], dt, v_max, labels_per_node, max_out,
        i_ptr(out_count), _ptr(out_cost), i_ptr(out_len), i_ptr(out_nodes),
    )
    if rc != 0:
        return None  # e.g. M > 64: fall back to numpy
    k = int(out_count[0])
    return [(float(out_cost[i]), out_nodes[i, : out_len[i]].tolist())
            for i in range(k)]


def free_polytope(seed, points, max_constraints: int, radius: float) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    out = np.empty((max_constraints, 3), dtype=np.float64)
    lib.free_polytope(float(seed[0]), float(seed[1]), _ptr(pts),
                      pts.shape[0], max_constraints, radius, _ptr(out))
    return out
