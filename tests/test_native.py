"""Native C++ geometry kernels vs numpy references."""

import numpy as np
import pytest

from mpc_planner_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def test_fit_matches_numpy():
    from mpc_planner_tpu.spline_fit import _solve_tridiagonal

    t = np.linspace(0, 5, 9)
    y = np.sin(t)
    out = native.fit_natural_cubic(t, y)
    # numpy reference (same algorithm reimplemented inline)
    h = np.diff(t)
    rhs = 6.0 * ((y[2:] - y[1:-1]) / h[1:] - (y[1:-1] - y[:-2]) / h[:-1])
    diag = 2.0 * (h[:-1] + h[1:])
    m_inner = _solve_tridiagonal(h[:-1][1:], diag, h[1:][:-1], rhs)
    M = np.zeros(len(t))
    M[1:-1] = m_inner
    a = (M[1:] - M[:-1]) / (6.0 * h)
    b = M[:-1] / 2.0
    c = (y[1:] - y[:-1]) / h - h * (2.0 * M[:-1] + M[1:]) / 6.0
    ref = np.stack([a, b, c, y[:-1]], axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_closest_point_native():
    from mpc_planner_tpu.spline_fit import PathSpline2D

    x = np.linspace(0, 10, 11)
    y = np.zeros(11)
    path = PathSpline2D(x, y)
    s = native.closest_point(path.sx.coeffs, path.sy.coeffs, path.sx.t,
                             3.7, 2.0, 0.0, path.length)
    np.testing.assert_allclose(s, 3.7, atol=1e-3)


def test_dr_project_native():
    points = np.array([[0.0, 0.0], [5.0, 5.0]])
    obstacles = np.array([[[0.2, 0.0]], [[100.0, 100.0]]])  # [K, M, 2]
    radii = np.array([1.0])
    out = native.dr_project(points, obstacles, radii)
    # First point pushed out of the disc
    assert np.linalg.norm(out[0] - obstacles[0, 0]) >= 1.0 - 1e-9
    # Second point untouched
    np.testing.assert_allclose(out[1], points[1])


def test_free_polytope_native_matches_python():
    from mpc_planner_tpu.modules.decomp_constraints import free_polytope

    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 2, (40, 2))
    seed = np.zeros(2)
    ref = free_polytope(seed, pts.copy(), 6, 0.3)
    out = native.free_polytope(seed, pts, 6, 0.3)
    np.testing.assert_allclose(out, ref, atol=1e-9)


def test_spline_fit_uses_native():
    """The Python CubicSpline transparently uses the native kernel."""
    from mpc_planner_tpu.spline_fit import CubicSpline

    t = np.linspace(0, 3, 7)
    y = t**2
    spl = CubicSpline(t, y)
    np.testing.assert_allclose(spl(t), y, atol=1e-9)


def test_prm_search_native_matches_numpy(cfg):
    """The C++ prm_search returns the same cost-ordered homology-distinct
    chains as the numpy fallback."""
    if not native.available():
        pytest.skip("native library unavailable")
    from mpc_planner_tpu.guidance import VisibilityPRMPlanner

    prm = VisibilityPRMPlanner(
        cfg.replace(t_mpc=cfg.t_mpc.__class__(guidance_backend="prm")))
    rng = np.random.default_rng(3)
    N = cfg.N
    n, n_goals = 24, 3
    pos = np.concatenate([
        np.zeros((1, 2)),
        rng.uniform([-1, -3], [9, 3], size=(n - 1 - n_goals, 2)),
        np.stack([np.full(n_goals, 8.0), np.linspace(-1, 1, n_goals)], -1),
    ])
    tk = np.concatenate([
        [0], rng.integers(1, N, n - 1 - n_goals), np.full(n_goals, N)
    ]).astype(np.int64)
    M = 3
    base = rng.uniform([1, -1], [6, 1], size=(M, 1, 2))
    vel = rng.uniform(-0.3, 0.3, size=(M, 1, 2))
    pred = base + vel * np.arange(N + 1)[None, :, None] * cfg.dt
    clear = np.full(M, 0.7)

    res_native = native.prm_search(pos, tk, n_goals, pred, clear, cfg.dt,
                                   prm.v_max, prm._labels_per_node, 12)
    res_numpy = prm._search_numpy(pos, tk, n_goals, pred, clear, cfg.dt, 12)
    assert res_native is not None
    assert len(res_native) == len(res_numpy)
    for (c1, ch1), (c2, ch2) in zip(res_native, res_numpy):
        assert abs(c1 - c2) < 1e-9
        assert list(ch1) == list(ch2)
