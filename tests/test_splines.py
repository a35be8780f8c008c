"""Spline tests: host fit (spline_fit.py) and traced blended evaluation
(splines.py) must agree on the fitted path."""

import jax.numpy as jnp
import numpy as np

from mpc_planner_tpu.parameters import ParameterRegistry
from mpc_planner_tpu.spline_fit import CubicSpline, PathSpline2D, fit_natural_cubic
from mpc_planner_tpu.splines import Spline2D


def test_natural_cubic_interpolates():
    t = np.array([0.0, 1.0, 2.0, 3.0])
    y = np.array([0.0, 1.0, 0.0, 2.0])
    spl = CubicSpline(t, y)
    np.testing.assert_allclose(spl(t), y, atol=1e-10)


def test_cubic_derivative_consistency():
    t = np.linspace(0, 5, 8)
    y = np.sin(t)
    spl = CubicSpline(t, y)
    s = 2.3
    eps = 1e-5
    fd = (spl(s + eps) - spl(s - eps)) / (2 * eps)
    np.testing.assert_allclose(spl.deriv(s), fd, atol=1e-5)


def test_path_spline_arclength():
    # Straight line: s should equal distance
    x = np.linspace(0, 10, 6)
    y = np.zeros(6)
    path = PathSpline2D(x, y)
    np.testing.assert_allclose(path.length, 10.0, atol=1e-6)
    np.testing.assert_allclose(path.at(5.0), [5.0, 0.0], atol=1e-6)


def test_closest_point():
    x = np.linspace(0, 10, 11)
    y = np.zeros(11)
    path = PathSpline2D(x, y)
    s = path.closest_point(np.array([3.7, 2.0]))
    np.testing.assert_allclose(s, 3.7, atol=1e-3)
    # windowed search around a hint
    s2 = path.closest_point(np.array([3.7, 2.0]), s_hint=3.0, window=2.0)
    np.testing.assert_allclose(s2, 3.7, atol=1e-3)


def _registry_for_segments(num_segments):
    reg = ParameterRegistry()
    for i in range(num_segments):
        for coef in "abcd":
            reg.add(f"spline_x{i}_{coef}", bundle_name=f"spline_x_{coef}")
        for coef in "abcd":
            reg.add(f"spline_y{i}_{coef}", bundle_name=f"spline_y_{coef}")
        reg.add(f"spline{i}_start", bundle_name="spline_start")
    return reg


def test_traced_spline_matches_host_fit():
    """Device-side blended evaluation tracks the host-side fitted spline
    away from segment boundaries (sigmoid blending smooths boundaries,
    ref spline.py:37)."""
    xs = np.array([0.0, 1.0, 2.5, 4.0, 6.0, 8.0])
    ys = np.array([0.0, 0.5, 0.2, -0.5, 0.0, 1.0])
    path = PathSpline2D(xs, ys)
    num_segments = min(5, path.n_segments)
    seg = path.segment_param_arrays(0, num_segments)

    reg = _registry_for_segments(num_segments)
    p = np.zeros(reg.npar)
    for i in range(num_segments):
        for coef, key in zip("abcd", ("ax", "bx", "cx", "dx")):
            p[reg.index(f"spline_x{i}_{coef}")] = seg[key][i]
        for coef, key in zip("abcd", ("ay", "by", "cy", "dy")):
            p[reg.index(f"spline_y{i}_{coef}")] = seg[key][i]
        p[reg.index(f"spline{i}_start")] = seg["s_start"][i]

    view = reg.bind(jnp.asarray(p))
    s_lo = float(seg["s_start"][0])
    s_hi = float(seg["s_start"][num_segments - 1])
    for s in np.linspace(s_lo + 0.3, s_hi - 0.3, 7):
        # skip points near boundaries where blending differs by design
        dist_to_boundary = min(abs(s - b) for b in seg["s_start"])
        if dist_to_boundary < 0.3:
            continue
        sp2d = Spline2D(view, num_segments, jnp.asarray(s))
        px, py = sp2d.at(jnp.asarray(s))
        host = path.at(s)
        np.testing.assert_allclose([float(px), float(py)], host, atol=2e-2)


def test_blend_weights_sum_to_one():
    from mpc_planner_tpu.splines import _blend_weights

    s_starts = jnp.array([0.0, 1.0, 2.0, 3.0])
    for s in [0.5, 1.5, 2.9, 3.5]:
        w = _blend_weights(jnp.asarray(s), s_starts)
        np.testing.assert_allclose(float(jnp.sum(w)), 1.0, atol=1e-6)
