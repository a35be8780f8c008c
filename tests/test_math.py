"""utils/math.py — the Pallas-lowerable atan2 and friends.

The custom atan2 replaces jnp.arctan2 everywhere (module costs AND the
fused kernel), so its values and its GRADIENTS must match jnp.arctan2 —
including on the y == 0 ray, where an earlier version selected a
constant in a `where` and silently zeroed d/dy (ADVICE r2: at cold
start vt == 0 exactly, corrupting the first RTI linearization).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_planner_tpu.utils.math import atan2, haar_difference_without_abs


def _grid():
    vals = np.array([-3.0, -1.0, -0.3, 0.0, 0.3, 1.0, 3.0])
    y, x = np.meshgrid(vals, vals)
    return y.ravel(), x.ravel()


def test_atan2_values_match_jnp():
    y, x = _grid()
    got = np.asarray(atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_atan2_gradients_match_jnp_away_from_axes():
    y, x = _grid()
    mask = (np.abs(y) > 1e-9) & (np.abs(x) > 1e-9)
    gy = jax.vmap(jax.grad(atan2, argnums=0))(jnp.asarray(y), jnp.asarray(x))
    gx = jax.vmap(jax.grad(atan2, argnums=1))(jnp.asarray(y), jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(gy)[mask], (x / (x**2 + y**2))[mask], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gx)[mask], (-y / (x**2 + y**2))[mask], atol=1e-5
    )


@pytest.mark.parametrize("x", [0.5, 1.0, 3.0, -0.5, -2.0])
def test_atan2_dy_at_y_zero(x):
    """d/dy atan2(0, x) = 1/x — the ADVICE r2 regression: a where-based
    quadrant select returned exactly 0 here, zeroing the A-matrix entry
    coupling spline progress to velocity at cold start."""
    gy = jax.grad(atan2, argnums=0)(0.0, x)
    assert np.isfinite(float(gy))
    np.testing.assert_allclose(float(gy), 1.0 / x, rtol=1e-5)


def test_atan2_dx_at_y_zero_is_zero():
    gx = jax.grad(atan2, argnums=1)(0.0, 2.0)
    np.testing.assert_allclose(float(gx), 0.0, atol=1e-7)


def test_atan2_origin_finite():
    # No NaN at the (0, 0) singular point, value matches arctan2(0,0)=0
    assert float(atan2(0.0, 0.0)) == 0.0
    assert np.isfinite(float(jax.grad(atan2, argnums=0)(0.0, 0.0)))


def test_haar_difference_wraps():
    a = haar_difference_without_abs(jnp.float32(3.0), jnp.float32(-3.0))
    # 6.0 wrapped into (-pi, pi]
    np.testing.assert_allclose(float(a), 6.0 - 2 * np.pi, atol=1e-6)
