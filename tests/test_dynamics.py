"""Dynamics model tests (model: reference test_base_classes.py model
shape/name/bounds checks)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_planner_tpu.models import (
    BicycleModel2ndOrder,
    ContouringSecondOrderUnicycleModel,
    ContouringSecondOrderUnicycleModelWithSlack,
    SecondOrderUnicycleModel,
)

ALL_MODELS = [
    SecondOrderUnicycleModel,
    ContouringSecondOrderUnicycleModel,
    ContouringSecondOrderUnicycleModelWithSlack,
    BicycleModel2ndOrder,
]


@pytest.mark.parametrize("model_cls", ALL_MODELS)
def test_shapes_and_bounds(model_cls):
    m = model_cls()
    assert m.nvar == m.nu + m.nx
    assert len(m.lower_bound) == m.nvar
    assert len(m.upper_bound) == m.nvar
    assert all(l < u for l, u in zip(m.lower_bound, m.upper_bound))
    # name addressing (ref solver_model.py get)
    for i, name in enumerate(m.inputs):
        assert m.index(name) == i
    for i, name in enumerate(m.states):
        assert m.index(name) == m.nu + i
    with pytest.raises(KeyError):
        m.index("nonexistent")


def test_model_map():
    m = ContouringSecondOrderUnicycleModel()
    mm = m.save_map()
    assert mm["x"][0] == "x" and mm["x"][1] == m.nu
    assert mm["a"][0] == "u" and mm["a"][1] == 0
    assert mm["spline"][1] == m.nu + 4


def test_unicycle_straight_line():
    """RK4 integration of straight driving matches closed form."""
    m = ContouringSecondOrderUnicycleModel()
    v = 1.5
    z = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, v, 0.0])  # a, w, x, y, psi, v, spline
    dt = 0.2
    x_next = m.discrete_dynamics(z, jnp.zeros(1), dt)
    np.testing.assert_allclose(np.asarray(x_next), [v * dt, 0.0, 0.0, v, v * dt], atol=1e-6)


def test_unicycle_turning():
    """Constant angular velocity: circular arc of radius v/w."""
    m = SecondOrderUnicycleModel()
    v, w = 1.0, 0.5
    z = jnp.array([0.0, w, 0.0, 0.0, 0.0, v])
    dt = 0.1
    x = jnp.array([0.0, 0.0, 0.0, v])
    for _ in range(10):
        z = z.at[m.nu :].set(x)
        x = m.discrete_dynamics(z, jnp.zeros(1), dt)
    t = 1.0
    R = v / w
    np.testing.assert_allclose(float(x[0]), R * np.sin(w * t), atol=1e-4)
    np.testing.assert_allclose(float(x[1]), R * (1 - np.cos(w * t)), atol=1e-4)
    np.testing.assert_allclose(float(x[2]), w * t, atol=1e-6)


def test_slack_model_xinit_excludes_slack():
    m = ContouringSecondOrderUnicycleModelWithSlack()
    idx = m.xinit_indices()
    assert m.index("slack") not in idx
    assert m.index("x") in idx


def test_bicycle_dynamics_runs():
    m = BicycleModel2ndOrder()
    z = jnp.zeros(m.nvar).at[m.index("v")].set(2.0).at[m.index("delta")].set(0.1)
    x_next = m.discrete_dynamics(z, jnp.zeros(1), 0.1)
    assert x_next.shape == (m.nx,)
    assert float(x_next[0]) > 0.0  # moved forward
