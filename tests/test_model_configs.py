"""End-to-end solves for the remaining model families: curvature-aware
contouring (discrete spline update, ref solver_model.py:242-271) and the
bicycle model (ref solver_model.py:302-352)."""

import numpy as np
import pytest

from mpc_planner_tpu.models import (
    BicycleModel2ndOrder,
    ContouringSecondOrderUnicycleModelCurvatureAware,
)
from mpc_planner_tpu.modules import (
    ContouringModule,
    CurvatureAwareContouringModule,
    ModuleManager,
    MPCBaseModule,
)
from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import corridor_scene
from mpc_planner_tpu.types import State

pytestmark = pytest.mark.slow  # >20 s/test on CPU; fast tier skips


def _curved_path_data(cfg):
    state, data = corridor_scene(cfg, n_pedestrians=0)
    t = np.linspace(0, np.pi, 20)
    data.reference_path = {"x": 10 * t / np.pi * 3, "y": 2.0 * np.sin(t)}
    return state, data


def test_curvature_aware_closed_loop(cfg):
    model = ContouringSecondOrderUnicycleModelCurvatureAware()
    modules = ModuleManager()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    modules.add_module(CurvatureAwareContouringModule(cfg))
    planner = Planner(model, modules, cfg)

    state, data = _curved_path_data(cfg)
    planner.on_data_received(data, "reference_path")

    out = planner.solve_mpc(state, data)
    if not out.success:
        out = planner.solve_mpc(state, data)  # warm retry
    assert out.success
    # Progress state advances monotonically along the path
    s = [planner.get_solution(k, "spline") for k in range(cfg.N + 1)]
    assert s[-1] > s[0]
    assert all(np.isfinite(s))


def test_bicycle_model_solves(cfg):
    model = BicycleModel2ndOrder()
    modules = ModuleManager()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    base.weigh_variable("slack", "slack")
    base.weigh_variable(
        "v", ["velocity", "reference_velocity"],
        cost_function=lambda x, w: w[0] * (x - w[1]) ** 2,
    )
    modules.add_module(ContouringModule(cfg))
    planner = Planner(model, modules, cfg)

    state, data = _curved_path_data(cfg)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    if not out.success:
        out = planner.solve_mpc(state, data)
    assert out.success
    # Steering stays within the physical bound
    deltas = [planner.get_solution(k, "delta") for k in range(cfg.N + 1)]
    assert np.max(np.abs(deltas)) <= 0.55 + 1e-3
    v = [planner.get_solution(k, "v") for k in range(1, cfg.N + 1)]
    assert v[-1] > 0.2  # accelerates along the path


def test_curvature_aware_on_straight_path(cfg):
    """A perfectly straight reference path has curvature exactly 0, and
    sqrt's gradient at 0 is NaN — which poisoned the CA spline-update
    Jacobian and froze every solve on the corridor centerline (r5).
    The double-where guard in Spline2D.get_curvature must keep the CA
    linearization finite and the solve feasible from the zero state."""
    model = ContouringSecondOrderUnicycleModelCurvatureAware()
    modules = ModuleManager()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    modules.add_module(CurvatureAwareContouringModule(cfg))
    planner = Planner(model, modules, cfg)

    state, data = corridor_scene(cfg, n_pedestrians=0)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    if not out.success:
        out = planner.solve_mpc(state, data)
    assert out.success
    s = [planner.get_solution(k, "spline") for k in range(cfg.N + 1)]
    assert all(np.isfinite(s)) and s[-1] > s[0]
