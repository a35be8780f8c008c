"""Decomp (free-space polytope) constraint tests with an occupancy grid
(ref decomp_constraints.cpp + costmap consumption)."""

import numpy as np

from mpc_planner_tpu.modules import (
    ContouringModule,
    DecompConstraintModule,
    ModuleManager,
    MPCBaseModule,
)
from mpc_planner_tpu.modules.decomp_constraints import (
    free_polytope,
    occupied_points_from_grid,
)
from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import corridor_scene
import pytest


def _costmap_with_walls(cfg):
    """Occupancy grid: corridor walls at y = +-2."""
    res = 0.2
    H, W = 40, 120  # y in [-4, 4], x in [0, 24]
    grid = np.zeros((H, W), dtype=np.uint8)
    meta = {"origin_x": 0.0, "origin_y": -4.0, "resolution": res}
    wall_rows_top = int((2.0 + 4.0) / res)
    wall_rows_bot = int((-2.0 + 4.0) / res)
    grid[wall_rows_top, :] = 255
    grid[wall_rows_bot, :] = 255
    return grid, meta


def test_occupied_points_extraction(cfg):
    grid, meta = _costmap_with_walls(cfg)
    pts = occupied_points_from_grid(grid, meta, 127)
    assert pts.shape[0] == 240  # two walls x 120 cells
    ys = np.unique(np.round(pts[:, 1], 1))
    assert set(ys) == {-1.9, 2.1}


def test_free_polytope_separates_walls():
    pts = np.array([[0.0, 2.0], [0.0, -2.0], [3.0, 2.0]])
    rows = free_polytope(np.zeros(2), pts, 4, 0.3)
    # seed satisfies all cuts
    assert np.all(rows[:, 0] * 0 + rows[:, 1] * 0 - rows[:, 2] <= 0)
    # wall points excluded (a.p > b for their cut)
    viol0 = rows[0, 0] * pts[0, 0] + rows[0, 1] * pts[0, 1] - rows[0, 2]
    assert viol0 > 0


@pytest.mark.slow
def test_decomp_closed_loop_solve(cfg):
    modules = ModuleManager()
    from mpc_planner_tpu.models import ContouringSecondOrderUnicycleModel

    model = ContouringSecondOrderUnicycleModel()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    base.weigh_variable(
        "v", ["velocity", "reference_velocity"],
        cost_function=lambda x, w: w[0] * (x - w[1]) ** 2,
    )
    modules.add_module(ContouringModule(cfg))
    dmod = modules.add_module(DecompConstraintModule(cfg))
    planner = Planner(model, modules, cfg)

    state, data = corridor_scene(cfg, n_pedestrians=0)
    data.costmap, data.costmap_meta = _costmap_with_walls(cfg)
    planner.on_data_received(data, "reference_path")

    out = planner.solve_mpc(state, data)
    if not out.success:
        out = planner.solve_mpc(state, data)
    assert out.success
    assert dmod._halfspaces is not None
    # Active halfspaces exist near the walls
    assert np.any(dmod._halfspaces[:, :, 2] < 1e5)
    # Solution stays inside the corridor
    ys = [planner.get_solution(k, "y") for k in range(cfg.N)]
    assert np.max(np.abs(ys)) < 2.0
