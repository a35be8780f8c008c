"""BASELINE.md config-ladder coverage: (3) ellipsoidal avoidance is tested
elsewhere; here (4) CC-MPC Gaussian chance constraints + static halfspaces
and the standalone linearized-constraints configuration."""

import numpy as np

from mpc_planner_tpu.modules import (
    ContouringModule,
    GaussianConstraintModule,
    LinearizedConstraintModule,
    ModuleManager,
    MPCBaseModule,
)
from mpc_planner_tpu.models import ContouringSecondOrderUnicycleModel
from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import corridor_scene
from mpc_planner_tpu.sim import ClosedLoopSimulator
from mpc_planner_tpu.sim.simulator import Pedestrian
import pytest

pytestmark = pytest.mark.slow  # >20 s/test on CPU; fast tier skips


def _contouring_base(cfg):
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModel()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    base.weigh_variable(
        "v", ["velocity", "reference_velocity"],
        cost_function=lambda x, w: w[0] * (x - w[1]) ** 2,
    )
    modules.add_module(ContouringModule(cfg))
    return model, modules


def test_gaussian_cc_mpc_solves_and_keeps_margin(cfg):
    """CC-MPC: the chance constraint enforces a larger margin than the
    deterministic combined radius when uncertainty is present."""
    model, modules = _contouring_base(cfg)
    modules.add_module(GaussianConstraintModule(cfg))
    planner = Planner(model, modules, cfg)

    state, data = corridor_scene(cfg, n_pedestrians=3, seed=4)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    if not out.success:
        out = planner.solve_mpc(state, data)
    assert out.success

    # Margin check on real (non-dummy) obstacles along the plan
    blk = data.obstacle_block
    combined_r = cfg.robot_radius + blk.radius
    for k in range(1, cfg.N):
        p = np.array([planner.get_solution(k, "x"), planner.get_solution(k, "y")])
        for i in range(blk.position.shape[0]):
            if blk.index[i] < 0:
                continue
            d = np.linalg.norm(p - blk.pred_position[i, k - 1])
            assert d > combined_r[i] - 1e-2


def test_linearized_constraints_closed_loop(cfg):
    model, modules = _contouring_base(cfg)
    modules.add_module(LinearizedConstraintModule(cfg))
    planner = Planner(model, modules, cfg)
    peds = [
        Pedestrian(position=np.array([4.0, 0.3]), velocity=np.array([-0.2, 0.0]), radius=0.4),
        Pedestrian(position=np.array([7.0, -0.4]), velocity=np.array([0.0, 0.1]), radius=0.4),
    ]
    xs = np.linspace(0, 14, 8)
    sim = ClosedLoopSimulator(planner, cfg, peds, {"x": xs, "y": np.zeros_like(xs)})
    res = sim.run(max_steps=35)
    assert res.collisions == 0
    assert res.trajectory[-1][0] > 1.5
