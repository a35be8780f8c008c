"""Planner configurations mirroring the reference's generation scripts
(mpc_planner_jackalsimulator/scripts/generate_jackalsimulator_solver.py:36-141)
plus scene builders for benchmarks/tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from mpc_planner_tpu.data_preparation import (
    HostObstacle,
    ensure_obstacle_size,
    get_constant_velocity_prediction,
    pack_obstacles,
)
from mpc_planner_tpu.models import (
    ContouringSecondOrderUnicycleModel,
    ContouringSecondOrderUnicycleModelWithSlack,
)
from mpc_planner_tpu.modules import (
    ContouringModule,
    EllipsoidConstraintModule,
    GoalModule,
    GuidanceConstraintModule,
    ModuleManager,
    MPCBaseModule,
    PathReferenceVelocityModule,
    ScenarioConstraintModule,
)
from mpc_planner_tpu.types import RealTimeData, State


def _add_base(modules: ModuleManager, cfg) -> MPCBaseModule:
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    if not cfg.contouring.dynamic_velocity_reference:
        base.weigh_variable(
            "v",
            ["velocity", "reference_velocity"],
            cost_function=lambda x, w: w[0] * (x - w[1]) ** 2,
        )
    return base


def configuration_no_obstacles(cfg):
    """Ref generate_jackalsimulator_solver.py:36-60."""
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModel()
    _add_base(modules, cfg)
    modules.add_module(ContouringModule(cfg))
    if cfg.contouring.dynamic_velocity_reference:
        modules.add_module(PathReferenceVelocityModule(cfg))
    return model, modules


def configuration_basic(cfg):
    """Ref :63-68 — + ellipsoidal avoidance."""
    model, modules = configuration_no_obstacles(cfg)
    modules.add_module(EllipsoidConstraintModule(cfg))
    return model, modules


def configuration_tmpc(cfg):
    """Ref :97-106 — T-MPC++ with ellipsoid safety submodule."""
    model, modules = configuration_no_obstacles(cfg)
    modules.add_module(GuidanceConstraintModule(cfg, EllipsoidConstraintModule))
    return model, modules


def configuration_safe_horizon(cfg):
    """Ref :71-94 — SH-MPC with slack state + scenario constraints."""
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModelWithSlack()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    base.weigh_variable("slack", "slack")
    if not cfg.contouring.dynamic_velocity_reference:
        base.weigh_variable(
            "v",
            ["velocity", "reference_velocity"],
            cost_function=lambda x, w: w[0] * (x - w[1]) ** 2,
        )
    modules.add_module(ContouringModule(cfg))
    if cfg.contouring.dynamic_velocity_reference:
        modules.add_module(PathReferenceVelocityModule(cfg))
    modules.add_module(ScenarioConstraintModule(cfg))
    return model, modules


def configuration_lmpcc(cfg):
    """Ref :109-126 — goal + velocity reference + ellipsoids."""
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModel()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    modules.add_module(GoalModule(cfg))
    modules.add_module(PathReferenceVelocityModule(cfg))
    modules.add_module(EllipsoidConstraintModule(cfg))
    return model, modules


# -- scenes ----------------------------------------------------------------

def corridor_scene(cfg, n_pedestrians: int = 8, seed: int = 0) -> Tuple[State, RealTimeData]:
    """The reference's headline benchmark scene: a corridor with crossing
    pedestrians (mpc_planner_jackalsimulator/README.md corridor with
    4/8/12 pedestrians)."""
    rng = np.random.default_rng(seed)
    state = State(nx=5)

    data = RealTimeData()
    data.robot_area = [(0.0, cfg.robot.width / 2.0)]
    # Straight 30 m corridor
    xs = np.linspace(0.0, 30.0, 16)
    data.reference_path = {"x": xs, "y": np.zeros_like(xs)}
    data.goal = np.array([30.0, 0.0])
    data.goal_received = True

    obstacles = []
    for i in range(n_pedestrians):
        px = rng.uniform(4.0, 26.0)
        py = rng.uniform(-2.5, 2.5)
        speed = rng.uniform(0.4, 1.4)
        angle = rng.uniform(0, 2 * np.pi)
        vel = speed * np.array([np.cos(angle), np.sin(angle)])
        o = HostObstacle(index=i, position=np.array([px, py]), angle=angle,
                         radius=cfg.obstacle_radius)
        o.prediction = get_constant_velocity_prediction(
            o.position, vel, cfg.dt, cfg.N, cfg.probabilistic.enable
        )
        obstacles.append(o)
    obstacles = ensure_obstacle_size(
        obstacles, state, cfg.max_obstacles, cfg.N, cfg.dt, cfg.probabilistic.enable
    )
    data.dynamic_obstacles = obstacles
    data.obstacle_block = pack_obstacles(obstacles, cfg.N)
    data.ego_position = state.get_position()
    return state, data
