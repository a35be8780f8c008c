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
    BicycleModel2ndOrder,
    BicycleModel2ndOrderCurvatureAware,
    ContouringSecondOrderUnicycleModel,
    ContouringSecondOrderUnicycleModelCurvatureAware,
    ContouringSecondOrderUnicycleModelWithSlack,
    PointMassModel,
)
from mpc_planner_tpu.modules import (
    ContouringModule,
    CurvatureAwareContouringModule,
    DecompConstraintModule,
    EllipsoidConstraintModule,
    GaussianConstraintModule,
    GoalModule,
    GuidanceConstraintModule,
    ModuleManager,
    MPCBaseModule,
    PathReferenceVelocityModule,
    ScenarioConstraintModule,
)
from mpc_planner_tpu.types import RealTimeData, State
from mpc_planner_tpu.utils.config import default_config


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


def configuration_safe_horizon_hard(cfg):
    """SH-MPC without the slack state: same 24 scenario halfspaces on the
    plain contouring model (nvar=7). The slack model (ref :71-94) is the
    faithful variant and runs the Pallas kernel too (the historic nvar=8
    fault no longer reproduces since r3; docs/PERF_NOTES.md). This
    hard-constrained variant is kept for A/B: infeasible scenario draws
    are reported as infeasible rather than absorbed by slack."""
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModel()
    _add_base(modules, cfg)
    modules.add_module(ContouringModule(cfg))
    if cfg.contouring.dynamic_velocity_reference:
        modules.add_module(PathReferenceVelocityModule(cfg))
    modules.add_module(ScenarioConstraintModule(cfg))
    return model, modules


def configuration_curvature_aware(cfg):
    """CA-MPC: curvature-aware contouring (projection-ratio s_dot cost on
    the discrete spline-projection model, ref solver_model.py:217-271 +
    curvature_aware_contouring.py:15-123) + ellipsoid avoidance."""
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModelCurvatureAware()
    _add_base(modules, cfg)
    modules.add_module(CurvatureAwareContouringModule(cfg))
    modules.add_module(EllipsoidConstraintModule(cfg))
    return model, modules


def configuration_tmpc_ca(cfg):
    """T-MPC++ on the CA model (the jackal system's curvature-aware
    variant: guidance constraints + CA contouring, ref
    generate_jackalsimulator_solver.py:33 imports the CA model and
    curvature_aware_contouring module as the drop-in alternative)."""
    modules = ModuleManager()
    model = ContouringSecondOrderUnicycleModelCurvatureAware()
    _add_base(modules, cfg)
    modules.add_module(CurvatureAwareContouringModule(cfg))
    modules.add_module(GuidanceConstraintModule(cfg, EllipsoidConstraintModule))
    return model, modules


def configuration_bicycle(cfg, curvature_aware: bool = False):
    """Bicycle MPCC (ref solver_model.py:302-437): dynamic steering +
    slack input, contouring (CA variant optional) + ellipsoid
    avoidance (nvar=9 — on the Pallas kernel since the r5 nvar<=9
    gate raise)."""
    modules = ModuleManager()
    model = (BicycleModel2ndOrderCurvatureAware() if curvature_aware
             else BicycleModel2ndOrder())
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
    modules.add_module(
        CurvatureAwareContouringModule(cfg) if curvature_aware
        else ContouringModule(cfg))
    modules.add_module(EllipsoidConstraintModule(cfg))
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


# -- per-system presets ------------------------------------------------------
# One factory per reference system package (SURVEY.md §2.3 "System nodes x4"),
# each returning (cfg, model, modules) with the package's settings.yaml
# horizon/step/iteration values baked in.

def system_jackalsimulator(variant: str = "tmpc", **overrides):
    """mpc_planner_jackalsimulator: N=30, dt=0.2, 10 RTI iterations
    (config/settings.yaml:2-17)."""
    kw = dict(name="jackalsimulator", N=30, integrator_step=0.2)
    kw.update(overrides)
    cfg = default_config(**kw)
    builders = {
        "tmpc": configuration_tmpc,
        "basic": configuration_basic,
        "no_obstacles": configuration_no_obstacles,
        "safe_horizon": configuration_safe_horizon,
        "safe_horizon_hard": configuration_safe_horizon_hard,
        "lmpcc": configuration_lmpcc,
        "curvature_aware": configuration_curvature_aware,
        "tmpc_ca": configuration_tmpc_ca,
    }
    model, modules = builders[variant](cfg)
    return cfg, model, modules


def system_jackal(variant: str = "tmpc", **overrides):
    """mpc_planner_jackal (real robot): N=30, dt=0.2; T-MPC uses the
    GAUSSIAN safety submodule (generate_jackal_solver.py:70 —
    GuidanceConstraintModule(constraint_submodule=GaussianConstraintModule));
    the goal variant is goal-tracking + ellipsoids (:31-50)."""
    kw = dict(name="jackal", N=30, integrator_step=0.2)
    kw.update(overrides)
    cfg = default_config(**kw)
    if variant == "tmpc":
        model, modules = configuration_no_obstacles(cfg)
        modules.add_module(GuidanceConstraintModule(cfg, GaussianConstraintModule))
    elif variant == "ca":
        # Curvature-aware jackal: CA contouring + T-MPC guidance with
        # the Gaussian safety submodule (the reference's CA model is the
        # drop-in alternative for this system, solver_model.py:217-271).
        modules = ModuleManager()
        model = ContouringSecondOrderUnicycleModelCurvatureAware()
        _add_base(modules, cfg)
        modules.add_module(CurvatureAwareContouringModule(cfg))
        modules.add_module(GuidanceConstraintModule(cfg, GaussianConstraintModule))
    elif variant == "goal":
        modules = ModuleManager()
        model = ContouringSecondOrderUnicycleModel()
        _add_base(modules, cfg)
        modules.add_module(GoalModule(cfg))
        modules.add_module(EllipsoidConstraintModule(cfg))
    else:  # lmpcc (generate_jackal_solver.py:76-95)
        model, modules = configuration_basic(cfg)
    return cfg, model, modules


def system_dingo(variant: str = "tmpc", **overrides):
    """mpc_planner_dingo (omnidirectional): N=30, dt=0.1
    (config/settings.yaml:2-3). T-MPC mirrors jackalsimulator
    (generate_dingo_solver.py:48-65); the lmpcc variant uses the holonomic
    point-mass model with goal tracking + T-MPC guidance (:68-85)."""
    kw = dict(name="dingo", N=30, integrator_step=0.1)
    kw.update(overrides)
    cfg = default_config(**kw)
    if variant == "tmpc":
        model, modules = configuration_no_obstacles(cfg)
        modules.add_module(GuidanceConstraintModule(cfg, EllipsoidConstraintModule))
    else:  # point-mass goal tracking
        modules = ModuleManager()
        model = PointMassModel()
        base = modules.add_module(MPCBaseModule(cfg))
        base.weigh_variable("ax", "acceleration")
        base.weigh_variable("ay", "acceleration")
        modules.add_module(GoalModule(cfg))
        modules.add_module(GuidanceConstraintModule(cfg, EllipsoidConstraintModule))
    return cfg, model, modules


def system_rosnavigation(variant: str = "lmpcc", **overrides):
    """mpc_planner_rosnavigation (nav-stack local planner): N=20, dt=0.2,
    4 RTI iterations (config/settings.yaml:2-13); every variant adds
    costmap free-space DecompConstraints
    (generate_rosnavigation_solver.py:33-128)."""
    kw = dict(name="rosnavigation", N=20, integrator_step=0.2)
    kw.update(overrides)
    cfg = default_config(**kw)
    if "solver" not in overrides:  # settings.yaml iterations: 4
        cfg = cfg.replace(solver=cfg.solver.__class__(iterations=4))
    if variant == "tmpc":  # :91-112 (slack model + guidance + decomp)
        modules = ModuleManager()
        model = ContouringSecondOrderUnicycleModelWithSlack()
        base = modules.add_module(MPCBaseModule(cfg))
        base.weigh_variable("a", "acceleration")
        base.weigh_variable("w", "angular_velocity")
        base.weigh_variable("slack", "slack")
        if not cfg.contouring.dynamic_velocity_reference:
            base.weigh_variable(
                "v", ["velocity", "reference_velocity"],
                cost_function=lambda x, w: w[0] * (x - w[1]) ** 2,
            )
        modules.add_module(ContouringModule(cfg))
        if cfg.contouring.dynamic_velocity_reference:
            modules.add_module(PathReferenceVelocityModule(cfg))
        modules.add_module(GuidanceConstraintModule(cfg, EllipsoidConstraintModule))
        modules.add_module(DecompConstraintModule(cfg))
    elif variant == "safe_horizon":  # :64-88
        model, modules = configuration_safe_horizon(cfg)
        modules.add_module(DecompConstraintModule(cfg))
    else:  # lmpcc, :33-61 + decomp (:128)
        modules = ModuleManager()
        model = ContouringSecondOrderUnicycleModel()
        _add_base(modules, cfg)
        modules.add_module(ContouringModule(cfg))
        modules.add_module(PathReferenceVelocityModule(cfg))
        modules.add_module(EllipsoidConstraintModule(cfg))
        modules.add_module(DecompConstraintModule(cfg))
    return cfg, model, modules


SYSTEMS = {
    "jackalsimulator": system_jackalsimulator,
    "jackal": system_jackal,
    "dingo": system_dingo,
    "rosnavigation": system_rosnavigation,
}


def select_system(name: str, variant: str = None, **overrides):
    """System selection by name (the reference's select_system.py picks
    which robot package builds; here it picks the preset)."""
    factory = SYSTEMS[name]
    if variant is None:
        return factory(**overrides)
    return factory(variant=variant, **overrides)


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
