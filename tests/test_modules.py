"""Module assembly tests (model: reference solver_generator/test/
test_control_modules.py:27-136 — exact parameter counts, objective
positivity, ellipsoid bound satisfaction, smoke-instantiation of all
modules)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpc_planner_tpu.modules import (
    ContouringConstraintModule,
    ContouringModule,
    CurvatureAwareContouringModule,
    DecompConstraintModule,
    EllipsoidConstraintModule,
    GaussianConstraintModule,
    GoalModule,
    GuidanceConstraintModule,
    LinearizedConstraintModule,
    ModuleManager,
    MPCBaseModule,
    PathReferenceVelocityModule,
    ScenarioConstraintModule,
)
from mpc_planner_tpu.modules.base import BoundModel
from mpc_planner_tpu.models import ContouringSecondOrderUnicycleModel
from mpc_planner_tpu.parameters import ParameterRegistry
from mpc_planner_tpu.utils.config import default_config


def _build(cfg, *modules):
    mgr = ModuleManager()
    for m in modules:
        mgr.add_module(m)
    reg = ParameterRegistry()
    mgr.define_parameters(reg)
    return mgr, reg


def test_contouring_param_count(cfg):
    """9 params/segment + 6 weights (ref contouring.py:22-47)."""
    mgr, reg = _build(cfg, ContouringModule(cfg))
    assert reg.npar == 6 + 9 * cfg.contouring.num_segments


def test_tmpc_configuration_param_count(cfg):
    """T-MPC configuration matches the reference's generated layout:
    MPCBase(3 weights w/ velocity pair) + Contouring + Guidance(Ellipsoid)."""
    base = MPCBaseModule(cfg)
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    base.weigh_variable("v", ["velocity", "reference_velocity"],
                        cost_function=lambda x, w: w[0] * (x - w[1]) ** 2)
    mgr, reg = _build(cfg, base, ContouringModule(cfg), GuidanceConstraintModule(cfg))
    expected = (
        4  # acceleration, angular_velocity, velocity, reference_velocity
        + 4  # contour, lag, terminal_angle, terminal_contouring
        + 9 * cfg.contouring.num_segments
        + 3 * cfg.max_obstacles  # guidance halfspaces (add_halfspaces=0)
        + 1  # ego_disc_radius
        + cfg.n_discs  # ego_disc_offset
        + 7 * cfg.max_obstacles  # ellipsoid params
    )
    assert reg.npar == expected
    # nh: guidance halfspaces + ellipsoid submodule
    assert mgr.constraint_number() == cfg.max_obstacles + cfg.max_obstacles * cfg.n_discs


def test_constraint_bounds_lengths(cfg):
    mods = [
        EllipsoidConstraintModule(cfg),
        GaussianConstraintModule(cfg),
        LinearizedConstraintModule(cfg),
        ContouringConstraintModule(cfg),
        DecompConstraintModule(cfg),
        ScenarioConstraintModule(cfg),
    ]
    for m in mods:
        assert len(m.lower_bounds()) == len(m.upper_bounds()) == m.nh
        assert m.nh > 0


def test_objective_positive(cfg):
    """Objectives are nonnegative for positive weights
    (ref test_control_modules.py objective positivity)."""
    model = ContouringSecondOrderUnicycleModel()
    base = MPCBaseModule(cfg)
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mgr, reg = _build(cfg, base, GoalModule(cfg))
    p = np.abs(np.random.default_rng(0).normal(1.0, 0.5, reg.npar))
    z = jnp.asarray(np.random.default_rng(1).normal(0, 1, model.nvar))
    cost = mgr.objective(BoundModel(model, z), reg.bind(jnp.asarray(p)), cfg, 1)
    assert float(cost) >= 0.0


def test_ellipsoid_constraint_satisfaction(cfg):
    """A far-away robot satisfies the ellipsoid constraint; an overlapping
    one violates it (ref test_control_modules.py:89-104)."""
    model = ContouringSecondOrderUnicycleModel()
    mod = EllipsoidConstraintModule(cfg)
    mgr, reg = _build(cfg, mod)
    p = np.zeros(reg.npar)
    p[reg.index("ego_disc_radius")] = 0.3
    for i in range(cfg.max_obstacles):
        p[reg.index(f"ellipsoid_obst_{i}_x")] = 100.0
        p[reg.index(f"ellipsoid_obst_{i}_y")] = 100.0
        p[reg.index(f"ellipsoid_obst_{i}_major")] = 0.0
        p[reg.index(f"ellipsoid_obst_{i}_minor")] = 0.0
        p[reg.index(f"ellipsoid_obst_{i}_chi")] = 1.0
        p[reg.index(f"ellipsoid_obst_{i}_r")] = 0.5
    # obstacle 0 overlapping the robot
    p[reg.index("ellipsoid_obst_0_x")] = 0.2
    p[reg.index("ellipsoid_obst_0_y")] = 0.0

    z = jnp.zeros(model.nvar)
    cons = mgr.constraints(BoundModel(model, z), reg.bind(jnp.asarray(p)), cfg, 1)
    vals = np.array([float(c) for c in cons])
    lb = mod.lower_bounds()
    assert vals[0] < lb[0]  # overlapping obstacle violates
    assert np.all(vals[1:] >= lb[1:])  # far obstacles satisfied


def test_smoke_all_modules(cfg):
    """Instantiate every module in one manager and assemble
    (ref test_control_modules.py:106-136)."""
    base = MPCBaseModule(cfg)
    base.weigh_variable("a", "acceleration")
    mods = [
        base,
        GoalModule(cfg),
        ContouringModule(cfg),
        PathReferenceVelocityModule(cfg),
        EllipsoidConstraintModule(cfg),
        GaussianConstraintModule(cfg),
        LinearizedConstraintModule(cfg),
        ContouringConstraintModule(cfg),
        DecompConstraintModule(cfg),
        ScenarioConstraintModule(cfg),
    ]
    mgr, reg = _build(cfg, *mods)
    assert reg.npar > 50
    model = ContouringSecondOrderUnicycleModel()
    z = jnp.zeros(model.nvar)
    view = reg.bind(jnp.ones(reg.npar))
    cost = mgr.objective(BoundModel(model, z), view, cfg, 1)
    cons = mgr.constraints(BoundModel(model, z), view, cfg, 1)
    assert len(cons) == mgr.constraint_number()
    assert np.isfinite(float(cost))


def test_curvature_aware_module_instantiates(cfg):
    m = CurvatureAwareContouringModule(cfg)
    mgr, reg = _build(cfg, m)
    model = ContouringSecondOrderUnicycleModel()
    z = jnp.zeros(model.nvar).at[model.index("v")].set(1.0)
    p = np.zeros(reg.npar)
    # benign spline params: straight x(s)=s
    for i in range(cfg.contouring.num_segments):
        p[reg.index(f"spline_x{i}_c")] = 1.0
        p[reg.index(f"spline{i}_start")] = float(i)
    cost = m.cost(BoundModel(model, z), reg.bind(jnp.asarray(p)), cfg, 1)
    assert np.isfinite(float(cost))


def test_velocity_spline_pads_constant_past_path_end(cfg):
    """Past-end spline_v slots must be CONSTANT segments at the path-end
    velocity: they share the path upload's s_start=length pin, so
    duplicated cubic coefficients would be evaluated at ds = s - length
    and return the last segment's START velocity instead (ADVICE r3)."""
    from types import SimpleNamespace

    from mpc_planner_tpu.parameters import ParameterBlock, ParameterRegistry

    mod = PathReferenceVelocityModule(cfg)
    reg = ParameterRegistry()
    mod.define_parameters(reg)
    pblock = ParameterBlock(reg, cfg.N + 1)

    xs = np.linspace(0.0, 10.0, 6)
    v = np.array([1.0, 1.2, 1.5, 1.3, 0.9, 0.4])  # non-constant
    data = SimpleNamespace(reference_path={"x": xs, "y": np.zeros_like(xs), "v": v})
    mod.on_data_received(data, "reference_path")

    last = mod.velocity_spline.n_segments - 1
    md = SimpleNamespace(current_path_segment=last)  # forces padded slots
    mod.set_parameters(None, md, pblock)

    v_end = float(mod.velocity_spline(mod.velocity_spline.t[-1]))
    for i in range(1, mod.num_segments):  # slots past the final segment
        assert pblock.get(0, f"spline_v{i}_a") == 0.0
        assert pblock.get(0, f"spline_v{i}_b") == 0.0
        assert pblock.get(0, f"spline_v{i}_c") == 0.0
        np.testing.assert_allclose(pblock.get(0, f"spline_v{i}_d"), v_end)
