"""Fused whole-RTI Pallas kernel (ops/pallas_rti.py) vs the XLA SQP path.

Runs in Pallas interpret mode on CPU; the same kernel compiles natively
on TPU (exercised by bench.py / experiments/ladder_bench.py and the
driver). Agreement here means the in-kernel linearization + Jacobi
MIRROR + IP solve reproduce the XLA pipeline's SQP-RTI iterates.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# Pallas interpret mode wraps the whole fused kernel in a program XLA:CPU
# compiles slowly (~30 s for the goal scene, minutes for the flagship).
# One tiny goal-scene agreement case ALWAYS runs (slow-marked) so
# refactors of _ip_solve can't silently break the fused path (ADVICE
# r2); the heavier flagship cases stay behind MPC_TEST_FUSED_INTERPRET=1
# and are additionally validated on hardware by
# experiments/fused_rti_check.py (agreement vs the unfused pipeline +
# KKT residuals).
pytestmark = pytest.mark.slow
_heavy = pytest.mark.skipif(
    os.environ.get("MPC_TEST_FUSED_INTERPRET") != "1",
    reason="heavy fused-RTI interpret tests are slow on XLA:CPU; run with "
    "MPC_TEST_FUSED_INTERPRET=1 or validate on hardware via "
    "experiments/fused_rti_check.py",
)


def _batch_inputs(model, Z0, P, xinit, B, rng):
    Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
    Z0b[:, 1:, model.nu:] += rng.normal(
        0, 0.05, Z0b[:, 1:, model.nu:].shape
    ).astype(np.float32)
    Pb = np.tile(np.asarray(P, np.float32)[None], (B, 1, 1))
    xb = np.tile(np.asarray(xinit, np.float32)[None], (B, 1))
    return (
        jnp.asarray(Z0b), jnp.asarray(Pb), jnp.asarray(xb),
    )


def _flagship(cfg):
    """T-MPC++ scene (guidance + ellipsoid constraints, nh > 0)."""
    from __graft_entry__ import _build

    model, ocp, solver, Z0, P, xinit = _build(cfg)
    return model, solver, Z0, P, xinit


def _goal_only(cfg):
    """Goal-tracking OCP (nh = 0)."""
    from mpc_planner_tpu.models import SecondOrderUnicycleModel
    from mpc_planner_tpu.modules import GoalModule, ModuleManager, MPCBaseModule
    from mpc_planner_tpu.parameters import ParameterBlock
    from mpc_planner_tpu.solver import OCP, SQPSolver
    from mpc_planner_tpu.solver.warmstart import initialize_with_state
    from mpc_planner_tpu.types import ModuleData, RealTimeData, State

    model = SecondOrderUnicycleModel()
    mgr = ModuleManager()
    base = mgr.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mgr.add_module(GoalModule(cfg))
    ocp = OCP(model, mgr, cfg)
    solver = SQPSolver(ocp)
    data = RealTimeData()
    data.goal = np.array([4.0, 1.0])
    data.goal_received = True
    pblock = ParameterBlock(ocp.params, cfg.N + 1)
    mgr.set_parameters_all(data, ModuleData(), pblock)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    xinit = np.array([state.get(n) for n in model.states])
    return model, solver, Z0, pblock.data, xinit


@pytest.mark.parametrize(
    "scene", ["goal", pytest.param("flagship", marks=_heavy)]
)
def test_fused_matches_xla(cfg, rng, scene):
    model, solver, Z0, P, xinit = (
        _goal_only(cfg) if scene == "goal" else _flagship(cfg)
    )
    Z0b, Pb, xb = _batch_inputs(model, Z0, P, xinit, 4, rng)

    ref = solver.solve_batch(Z0b, Pb, xb, num_iterations=3)  # XLA path (CPU)
    solver.interpret = True
    fused = solver._solve_batch_fused(Z0b, Pb, xb, num_iterations=3)

    Z_ref = np.asarray(ref.Z)
    Z_f = np.asarray(fused.Z)
    scale = np.abs(Z_ref).max() + 1e-9
    assert np.abs(Z_ref - Z_f).max() / scale < 5e-3
    assert np.array_equal(np.asarray(ref.exit_code), np.asarray(fused.exit_code))
    assert np.allclose(
        np.asarray(ref.res_eq), np.asarray(fused.res_eq), atol=1e-3
    )


@_heavy
def test_fused_warm_duals_and_single_iteration(cfg, rng):
    model, solver, Z0, P, xinit = _flagship(cfg)
    Z0b, Pb, xb = _batch_inputs(model, Z0, P, xinit, 2, rng)
    solver.interpret = True

    first = solver._solve_batch_fused(Z0b, Pb, xb, num_iterations=1)
    warm0 = (first.lam_l, first.lam_u, first.qp_mu < 1e-2)

    ref = jax.vmap(
        lambda z, p, x, wl, wu, ok: solver._solve(
            z, p, x, 2, warm0=(wl, wu, ok)
        )
    )(Z0b, Pb, xb, *warm0)
    fused = solver._solve_batch_fused(Z0b, Pb, xb, 2, warm0=warm0)

    Z_ref = np.asarray(ref.Z)
    Z_f = np.asarray(fused.Z)
    assert np.abs(Z_ref - Z_f).max() / (np.abs(Z_ref).max() + 1e-9) < 5e-3


@_heavy
def test_fused_kkt_residuals(cfg, rng):
    """The fused solve satisfies the same KKT tolerances as the XLA path
    (independent of any agreement check)."""
    from mpc_planner_tpu.solver.kkt import kkt_residuals

    model, solver, Z0, P, xinit = _flagship(cfg)
    Z0b, Pb, xb = _batch_inputs(model, Z0, P, xinit, 2, rng)
    solver.interpret = True
    res = solver._solve_batch_fused(Z0b, Pb, xb, num_iterations=6)
    assert bool(np.all(np.asarray(res.exit_code) == 1))
    for b in range(2):
        r = kkt_residuals(
            solver, np.asarray(res.Z)[b], np.asarray(Pb)[b],
            np.asarray(res.lam_l)[b], np.asarray(res.lam_u)[b],
        )
        assert r.eq_residual < 1e-2
        assert r.primal_box < 1e-3
        assert r.primal_h < 1e-3
        assert r.dual_feasibility >= -1e-8
