"""Solver tests: OCP dims (model: reference test_acados.py:48-77),
QP KKT satisfaction, SQP goal convergence, warmstart semantics
(model: reference mpc_planner_solver/test/test_solver.cpp:52-134)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_planner_tpu.models import (
    ContouringSecondOrderUnicycleModel,
    SecondOrderUnicycleModel,
)
from mpc_planner_tpu.modules import (
    EllipsoidConstraintModule,
    GoalModule,
    ModuleManager,
    MPCBaseModule,
)
from mpc_planner_tpu.parameters import ParameterBlock
from mpc_planner_tpu.solver import OCP, SQPSolver
from mpc_planner_tpu.solver.warmstart import (
    initialize_warmstart,
    initialize_with_braking,
    initialize_with_state,
)
from mpc_planner_tpu.types import ModuleData, RealTimeData, State


def _goal_setup(cfg, goal=(4.0, 1.0)):
    model = SecondOrderUnicycleModel()
    mgr = ModuleManager()
    base = mgr.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mgr.add_module(GoalModule(cfg))
    ocp = OCP(model, mgr, cfg)
    solver = SQPSolver(ocp)
    data = RealTimeData()
    data.goal = np.array(goal)
    data.goal_received = True
    pblock = ParameterBlock(ocp.params, cfg.N + 1)
    mgr.set_parameters_all(data, ModuleData(), pblock)
    return model, ocp, solver, pblock


def test_ocp_dims(cfg):
    """OCP dims for the basic configuration (ref test_acados.py asserts
    nh=12, nx=5, nu=2 for ellipsoid config with 12 obstacles)."""
    model = ContouringSecondOrderUnicycleModel()
    mgr = ModuleManager()
    mgr.add_module(EllipsoidConstraintModule(cfg))
    ocp = OCP(model, mgr, cfg)
    assert ocp.nx == 5
    assert ocp.nu == 2
    assert ocp.nh == cfg.max_obstacles * cfg.n_discs == 12


def test_goal_solve_moves_toward_goal(cfg):
    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    res = solver.solve(Z0, pblock.data, state.as_array())
    assert int(res.exit_code) == 1
    Z = np.asarray(res.Z)
    start_d = np.linalg.norm([4.0, 1.0])
    end_d = np.linalg.norm(Z[-1, 2:4] - np.array([4.0, 1.0]))
    assert end_d < start_d  # moved toward the goal
    assert float(res.res_eq) < 1e-2  # dynamically feasible


def test_goal_solve_is_locally_optimal(cfg):
    """Perturbing the optimal controls (within bounds) and re-rolling out
    the dynamics must not decrease the nonlinear objective."""
    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    res = solver.solve(Z0, pblock.data, state.as_array(), num_iterations=15)
    Z = np.asarray(res.Z)
    P = jnp.asarray(pblock.data, jnp.float32)
    pobj = float(ocp.total_cost(jnp.asarray(Z, jnp.float32), P))

    lb = np.asarray(model.lower_bound[: model.nu])
    ub = np.asarray(model.upper_bound[: model.nu])
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(state.as_array(), jnp.float32)
    for _ in range(6):
        U = Z[: cfg.N, : model.nu] + rng.normal(0, 0.05, (cfg.N, model.nu))
        U = np.clip(U, lb, ub)
        X = ocp.rollout(x0, jnp.asarray(U, jnp.float32), P)
        Z_pert = jnp.concatenate(
            [jnp.pad(jnp.asarray(U, jnp.float32), ((0, 1), (0, 0))), X], axis=1
        )
        pobj_pert = float(ocp.total_cost(Z_pert, P))
        assert pobj_pert >= pobj - 1e-3


def test_solution_respects_bounds(cfg):
    model, ocp, solver, pblock = _goal_setup(cfg, goal=(50.0, 0.0))
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    res = solver.solve(Z0, pblock.data, state.as_array())
    Z = np.asarray(res.Z)
    lb = np.asarray(model.lower_bound)
    ub = np.asarray(model.upper_bound)
    # inputs at stages 0..N-1 within bounds (small IP tolerance)
    assert np.all(Z[:-1, : model.nu] >= lb[: model.nu] - 1e-3)
    assert np.all(Z[:-1, : model.nu] <= ub[: model.nu] + 1e-3)
    # velocity bound (index 5): v <= 3
    assert np.all(Z[1:, model.index("v")] <= ub[model.index("v")] + 1e-3)


def test_xinit_pinned(cfg):
    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    state.set("x", 1.0)
    state.set("y", -2.0)
    state.set("v", 0.5)
    Z0 = initialize_with_state(model, cfg.N, state)
    res = solver.solve(Z0, pblock.data, state.as_array())
    Z = np.asarray(res.Z)
    np.testing.assert_allclose(Z[0, model.nu :], state.as_array(), atol=1e-5)


def test_batch_solve_matches_single(cfg):
    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    x0 = state.as_array()
    single = solver.solve(Z0, pblock.data, x0)
    B = 4
    batch = solver.solve_batch(
        np.tile(Z0[None], (B, 1, 1)),
        np.tile(pblock.data[None], (B, 1, 1)),
        np.tile(x0[None], (B, 1)),
    )
    assert batch.Z.shape[0] == B
    np.testing.assert_allclose(np.asarray(batch.Z[0]), np.asarray(single.Z), atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch.Z[3]), np.asarray(batch.Z[0]), atol=1e-6)


def test_warmstart_shift_forward():
    """Shift semantics (ref acados_solver_interface.cpp:344-376 and
    test_solver.cpp warmstart test)."""
    model = SecondOrderUnicycleModel()
    N = 6
    Z_prev = np.arange((N + 1) * model.nvar, dtype=float).reshape(N + 1, model.nvar)
    state = State(model)
    state.set("x", 42.0)
    Z = initialize_warmstart(model, N, Z_prev, state, shift_forward=True)
    assert Z[0, model.index("x")] == 42.0
    np.testing.assert_allclose(Z[1], Z_prev[2])
    np.testing.assert_allclose(Z[N - 1], Z_prev[N - 1])
    np.testing.assert_allclose(Z[N], Z_prev[N - 1])


def test_braking_initialization():
    """Braking plan decelerates to zero (ref :303-342)."""
    model = ContouringSecondOrderUnicycleModel()
    N, dt = 10, 0.2
    state = State(model)
    state.set("v", 2.0)
    state.set("psi", 0.0)
    Z = initialize_with_braking(model, N, dt, state, deceleration=3.0)
    v = Z[:, model.index("v")]
    assert v[0] == 2.0
    assert np.all(np.diff(v) <= 1e-9)
    assert v[-1] == 0.0
    x = Z[:, model.index("x")]
    assert np.all(np.diff(x) >= -1e-9)  # moves forward while braking
    # Stored inputs are clipped into the model bounds (the -3 deceleration
    # exceeds the [-2, 2] input bound; see clip_to_bounds docstring)
    np.testing.assert_allclose(Z[:, model.index("a")], model.lower_bound[0])


def test_sqp_mode_converges_and_freezes(cfg):
    """solver_type=SQP: iterates to convergence (step < tolstat), freezes
    converged iterates, reports iterations used and exit code semantics
    (1 converged / 0 max-iter) — ref acados SQP option
    (generate_acados_solver.py solver_type, settings.yaml tolstat)."""
    from mpc_planner_tpu.solver.warmstart import initialize_with_state

    cfg_sqp = cfg.replace(
        solver=cfg.solver.__class__(
            iterations=15, qp_iterations=10, solver_type="SQP"
        )
    )
    model, ocp, solver, pblock = _goal_setup(cfg_sqp)
    assert solver.solver_type == "SQP"
    state = State(model)
    Z0 = initialize_with_state(model, cfg_sqp.N, state)
    xinit = np.array([state.get(n) for n in model.states])
    res = solver.solve(Z0, pblock.data, xinit)
    assert int(res.exit_code) == 1  # converged within 15 iterations
    assert int(res.iters) < 15  # froze early
    # Converged solution matches a long RTI run
    model2, ocp2, solver_rti, pblock2 = _goal_setup(cfg_sqp.replace(
        solver=cfg_sqp.solver.__class__(iterations=15, qp_iterations=10)
    ))
    res_rti = solver_rti.solve(Z0, pblock2.data, xinit)
    np.testing.assert_allclose(np.asarray(res.Z), np.asarray(res_rti.Z),
                               atol=2e-2)


def test_sqp_mode_max_iter_exit_code(cfg):
    """Too few iterations for convergence -> exit code 0 (max iterations),
    not failure (the iterate is still usable)."""
    from mpc_planner_tpu.solver.warmstart import initialize_with_state

    cfg_sqp = cfg.replace(
        solver=cfg.solver.__class__(
            iterations=2, qp_iterations=10, solver_type="SQP",
            tol_stationarity=1e-9,  # unreachably tight
        )
    )
    model, ocp, solver, pblock = _goal_setup(cfg_sqp, goal=(8.0, 3.0))
    state = State(model)
    Z0 = initialize_with_state(model, cfg_sqp.N, state)
    xinit = np.array([state.get(n) for n in model.states])
    res = solver.solve(Z0, pblock.data, xinit)
    assert int(res.exit_code) == 0


def test_cross_cycle_dual_warmstart(cfg):
    """Duals returned by one solve warm-start the next cycle's first QP
    (HPIPM warm_start=2 carried across control cycles): same solution,
    success preserved, fewer IP iterations needed."""
    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    xinit = np.array([state.get(n) for n in model.states])

    res1 = solver.solve(Z0, pblock.data, xinit)
    assert int(res1.exit_code) == 1
    assert res1.lam_l is not None and res1.lam_u is not None
    assert np.all(np.asarray(res1.lam_l) >= 0)

    # "Next cycle": shifted warmstart, same problem, carried duals
    warm = (np.asarray(res1.lam_l), np.asarray(res1.lam_u), True)
    res2 = solver.solve(np.asarray(res1.Z), pblock.data, xinit, warm_duals=warm)
    res2_cold = solver.solve(np.asarray(res1.Z), pblock.data, xinit)
    assert int(res2.exit_code) == 1
    np.testing.assert_allclose(np.asarray(res2.Z), np.asarray(res2_cold.Z),
                               atol=5e-3)


def test_cross_cycle_dual_warmstart_batched(cfg):
    """Batched variant with a per-element ok mask."""
    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    xinit = np.array([state.get(n) for n in model.states])
    B = 3
    Z0b = np.tile(Z0[None], (B, 1, 1))
    Pb = np.tile(pblock.data[None], (B, 1, 1))
    xb = np.tile(xinit[None], (B, 1))

    res1 = solver.solve_batch(Z0b, Pb, xb)
    assert np.all(np.asarray(res1.exit_code) == 1)
    ok = np.array([True, False, True])  # element 1 falls back to cold start
    warm = (np.asarray(res1.lam_l), np.asarray(res1.lam_u), ok)
    res2 = solver.solve_batch(np.asarray(res1.Z), Pb, xb, warm_duals=warm)
    res2_cold = solver.solve_batch(np.asarray(res1.Z), Pb, xb)
    assert np.all(np.asarray(res2.exit_code) == 1)
    np.testing.assert_allclose(np.asarray(res2.Z), np.asarray(res2_cold.Z),
                               atol=5e-3)


def test_warm_failure_cold_retry(cfg):
    """Failed warm-dual elements are re-solved cold in the SAME cycle
    (solver.qp_retry_cold; the acados QP-memory-reset analog that
    recovers this cycle instead of the next). Mechanics exercised with
    stubbed compiled fns so the warm failure is deterministic."""
    import jax.numpy as jnp

    from mpc_planner_tpu.solver.sqp import SolveResult

    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    xinit = np.array([state.get(n) for n in model.states])
    B = 3
    Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
    Pb = np.tile(pblock.data[None], (B, 1, 1)).astype(np.float32)
    xb = np.tile(xinit[None], (B, 1)).astype(np.float32)

    real = solver.solve_batch(Z0b, Pb, xb)
    nrows = solver.nrows

    def fake_result(exit_codes, tag):
        Bn = len(exit_codes)
        return SolveResult(
            Z=jnp.full((Bn, cfg.N + 1, model.nvar), tag, jnp.float32),
            exit_code=jnp.asarray(exit_codes, jnp.int32),
            pobj=jnp.full((Bn,), tag, jnp.float32),
            res_eq=jnp.zeros((Bn,), jnp.float32),
            qp_mu=jnp.zeros((Bn,), jnp.float32),
            iters=jnp.ones((Bn,), jnp.int32),
            lam_l=jnp.zeros((Bn, cfg.N + 1, nrows), jnp.float32),
            lam_u=jnp.zeros((Bn, cfg.N + 1, nrows), jnp.float32),
        )

    calls = []

    def stub_get_compiled(n, batched, warm=False, escalated=False):
        calls.append(warm)
        if warm:
            return lambda *a: fake_result([-1, 1, -1], 1.0)  # warm: 0, 2 fail
        assert escalated  # retry dispatch runs the full-budget program
        return lambda *a: fake_result([1, 1, 1], 2.0)  # cold: all pass

    solver._get_compiled = stub_get_compiled
    ok = np.array([True, True, False])  # element 2's duals were invalid
    warm = (np.asarray(real.lam_l), np.asarray(real.lam_u), ok)
    res = solver.solve_batch(Z0b, Pb, xb, warm_duals=warm)

    # Element 0: warm-failed with valid duals -> replaced by cold (tag 2)
    # Element 1: warm success -> kept (tag 1)
    # Element 2: failed but ok=False (already solved cold inside the warm
    # call) -> NOT retried, kept as-is
    assert calls == [True, False]
    np.testing.assert_array_equal(np.asarray(res.exit_code), [1, 1, -1])
    np.testing.assert_allclose(np.asarray(res.pobj), [2.0, 1.0, 1.0])
    assert float(np.asarray(res.Z)[0, 0, 0]) == 2.0
    assert float(np.asarray(res.Z)[1, 0, 0]) == 1.0

    # Disabled flag: no retry dispatch, warm result returned verbatim
    calls.clear()
    solver.qp_retry_cold = False
    res2 = solver.solve_batch(Z0b, Pb, xb, warm_duals=warm)
    assert calls == [True]
    np.testing.assert_array_equal(np.asarray(res2.exit_code), [-1, 1, -1])


def test_warm_stall_escalation(cfg):
    """Soft-stall escalation (the adaptive warm-iteration default): a
    warm-dual element that is res_eq-feasible but ends with barrier mu
    above solver.qp_mu_stall is re-solved at the full cold budget in the
    same cycle and replaced when the cold solve succeeds."""
    import jax.numpy as jnp

    from mpc_planner_tpu.solver.sqp import SolveResult

    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    xinit = np.array([state.get(n) for n in model.states])
    B = 3
    Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
    Pb = np.tile(pblock.data[None], (B, 1, 1)).astype(np.float32)
    xb = np.tile(xinit[None], (B, 1)).astype(np.float32)
    real = solver.solve_batch(Z0b, Pb, xb)
    nrows = solver.nrows

    def fake_result(exit_codes, mus, tag):
        Bn = len(exit_codes)
        return SolveResult(
            Z=jnp.full((Bn, cfg.N + 1, model.nvar), tag, jnp.float32),
            exit_code=jnp.asarray(exit_codes, jnp.int32),
            pobj=jnp.full((Bn,), tag, jnp.float32),
            res_eq=jnp.zeros((Bn,), jnp.float32),
            qp_mu=jnp.asarray(mus, jnp.float32),
            iters=jnp.ones((Bn,), jnp.int32),
            lam_l=jnp.zeros((Bn, cfg.N + 1, nrows), jnp.float32),
            lam_u=jnp.zeros((Bn, cfg.N + 1, nrows), jnp.float32),
        )

    calls = []

    def stub_get_compiled(n, batched, warm=False, escalated=False):
        calls.append(warm)
        if warm:
            # all feasible, but elements 0 and 2 stalled at high mu
            return lambda *a: fake_result([1, 1, 1], [1.0, 1e-9, 0.5], 1.0)
        assert escalated  # retry dispatch runs the full-budget program
        return lambda *a: fake_result([1, -1, 1], [1e-9] * 3, 2.0)

    solver._get_compiled = stub_get_compiled
    assert solver.qp_mu_stall == 1e-3
    ok = np.array([True, True, False])  # element 2's duals were invalid
    warm = (np.asarray(real.lam_l), np.asarray(real.lam_u), ok)
    res = solver.solve_batch(Z0b, Pb, xb, warm_duals=warm)

    # Element 0: stalled with applied duals, cold succeeded -> replaced
    # Element 1: converged (mu tiny) -> kept
    # Element 2: stalled but ok=False (already cold inside warm call) ->
    # NOT escalated
    assert calls == [True, False]
    np.testing.assert_allclose(np.asarray(res.pobj), [2.0, 1.0, 1.0])
    np.testing.assert_array_equal(np.asarray(res.exit_code), [1, 1, 1])


def test_warm_iterations_auto_default(cfg):
    """The auto warm-QP iteration budget is the gated-fast 4 (stall
    escalation makes it safe-by-default); explicit config still wins."""
    model, ocp, solver, pblock = _goal_setup(cfg)
    assert solver.warm_qp_iters == 4
    import dataclasses
    cfg6 = cfg.replace(
        solver=dataclasses.replace(cfg.solver, qp_warm_iterations=6))
    from mpc_planner_tpu.solver.ocp import OCP
    from mpc_planner_tpu.solver.sqp import SQPSolver
    ocp6 = OCP(model, ocp.modules, cfg6)
    assert SQPSolver(ocp6).warm_qp_iters == 6


def test_bound_limited_vars(cfg):
    """printIfBoundLimited parity (acados_solver_interface.cpp:426-446):
    variables near a box bound at the solution are reported by name."""
    model, ocp, solver, pblock = _goal_setup(cfg)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    xinit = np.array([state.get(n) for n in model.states])
    res = solver.solve(Z0, pblock.data, xinit)
    Z = np.asarray(res.Z).copy()
    # Pin one input to its lower bound artificially
    lb_a = float(np.asarray(ocp.lb_z)[0])
    Z[3, 0] = lb_a
    hits = solver.bound_limited_vars(Z)
    assert any(k == 3 and name == model.inputs[0] and side == "lower"
               for k, name, side in hits), hits
    # Stage-0 states are skipped even at their bounds
    Z[0, model.nu] = float(np.asarray(ocp.lb_z)[model.nu])
    assert not any(k == 0 and name in model.states
                   for k, name, _ in solver.bound_limited_vars(Z))
