"""Fused Pallas QP kernel vs the XLA reference implementation.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel
compiles natively on TPU (exercised by bench.py / the driver).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from mpc_planner_tpu.solver.qp import solve_qp


def _small_qp(cfg, rng, mirror=True):
    """Build a batched QP from the goal-tracking OCP."""
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
    B = 4
    Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
    Z0b[:, 1:, model.nu :] += rng.normal(0, 0.05, Z0b[:, 1:, model.nu :].shape)
    Pb = jnp.asarray(np.tile(pblock.data[None], (B, 1, 1)), jnp.float32)
    qp = jax.vmap(lambda z, p: solver._linearize(z, p, mirror=mirror))(
        jnp.asarray(Z0b, jnp.float32), Pb
    )
    return (model, qp) if mirror else (model, solver, qp)


@pytest.mark.parametrize("mehrotra", [True, False])
def test_pallas_qp_matches_xla(cfg, rng, mehrotra):
    from mpc_planner_tpu.ops import pallas_qp

    model, qp = _small_qp(cfg, rng)
    ITER = 8
    with jax.default_matmul_precision("highest"):
        ref = jax.vmap(
            lambda d: solve_qp(
                d, model.nu, model.nx, iterations=ITER, mehrotra=mehrotra
            )
        )(qp)
        out = pallas_qp.solve_qp_pallas(
            qp, model.nu, model.nx, iterations=ITER, interpret=True,
            mehrotra=mehrotra,
        )
    dz_ref = np.asarray(ref.dz)
    dz_pl = np.asarray(out.dz)
    scale = np.abs(dz_ref).max() + 1e-9
    assert np.abs(dz_ref - dz_pl).max() / scale < 5e-3
    # Duals agree too (warm-start handoff depends on them)
    ll_ref = np.asarray(ref.lam_l)
    ll_pl = np.asarray(out.lam_l)
    assert np.abs(ll_ref - ll_pl).max() / (np.abs(ll_ref).max() + 1e-9) < 5e-3


def test_pallas_qp_mirror_in_kernel(cfg, rng):
    """Raw-Hessian input + in-kernel MIRROR matches the XLA-mirrored
    reference path."""
    from mpc_planner_tpu.ops import pallas_qp

    model, solver, qp_raw = _small_qp(cfg, rng, mirror=False)
    ITER = 8
    with jax.default_matmul_precision("highest"):
        Bb, Np1, nv, _ = qp_raw.H.shape
        H_m = solver._mirror_nvar(qp_raw.H.reshape(Bb * Np1, nv, nv))
        qp_m = qp_raw._replace(H=H_m.reshape(Bb, Np1, nv, nv))
        ref = jax.vmap(
            lambda d: solve_qp(d, model.nu, model.nx, iterations=ITER)
        )(qp_m)
        out = pallas_qp.solve_qp_pallas(
            qp_raw, model.nu, model.nx, iterations=ITER, interpret=True,
            mirror_in_kernel=True, lm=solver.lm,
            mirror_x_only=solver._mirror_x_only,
        )
    dz_ref = np.asarray(ref.dz)
    dz_pl = np.asarray(out.dz)
    scale = np.abs(dz_ref).max() + 1e-9
    assert np.abs(dz_ref - dz_pl).max() / scale < 5e-3


@pytest.mark.parametrize("mehrotra", [True, False])
def test_pallas_qp_warm_duals(cfg, rng, mehrotra):
    from mpc_planner_tpu.ops import pallas_qp

    model, qp = _small_qp(cfg, rng)
    ITER = 6
    with jax.default_matmul_precision("highest"):
        first = pallas_qp.solve_qp_pallas(
            qp, model.nu, model.nx, iterations=ITER, interpret=True
        )
        B = qp.H.shape[0]
        ok = jnp.ones((B,), bool)
        warm = pallas_qp.solve_qp_pallas(
            qp, model.nu, model.nx, iterations=ITER,
            warm_duals=(first.lam_l, first.lam_u, ok), interpret=True,
            mehrotra=mehrotra,
        )
        ref = jax.vmap(
            lambda d, wl, wu: solve_qp(
                d, model.nu, model.nx, iterations=ITER,
                warm_duals=(wl, wu, jnp.asarray(True)), mehrotra=mehrotra,
            )
        )(qp, first.lam_l, first.lam_u)
    assert (
        np.abs(np.asarray(warm.dz) - np.asarray(ref.dz)).max()
        / (np.abs(np.asarray(ref.dz)).max() + 1e-9)
        < 5e-3
    )


def test_pallas_qp_wide_matches_classic(cfg, rng):
    """Wide multi-block dispatch (w blocks per kernel call, [w] block
    axis inside every op — the measured 4-7x Riccati-throughput form,
    experiments/riccati_ilp_probe.py) must agree with the classic
    one-block-per-call path on a batch spanning several blocks,
    including a remainder chunk (G=3 -> chunks of 2 + 1)."""
    from mpc_planner_tpu.ops import pallas_qp

    model, qp = _small_qp(cfg, rng)
    # Tile the 4-element QP out to 3 lane blocks with per-element noise
    B = 3 * pallas_qp.LANES
    reps = B // qp.H.shape[0]
    qp = jax.tree.map(lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), qp)
    g_noise = 0.01 * jax.random.normal(jax.random.PRNGKey(0), qp.g.shape)
    qp = qp._replace(g=qp.g + g_noise)

    ITER = 5
    with jax.default_matmul_precision("highest"):
        classic = pallas_qp.solve_qp_pallas(
            qp, model.nu, model.nx, iterations=ITER, interpret=True, wide=1)
        wide = pallas_qp.solve_qp_pallas(
            qp, model.nu, model.nx, iterations=ITER, interpret=True, wide=2)
    np.testing.assert_allclose(
        np.asarray(wide.dz), np.asarray(classic.dz), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(wide.lam_l), np.asarray(classic.lam_l), atol=2e-5,
        rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(wide.mu), np.asarray(classic.mu), atol=1e-7, rtol=1e-4)


def test_pallas_qp_wide_warm_duals(cfg, rng):
    """Warm-dual handoff through the wide path (wok carries no stage
    axis — layout differs from the stage-first tensors)."""
    from mpc_planner_tpu.ops import pallas_qp

    model, qp = _small_qp(cfg, rng)
    B = 2 * pallas_qp.LANES
    reps = B // qp.H.shape[0]
    qp = jax.tree.map(lambda x: jnp.tile(x, (reps,) + (1,) * (x.ndim - 1)), qp)
    ITER = 5
    with jax.default_matmul_precision("highest"):
        first = pallas_qp.solve_qp_pallas(
            qp, model.nu, model.nx, iterations=ITER, interpret=True, wide=2)
        ok = jnp.ones((B,), bool)
        warm_classic = pallas_qp.solve_qp_pallas(
            qp, model.nu, model.nx, iterations=3,
            warm_duals=(first.lam_l, first.lam_u, ok), interpret=True, wide=1)
        warm_wide = pallas_qp.solve_qp_pallas(
            qp, model.nu, model.nx, iterations=3,
            warm_duals=(first.lam_l, first.lam_u, ok), interpret=True, wide=2)
    np.testing.assert_allclose(
        np.asarray(warm_wide.dz), np.asarray(warm_classic.dz), atol=2e-5,
        rtol=1e-4)
