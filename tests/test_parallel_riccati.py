"""Parallel-in-horizon (associative-scan) Riccati vs the sequential sweeps.

Both paths solve the same Newton/LQR systems exactly, so full IP solves
must agree to float tolerance (VERDICT r1 #5: agreement vs
`_riccati_linear` on identical inputs). Crossover measurements live in
`experiments/horizon_sweep.py`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mpc_planner_tpu.solver import parallel_riccati
from mpc_planner_tpu.solver.qp import QPData, _riccati_factor, _riccati_linear, solve_qp


def _random_qp(rng, N=12, nu=2, nx=5, nh=4):
    """Well-conditioned random stagewise QP."""
    nvar = nu + nx
    nrows = nvar + nh

    def spd(n, scale=1.0):
        M = rng.normal(0, 1, (N + 1, n, n))
        return scale * (M @ M.transpose(0, 2, 1) + 2.0 * np.eye(n))

    H = spd(nvar, 0.5)
    H[N, :nu, :] = 0.0
    H[N, :, :nu] = 0.0
    H[N, nu:, nu:] += np.eye(nx)
    g = rng.normal(0, 1, (N + 1, nvar))
    A = np.tile(np.eye(nx), (N, 1, 1)) + 0.05 * rng.normal(0, 1, (N, nx, nx))
    B = 0.3 * rng.normal(0, 1, (N, nx, nu))
    c = 0.05 * rng.normal(0, 1, (N, nx))
    D_h = rng.normal(0, 1, (N + 1, nh, nvar))
    D_box = np.zeros((N + 1, nvar, nvar))
    D_box[:] = np.eye(nvar)
    D = np.concatenate([D_box, D_h], axis=1)
    lb = -2.0 - np.abs(rng.normal(0, 1, (N + 1, nrows)))
    ub = 2.0 + np.abs(rng.normal(0, 1, (N + 1, nrows)))
    mask = np.ones((N + 1, nrows))
    mask[0, nu:nvar] = 0.0  # x_0 pinned
    mask[N, :nu] = 0.0  # no terminal input
    mask[N, nvar:] = 0.0  # no terminal h rows
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return QPData(
        H=f32(H), g=f32(g), A=f32(A), B=f32(B), c=f32(c), D=f32(D),
        lb=f32(lb), ub=f32(ub), mask_l=f32(mask), mask_u=f32(mask),
    ), nu, nx


def test_linear_solve_agreement(rng):
    """Same (H_bar, g_bar, r_eq) -> same dz through both factorizations."""
    qp, nu, nx = _random_qp(rng)
    N = qp.A.shape[0]
    with jax.default_matmul_precision("highest"):
        factors = _riccati_factor(qp.H, qp.A, qp.B, nu, nx, reg=1e-7)
        dz_seq = _riccati_linear(factors, qp.g, qp.c, qp.A, qp.B, nu, nx)
        prep = parallel_riccati.prepare(qp.H, qp.A, qp.B, nu, nx, reg=1e-7)
        dz_par = parallel_riccati.solve(prep, qp.g, qp.c, qp.B, nu, nx)
    dz_seq = np.asarray(dz_seq)
    dz_par = np.asarray(dz_par)
    scale = np.abs(dz_seq).max() + 1e-9
    assert np.abs(dz_seq - dz_par).max() / scale < 1e-5


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_ip_solve_agreement(seed):
    """Full interior-point solves agree between the two linear solvers."""
    rng = np.random.default_rng(seed)
    qp, nu, nx = _random_qp(rng)
    with jax.default_matmul_precision("highest"):
        sol_seq = solve_qp(qp, nu, nx, iterations=10, horizon_parallel=False)
        sol_par = solve_qp(qp, nu, nx, iterations=10, horizon_parallel=True)
    dz_seq = np.asarray(sol_seq.dz)
    dz_par = np.asarray(sol_par.dz)
    scale = np.abs(dz_seq).max() + 1e-9
    assert np.abs(dz_seq - dz_par).max() / scale < 5e-4
    assert np.isfinite(float(sol_par.mu))


@pytest.mark.slow
def test_config_flag_reaches_solver(cfg):
    """solver.horizon_parallel=True is honored end-to-end on the XLA path."""
    import dataclasses

    from mpc_planner_tpu.planner import Planner
    from mpc_planner_tpu.presets import configuration_no_obstacles, corridor_scene

    cfg2 = cfg.replace(
        solver=dataclasses.replace(cfg.solver, horizon_parallel=True, qp_backend="xla")
    )
    model, modules = configuration_no_obstacles(cfg2)
    planner = Planner(model, modules, cfg2)
    assert planner.solver.horizon_parallel
    state, data = corridor_scene(cfg2, n_pedestrians=0, seed=0)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
