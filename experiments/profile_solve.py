"""Breakdown of the batched solve: linearization vs QP kernel vs mirror.

Run on the real TPU chip: python experiments/profile_solve.py [BATCH]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
RTI = 10


def timeit(fn, *args, reps=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from mpc_planner_tpu.utils.config import default_config
    from mpc_planner_tpu.ops.pallas_qp import solve_qp_pallas
    from mpc_planner_tpu.ops.jacobi_eigh import mirror_jacobi

    cfg = default_config(N=20)
    model, ocp, solver, Z0, P, xinit = _build(cfg)
    rng = np.random.default_rng(0)
    Z0b = np.tile(Z0[None], (BATCH, 1, 1)).astype(np.float32)
    Z0b[:, 1:, model.nu:] += rng.normal(0, 0.05, Z0b[:, 1:, model.nu:].shape).astype(np.float32)
    Pb = jax.device_put(jnp.asarray(np.tile(P[None], (BATCH, 1, 1)), jnp.float32))
    xb = jax.device_put(jnp.asarray(np.tile(xinit[None], (BATCH, 1)), jnp.float32))
    Z0b = jax.device_put(jnp.asarray(Z0b))

    print(f"B={BATCH} N={ocp.N} nvar={ocp.nvar} nh={ocp.nh} nrows={solver.nrows}")

    # full solve
    t_full = timeit(lambda: solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI), reps=5)
    print(f"full solve ({RTI} RTI): {t_full*1e3:8.2f} ms  ({BATCH/t_full:.0f} solves/s)")

    t_full1 = timeit(lambda: solver.solve_batch(Z0b, Pb, xb, num_iterations=1), reps=5)
    print(f"full solve (1 RTI):   {t_full1*1e3:8.2f} ms")

    # linearization alone (no mirror)
    @jax.jit
    def lin_only(Z, P_):
        with jax.default_matmul_precision("highest"):
            return jax.vmap(lambda z, p: solver._linearize(z, p, mirror=False))(Z, P_)

    qp = lin_only(Z0b, Pb)
    t_lin = timeit(lin_only, Z0b, Pb)
    print(f"linearize (no mirror): {t_lin*1e3:8.2f} ms")

    # mirror alone
    Bb, Np1, nv, _ = qp.H.shape
    Hflat = qp.H.reshape(Bb * Np1, nv, nv)

    @jax.jit
    def mirror_only(H):
        with jax.default_matmul_precision("highest"):
            return mirror_jacobi(H, solver.lm)

    t_mir = timeit(mirror_only, Hflat)
    print(f"mirror (jacobi):       {t_mir*1e3:8.2f} ms")

    # QP kernel alone, cold (12 it) and warm (8 it)
    @jax.jit
    def qp_cold(qp):
        return solve_qp_pallas(qp, ocp.nu, ocp.nx, iterations=solver.qp_iterations,
                               mu0=solver.mu0)

    qpm = qp._replace(H=mirror_only(Hflat).reshape(Bb, Np1, nv, nv))
    t_qp = timeit(qp_cold, qpm)
    print(f"qp kernel cold ({solver.qp_iterations} it): {t_qp*1e3:8.2f} ms")

    warm_iters = max(6, solver.qp_iterations * 2 // 3)

    @jax.jit
    def qp_warm(qp, ll, lu, mu):
        return solve_qp_pallas(qp, ocp.nu, ocp.nx, iterations=warm_iters,
                               mu0=solver.mu0, warm_duals=(ll, lu, mu < 1e-2))

    sol = qp_cold(qpm)
    t_qpw = timeit(lambda: qp_warm(qpm, sol.lam_l, sol.lam_u, sol.mu))
    print(f"qp kernel warm ({warm_iters} it): {t_qpw*1e3:8.2f} ms")

    est = t_lin * RTI + t_mir * RTI + t_qp + t_qpw * (RTI - 1)
    print(f"sum of parts estimate: {est*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
