"""Breakdown of the batched solve: linearization vs MIRROR vs QP kernel.

Run on the real TPU chip: python experiments/profile_solve.py [BATCH]

Methodology (docs/PERF_NOTES.md): every piece is CHAINED on device
(CHAIN data-dependent repetitions inside one jit) and the chain is
synced with ONE scalar pull, then divided. Per-call timing through the
dev tunnel is meaningless here — `block_until_ready` silently does not
fence pure-XLA programs, and a per-call host pull costs a ~100 ms
tunnel round trip that dwarfs the compute.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
RTI = 10
CHAIN = 16


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from mpc_planner_tpu.utils.config import default_config
    from mpc_planner_tpu.ops.pallas_qp import solve_qp_pallas

    cfg = default_config(N=20)
    model, ocp, solver, Z0, P, xinit = _build(cfg)
    rng = np.random.default_rng(0)
    Z0b = np.tile(Z0[None], (BATCH, 1, 1)).astype(np.float32)
    Z0b[:, 1:, model.nu:] += rng.normal(0, 0.05, Z0b[:, 1:, model.nu:].shape).astype(np.float32)
    Pb = jax.device_put(jnp.asarray(np.tile(P[None], (BATCH, 1, 1)), jnp.float32))
    xb = jax.device_put(jnp.asarray(np.tile(xinit[None], (BATCH, 1)), jnp.float32))
    Z0b = jax.device_put(jnp.asarray(Z0b))

    print(f"B={BATCH} N={ocp.N} nvar={ocp.nvar} nh={ocp.nh} nrows={solver.nrows}")

    def timeit_chain(make_step, x0, reps=3):
        """make_step(x) -> x' (same pytree structure); chain CHAIN steps
        on device, sync with one scalar pull, divide."""

        @jax.jit
        def chained(x):
            def body(c, _):
                return make_step(c), None

            out, _ = jax.lax.scan(body, x, None, length=CHAIN)
            return out

        def pull(out):
            leaf = jax.tree_util.tree_leaves(out)[0]
            return float(np.asarray(leaf).ravel()[0])

        pull(chained(x0))  # compile + flush
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            pull(chained(x0))
            ts.append((time.perf_counter() - t0) / CHAIN)
        return min(ts)

    nu, nx = ocp.nu, ocp.nx

    # full solve (one control cycle, warm duals carried) — same chain as
    # bench.py
    res = solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI)
    jax.block_until_ready(res)

    def cycle(carry):
        Z, ll, lu, ok = carry
        r = solver.batch_impl(Z, Pb, xb, RTI, warm0=(ll, lu, ok))
        return (r.Z, r.lam_l, r.lam_u, r.exit_code == 1)

    t_full = timeit_chain(cycle, (res.Z, res.lam_l, res.lam_u,
                                  res.exit_code == 1))
    print(f"full warm cycle ({RTI} RTI): {t_full*1e3:8.2f} ms "
          f"({BATCH/t_full:.0f} solves/s)")

    # linearization alone (no mirror): Z' = Z + eps * g
    def lin_step(Z):
        with jax.default_matmul_precision("highest"):
            qp = jax.vmap(lambda z, p: solver._linearize(z, p, mirror=False))(Z, Pb)
        return Z + 1e-7 * qp.g

    t_lin = timeit_chain(lin_step, Z0b)
    print(f"linearize (no mirror):  {t_lin*1e3:8.2f} ms")

    with jax.default_matmul_precision("highest"):
        qp0 = jax.jit(jax.vmap(
            lambda z, p: solver._linearize(z, p, mirror=False)))(Z0b, Pb)
    Bb, Np1, nv, _ = qp0.H.shape
    Hflat = jnp.reshape(qp0.H, (Bb * Np1, nv, nv))

    # mirror alone — the structure-aware unpacked Jacobi the solver
    # actually runs (sqp._mirror_nvar)
    def mirror_step(H):
        with jax.default_matmul_precision("highest"):
            return solver._mirror_nvar(H) + 1e-9 * H

    t_mir = timeit_chain(mirror_step, Hflat)
    print(f"mirror (unpacked jacobi): {t_mir*1e3:8.2f} ms")

    # QP kernel alone, cold and warm iteration counts
    with jax.default_matmul_precision("highest"):
        Hm = jax.jit(lambda H: solver._mirror_nvar(H))(Hflat)
    qpm = qp0._replace(H=jnp.reshape(Hm, (Bb, Np1, nv, nv)))

    def qp_cold_step(qp):
        sol = solve_qp_pallas(qp, nu, nx, iterations=solver.qp_iterations,
                              mu0=solver.mu0)
        return qp._replace(g=qp.g + 1e-7 * sol.dz)

    t_qp = timeit_chain(qp_cold_step, qpm)
    print(f"qp kernel cold ({solver.qp_iterations} it): {t_qp*1e3:8.2f} ms")

    warm_iters = max(6, solver.qp_iterations * 2 // 3)
    sol0 = jax.jit(lambda qp: solve_qp_pallas(
        qp, nu, nx, iterations=solver.qp_iterations, mu0=solver.mu0))(qpm)

    def qp_warm_step(carry):
        qp, ll, lu, mu = carry
        sol = solve_qp_pallas(qp, nu, nx, iterations=warm_iters,
                              mu0=solver.mu0, warm_duals=(ll, lu, mu < 1e-2))
        return (qp._replace(g=qp.g + 1e-7 * sol.dz), sol.lam_l, sol.lam_u,
                sol.mu)

    t_qpw = timeit_chain(qp_warm_step, (qpm, sol0.lam_l, sol0.lam_u, sol0.mu))
    print(f"qp kernel warm ({warm_iters} it): {t_qpw*1e3:8.2f} ms")

    est = (t_lin + t_mir) * RTI + t_qp + t_qpw * (RTI - 1)
    print(f"sum of parts estimate:  {est*1e3:8.2f} ms (vs {t_full*1e3:.2f} measured)")


if __name__ == "__main__":
    main()
