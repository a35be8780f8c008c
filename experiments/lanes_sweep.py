"""A/B the fused QP kernel's LANES (batch elements per kernel block).

The kernel is latency-bound (docs/PERF_NOTES.md): each of ~1500
sequential stage-steps is a handful of dependent tiny VPU ops. More
lanes per block = more independent work per op = better ILP, as long as
the ~58 KB/lane working set fits scoped VMEM (16 MB). The identity-box
diet freed ~1.4 MB/128 lanes; this sweep measures whether 256 now fits
and whether it is actually faster.

Run on the real chip: python experiments/lanes_sweep.py [BATCH]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


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
    from mpc_planner_tpu.ops import pallas_qp
    from mpc_planner_tpu.ops.jacobi_eigh import mirror_jacobi

    cfg = default_config(N=20)
    model, ocp, solver, Z0, P, xinit = _build(cfg)
    rng = np.random.default_rng(0)
    Z0b = np.tile(Z0[None], (BATCH, 1, 1)).astype(np.float32)
    Z0b[:, 1:, model.nu:] += rng.normal(
        0, 0.05, Z0b[:, 1:, model.nu:].shape).astype(np.float32)
    Pb = jax.device_put(jnp.asarray(np.tile(P[None], (BATCH, 1, 1)), jnp.float32))
    Z0b = jax.device_put(jnp.asarray(Z0b))
    xb = jax.device_put(jnp.asarray(np.tile(xinit[None], (BATCH, 1)), jnp.float32))

    with jax.default_matmul_precision("highest"):
        qp = jax.jit(jax.vmap(lambda z, p: solver._linearize(z, p, mirror=False)))(
            Z0b, Pb)
        Bb, Np1, nv, _ = qp.H.shape
        Hm = jax.jit(lambda H: mirror_jacobi(H, solver.lm))(
            qp.H.reshape(Bb * Np1, nv, nv))
        qp = qp._replace(H=Hm.reshape(Bb, Np1, nv, nv))
    jax.block_until_ready(qp.H)

    print(f"B={BATCH} N={ocp.N} nvar={ocp.nvar} nh={ocp.nh} nrows={solver.nrows}")

    ref = None
    for lanes in (128, 256):
        pallas_qp.LANES = lanes
        try:
            fn_cold = jax.jit(lambda qp: pallas_qp.solve_qp_pallas(
                qp, ocp.nu, ocp.nx, iterations=12, mu0=solver.mu0))
            sol = jax.block_until_ready(fn_cold(qp))
            fn_warm = jax.jit(lambda qp, ll, lu, mu: pallas_qp.solve_qp_pallas(
                qp, ocp.nu, ocp.nx, iterations=8, mu0=solver.mu0,
                warm_duals=(ll, lu, mu < 1e-2)))
            jax.block_until_ready(fn_warm(qp, sol.lam_l, sol.lam_u, sol.mu))
            t_c = timeit(fn_cold, qp)
            t_w = timeit(lambda: fn_warm(qp, sol.lam_l, sol.lam_u, sol.mu))
            if ref is None:
                ref = np.asarray(sol.dz)
                err = 0.0
            else:
                err = float(np.max(np.abs(np.asarray(sol.dz) - ref)))
            print(f"LANES={lanes}: cold12 {t_c*1e3:7.2f} ms  warm8 {t_w*1e3:7.2f} ms"
                  f"  max|dz-ref|={err:.2e}")
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).splitlines()[0][:160]
            print(f"LANES={lanes}: FAILED — {msg}")
    pallas_qp.LANES = 128


if __name__ == "__main__":
    main()
