"""Hardware agreement + timing check for the fused RTI kernel.

Compares ops/pallas_rti.py (whole SQP-RTI in one kernel launch per lane
block) against the XLA QP path and the unfused Pallas pipeline on the
real TPU, then times all three at B=1024.

Run on the chip: python -u experiments/fused_rti_check.py [BATCH]
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
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from mpc_planner_tpu.solver import SQPSolver
    from mpc_planner_tpu.utils.config import default_config

    # Force the fused path on: `rti_fused` defaults to auto->off until a
    # recorded hardware win exists (this script produces that record).
    cfg = default_config(N=20)
    cfg = cfg.replace(solver=dataclasses.replace(cfg.solver, rti_fused="on"))
    model, ocp, solver, Z0, P, xinit = _build(cfg)
    assert solver.rti_fused, "fused path not selected"

    rng = np.random.default_rng(0)
    Z0s = np.tile(Z0[None], (BATCH, 1, 1)).astype(np.float32)
    Z0s[:, 1:, model.nu:] += rng.normal(
        0, 0.05, Z0s[:, 1:, model.nu:].shape
    ).astype(np.float32)
    Pb = jax.device_put(jnp.asarray(np.tile(P[None], (BATCH, 1, 1)), jnp.float32))
    xb = jax.device_put(jnp.asarray(np.tile(xinit[None], (BATCH, 1)), jnp.float32))
    Z0b = jax.device_put(jnp.asarray(Z0s))

    # Small-batch agreement: fused vs the unfused Pallas pipeline (which
    # is itself agreement-tested against the XLA path by the test suite;
    # the XLA QP path's TPU compile at flagship shapes takes >30 min and
    # adds nothing here).
    Bs = 8
    Z0a, Pa, xa = Z0b[:Bs], Pb[:Bs], xb[:Bs]

    cfg_u = cfg.replace(solver=dataclasses.replace(cfg.solver, rti_fused="off"))
    solver_u = SQPSolver(ocp.__class__(model, ocp.modules, cfg_u))
    t0 = time.time()
    unf = solver_u.solve_batch(Z0a, Pa, xa, num_iterations=RTI)
    jax.block_until_ready(unf.Z)
    print(f"unfused pallas solved ({time.time()-t0:.1f}s)")

    t0 = time.time()
    fus = solver.solve_batch(Z0a, Pa, xa, num_iterations=RTI)
    jax.block_until_ready(fus.Z)
    print(f"fused solved ({time.time()-t0:.1f}s compile+run)")

    Zu, Zf = (np.asarray(r.Z) for r in (unf, fus))
    scale = np.abs(Zu).max() + 1e-9
    print("exit codes unfused/fused:",
          np.asarray(unf.exit_code), np.asarray(fus.exit_code))
    print(f"max|Z_fused - Z_unfused|/scale = {np.abs(Zf-Zu).max()/scale:.2e}")
    print(f"res_eq fused max = {np.asarray(fus.res_eq).max():.2e}")

    # KKT residuals of the fused result (independent parity check)
    from mpc_planner_tpu.solver.kkt import kkt_residuals
    r = kkt_residuals(solver, Zf[0], np.asarray(Pa)[0],
                      np.asarray(fus.lam_l)[0], np.asarray(fus.lam_u)[0])
    print(f"fused KKT: stat={r.stationarity:.2e} eq={r.eq_residual:.2e} "
          f"box={r.primal_box:.2e} h={r.primal_h:.2e} "
          f"comp={r.complementarity:.2e}")

    # Warm-dual cycle agreement
    warm = (fus.lam_l, fus.lam_u, fus.qp_mu < 1e-2)
    warm_u = (unf.lam_l, unf.lam_u, unf.qp_mu < 1e-2)
    fus2 = solver.solve_batch(Z0a, Pa, xa, num_iterations=RTI, warm_duals=warm)
    unf2 = solver_u.solve_batch(Z0a, Pa, xa, num_iterations=RTI, warm_duals=warm_u)
    d = np.abs(np.asarray(fus2.Z) - np.asarray(unf2.Z)).max() / scale
    print(f"warm cycle: max|Z_f - Z_u|/scale = {d:.2e}; "
          f"exit {np.asarray(fus2.exit_code)}")

    # Timing at full batch
    t_unf = timeit(lambda: solver_u.solve_batch(Z0b, Pb, xb, num_iterations=RTI),
                   reps=5)
    t_fus = timeit(lambda: solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI),
                   reps=5)
    print(f"B={BATCH} {RTI} RTI: unfused {t_unf*1e3:.2f} ms "
          f"({BATCH/t_unf:.0f}/s) | fused {t_fus*1e3:.2f} ms "
          f"({BATCH/t_fus:.0f}/s)")

    # Single-block latency (batch of one pads to 128 lanes)
    t1_unf = timeit(lambda: solver_u.solve_batch(Z0b[:1], Pb[:1], xb[:1],
                                                 num_iterations=RTI), reps=5)
    t1_fus = timeit(lambda: solver.solve_batch(Z0b[:1], Pb[:1], xb[:1],
                                               num_iterations=RTI), reps=5)
    print(f"B=1: unfused {t1_unf*1e3:.2f} ms | fused {t1_fus*1e3:.2f} ms")


if __name__ == "__main__":
    main()
