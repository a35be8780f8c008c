"""Stability stress for the nvar=8 (SH-MPC slack model) Pallas path.

History (docs/PERF_NOTES.md): at nvar=8 the compiled kernel was
NONDETERMINISTICALLY faulty on hardware — the same program flip-flopped
across processes between chip faults, all-NaN results, and bit-correct
answers. That was measured under the default 16 MB scoped-VMEM cap with
~665 KB of headroom; this script retests under the raised 100 MB cap.

Run several times in FRESH processes (the flakiness was cross-process):
    for i in 1 2 3 4 5 6; do python experiments/nvar8_stress.py; done

Prints one line: PASS / NAN / MISMATCH / FAULT.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

BATCH = 256
RTI = 10


def main():
    import jax
    import jax.numpy as jnp

    from experiments.ladder_bench import build_solver
    from mpc_planner_tpu.presets import configuration_safe_horizon, corridor_scene
    from mpc_planner_tpu.utils.config import default_config

    cfg = default_config(N=20).replace(max_obstacles=8)
    model, mgr = configuration_safe_horizon(cfg)
    state, data = corridor_scene(cfg, n_pedestrians=8)
    solver, Z0, P, xinit = build_solver(cfg, model, mgr, state, data)
    assert model.nvar == 8, model.nvar

    rng = np.random.default_rng(0)
    Z0b = np.tile(Z0[None], (BATCH, 1, 1)).astype(np.float32)
    Z0b[:, 1:, model.nu:] += rng.normal(
        0, 0.05, Z0b[:, 1:, model.nu:].shape).astype(np.float32)
    Z0b = jnp.asarray(Z0b)
    Pb = jnp.asarray(np.tile(P[None], (BATCH, 1, 1)), jnp.float32)
    xb = jnp.asarray(np.tile(xinit[None], (BATCH, 1)), jnp.float32)

    # Reference: XLA path (stable)
    solver.qp_backend = "xla"
    solver._compiled.clear()
    ref = solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI)
    Zr = np.asarray(jax.block_until_ready(ref.Z))

    # Device under test: forced Pallas path
    solver.qp_backend = "pallas"
    solver._compiled.clear()
    try:
        out = solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI)
        Zp = np.asarray(jax.block_until_ready(out.Z))
    except Exception as exc:  # noqa: BLE001
        print(f"FAULT: {str(exc).splitlines()[0][:140]}")
        return 2
    if not np.all(np.isfinite(Zp)):
        print(f"NAN: {np.isnan(Zp).mean():.1%} NaN elements")
        return 3
    err = float(np.max(np.abs(Zp - Zr)))
    if err > 1e-2:
        print(f"MISMATCH: max|Z_pallas - Z_xla| = {err:.3e}")
        return 4
    print(f"PASS: max|Z_pallas - Z_xla| = {err:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
