"""Multi-device scaling sweep for the batched T-MPC solve.

Measures `distributed_solve_step` (solve sharded over a mesh +
global-argmin selection + replicated winner) at FLAGSHIP shapes (N=20,
full T-MPC++ module set) across mesh sizes, reporting per-device
throughput and weak-scaling efficiency.

Two modes:
  * CPU virtual mesh (default; the only multi-device option in this
    environment): `python experiments/scaling_sweep.py` sweeps
    1/2/4/8 virtual devices with a fixed PER-DEVICE batch (weak
    scaling). Absolute times are CPU times — only the scaling SHAPE and
    the collective overheads are meaningful; the same harness runs
    unchanged on a real slice.
  * Real TPU(s): `JAX_PLATFORMS= python experiments/scaling_sweep.py --tpu`
    uses every available chip (1 in this environment).

Also reports the cross-device payloads of the selection step (analytic:
the argmin all-reduce carries O(1) scalars per device; the winner
broadcast is one [N+1, nvar] f32 trajectory ~= 0.6 kB) — the only
communication in the control cycle, SURVEY.md §2.5(5).

Results land in SCALING.md.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--tpu", action="store_true", help="use real TPU devices")
    p.add_argument("--per-device", type=int, default=16,
                   help="batch elements per device (weak scaling)")
    p.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--rti", type=int, default=10)
    return p.parse_args()


def main():
    args = parse_args()
    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={max(args.devices)}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp

    from __graft_entry__ import _build
    from mpc_planner_tpu.parallel.distributed import distributed_solve_step
    from mpc_planner_tpu.parallel.mesh import batch_mesh, shard_batch
    from mpc_planner_tpu.utils.config import default_config

    cfg = default_config(N=20)
    model, ocp, solver, Z0, P, xinit = _build(cfg)
    print(f"flagship OCP: N={ocp.N} nvar={ocp.nvar} nh={ocp.nh} "
          f"npar={ocp.npar} backend={solver.qp_backend} "
          f"fused={solver.rti_fused}")

    all_devices = jax.devices()
    sweep = [n for n in args.devices if n <= len(all_devices)]
    rng = np.random.default_rng(0)

    rows = []
    for n_dev in sweep:
        B = args.per_device * n_dev
        mesh = batch_mesh(all_devices[:n_dev])
        Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
        Z0b[:, 1:, model.nu:] += rng.normal(
            0, 0.05, Z0b[:, 1:, model.nu:].shape
        ).astype(np.float32)
        Pb = np.tile(P[None], (B, 1, 1)).astype(np.float32)
        xb = np.tile(xinit[None], (B, 1)).astype(np.float32)
        cons = np.ones((B,), np.float32)
        Z0b, Pb, xb, cons = shard_batch(mesh, (Z0b, Pb, xb, cons))

        step = distributed_solve_step(solver, mesh, num_iterations=args.rti)
        out = step(Z0b, Pb, xb, cons)
        jax.block_until_ready(out)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(Z0b, Pb, xb, cons)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        Zw, idx, found, res = out
        n_feasible = int(np.sum(np.asarray(res.exit_code) == 1))
        rows.append((n_dev, B, dt * 1e3, B / dt, B / dt / n_dev, n_feasible))
        print(f"devices={n_dev:2d} B={B:4d} {dt*1e3:9.2f} ms/step "
              f"{B/dt:9.0f} solves/s {B/dt/n_dev:9.0f} /s/device "
              f"feasible={n_feasible}/{B} winner={int(idx)} found={bool(found)}")

    base = rows[0][4]
    print("\n| devices | B | ms/step | solves/s | solves/s/device | efficiency |")
    print("|---|---|---|---|---|---|")
    for n_dev, B, ms, sps, spsd, nf in rows:
        print(f"| {n_dev} | {B} | {ms:.1f} | {sps:.0f} | {spsd:.0f} | "
              f"{spsd/base*100:.0f}% |")

    # Communication payloads of the selection step (per control cycle)
    Np1, nvar = ocp.N + 1, ocp.nvar
    print(f"\nselection payloads: argmin all-reduce = O(1) scalars/device; "
          f"winner broadcast = {Np1}x{nvar} f32 = {Np1*nvar*4} bytes")


if __name__ == "__main__":
    main()
