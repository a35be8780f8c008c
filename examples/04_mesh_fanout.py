"""Scaling T-MPC++'s parallel solves across a device mesh.

The reference runs its 4+1 parallel homotopy-class planners on OpenMP
threads (guidance_constraints.cpp:279). Here the parallel planners are a
leading batch axis of ONE vmapped solver, and that axis shards over a
`jax.sharding.Mesh` — 5 planners or 5000 are the same program. The
best-feasible argmin selection (ref FindBestPlanner) lowers to an
all-reduce over the mesh.

This example uses an 8-device virtual CPU mesh so it runs anywhere; on
real hardware the same code spans a TPU pod slice (the ICI carries the
argmin collective).
"""

import _common

_common.setup(cpu_devices=8)

import numpy as np
import jax

from __graft_entry__ import _build
from mpc_planner_tpu.parallel.mesh import (
    argmin_objective,
    batch_mesh,
    shard_batch,
    sharded_solve_fn,
)
from mpc_planner_tpu.utils.config import default_config


def main():
    cfg = default_config(N=10)
    cfg = cfg.replace(solver=cfg.solver.__class__(iterations=4, qp_iterations=10))
    model, ocp, solver, Z0, P, xinit = _build(cfg)

    # 128 parallel guesses: perturbed warmstarts standing in for distinct
    # homotopy-class guidance trajectories.
    B = 128
    rng = np.random.default_rng(0)
    Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
    Z0b[:, 1:, model.nu:] += rng.normal(
        0, 0.05, Z0b[:, 1:, model.nu:].shape).astype(np.float32)
    Pb = np.tile(P[None], (B, 1, 1)).astype(np.float32)
    xb = np.tile(xinit[None], (B, 1)).astype(np.float32)

    mesh = batch_mesh(jax.devices()[:8])
    print(f"mesh: {mesh.shape} over {len(mesh.devices.flat)} devices")

    # Shard the batch axis; each device solves B/8 full MPC problems.
    Z0b, Pb, xb = shard_batch(mesh, (Z0b, Pb, xb))
    solve = sharded_solve_fn(solver, mesh, num_iterations=cfg.solver.iterations)
    res = jax.block_until_ready(solve(Z0b, Pb, xb))

    feasible = res.exit_code == 1
    print(f"batch: {B} solves, {int(np.sum(np.asarray(feasible)))} feasible")

    # Best-planner selection as a collective reduction.
    idx, found = jax.jit(argmin_objective)(res.pobj, feasible)
    print(f"selected planner {int(idx)} "
          f"(objective {float(res.pobj[int(idx)]):.3f}, found={bool(found)})")
    assert bool(found)


if __name__ == "__main__":
    main()
