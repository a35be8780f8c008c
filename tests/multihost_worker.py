"""Worker process for the real multi-host test (test_multihost.py).

Each process owns 4 virtual CPU devices and joins a 2-process
`jax.distributed` job — the same topology as one controller process per
TPU host on a pod slice (SURVEY.md §2.5: ROS pub/sub between processes
becomes jax.distributed; DCN carries the argmin reduction + winner
broadcast, parallel/distributed.py).

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
Prints one line: MULTIHOST <pid> idx=<i> found=<b> zsum=<f>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)

import numpy as np  # noqa: E402

from __graft_entry__ import _build  # noqa: E402
from mpc_planner_tpu.parallel.distributed import (  # noqa: E402
    distributed_solve_step,
    global_batch_size,
    host_shard_slice,
    host_sharded_batch,
)
from mpc_planner_tpu.parallel.mesh import batch_mesh  # noqa: E402
from mpc_planner_tpu.utils.config import default_config  # noqa: E402


def jnp_sum_replicated(mesh):
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    def f(x):
        return jax.lax.with_sharding_constraint(
            jnp.sum(x), NamedSharding(mesh, P())
        )

    return f


def main():
    assert jax.process_count() == int(sys.argv[2])
    assert len(jax.devices()) == 4 * jax.process_count(), (
        f"expected {4 * jax.process_count()} global devices, "
        f"have {len(jax.devices())}"
    )

    # Establish the cross-process Gloo clique BEFORE the heavy solver
    # compile: the trivial reduction below compiles in ~1 s on both
    # processes, so the 30 s context-init handshake never races the
    # compile-time skew of the main step (which can exceed it).
    mesh = batch_mesh()  # all 8 global devices
    probe = host_sharded_batch(mesh, (np.ones(2 * len(jax.devices()), np.float32),))[0]
    jax.block_until_ready(jax.jit(jnp_sum_replicated(mesh))(probe))
    print(f"[w{jax.process_index()}] gloo barrier ok", flush=True)

    # The FLAGSHIP program (same shape dryrun_multichip runs single-
    # process): N=20 full T-MPC++ module set (nh=24), TWO control cycles
    # through distributed_solve_step — cycle 2 carries cycle 1's
    # converged duals (cross-cycle warm start), the broadcast winner
    # (shifted) as every planner's warmstart, and the consistency bonus
    # on the winner (VERDICT r4 #8).
    import jax.numpy as jnp

    cfg = default_config(N=20)
    cfg = cfg.replace(
        solver=cfg.solver.__class__(iterations=2, qp_iterations=6),
    )
    model, ocp, solver, Z0, P, xinit = _build(cfg)
    print(f"[w{jax.process_index()}] built flagship N=20 nh={ocp.nh}",
          flush=True)

    per_host = 8
    B = global_batch_size(per_host)  # 16 over 2 hosts
    sl = host_shard_slice(B)

    # Every host derives ITS slice of the same deterministic global batch
    # (the guidance layer is deterministic given state+obstacles; here the
    # per-row perturbation is seeded by global row index).
    rows = np.arange(B)[sl]
    rng = np.random.default_rng(0)
    noise = rng.normal(0, 0.05, (B,) + Z0[1:, model.nu:].shape).astype(np.float32)
    Z0l = np.tile(Z0[None], (per_host, 1, 1)).astype(np.float32)
    Z0l[:, 1:, model.nu:] += noise[rows]
    Pl = np.tile(P[None], (per_host, 1, 1)).astype(np.float32)
    xl = np.tile(xinit[None], (per_host, 1)).astype(np.float32)
    cl = np.ones(per_host, np.float32)

    Z0b, Pb, xb, cb = host_sharded_batch(mesh, (Z0l, Pl, xl, cl))

    cold = distributed_solve_step(solver, mesh, num_iterations=2)
    print(f"[w{jax.process_index()}] cold cycle", flush=True)
    Zw, idx, found, res = cold(Z0b, Pb, xb, cb)
    jax.block_until_ready(Zw)
    assert bool(found), "no feasible planner in cold cycle"
    print(f"[w{jax.process_index()}] cold done idx={int(idx)}", flush=True)

    # Cycle 2: winner broadcast -> shifted warmstart on every planner,
    # converged duals carried, consistency bonus on the winner
    # (guidance_constraints.cpp:358-359).
    Zshift = jnp.concatenate([Zw[1:], Zw[-1:]], axis=0)
    Z0l2 = np.tile(np.asarray(Zshift, np.float32)[None], (per_host, 1, 1))
    cl2 = np.where(rows == int(idx), 0.9, 1.0).astype(np.float32)
    Z0b2, cb2 = host_sharded_batch(mesh, (Z0l2, cl2))
    warm = distributed_solve_step(solver, mesh, num_iterations=2, warm=True)
    print(f"[w{jax.process_index()}] warm cycle", flush=True)
    Zw2, idx2, found2, res2 = warm(
        Z0b2, Pb, xb, cb2, res.lam_l, res.lam_u, res.exit_code == 1)
    jax.block_until_ready(Zw2)
    assert bool(found2), "no feasible planner in warm cycle"

    # Zw2 is replicated: every host reads the identical winner locally.
    print(
        f"MULTIHOST {jax.process_index()} idx={int(idx)} "
        f"idx2={int(idx2)} found={bool(found) and bool(found2)} "
        f"zsum={float(np.asarray(Zw).sum()):.6f} "
        f"zsum2={float(np.asarray(Zw2).sum()):.6f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
