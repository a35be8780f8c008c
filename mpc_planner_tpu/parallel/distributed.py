"""Multi-host fan-out for batched MPC solves (pod slices over DCN).

SURVEY.md §2.5 / §5: the reference's communication is ROS pub/sub between
processes plus OpenMP shared memory inside the planner; the TPU-native
equivalent is one controller process per host driving its local chips,
joined by `jax.distributed` — the guess/scenario batch is sharded over
EVERY chip in the slice (ICI within a host's chips, DCN between hosts),
and the T-MPC selection (guidance_constraints.cpp:416-434) runs as a
global argmin reduction that XLA lowers to collectives along the same
axes.

Flow per control cycle (hosts run in lockstep like SPMD training steps):

1. every host computes the SAME guidance trajectories (the guidance layer
   is deterministic given state+obstacles, homotopy.py) and takes the
   slice of the batch its process owns;
2. `host_sharded_batch` assembles global arrays from the per-process
   shards without gathering (jax.make_array_from_process_local_data);
3. the jitted sharded solve runs; `global_argmin` reduces the winner and
   `broadcast_winner` gathers exactly ONE trajectory to every host
   (replicated out-sharding) — the only cross-host data movement besides
   the reduction itself, a few kB over DCN;
4. each host's robot-side driver actuates from the identical winner.

Single-process (tests, one host) degrades gracefully: process_count()==1
means every shard is local and the same code runs unchanged on the
virtual CPU mesh (tests/conftest.py) or one real chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpc_planner_tpu.parallel.mesh import batch_mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the multi-host job (no-op when already initialized or single
    process). On TPU pods the three arguments auto-detect from the
    environment; pass them explicitly on other fabrics."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # Single-process run (no coordinator configured): stay local.
        pass


def global_batch_size(per_host: int) -> int:
    return per_host * jax.process_count()


def host_shard_slice(global_B: int) -> slice:
    """Index range of the global batch this process owns (contiguous
    block layout, matching NamedSharding(P("batch")) on a process-major
    mesh)."""
    n = jax.process_count()
    assert global_B % n == 0, f"global batch {global_B} not divisible by {n} hosts"
    per = global_B // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def host_sharded_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Assemble global device arrays from per-process local shards.

    Each leaf of `tree` holds only this process's rows (host_shard_slice
    of the global batch). No host ever materializes the full batch.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def make(x):
        x = np.asarray(x)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(make, tree)


def global_argmin(pobj, feasible):
    """Global T-MPC selection over the sharded batch: returns
    (winner_index, found_any) as replicated scalars. Under jit with a
    sharded input, XLA lowers this to an all-reduce over ICI/DCN."""
    masked = jnp.where(feasible, pobj, jnp.inf)
    idx = jnp.argmin(masked)
    return idx, jnp.isfinite(masked[idx])


def broadcast_winner(mesh: Mesh, Z_batch, idx, axis_name: str = "batch"):
    """Gather the winning trajectory to every host (replicated output).

    Z_batch [B, N+1, nvar] sharded on the batch axis; idx replicated
    scalar. The dynamic gather of one row is the only cross-host payload.
    """
    replicated = NamedSharding(mesh, P())

    @jax.jit
    def pick(Zb, i):
        out = jnp.take(Zb, i, axis=0)
        return jax.lax.with_sharding_constraint(out, replicated)

    return pick(Z_batch, idx)


def distributed_solve_step(solver, mesh: Mesh, num_iterations: int,
                           warm: bool = False):
    """Build the per-cycle jitted step: sharded batch solve + global
    selection + replicated winner. Returns
    step(Z0, P, xinit, consistency [B]) -> (Z_winner, idx, found, res).

    `consistency` is the per-element objective multiplier (1.0 or the
    selection_weight_consistency for previously selected classes).

    With `warm=True`, step takes three extra sharded operands
    (lam_l, lam_u, ok) — the previous cycle's converged QP duals — so
    steady-state cycles run the cross-cycle warm-start exactly like the
    single-chip flagship program."""
    data_sharding = NamedSharding(mesh, P("batch"))
    replicated = NamedSharding(mesh, P())

    # SPMD over the mesh: each device runs the batched solve on its OWN
    # shard (a pallas_call cannot be auto-partitioned by pjit — shard_map
    # is the per-device program form; the XLA backend uses the same
    # structure so CPU meshes validate the exact program shape a pod
    # runs). Selection stays outside: plain reductions over the sharded
    # result lower to ICI/DCN collectives.
    from mpc_planner_tpu.parallel.mesh import sharded_batch_impl

    solve_sharded = sharded_batch_impl(solver, mesh, num_iterations, warm=warm)

    def select(res, consistency):
        pobj = res.pobj * consistency
        idx, found = global_argmin(pobj, res.exit_code == 1)
        Zw = jax.lax.with_sharding_constraint(
            jnp.take(res.Z, idx, axis=0), replicated
        )
        return Zw, idx, found, res

    if warm:
        def step(Z0, P_, xinit, consistency, lam_l, lam_u, ok):
            return select(solve_sharded(Z0, P_, xinit, lam_l, lam_u, ok),
                          consistency)
        n_in = 7
    else:
        def step(Z0, P_, xinit, consistency):
            return select(solve_sharded(Z0, P_, xinit), consistency)
        n_in = 4

    return jax.jit(
        step,
        in_shardings=(data_sharding,) * n_in,
        out_shardings=(replicated, replicated, replicated, data_sharding),
    )
