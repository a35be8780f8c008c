"""Device mesh + sharding for batched MPC solves.

TPU-native replacement for the reference's process-level parallelism
(SURVEY.md §2.5): the OpenMP `parallel for` over 5 T-MPC planners
(guidance_constraints.cpp:279) and 4 scenario solvers
(scenario_constraints.cpp:67) become ONE leading batch axis, sharded
over a `jax.sharding.Mesh`. The T-MPC argmin selection
(guidance_constraints.cpp:416-434) runs as an XLA reduction over the
sharded axis — the collective rides ICI, chosen by the compiler from
the sharding annotations.

Single axis name "batch": data-parallel over independent NLPs. There is
no tensor/pipeline dimension worth sharding at nx<=9 — scale lives in
the number of parallel problems, exactly as BASELINE.md prescribes
(1000+ homotopy/scenario solves per control step).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_mesh(devices: Optional[Sequence] = None, axis_name: str = "batch") -> Mesh:
    """1D mesh over all (or given) devices."""
    devices = jax.devices() if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "batch"):
    """Place a pytree with leading batch axis onto the mesh (sharded on
    axis 0, replicated otherwise)."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def sharded_batch_impl(solver, mesh: Mesh, num_iterations: int,
                       axis_name: str = "batch", warm: bool = False):
    """Traceable batched solve, SPMD over the mesh.

    On a multi-device mesh, wraps `solver.batch_impl` in `jax.shard_map`
    so each device runs the solve on its OWN batch shard — a pallas_call
    cannot be auto-partitioned by pjit, so plain jit-with-shardings
    would silently all-gather the full batch onto every device and run
    it replicated (ADVICE r2). On a 1-device mesh, the wrapper is the
    plain batch_impl. Shared by sharded_solve_fn and
    parallel/distributed.py::distributed_solve_step.

    With `warm=True` the returned callable takes three extra batch-axis
    operands (lam_l, lam_u, ok) — last cycle's converged QP duals (the
    cross-cycle HPIPM warm_start=2 carry), sharded like the batch.
    """
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if warm:
        fn = lambda z, p_, x, wl, wu, ok: solver.batch_impl(
            z, p_, x, num_iterations, warm0=(wl, wu, ok))
        n_in = 6
    else:
        fn = lambda z, p_, x: solver.batch_impl(z, p_, x, num_iterations)
        n_in = 3
    if n_dev > 1:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=(P(axis_name),) * n_in,
            out_specs=P(axis_name), check_vma=False,
        )
    return fn


def sharded_solve_fn(solver, mesh: Mesh, num_iterations: int, axis_name: str = "batch"):
    """jit the batched solve with explicit in/out shardings over the mesh.

    Returns fn(Z0 [B, N+1, nvar], P [B, N+1, npar], xinit [B, nx]) ->
    SolveResult with leading sharded batch axis. B must be divisible by
    the mesh size.
    """
    data_sharding = NamedSharding(mesh, P(axis_name))
    solve = sharded_batch_impl(solver, mesh, num_iterations, axis_name)

    return jax.jit(
        solve,
        in_shardings=(data_sharding, data_sharding, data_sharding),
        out_shardings=data_sharding,
    )


def argmin_objective(pobj, feasible, consistency_weight=None, previous_selected=None):
    """T-MPC selection as a pure reduction (guidance_constraints.cpp:358,
    416-434): lowest weighted objective among feasible batch elements.

    pobj [B], feasible [B] bool. Returns (index, found_any).
    Runs under jit; with a sharded batch axis XLA lowers the argmin to an
    ICI all-reduce.
    """
    import jax.numpy as jnp

    obj = pobj
    if consistency_weight is not None and previous_selected is not None:
        sel = jnp.arange(obj.shape[0]) == previous_selected
        obj = jnp.where(sel, obj * consistency_weight, obj)
    masked = jnp.where(feasible, obj, jnp.inf)
    idx = jnp.argmin(masked)
    return idx, jnp.isfinite(masked[idx])
