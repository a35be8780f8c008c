from mpc_planner_tpu.parallel.mesh import (
    batch_mesh,
    shard_batch,
    sharded_solve_fn,
)
from mpc_planner_tpu.parallel.distributed import (
    broadcast_winner,
    distributed_solve_step,
    global_argmin,
    global_batch_size,
    host_shard_slice,
    host_sharded_batch,
    initialize_distributed,
)

__all__ = [
    "batch_mesh",
    "shard_batch",
    "sharded_solve_fn",
    "broadcast_winner",
    "distributed_solve_step",
    "global_argmin",
    "global_batch_size",
    "host_shard_slice",
    "host_sharded_batch",
    "initialize_distributed",
]
