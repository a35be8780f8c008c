from mpc_planner_tpu.parallel.mesh import (
    batch_mesh,
    shard_batch,
    sharded_solve_fn,
)

__all__ = ["batch_mesh", "shard_batch", "sharded_solve_fn"]
