"""Single-chip batch-scaling sweep: throughput vs batch size.

Measures full T-MPC++ solves (N=20, 10 RTI) at several batch sizes on
one chip — shows where per-chip throughput saturates (the lane blocks
are 128 wide; B below 128 pays for a full block).

Run: python experiments/batch_sweep.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZES = (128, 256, 512, 1024, 2048)
RTI = 10


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    from mpc_planner_tpu.utils.config import default_config

    cfg = default_config(N=20)
    model, ocp, solver, Z0, P, xinit = _build(cfg)
    rng = np.random.default_rng(0)

    print(f"N={ocp.N} nvar={ocp.nvar} nh={ocp.nh}, {RTI} RTI iters/solve")
    rows = []
    for B in SIZES:
        Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
        Z0b[:, 1:, model.nu:] += rng.normal(
            0, 0.05, Z0b[:, 1:, model.nu:].shape).astype(np.float32)
        Z0b = jax.device_put(jnp.asarray(Z0b))
        Pb = jax.device_put(jnp.asarray(np.tile(P[None], (B, 1, 1)), jnp.float32))
        xb = jax.device_put(jnp.asarray(np.tile(xinit[None], (B, 1)), jnp.float32))

        # Chained steady-state cycles (bench.py methodology): keeps the
        # number off the dev tunnel's per-dispatch latency.
        res = solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI)
        jax.block_until_ready(res)
        CYCLES = 8

        @jax.jit
        def run_cycles(Z0_, ll0, lu0, ok0, Pb=Pb, xb=xb):
            def cycle(carry, _):
                Z, ll, lu, ok = carry
                r = solver.batch_impl(Z, Pb, xb, RTI, warm0=(ll, lu, ok))
                return (r.Z, r.lam_l, r.lam_u, r.exit_code == 1), None

            out, _ = jax.lax.scan(
                cycle, (Z0_, ll0, lu0, ok0), None, length=CYCLES)
            return out

        warm0 = (res.Z, res.lam_l, res.lam_u, res.exit_code == 1)
        jax.block_until_ready(run_cycles(*warm0))  # compile
        reps = 8
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run_cycles(*warm0))
            ts.append((time.perf_counter() - t0) / CYCLES)
        mean = float(np.mean(ts))
        p99 = float(np.percentile(ts, 99))
        rows.append((B, mean * 1e3, p99 * 1e3, B / mean))
        print(f"B={B:5d}: mean {mean*1e3:7.2f} ms  p99 {p99*1e3:7.2f} ms  "
              f"{B/mean:9.0f} solves/s/chip", flush=True)

    print("\n| B | mean ms | p99 ms | solves/s/chip |")
    print("|---|---|---|---|")
    for B, m, p, thr in rows:
        print(f"| {B} | {m:.1f} | {p:.1f} | {thr:,.0f} |")


if __name__ == "__main__":
    main()
