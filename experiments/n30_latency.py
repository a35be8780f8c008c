"""N=30 latency study: warm-QP iteration sweep + single-block latency.

The reference jackalsimulator's horizon is N=30 @ dt=0.2 (settings.yaml
:2-3); r3 measured the flagship T-MPC++ rung there at 38.3 ms/cycle at
B=1024 — above BASELINE.md's 33 ms line (VERDICT r3 missing-item). The
kernel is latency-bound in N x IP_iters sequential steps
(docs/PERF_NOTES.md), so the lever is the warm-QP IP iteration count
(`solver.qp_warm_iterations`, default auto=6).

This experiment, on the real chip:
  1. chains steady-state cycles at N=30, B=1024 for warm iters 6/5/4,
     recording ms/cycle + steady feasibility + divergence vs the 6-iter
     chain (quality gate: same solutions to f32 tolerance);
  2. records the per-robot single-block latency (B=128) at N=30 —
     the number VERDICT r3 noted was missing.

Usage: python experiments/n30_latency.py [--cycles 8] [--reps 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Persistent compilation cache: repeat TPU runs of the same shapes skip
# the multi-minute remote compile (fresh processes included).
try:
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/mpc_planner_tpu_jaxcache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass



def run_chain(solver, Z0b, Pb, xb, rti, cycles, reps):
    import jax

    res = solver.solve_batch(Z0b, Pb, xb, num_iterations=rti)
    jax.block_until_ready(res)
    feas0 = int(np.sum(np.asarray(res.exit_code) == 1))

    @jax.jit
    def run_cycles(Z0, ll0, lu0, ok0):
        def cycle(carry, _):
            Z, ll, lu, ok = carry
            r = solver.batch_impl(Z, Pb, xb, rti, warm0=(ll, lu, ok))
            return (r.Z, r.lam_l, r.lam_u, r.exit_code == 1), r.exit_code

        return jax.lax.scan(cycle, (Z0, ll0, lu0, ok0), None, length=cycles)

    warm0 = (res.Z, res.lam_l, res.lam_u, res.exit_code == 1)
    out = run_cycles(*warm0)
    jax.block_until_ready(out)

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run_cycles(*warm0)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / cycles)
    codes = np.asarray(out[1])
    feas_steady = int(np.sum(codes[-1] == 1))
    Z_final = np.asarray(out[0][0])
    return np.asarray(times), feas0, feas_steady, Z_final


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=8)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rti", type=int, default=10)
    ap.add_argument("--warm-iters", type=int, nargs="*", default=[6, 5, 4])
    ap.add_argument("--horizon", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from experiments.ladder_bench import build_solver
    from mpc_planner_tpu.presets import configuration_tmpc, corridor_scene
    from mpc_planner_tpu.utils.config import default_config

    print("| B | warm IP iters | mean ms | p99 ms | solves/s | steady feasible "
          "| max|dZ| vs 6 |")
    print("|---|---|---|---|---|---|---|")
    import json

    for B in (1024, 128):
        Z_ref = None
        for wi in args.warm_iters:
            cfg = default_config(N=args.horizon)
            cfg = cfg.replace(solver=cfg.solver.__class__(
                qp_warm_iterations=wi))
            model, mgr = configuration_tmpc(cfg)
            state, data = corridor_scene(cfg, n_pedestrians=8)
            solver, Z0, P, xinit = build_solver(cfg, model, mgr, state, data)

            rng = np.random.default_rng(0)
            Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
            Z0b[:, 1:, model.nu:] += rng.normal(
                0, 0.05, Z0b[:, 1:, model.nu:].shape).astype(np.float32)
            Z0b = jax.device_put(jnp.asarray(Z0b))
            Pb = jax.device_put(jnp.asarray(
                np.tile(P[None], (B, 1, 1)), jnp.float32))
            xb = jax.device_put(jnp.asarray(
                np.tile(xinit[None], (B, 1)), jnp.float32))

            times, feas0, feas_steady, Z_final = run_chain(
                solver, Z0b, Pb, xb, args.rti, args.cycles, args.reps)
            if wi == args.warm_iters[0]:
                Z_ref = Z_final
                dz = 0.0
            else:
                dz = float(np.max(np.abs(Z_final - Z_ref)))
            mean_ms = float(np.mean(times)) * 1e3
            p99_ms = float(np.percentile(times, 99)) * 1e3
            print(f"| {B} | {wi} | {mean_ms:.1f} | {p99_ms:.1f} "
                  f"| {B/np.mean(times):,.0f} | {feas_steady}/{B} | {dz:.2e} |",
                  flush=True)
            print(json.dumps({
                "B": B, "warm_iters": wi, "mean_ms": round(mean_ms, 2),
                "p99_ms": round(p99_ms, 2),
                "solves_per_sec": round(float(B / np.mean(times)), 1),
                "feasible_cold": feas0, "feasible_steady": feas_steady,
                "max_dz_vs_first": dz,
            }), flush=True)


if __name__ == "__main__":
    main()
