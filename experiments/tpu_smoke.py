"""TPU smoke check: compile + run 1 batch on every config-ladder rung.

Run BEFORE every end-of-round snapshot (VERDICT r2 task 1). Exits nonzero
on any compile failure or NaN. Fast: B=128 (one lane block), 2 RTI
iterations — catches Mosaic/VMEM compile regressions that interpret-mode
CPU tests cannot see.

Usage: python experiments/tpu_smoke.py [--rung NAME] [--batch B] [--rti K]

Defaults B=1024, RTI=10: the bench.py flagship shape exactly — the r2
OOM only manifested at the full G=8-block, 10-RTI program, so the smoke
must compile the same program the driver benches.
"""

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



def main():
    def flag(name, default):
        if name in sys.argv:
            i = sys.argv.index(name)
            v = sys.argv[i + 1]
            del sys.argv[i : i + 2]
            return v
        return default

    only = flag("--rung", None)
    B = int(flag("--batch", 1024))
    rti = int(flag("--rti", 10))

    import jax
    import jax.numpy as jnp

    from experiments.ladder_bench import build_solver, make_rungs
    failures = []
    for name, cfg, model, mgr, state, data in make_rungs():
        if only and name != only:
            continue
        t0 = time.perf_counter()
        try:
            solver, Z0, P, xinit = build_solver(cfg, model, mgr, state, data)
            Z0b = jnp.asarray(np.tile(Z0[None], (B, 1, 1)), jnp.float32)
            Pb = jnp.asarray(np.tile(P[None], (B, 1, 1)), jnp.float32)
            xb = jnp.asarray(np.tile(xinit[None], (B, 1)), jnp.float32)
            res = solver.solve_batch(Z0b, Pb, xb, num_iterations=rti)
            jax.block_until_ready(res)
            traj = np.asarray(res.Z)
            ok = bool(np.all(np.isfinite(traj)))
            n_succ = int(np.sum(np.asarray(res.exit_code) == 1))
            dt = time.perf_counter() - t0
            print(
                f"  {name:12s} backend={solver.qp_backend:6s} "
                f"nvar={solver.ocp.nvar} nh={solver.ocp.nh} "
                f"feasible={n_succ}/{B} finite={ok} ({dt:.1f}s)",
                flush=True,
            )
            if not ok:
                failures.append((name, "non-finite output"))
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"{type(e).__name__}: {e}"))
            print(f"  {name:12s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    if failures:
        print(f"SMOKE FAILED: {len(failures)} rung(s)")
        for name, why in failures:
            print(f"  {name}: {why[:400]}")
        sys.exit(1)
    print("SMOKE OK")


if __name__ == "__main__":
    main()
