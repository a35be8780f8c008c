"""BASELINE.md config-ladder benchmark on the real TPU chip.

Measures batched MPC throughput (solves/s/chip) and p99 batch latency for
every rung of the ladder (BASELINE.md "Config ladder"):

  1. goal      unicycle goal-tracking, no obstacles
  2. mpcc      MPCC contouring on a spline path
  3. ellipsoid + ellipsoidal avoidance (8 obstacles)
  4. cc-static CC-MPC Gaussian chance constraints + static free-space
               polytopes from an occupancy grid (decomp)
  5. tmpc      T-MPC++ guidance + ellipsoid safety (the bench.py headline)
  6. shmpc     SH-MPC slack model + 24 scenario halfspaces

Usage: python experiments/ladder_bench.py [BATCH] [RTI]
Prints one markdown table + one JSON line per rung.
"""

import json
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


def _cli_int(i: int, default: int) -> int:
    # Tolerate being IMPORTED by other experiments whose argv differs
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


BATCH = _cli_int(1, 1024)
RTI = _cli_int(2, 10)
REPS = 15


def build_solver(cfg, model, modules, state, data):
    """Mirror of the per-cycle host path (__graft_entry__._build)."""
    from mpc_planner_tpu.parameters import ParameterBlock
    from mpc_planner_tpu.solver import OCP, SQPSolver
    from mpc_planner_tpu.solver.warmstart import initialize_with_state
    from mpc_planner_tpu.types import ModuleData

    ocp = OCP(model, modules, cfg)
    solver = SQPSolver(ocp)

    md = ModuleData()
    if data.reference_path is not None:
        modules.on_data_received(data, "reference_path")
    modules.on_data_received(data, "dynamic obstacles")
    Z0 = initialize_with_state(model, cfg.N, state)
    md.warmstart = Z0
    md.warmstart_xy = Z0[:, [model.index("x"), model.index("y")]]
    md.warmstart_psi = Z0[:, model.index("psi")]
    if "spline" in model.states:
        md.warmstart_spline = Z0[:, model.index("spline")]
    modules.update_all(state, data, md)
    pblock = ParameterBlock(ocp.params, cfg.N + 1)
    modules.set_parameters_all(data, md, pblock)
    pblock.data[cfg.N] = pblock.data[cfg.N - 1]
    xinit = np.array([state.get(n) for n in model.states])
    return solver, Z0, pblock.data, xinit


def corridor_costmap():
    res = 0.2
    grid = np.zeros((40, 120), dtype=np.uint8)  # y in [-4,4], x in [0,24]
    meta = {"origin_x": 0.0, "origin_y": -4.0, "resolution": res}
    grid[int(6.0 / res), :] = 255
    grid[int(2.0 / res), :] = 255
    return grid, meta


def make_rungs():
    from mpc_planner_tpu.models import SecondOrderUnicycleModel
    from mpc_planner_tpu.modules import (
        DecompConstraintModule,
        GaussianConstraintModule,
        GoalModule,
        ModuleManager,
        MPCBaseModule,
    )
    from mpc_planner_tpu.presets import (
        configuration_basic,
        configuration_no_obstacles,
        configuration_safe_horizon_hard,
        configuration_tmpc,
        corridor_scene,
    )
    from mpc_planner_tpu.utils.config import default_config

    rungs = []

    # 1. goal tracking, no obstacles
    cfg = default_config(N=20).replace(max_obstacles=0)
    model = SecondOrderUnicycleModel()
    mgr = ModuleManager()
    base = mgr.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mgr.add_module(GoalModule(cfg))
    state, data = corridor_scene(cfg, n_pedestrians=0)
    data.reference_path = None
    data.goal = np.array([5.0, 0.0])
    data.goal_received = True
    rungs.append(("goal", cfg, model, mgr, state, data))

    # 2. MPCC, no obstacles
    cfg = default_config(N=20).replace(max_obstacles=0)
    model, mgr = configuration_no_obstacles(cfg)
    state, data = corridor_scene(cfg, n_pedestrians=0)
    rungs.append(("mpcc", cfg, model, mgr, state, data))

    # 3. + ellipsoids (8 obstacles)
    cfg = default_config(N=20).replace(max_obstacles=8)
    model, mgr = configuration_basic(cfg)
    state, data = corridor_scene(cfg, n_pedestrians=8)
    rungs.append(("ellipsoid", cfg, model, mgr, state, data))

    # 4. CC-MPC + static polytopes
    cfg = default_config(N=20).replace(max_obstacles=8)
    model, mgr = configuration_no_obstacles(cfg)
    mgr.add_module(GaussianConstraintModule(cfg))
    mgr.add_module(DecompConstraintModule(cfg))
    state, data = corridor_scene(cfg, n_pedestrians=8)
    data.costmap, data.costmap_meta = corridor_costmap()
    rungs.append(("cc-static", cfg, model, mgr, state, data))

    # 5. T-MPC++ (headline)
    cfg = default_config(N=20)
    model, mgr = configuration_tmpc(cfg)
    state, data = corridor_scene(cfg, n_pedestrians=8)
    rungs.append(("tmpc", cfg, model, mgr, state, data))

    # 6. SH-MPC scenario constraints (hard variant, nvar=7)
    cfg = default_config(N=20).replace(max_obstacles=8)
    model, mgr = configuration_safe_horizon_hard(cfg)
    state, data = corridor_scene(cfg, n_pedestrians=8)
    rungs.append(("shmpc", cfg, model, mgr, state, data))

    # 7. SH-MPC slack model (nvar=8) — the configuration the reference's
    # SH-MPC actually generates (solver_model.py:274-299,
    # scenario_constraints.py:26). On the Pallas kernel since r3: the
    # historic nondeterministic nvar=8 fault no longer reproduces after
    # the refs-based VMEM refactor (10/10 fresh-process stress PASS,
    # experiments/nvar8_stress.py).
    from mpc_planner_tpu.presets import configuration_safe_horizon

    cfg = default_config(N=20).replace(max_obstacles=8)
    model, mgr = configuration_safe_horizon(cfg)
    state, data = corridor_scene(cfg, n_pedestrians=8)
    rungs.append(("shmpc-slack", cfg, model, mgr, state, data))

    # 8. T-MPC++ at N=30 — the reference jackalsimulator's actual
    # horizon (settings.yaml:2-3, N=30 @ dt=0.2). Compiles thanks to the
    # raised scoped-VMEM cap set at package import (mpc_planner_tpu/
    # __init__.py; docs/PERF_NOTES.md).
    cfg = default_config(N=30)
    model, mgr = configuration_tmpc(cfg)
    state, data = corridor_scene(cfg, n_pedestrians=8)
    rungs.append(("tmpc-n30", cfg, model, mgr, state, data))

    # 9. CA-MPC: curvature-aware contouring (discrete spline-projection
    # update, ref solver_model.py:217-271) + 8 ellipsoids. nvar=7 —
    # Pallas kernel path.
    from mpc_planner_tpu.presets import (
        configuration_bicycle,
        configuration_curvature_aware,
    )

    cfg = default_config(N=20).replace(max_obstacles=8)
    model, mgr = configuration_curvature_aware(cfg)
    state, data = _curved_scene(cfg, n_pedestrians=8)
    rungs.append(("ca-mpc", cfg, model, mgr, state, data))

    # 10./11. Bicycle MPCC + its CA variant (ref solver_model.py:
    # 302-437). nvar=9 rides the Pallas kernel since the r5 gate raise
    # (measured 15x vs the XLA path at B=1024, Z agreement 1e-6).
    cfg = default_config(N=20).replace(max_obstacles=8)
    model, mgr = configuration_bicycle(cfg)
    state, data = _curved_scene(cfg, n_pedestrians=8)
    rungs.append(("bicycle", cfg, model, mgr, state, data))

    cfg = default_config(N=20).replace(max_obstacles=8)
    model, mgr = configuration_bicycle(cfg, curvature_aware=True)
    state, data = _curved_scene(cfg, n_pedestrians=8)
    rungs.append(("bicycle-ca", cfg, model, mgr, state, data))

    return rungs


def _curved_scene(cfg, n_pedestrians: int = 8):
    """Corridor scene on a gently curved path (the CA models' s_dot
    projection term is trivial on a straight line)."""
    from mpc_planner_tpu.presets import corridor_scene

    state, data = corridor_scene(cfg, n_pedestrians=n_pedestrians)
    t = np.linspace(0, np.pi, 20)
    data.reference_path = {"x": 30.0 * t / np.pi, "y": 2.0 * np.sin(t)}
    return state, data


def main():
    import jax
    import jax.numpy as jnp

    only = os.environ.get("LADDER_RUNGS")
    results = []
    for name, cfg, model, mgr, state, data in make_rungs():
        if only and name not in only.split(","):
            continue
        solver, Z0, P, xinit = build_solver(cfg, model, mgr, state, data)
        rng = np.random.default_rng(0)
        Z0b = np.tile(Z0[None], (BATCH, 1, 1)).astype(np.float32)
        Z0b[:, 1:, model.nu:] += rng.normal(
            0, 0.05, Z0b[:, 1:, model.nu:].shape
        ).astype(np.float32)
        Z0b = jax.device_put(jnp.asarray(Z0b))
        Pb = jax.device_put(jnp.asarray(np.tile(P[None], (BATCH, 1, 1)), jnp.float32))
        xb = jax.device_put(jnp.asarray(np.tile(xinit[None], (BATCH, 1)), jnp.float32))

        t_c0 = time.perf_counter()
        res = solver.solve_batch(Z0b, Pb, xb, num_iterations=RTI)
        jax.block_until_ready(res)
        compile_s = time.perf_counter() - t_c0
        feas = int(np.sum(np.asarray(res.exit_code) == 1))

        # Steady-state control cycles chained on device (same methodology
        # as bench.py: trajectory + converged duals warm-start the next
        # cycle; per-solve work is shape-static so chaining does not make
        # the workload easier — it keeps the number off the dev tunnel's
        # per-dispatch latency).
        CYCLES = 4

        @jax.jit
        def run_cycles(Z0_, ll0, lu0, ok0):
            def cycle(carry, _):
                Z, ll, lu, ok = carry
                r = solver.batch_impl(Z, Pb, xb, RTI, warm0=(ll, lu, ok))
                return (r.Z, r.lam_l, r.lam_u, r.exit_code == 1), r.exit_code

            return jax.lax.scan(
                cycle, (Z0_, ll0, lu0, ok0), None, length=CYCLES
            )

        warm0 = (res.Z, res.lam_l, res.lam_u, res.exit_code == 1)
        out = run_cycles(*warm0)
        jax.block_until_ready(out)
        times = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = run_cycles(*warm0)
            jax.block_until_ready(out)
            times.append((time.perf_counter() - t0) / CYCLES)
        times = np.asarray(times)
        feas = int(np.sum(np.asarray(out[1])[-1] == 1))
        row = {
            "rung": name,
            "nvar": solver.ocp.nvar,
            "nh": solver.ocp.nh,
            "batch_ms_mean": round(float(np.mean(times) * 1e3), 2),
            "batch_ms_p99": round(float(np.percentile(times, 99) * 1e3), 2),
            "solves_per_sec": round(BATCH / float(np.mean(times)), 1),
            "feasible": f"{feas}/{BATCH}",
            "compile_s": round(compile_s, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print(f"\n| rung | nh | mean ms (B={BATCH}) | p99 ms | solves/s/chip | feasible |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['rung']} | {r['nh']} | {r['batch_ms_mean']} | "
            f"{r['batch_ms_p99']} | {r['solves_per_sec']} | {r['feasible']} |"
        )


if __name__ == "__main__":
    main()
