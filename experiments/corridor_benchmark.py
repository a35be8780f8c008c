"""The reference's headline closed-loop experiment: a corridor with
crossing pedestrians, T-MPC++ vs non-parallel MPC
(mpc_planner_jackalsimulator/README.md + docs/duration_with_baseline.png:
task duration over 4/8/12 pedestrians).

Runs the pure-Python/JAX simulator (sim/) instead of Gazebo. Usage:
    python experiments/corridor_benchmark.py [--cpu] [--seeds 3]
Prints a markdown table of task duration / collisions / completion.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--max-steps", type=int, default=200)
    ap.add_argument("--peds", type=int, nargs="*", default=[4, 8, 12])
    ap.add_argument("--config", choices=["tmpc", "basic", "shmpc", "ca", "all"],
                    default="all")
    ap.add_argument("--scenario-solvers", type=int, default=None,
                    help="SH-MPC parallel scenario solvers (shmpc config; "
                         "the second BASELINE.md scale axis)")
    ap.add_argument("--scenario-constraints", type=int, default=None,
                    help="halfspaces kept per stage (top-k cap; the "
                         "reference uses 24 — raise to diagnose support "
                         "saturation in dense scenes)")
    ap.add_argument("--scenario-span", type=float, default=None,
                    help="lateral warmstart span [m] across scenario "
                         "solvers (multistart; 0 = reference-faithful "
                         "single warmstart)")
    ap.add_argument("--scenario-samples", type=int, default=None,
                    help="explicit scenario samples per solver (default: "
                         "derived from probabilistic.risk via the scenario "
                         "bound; see modules/scenario_theory.py)")
    ap.add_argument("--backend", choices=["lateral", "prm", "sampled"],
                    default=None, help="guidance backend override (A/B runs)")
    ap.add_argument("--samples-per-class", type=int, default=None,
                    help="warmstart variations per homotopy class — scales "
                         "the T-MPC batch to 100s-1000s of parallel guesses "
                         "(the BASELINE.md scale axis; run WITHOUT --cpu so "
                         "the batch solves on the TPU)")
    ap.add_argument("--horizon", type=int, default=20,
                    help="MPC horizon N (the reference jackalsimulator runs 30)")
    ap.add_argument("--qp-warm-iterations", type=int, default=0,
                    help="override warm-QP IP iterations (0 = auto; the "
                         "N=30 latency lever, experiments/n30_latency.py)")
    ap.add_argument("--no-braking-class", action="store_true")
    ap.add_argument("--no-prm-smoothing", action="store_true",
                    help="A/B: linear polyline PRM resampling instead of "
                         "cubic-spline smoothing")
    ap.add_argument("--robot-blind", action="store_true",
                    help="pedestrians ignore the robot (pedsim's social-"
                         "forces agents avoid it; that is the default)")
    ap.add_argument("--json", action="store_true",
                    help="also print one JSON line per row")
    ap.add_argument("--profile", action="store_true",
                    help="print the per-phase host/device profiler summary "
                         "after each row (PROFILER scopes)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent compilation cache: repeat TPU runs of the same
        # shapes skip the multi-minute remote compile.
        import jax

        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser("~/.cache/mpc_planner_tpu_jaxcache"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:
            pass

    import numpy as np

    from mpc_planner_tpu.planner import Planner
    from mpc_planner_tpu.presets import (
        configuration_basic,
        configuration_safe_horizon,
        configuration_tmpc,
    )
    from mpc_planner_tpu.sim import ClosedLoopSimulator
    from mpc_planner_tpu.sim.simulator import Pedestrian
    from mpc_planner_tpu.utils.config import default_config

    def make_peds(n, seed):
        """Crossing pedestrians in the corridor INTERIOR (the reference's
        pedestrian_simulator corridor: agents walk across the corridor,
        the goal region stays clear — mpc_planner_jackalsimulator
        README corridor GIF). Goals on the far side make them re-cross."""
        rng = np.random.default_rng(seed)
        peds = []
        for _ in range(n):
            x = rng.uniform(4.0, 20.0)
            y = rng.uniform(-2.5, 2.5)
            vy = rng.uniform(0.3, 0.9) * (1 if rng.random() < 0.5 else -1)
            wp_a = np.array([x + rng.uniform(-2.0, 2.0), 3.0 * np.sign(vy)])
            wp_b = np.array([x + rng.uniform(-2.0, 2.0), -3.0 * np.sign(vy)])
            peds.append(Pedestrian(
                position=np.array([x, y]),
                velocity=np.array([rng.uniform(-0.3, 0.3), vy]),
                radius=0.4,
                waypoints=[wp_a, wp_b],  # cyclic crossing, pedsim-style
            ))
        return peds

    xs = np.linspace(0, 25, 14)
    path = {"x": xs, "y": np.zeros_like(xs)}
    configs = {"T-MPC++": configuration_tmpc, "MPC (ellipsoid)": configuration_basic}
    if args.config == "tmpc":
        configs = {"T-MPC++": configuration_tmpc}
    elif args.config == "basic":
        configs = {"MPC (ellipsoid)": configuration_basic}
    elif args.config == "shmpc":
        configs = {"SH-MPC (slack)": configuration_safe_horizon}
    elif args.config == "ca":
        from mpc_planner_tpu.presets import configuration_tmpc_ca
        configs = {"CA T-MPC++": configuration_tmpc_ca}

    print("| config | pedestrians | B | completion | duration [s] | collisions "
          "| infeasible | cycle ms (mean/p99) |")
    print("|---|---|---|---|---|---|---|---|")
    for cfg_name, make_config in configs.items():
        for n_peds in args.peds:
            durations, collisions, completed, infeasible = [], 0, 0, 0
            cycle_times, n_planners = [], 0
            mod_records = []
            # ONE planner per row, reset between seeds — the reference
            # node persists across its num_experiments segments the same
            # way, and rebuilding would pay the jit compile per seed.
            cfg = default_config(N=args.horizon)
            import dataclasses as _dc
            if args.no_braking_class:
                cfg = cfg.replace(
                    t_mpc=_dc.replace(cfg.t_mpc, braking_class=False)
                )
            if args.backend:
                cfg = cfg.replace(
                    t_mpc=_dc.replace(cfg.t_mpc, guidance_backend=args.backend)
                )
            if args.samples_per_class:
                cfg = cfg.replace(
                    t_mpc=_dc.replace(cfg.t_mpc,
                                      samples_per_class=args.samples_per_class)
                )
            if args.no_prm_smoothing:
                cfg = cfg.replace(
                    t_mpc=_dc.replace(cfg.t_mpc, prm_spline_smoothing=False)
                )
            if args.qp_warm_iterations:
                cfg = cfg.replace(
                    solver=_dc.replace(cfg.solver,
                                       qp_warm_iterations=args.qp_warm_iterations)
                )
            if args.scenario_solvers:
                cfg = cfg.replace(
                    scenario_constraints=_dc.replace(
                        cfg.scenario_constraints,
                        parallel_solvers=args.scenario_solvers)
                )
            if args.scenario_samples:
                cfg = cfg.replace(
                    scenario_constraints=_dc.replace(
                        cfg.scenario_constraints,
                        n_samples=args.scenario_samples)
                )
            if args.scenario_constraints:
                cfg = cfg.replace(
                    scenario_constraints=_dc.replace(
                        cfg.scenario_constraints,
                        n_constraints=args.scenario_constraints)
                )
            if args.scenario_span is not None:
                cfg = cfg.replace(
                    scenario_constraints=_dc.replace(
                        cfg.scenario_constraints,
                        warmstart_span=args.scenario_span)
                )
            model, modules = make_config(cfg)
            planner = Planner(model, modules, cfg)
            for seed in range(args.seeds):
                planner.reset()
                sim = ClosedLoopSimulator(
                    planner, cfg, make_peds(n_peds, seed), path,
                    social_forces=True, seed=seed,
                    # pedsim's social-forces pedestrians treat the robot
                    # as an agent and avoid it (the reference's corridor
                    # conditions); --robot-blind reproduces the harsher
                    # robot-invisible variant.
                    robot_aware=not args.robot_blind,
                )
                res = sim.run(max_steps=args.max_steps)
                durations.append(res.duration)
                collisions += res.collisions
                completed += int(res.completed)
                infeasible += res.infeasible_cycles
                # Skip the first 3 cycles per seed (jit compile/cache warm)
                cycle_times.extend(res.cycle_times[3:])
                mod_records.extend(res.module_records)
                gmod = modules.get("GuidanceConstraints")
                smod = modules.get("ScenarioConstraints")
                if gmod is not None:
                    n_planners = gmod.n_planners
                elif smod is not None:
                    n_planners = cfg.scenario_constraints.parallel_solvers
                else:
                    n_planners = 1
            cyc = np.asarray(cycle_times) * 1e3
            cyc_s = (f"{cyc.mean():.1f}/{np.percentile(cyc, 99):.1f}"
                     if cyc.size else "-")
            print(
                f"| {cfg_name} | {n_peds} | {n_planners} | {completed}/{args.seeds} "
                f"| {np.mean(durations):.1f} | {collisions} | {infeasible} "
                f"| {cyc_s} |",
                flush=True,
            )
            if args.profile:
                from mpc_planner_tpu.utils.profiling import PROFILER
                print(PROFILER.summary(), flush=True)
                PROFILER.reset()
            # SH-MPC scenario-theory summary (per-cycle risk certificates
            # from module saveData): fraction of cycles with a valid
            # certificate, its distribution, and support/saturation stats
            # — the envelope diagnosis instrumentation.
            certs = np.asarray([
                r["scenario_risk_certificate"] for r in mod_records
                if "scenario_risk_certificate" in r])
            cert_stats = None
            if certs.size:
                valid = np.asarray([
                    bool(r.get("scenario_cert_valid")) for r in mod_records
                    if "scenario_risk_certificate" in r])
                support = np.asarray([
                    r.get("scenario_support_max", -1) for r in mod_records
                    if "scenario_risk_certificate" in r])
                cert_stats = {
                    "n_cycles": int(certs.size),
                    "cert_valid_frac": round(float(valid.mean()), 3),
                    "cert_eps_median": round(float(np.median(certs[valid])), 4)
                    if valid.any() else None,
                    "cert_eps_p95": round(float(np.percentile(certs[valid], 95)), 4)
                    if valid.any() else None,
                    "support_max_median": float(np.median(support[support >= 0]))
                    if (support >= 0).any() else None,
                    "support_max_peak": int(support.max()) if support.size else None,
                    "n_samples": int(mod_records[0].get("scenario_n_samples", -1)),
                }
                print(f"  scenario certificate: {cert_stats}", flush=True)
            if args.json:
                import json as _json
                print(_json.dumps({
                    "config": cfg_name, "backend": args.backend or "lateral",
                    "peds": n_peds, "B": n_planners, "completed": completed,
                    "seeds": args.seeds,
                    "duration_mean": round(float(np.mean(durations)), 1),
                    "collisions": collisions, "infeasible": infeasible,
                    "cycle_ms_mean": round(float(cyc.mean()), 2) if cyc.size else None,
                    "cycle_ms_p99": round(float(np.percentile(cyc, 99)), 2) if cyc.size else None,
                    "scenario_certificate": cert_stats,
                }), flush=True)


if __name__ == "__main__":
    main()
