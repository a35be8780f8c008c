"""Configuration tree.

TPU-native equivalent of the reference's YAML `CONFIG` singleton
(reference mpc_planner_util/include/mpc_planner_util/parameters.h:7-52) and the
per-system `config/settings.yaml`
(reference mpc_planner_jackalsimulator/config/settings.yaml:1-91).

Design difference: everything that determines *shapes* of the compiled
program (N, max_obstacles, num_segments, n_discs, ...) is a plain Python
value on a frozen dataclass, so it is static under `jax.jit`; runtime
tunables (weights) live in a dict that is uploaded as solver parameters
each cycle (the reference streams them through the generated
`setSolverParameter*` setters each stage, generate_cpp_files.py:204-260).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

try:  # yaml is available via transitively-installed deps; gate anyway.
    import yaml

    _HAS_YAML = True
except Exception:  # pragma: no cover
    _HAS_YAML = False


@dataclass(frozen=True)
class ContouringConfig:
    num_segments: int = 5
    dynamic_velocity_reference: bool = False
    add_road_constraints: bool = True
    preview: float = 0.0


@dataclass(frozen=True)
class TMPCConfig:
    """T-MPC++ settings (reference settings.yaml:63-67)."""

    use_tmpc_pp: bool = True  # include the non-guided planner in parallel
    enable_constraints: bool = True  # homotopy halfspace constraints
    warmstart_with_mpc_solution: bool = False
    # Batched scale-out beyond the reference's 4+1 planners:
    n_paths: int = 4  # homotopy classes (ref guidance_planner.yaml:11)
    samples_per_class: int = 1  # warmstart variations per class (batch axis)
    selection_weight_consistency: float = 0.75  # bonus for previously chosen class
    # Extra decelerate-to-stop guidance class (opt-in): when every
    # side-passing class is infeasible the batch still contains a feasible
    # "slow down in lane" plan, so the cycle reports success instead of
    # falling back to the open-loop brake (ref ros1_jackalsimulator.cpp:
    # 191-201). Selection-gated to emergencies only; still DEFAULT OFF:
    # in the corridor benchmark with robot-blind pedestrians a gently
    # stopping robot gets engulfed by the crowd (completion 2/3 -> 0/3),
    # while the reference-equivalent hard open-loop brake recovers better.
    # Enable for deployments where pedestrians yield to a stopped robot.
    braking_class: bool = False
    braking_deceleration: float = 2.0  # [m/s^2] comfortable decel profile
    # Guidance backend: "lateral" constructs homotopy classes in the path
    # frame (fast, deterministic — the default); "prm" searches a seeded
    # Visibility-PRM over (x, y, t) with winding-number homology filtering,
    # matching the reference's guidance_planner behavior
    # (guidance_planner.yaml: 30 samples, n_paths=4, seeded) — the
    # RECOMMENDED closed-loop backend (lateral is its equal in the
    # corridor A/B and cheaper; prm's +40% class recall is insurance for
    # scenes whose best class is not a lateral offset); "sampled"
    # evaluates thousands of candidate space-time paths in one jitted
    # device sweep (guidance/device_prm.py). SCOPE OF "sampled": class
    # recall analysis and warmstart augmentation. Measured closed-loop
    # (12 peds, 5 seeds, 2026-08-21, after acceleration-limited candidate
    # retiming): 4/5 completion, 3 collisions, 17 infeasible cycles vs
    # 5/5 / 0 / ~3 for lateral and prm — its smooth 2-via candidates
    # remain worse guidance representatives at close range, so do not
    # drive a closed loop with it (STATUS.md guidance A/B).
    guidance_backend: str = "lateral"
    sampled_n_samples: int = 512  # device-sweep candidates per cycle
    prm_n_samples: int = 30  # ref guidance_planner.yaml n_samples
    prm_seed: int = 1  # ref guidance_planner.yaml seed
    prm_max_velocity: float = 3.0  # edge velocity budget [m/s]
    prm_margin: float = 0.1  # extra clearance in collision checks [m]
    prm_n_goals: int = 5  # lateral goal fan per longitudinal station
    # Longitudinal goal stations along the path (ref guidance_planner.yaml
    # goals: longitudinal: 3 / vertical: 3 — a goal GRID, so a blocked
    # far station still leaves reachable nearer goals).
    prm_n_goals_longitudinal: int = 3
    # Cubic-spline smoothing of selected PRM node paths before they
    # become warmstarts (ref guidance_planner spline_optimization);
    # False = linear polyline, for A/B only.
    prm_spline_smoothing: bool = True
    prm_goal_length_weight: float = 2.0  # shortfall penalty per meter (ref
    #                                      selection_weights length)


@dataclass(frozen=True)
class ProbabilisticConfig:
    enable: bool = True
    risk: float = 0.05
    propagate_uncertainty: bool = True


@dataclass(frozen=True)
class ScenarioConfig:
    parallel_solvers: int = 4
    n_constraints: int = 24  # halfspaces per stage (ref scenario_constraints.py:26)
    # Scenario samples drawn per solver. None (default) derives the draw
    # from (probabilistic.risk, confidence, support_bound) via the
    # nonconvex scenario bound (modules/scenario_theory.py::sample_size)
    # so the configured risk GOVERNS the draw, as the reference's
    # scenario_module does. An explicit int overrides the sizing (e.g.
    # for 1000+-solver scale runs where per-solver memory matters); the
    # a-posteriori certificate is computed either way.
    n_samples: Optional[int] = None
    confidence: float = 0.01  # beta: certificate holds w.p. >= 1 - beta
    # Design target for per-stage support cardinality, used ONLY to size
    # the draw (per-stage halfspaces act on the 2D stage position + the
    # shared slack); the certificate uses the observed count.
    support_bound: int = 3
    # Lateral warmstart span [m] across the parallel solvers: solver b
    # starts from the shared warmstart laterally offset by a funnel
    # (tapering in over the horizon) up to +-span/2. 0 = all solvers
    # share the planner's single warmstart (reference-faithful; the
    # measured dense-scene failure mode — after one infeasible cycle
    # every solver restarts from the same braking trajectory inside the
    # crowd and failures cascade; see STATUS.md SH-MPC envelope).
    warmstart_span: float = 0.0
    enable_safe_horizon: bool = True


@dataclass(frozen=True)
class DecompConfig:
    range: float = 2.0
    max_constraints: int = 12
    occupancy_threshold: int = 127


@dataclass(frozen=True)
class RoadConfig:
    two_way: bool = False
    width: float = 6.0


@dataclass(frozen=True)
class RobotConfig:
    length: float = 0.65
    width: float = 0.65
    com_to_back: float = 0.0


@dataclass(frozen=True)
class SolverConfig:
    iterations: int = 10  # SQP-RTI iterations (ref settings.yaml:16)
    # Mehrotra predictor-corrector iterations for the COLD first QP; QPs
    # warm-started from the previous RTI iteration / cycle duals run
    # max(6, qp_iterations*2//3). 12 -> 9 measured 2026-08-21 (back-to-
    # back A/B, B=1024 flagship): -13% full-solve time, 1024/1024
    # feasible, res_eq <= 1.4e-4 (tol 1e-2); KKT ladder + closed-loop
    # suites green at 9. acados analog: qp_solver_iter_max trades the
    # same budget (generate_acados_solver.py).
    qp_iterations: int = 9
    qp_backend: str = "auto"  # "auto" | "pallas" | "xla"
    solver_type: str = "SQP_RTI"  # or "SQP"
    tol_stationarity: float = 1e-3  # ref settings.yaml tolstat
    tol_eq_residual: float = 1e-2  # res_eq failure check (ref acados_solver_interface.cpp:176-181)
    # Hessian handling is EXACT + MIRROR regularization, matching what
    # the reference's acados backend generates (EXTERNAL cost => exact
    # Hessian, MIRROR regularize_method — generate_acados_solver.py:
    # 143-176). A Gauss-Newton option would need modules to expose
    # residual vectors instead of scalar costs; no such flag is offered
    # until it exists.
    # MIRROR block structure: "auto" probes whether the cost's u-block is
    # diagonal and u-x decoupled (true for all stock modules) and then
    # eigendecomposes only the x-block; "full" forces dense nvar x nvar.
    mirror_structure: str = "auto"  # "auto" | "x_only" | "full"
    levenberg_marquardt: float = 1e-6
    qp_mu0: float = 1e1
    qp_mu_min: float = 1e-10
    # OPT-IN speed/robustness trade: warm-started QPs (RTI iterations
    # >= 2 / cross-cycle duals) drop Mehrotra's affine predictor and run
    # a single centered Newton step per IP iteration at ~60% of the
    # sequential cost. DEFAULT OFF: the flag is static per-trace, so
    # batch elements whose warm duals are REJECTED (previous QP diverged
    # — exactly the hard, constraint-flipping scenes) get a cold dual
    # start on the cheap fixed-sigma path and lose the adaptive
    # centering they need; in the SH-MPC closed-loop corridor this drove
    # the robot backwards (tests/test_scenario.py::test_scenario_closed_
    # loop). The reference never trades QP quality for time — it cuts
    # RTI iterations instead (acados_solver_interface.cpp:108-116).
    # Safe to enable for benign scenes after validating on
    # divergence-recovery scenarios.
    qp_warm_corrector_only: bool = False
    qp_warm_sigma: float = 0.1
    # IP iterations for WARM QPs (RTI iterations >= 2 and dual-carried
    # first QPs). 0 = auto: 4 iterations with per-element stall
    # escalation — any element whose final barrier mu exceeds
    # `qp_mu_stall` (or that fails res_eq) is re-solved at the full cold
    # budget through the in-cycle retry dispatch, so the fast setting is
    # safe by default (the r4 gates: 1024/1024 steady feasibility, KKT
    # ~1e-8, matched closed-loop outcomes; escalation covers the
    # constraint-flipping tail those gates cannot). The warm chain
    # dominates steady-state cycle time (the kernel is latency-bound in
    # N x IP sequential steps), so this is the N=30 latency lever.
    # Explicit values disable nothing: escalation applies whenever warm
    # duals were used.
    qp_warm_iterations: int = 0
    # Barrier-mu stall threshold for escalation: a warm QP that converges
    # ends with mu ~ qp_mu_min; a stalled one sits orders of magnitude
    # higher. Elements with final mu above this are re-solved cold in the
    # same cycle even when res_eq still passes.
    qp_mu_stall: float = 1e-3
    # Blocks per Pallas QP kernel call. 0 = auto (resolves to 1,
    # classic one-block-per-call); w>1 packs w blocks' tiny-matrix
    # algebra into each VPU op. Measured: the isolated Riccati
    # recursion runs 4-7x faster per block at w=8
    # (experiments/riccati_ilp_probe.py) but the FULL kernel is
    # elementwise-dominated and end-to-end neutral (25.9 vs 25.2 ms
    # warm cycle at B=1024 flagship, bit-identical results) — see
    # docs/PERF_NOTES.md "Wide multi-block kernel".
    qp_wide_blocks: int = 0
    # Re-solve failed warm-dual batch elements cold in the SAME cycle
    # (one extra dispatch, only on failure cycles). Carried duals go
    # stale exactly when constraint geometry shifts fast; a cold solve
    # of the same problem then succeeds where the warm one stalls at
    # mu ~ mu0 (measured: 12-ped corridor alternating warm-fail /
    # cold-pass lock). Reference analog: acados QP-memory reset on
    # failure (acados_solver_interface.cpp:186-191), which only helps
    # the NEXT cycle.
    qp_retry_cold: bool = True
    # Swap the sequential Riccati sweeps for the associative-scan
    # (parallel-in-horizon) LQR on the XLA path: O(log N) dependent
    # combine rounds instead of O(N) stages. Worth it only for long
    # horizons — measure with experiments/horizon_sweep.py. The Pallas
    # kernel path ignores this flag (it carries its own sequential
    # in-register recursion).
    horizon_parallel: bool = False
    # Fully fused SQP-RTI kernel (ops/pallas_rti.py): linearization +
    # MIRROR + all RTI x IP iterations in ONE Pallas launch per lane
    # block, removing the per-iteration XLA<->kernel round trips.
    # STATUS: compiles are being stabilized against Mosaic compiler
    # limits (docs/PERF_NOTES.md) — "auto" currently resolves OFF; use
    # "on" to opt in. The unfused pipeline is the production path.
    rti_fused: str = "auto"  # "auto" | "on" | "off"
    # MIRROR regularization applied INSIDE the QP kernel (raw Hessians
    # shipped; Jacobi sweep runs on the lanes) — saves the XLA-side
    # Jacobi pass + an HBM round trip per RTI iteration. "auto" = on
    # whenever the Pallas QP backend is selected.
    qp_mirror_in_kernel: str = "auto"  # "auto" | "on" | "off"
    timeout_margin: float = 0.006  # [s] subtracted from budget (ref planner.cpp:117-118)


@dataclass(frozen=True)
class Config:
    """Static planner configuration (shape-determining + tunables).

    Defaults mirror mpc_planner_jackalsimulator/config/settings.yaml.
    """

    name: str = "jackal"
    N: int = 30  # horizon
    integrator_step: float = 0.2  # [s]
    n_discs: int = 1
    max_obstacles: int = 12
    robot_radius: float = 0.325
    obstacle_radius: float = 0.4
    control_frequency: float = 20.0  # [Hz]
    enable_output: bool = True
    deceleration_at_infeasible: float = 3.0  # [m/s^2]
    shift_previous_solution_forward: bool = False
    max_obstacle_distance: float = 30.0
    debug_limits: bool = False

    robot: RobotConfig = field(default_factory=RobotConfig)
    road: RoadConfig = field(default_factory=RoadConfig)
    contouring: ContouringConfig = field(default_factory=ContouringConfig)
    t_mpc: TMPCConfig = field(default_factory=TMPCConfig)
    probabilistic: ProbabilisticConfig = field(default_factory=ProbabilisticConfig)
    scenario_constraints: ScenarioConfig = field(default_factory=ScenarioConfig)
    decomp: DecompConfig = field(default_factory=DecompConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    linearized_add_halfspaces: int = 0  # ref settings.yaml linearized_constraints

    # Runtime-tunable weights (ref settings.yaml:76-91). These are streamed
    # into the parameter tensor each cycle — changing them does NOT recompile.
    weights: Dict[str, float] = field(
        default_factory=lambda: {
            "goal": 1.0,
            "goal_x": 1.0,
            "goal_y": 1.0,
            "velocity": 0.55,
            "acceleration": 0.34,
            "angular_velocity": 0.85,
            "reference_velocity": 2.0,
            "contour": 0.05,
            "preview": 0.0,
            "lag": 0.75,
            "slack": 10000.0,
            "terminal_angle": 100.0,
            "terminal_contouring": 10.0,
        }
    )

    @property
    def dt(self) -> float:
        return self.integrator_step

    def replace(self, **kwargs: Any) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def with_weights(self, **weights: float) -> "Config":
        merged = dict(self.weights)
        merged.update(weights)
        return dataclasses.replace(self, weights=merged)


def default_config(**overrides: Any) -> Config:
    return Config().replace(**overrides) if overrides else Config()


def _nested_update(cfg: Config, data: Dict[str, Any]) -> Config:
    """Apply a (possibly nested) dict of overrides onto a Config."""
    kwargs: Dict[str, Any] = {}
    field_types = {f.name: f for f in dataclasses.fields(Config)}
    rename = {
        "t-mpc": "t_mpc",
        "use_t-mpc++": "use_tmpc_pp",
    }
    for key, value in data.items():
        key = rename.get(key, key)
        if key not in field_types:
            continue
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            sub_kwargs = {}
            sub_fields = {f.name for f in dataclasses.fields(current)}
            for sk, sv in value.items():
                sk = rename.get(sk, sk)
                if sk in sub_fields:
                    sub_kwargs[sk] = sv
            kwargs[key] = dataclasses.replace(current, **sub_kwargs)
        elif key == "weights" and isinstance(value, dict):
            merged = dict(current)
            merged.update(value)
            kwargs[key] = merged
        else:
            kwargs[key] = value
    return dataclasses.replace(cfg, **kwargs)


def load_config(path: Optional[str] = None, data: Optional[Dict[str, Any]] = None) -> Config:
    """Load a Config from a YAML file or a dict (settings.yaml-compatible keys)."""
    cfg = Config()
    if path is not None:
        if not _HAS_YAML:  # pragma: no cover
            raise RuntimeError("pyyaml unavailable; pass `data=` instead")
        with open(path) as f:
            data = yaml.safe_load(f)
    if data:
        cfg = _nested_update(cfg, data)
    return cfg
