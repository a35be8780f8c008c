"""mpc_planner_tpu — a TPU-native real-time MPC engine for 2D mobile robots.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tud-amr/mpc_planner (see SURVEY.md): modular stage costs/constraints
(MPCC / CA-MPC contouring, goal tracking, ellipsoidal / linearized /
Gaussian chance / scenario / free-space-polytope collision avoidance)
over unicycle & bicycle dynamics, solved with a batched SQP-RTI loop
whose stagewise QP step is an interior-point Riccati sweep.

Where the reference runs a handful of homotopy-class solvers over OpenMP
threads (T-MPC++, reference guidance_constraints.cpp:279), this engine
vmaps the entire solve over a leading batch axis and shards it across a
TPU mesh.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  planner.py        — Planner.solve_mpc orchestration (ref planner.cpp)
  modules/          — objective/constraint modules: one class = symbolic
                      (traced) half + host `prepare` half
  solver/           — OCP assembly, SQP-RTI, interior-point Riccati QP
  models/           — dynamics models + RK4 (ref solver_model.py)
  parallel/         — mesh/sharding for batched solves
  guidance/         — homotopy-class guidance (T-MPC++)
  sim/              — pure-JAX closed-loop simulator (replaces Gazebo)
"""

import os as _os

# Raise libtpu's scoped-VMEM cap (default 16 MB) before the TPU runtime
# initializes: the QP kernel is a whole-VMEM program whose stack-living
# intermediates exceed the default at long horizons (N=30, the
# reference jackalsimulator config, needs ~17 MB; measured 2026-08-21 —
# docs/PERF_NOTES.md). `pltpu.CompilerParams(vmem_limit_bytes=...)` does
# NOT move this limit in the current libtpu; only the init flag does.
# No-op if the user already set the flag or libtpu is already loaded.
if "--xla_tpu_scoped_vmem_limit_kib" not in _os.environ.get(
    "LIBTPU_INIT_ARGS", ""
):
    import sys as _sys

    # LIBTPU_INIT_ARGS is consumed when the TPU *client* initializes
    # (plugin module import alone does not), so the append is only
    # ineffective once a tpu backend already exists.
    def _tpu_client_initialized() -> bool:
        bridge = _sys.modules.get("jax._src.xla_bridge")
        backends = getattr(bridge, "_backends", None) or {}
        return "tpu" in backends

    if _tpu_client_initialized():
        # libtpu reads LIBTPU_INIT_ARGS once at runtime init: appending
        # after jax's backend bindings are loaded is silently ineffective
        # (ADVICE r3). The user must set the env var before importing
        # jax, or export it in the environment.
        import warnings as _warnings

        _warnings.warn(
            "mpc_planner_tpu imported after jax/libtpu initialization: "
            "--xla_tpu_scoped_vmem_limit_kib=32768 cannot be applied. "
            "Long-horizon (N=30) TPU kernels may fail to compile; set "
            "LIBTPU_INIT_ARGS='--xla_tpu_scoped_vmem_limit_kib=32768' "
            "in the environment before starting Python (override the "
            "value the same way if you need a different cap).",
            stacklevel=2,
        )
        del _warnings
    else:
        _os.environ["LIBTPU_INIT_ARGS"] = (
            _os.environ.get("LIBTPU_INIT_ARGS", "")
            + " --xla_tpu_scoped_vmem_limit_kib=32768"
        ).strip()
    del _sys, _tpu_client_initialized
del _os

from mpc_planner_tpu.utils.config import Config, default_config
from mpc_planner_tpu.types import (
    Disc,
    Halfspace,
    Prediction,
    PredictionType,
    DynamicObstacle,
    ReferencePath,
    RealTimeData,
    Trajectory,
    PlannerOutput,
    ModuleData,
    State,
)
from mpc_planner_tpu.parameters import ParameterRegistry

__version__ = "0.1.0"

__all__ = [
    "Config",
    "default_config",
    "Disc",
    "Halfspace",
    "Prediction",
    "PredictionType",
    "DynamicObstacle",
    "ReferencePath",
    "RealTimeData",
    "Trajectory",
    "PlannerOutput",
    "ModuleData",
    "State",
    "ParameterRegistry",
]
