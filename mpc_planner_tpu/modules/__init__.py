from mpc_planner_tpu.modules.base import (
    Module,
    ObjectiveModule,
    ConstraintModule,
    ModuleManager,
    BoundModel,
)
from mpc_planner_tpu.modules.mpc_base import MPCBaseModule
from mpc_planner_tpu.modules.goal import GoalModule
from mpc_planner_tpu.modules.contouring import ContouringModule
from mpc_planner_tpu.modules.curvature_aware_contouring import CurvatureAwareContouringModule
from mpc_planner_tpu.modules.path_reference_velocity import PathReferenceVelocityModule
from mpc_planner_tpu.modules.ellipsoid_constraints import EllipsoidConstraintModule
from mpc_planner_tpu.modules.gaussian_constraints import GaussianConstraintModule
from mpc_planner_tpu.modules.linearized_constraints import LinearizedConstraintModule
from mpc_planner_tpu.modules.contouring_constraints import ContouringConstraintModule
from mpc_planner_tpu.modules.decomp_constraints import DecompConstraintModule
from mpc_planner_tpu.modules.guidance_constraints import GuidanceConstraintModule
from mpc_planner_tpu.modules.scenario_constraints import ScenarioConstraintModule

__all__ = [
    "Module",
    "ObjectiveModule",
    "ConstraintModule",
    "ModuleManager",
    "BoundModel",
    "MPCBaseModule",
    "GoalModule",
    "ContouringModule",
    "CurvatureAwareContouringModule",
    "PathReferenceVelocityModule",
    "EllipsoidConstraintModule",
    "GaussianConstraintModule",
    "LinearizedConstraintModule",
    "ContouringConstraintModule",
    "DecompConstraintModule",
    "GuidanceConstraintModule",
    "ScenarioConstraintModule",
]
