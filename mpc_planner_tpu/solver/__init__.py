from mpc_planner_tpu.solver.ocp import OCP
from mpc_planner_tpu.solver.sqp import SQPSolver, SolveResult

__all__ = ["OCP", "SQPSolver", "SolveResult"]
