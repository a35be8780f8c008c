from mpc_planner_tpu.guidance.homotopy import GuidancePlanner, GuidanceTrajectory

__all__ = ["GuidancePlanner", "GuidanceTrajectory"]
