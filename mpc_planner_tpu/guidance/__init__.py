from mpc_planner_tpu.guidance.homotopy import GuidancePlanner, GuidanceTrajectory
from mpc_planner_tpu.guidance.prm import VisibilityPRMPlanner


def make_guidance_planner(cfg):
    """Guidance backend factory (t_mpc.guidance_backend)."""
    backend = getattr(cfg.t_mpc, "guidance_backend", "lateral")
    if backend == "prm":
        return VisibilityPRMPlanner(cfg)
    if backend == "sampled":
        from mpc_planner_tpu.guidance.device_prm import DeviceSampledPlanner

        return DeviceSampledPlanner(cfg)
    if backend == "lateral":
        return GuidancePlanner(cfg)
    raise ValueError(
        f"Unknown guidance backend '{backend}' (lateral | prm | sampled)"
    )


__all__ = [
    "GuidancePlanner",
    "GuidanceTrajectory",
    "VisibilityPRMPlanner",
    "make_guidance_planner",
]
