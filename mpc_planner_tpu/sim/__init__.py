from mpc_planner_tpu.sim.simulator import ClosedLoopSimulator, SimResult

__all__ = ["ClosedLoopSimulator", "SimResult"]
