"""Verify drive: closed-loop T-MPC++ on the real TPU with the
Visibility-PRM guidance backend (t_mpc.guidance_backend="prm")."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import configuration_tmpc
from mpc_planner_tpu.sim import ClosedLoopSimulator
from mpc_planner_tpu.sim.simulator import Pedestrian
from mpc_planner_tpu.utils.config import default_config


def main():
    cfg = default_config(N=20)
    cfg = cfg.replace(t_mpc=cfg.t_mpc.__class__(guidance_backend="prm"))
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)

    rng = np.random.default_rng(0)
    peds = [
        Pedestrian(
            position=np.array([rng.uniform(4, 24), rng.uniform(-2.5, 2.5)]),
            velocity=np.array([rng.uniform(-0.6, 0.3), rng.uniform(-0.9, 0.9)]),
            radius=0.4,
            goal=np.array([rng.uniform(0, 28), rng.uniform(-3, 3)]),
        )
        for _ in range(8)
    ]
    xs = np.linspace(0, 25, 14)
    sim = ClosedLoopSimulator(planner, cfg, peds, {"x": xs, "y": np.zeros_like(xs)},
                              social_forces=True, seed=0)
    t0 = time.time()
    result = sim.run(max_steps=200)
    gmod = modules.get("GuidanceConstraints")
    from mpc_planner_tpu.guidance import VisibilityPRMPlanner

    assert isinstance(gmod.guidance, VisibilityPRMPlanner), "PRM backend not active"
    print(f"wall={time.time()-t0:.1f}s steps={len(result.trajectory)} "
          f"completed={result.completed} duration={result.duration:.1f}s "
          f"collisions={result.collisions} infeasible={result.infeasible_cycles}")
    final = result.trajectory[-1]
    print(f"final position: {final}")
    assert result.completed, "robot did not reach the corridor end"
    assert result.collisions == 0, "collision in PRM-guided run"
    print("VERIFY-OK")


if __name__ == "__main__":
    main()
