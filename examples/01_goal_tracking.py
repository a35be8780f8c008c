"""Minimal MPC loop: drive a unicycle to a goal point.

The smallest complete use of the framework — the equivalent of a bare
reference system node with only the goal objective and input penalties
(ref mpc_planner/src/planner.cpp cycle + goal_module.py). No obstacles,
no reference path.
"""

import _common

_common.setup()

import numpy as np
import jax.numpy as jnp

from mpc_planner_tpu import default_config, RealTimeData, State
from mpc_planner_tpu.models import SecondOrderUnicycleModel
from mpc_planner_tpu.modules import ModuleManager, MPCBaseModule, GoalModule
from mpc_planner_tpu.planner import Planner


def main():
    cfg = default_config(N=10)

    # Module set: weighted input penalties + goal attraction
    # (ref configuration in generate_jackal_solver.py).
    model = SecondOrderUnicycleModel()
    modules = ModuleManager()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    modules.add_module(GoalModule(cfg))

    planner = Planner(model, modules, cfg)

    state = State(model)
    data = RealTimeData()
    data.robot_area = planner.default_robot_area()
    data.goal = np.array([5.0, 2.0])
    data.goal_received = True

    # Closed loop: solve -> apply first input -> integrate the plant.
    for step in range(60):
        out = planner.solve_mpc(state, data)
        assert out.success, "solver reported infeasible"
        z = np.zeros(model.nvar)
        z[0] = planner.get_solution(0, "a")
        z[1] = planner.get_solution(0, "w")
        z[2:] = state.as_array()
        state.from_array(
            np.asarray(model.discrete_dynamics(jnp.asarray(z), jnp.zeros(1), cfg.dt))
        )
        dist = np.linalg.norm(state.get_position() - data.goal)
        if step % 10 == 0:
            print(f"step {step:3d}: pos=({state.get('x'):5.2f}, {state.get('y'):5.2f})"
                  f"  v={state.get('v'):4.2f}  dist-to-goal={dist:5.2f}")
        if planner.is_objective_reached(state, data):
            print(f"goal reached in {step} steps ({step * cfg.dt:.1f} s)")
            break
    else:
        raise SystemExit("did not reach the goal")


if __name__ == "__main__":
    main()
