"""Defining a new robot system from scratch — the workflow the reference
implements as a new `mpc_planner_<system>` package plus a
`generate_<system>_solver.py` script (SURVEY.md §2.3 "System nodes x4").

Here the same three ingredients are plain Python — no codegen, no
package boilerplate:

  1. a dynamics model (subclass `DynamicsModel`; the reference writes a
     CasADi model in solver_generator/solver_model.py),
  2. a module set with custom weighted costs (the reference's
     `configuration_*()` in its generate script),
  3. config deltas (the reference's per-system config/settings.yaml).

The example system: a planar omnidirectional base ("omni") with linear
drag, a custom speed-tracking cost, and ellipsoidal pedestrian
avoidance.
"""

import _common

_common.setup()

import numpy as np
import jax.numpy as jnp

from mpc_planner_tpu import default_config, RealTimeData, State
from mpc_planner_tpu.data_preparation import (
    ensure_obstacle_size,
    get_constant_velocity_prediction,
    HostObstacle,
    pack_obstacles,
)
from mpc_planner_tpu.models import DynamicsModel
from mpc_planner_tpu.modules import (
    EllipsoidConstraintModule,
    GoalModule,
    ModuleManager,
    MPCBaseModule,
)
from mpc_planner_tpu.planner import Planner


# -- 1. dynamics model (ref solver_model.py subclassing pattern) -----------
class OmniDragModel(DynamicsModel):
    """Omnidirectional base with linear velocity drag.

    z = (ax, ay, x, y, vx, vy);  dv = a - drag * v.
    """

    drag = 0.35
    states = ("x", "y", "vx", "vy")
    inputs = ("ax", "ay")
    lower_bound = (-1.5, -1.5, -200.0, -200.0, -2.0, -2.0)
    upper_bound = (1.5, 1.5, 200.0, 200.0, 2.0, 2.0)

    def continuous_model(self, x, u):
        return jnp.stack(
            [
                x[..., 2],
                x[..., 3],
                u[..., 0] - self.drag * x[..., 2],
                u[..., 1] - self.drag * x[..., 3],
            ],
            axis=-1,
        )

    def continuous_model_integrated(self, x_full, x_int, u):
        return self.continuous_model(x_int, u)


def main():
    # -- 3. config deltas (ref per-system settings.yaml) -------------------
    cfg = default_config(N=12)
    cfg.weights["speed"] = 0.08         # cruise-tracking weight
    cfg.weights["cruise_speed"] = 1.2   # live-tunable, no recompile
    cfg.weights["goal"] = 2.5

    # -- 2. module set (ref generate_<system>_solver.py configuration) ----
    model = OmniDragModel()
    modules = ModuleManager()
    base = modules.add_module(MPCBaseModule(cfg))
    base.weigh_variable("ax", "acceleration")
    base.weigh_variable("ay", "acceleration")
    # Custom cost lambda, like the reference's
    #   base.weigh_variable(var_name="v", weight_names=["velocity", ...],
    #                       cost_function=lambda x, w: w[0]*(x-w[1])**2)
    base.weigh_variable(
        "vx",
        ["speed", "cruise_speed"],
        cost_function=lambda x, w: w[0] * (x - w[1]) ** 2,
    )
    modules.add_module(GoalModule(cfg))
    modules.add_module(EllipsoidConstraintModule(cfg))

    planner = Planner(model, modules, cfg)

    state = State(model)
    data = RealTimeData()
    data.robot_area = planner.default_robot_area()
    data.goal = np.array([8.0, 0.0])
    data.goal_received = True

    # One pedestrian crossing the straight-line route.
    ped_pos = np.array([4.0, -2.0])
    ped_vel = np.array([0.0, 0.55])

    for step in range(80):
        obstacles = [
            HostObstacle(
                index=0,
                position=ped_pos.copy(),
                angle=0.0,
                radius=0.35,
                # Gaussian prediction: the ellipsoid axes grow with the
                # propagated uncertainty, chi-scaled by cfg.probabilistic
                # .risk — risk-aware avoidance instead of grazing the
                # deterministic boundary (ref ellipsoid_constraints.cpp:80).
                prediction=get_constant_velocity_prediction(
                    ped_pos, ped_vel, cfg.dt, cfg.N, probabilistic=True
                ),
            )
        ]
        # Pad/sort to exactly cfg.max_obstacles with +100 m dummies
        # (fixed shapes; ref data_preparation.cpp:95-168).
        obstacles = ensure_obstacle_size(
            obstacles, state, cfg.max_obstacles, cfg.N, cfg.dt, True
        )
        data.dynamic_obstacles = obstacles
        data.obstacle_block = pack_obstacles(obstacles, cfg.N)
        planner.on_data_received(data, "dynamic obstacles")

        out = planner.solve_mpc(state, data)
        assert out.success

        z = np.zeros(model.nvar)
        z[0] = planner.get_solution(0, "ax")
        z[1] = planner.get_solution(0, "ay")
        z[2:] = state.as_array()
        state.from_array(
            np.asarray(model.discrete_dynamics(jnp.asarray(z), jnp.zeros(1), cfg.dt))
        )
        ped_pos = ped_pos + ped_vel * cfg.dt

        clearance = np.linalg.norm(state.get_position() - ped_pos)
        assert clearance > 0.35 + cfg.robot_radius - 1e-6, "collision!"
        if step % 10 == 0:
            print(
                f"step {step:3d}: pos=({state.get('x'):5.2f}, {state.get('y'):5.2f})"
                f"  |v|={np.hypot(state.get('vx'), state.get('vy')):4.2f}"
                f"  ped-clearance={clearance:4.2f}"
            )
        if planner.is_objective_reached(state, data):
            print(f"goal reached in {step} steps, no collision")
            break
    else:
        raise SystemExit("did not reach the goal")


if __name__ == "__main__":
    main()
