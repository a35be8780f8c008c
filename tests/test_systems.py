"""System-layer tests (ref ros1_jackalsimulator.cpp / ros1_rosnavigation.cpp
driver behavior)."""

import numpy as np

from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import configuration_basic
from mpc_planner_tpu.systems import NavigationPlanner, RobotLoop, convert_obstacle_messages
from mpc_planner_tpu.types import State
import pytest


def _make_loop(cfg):
    model, modules = configuration_basic(cfg)
    planner = Planner(model, modules, cfg)
    return RobotLoop(planner, cfg), model


def test_obstacle_message_conversion(cfg):
    state = State(nx=5)
    msgs = [
        {"id": 0, "position": [3.0, 1.0], "velocity": [0.5, 0.0]},
        {
            "id": 1,
            "position": [5.0, -1.0],
            "prediction": {
                "positions": np.tile([5.0, -1.0], (cfg.N, 1)),
                "major": np.full(cfg.N, 0.2),
                "minor": np.full(cfg.N, 0.1),
            },
        },
        {"id": 2, "position": [500.0, 0.0]},  # beyond max_obstacle_distance
    ]
    obstacles = convert_obstacle_messages(cfg, state, msgs)
    assert len(obstacles) == cfg.max_obstacles  # padded with dummies
    ids = [o.index for o in obstacles]
    assert 0 in ids and 1 in ids
    assert 2 not in ids  # distance-filtered
    from mpc_planner_tpu.types import PredictionType

    gaussian_obs = next(o for o in obstacles if o.index == 1)
    assert gaussian_obs.prediction.type == int(PredictionType.GAUSSIAN)


@pytest.mark.slow
def test_robot_loop_drives(cfg):
    loop, model = _make_loop(cfg)
    xs = np.linspace(0, 12, 8)
    loop.set_reference_path(xs, np.zeros_like(xs))
    pose = np.array([0.0, 0.0, 0.0])
    v = 0.0
    moved = False
    for _ in range(15):
        v_cmd, w_cmd, ok = loop.tick(pose, v, [])
        # integrate simple unicycle
        pose[0] += v_cmd * np.cos(pose[2]) * cfg.dt
        pose[1] += v_cmd * np.sin(pose[2]) * cfg.dt
        pose[2] += w_cmd * cfg.dt
        v = v_cmd
        if ok:
            moved = True
    assert moved
    assert pose[0] > 0.5  # made forward progress


def test_braking_fallback_on_infeasible(cfg):
    loop, model = _make_loop(cfg)
    # No reference path -> data not ready -> braking command
    v_cmd, w_cmd, ok = loop.tick(np.array([0.0, 0.0, 0.0]), 2.0, [])
    assert not ok
    assert v_cmd == max(2.0 - cfg.deceleration_at_infeasible * cfg.dt, 0.0)
    assert w_cmd == 0.0


def test_navigation_planner_rotate_to_goal(cfg):
    model, modules = configuration_basic(cfg)
    planner = Planner(model, modules, cfg)
    nav = NavigationPlanner(planner, cfg)
    plan = np.stack([np.linspace(0, 5, 6), np.zeros(6), np.full(6, np.pi / 2)], axis=1)
    assert nav.set_plan(plan)
    # At the goal position but wrong heading: should rotate in place
    v, w = nav.compute_velocity_commands(np.array([5.0, 0.0, 0.0]), 0.0, [])
    assert v == 0.0 and w > 0.0
    assert not nav.is_goal_reached(np.array([5.0, 0.0, 0.0]))
    assert nav.is_goal_reached(np.array([5.0, 0.0, np.pi / 2]))


@pytest.mark.slow
def test_flipped_robot_detection(cfg):
    """Tipped-over robot -> zero command, flagged (ref ros1_jackalsimulator
    .cpp:235-239)."""
    loop, model = _make_loop(cfg)
    xs = np.linspace(0, 10, 6)
    loop.set_reference_path(xs, np.zeros_like(xs))
    v, w, ok = loop.tick((0.0, 0.0, 0.0), 1.0, [], roll=2.0)
    assert (v, w, ok) == (0.0, 0.0, False)
    assert loop.flipped
    v, w, ok = loop.tick((0.0, 0.0, 0.0), 1.0, [])
    assert not loop.flipped


def test_watchdog_expiry(cfg):
    from mpc_planner_tpu.systems import Watchdog

    wd = Watchdog(timeout=0.5)
    wd.kick(now=100.0)
    assert not wd.expired(now=100.4)
    assert wd.expired(now=100.6)
    wd.kick(now=101.0)
    assert not wd.expired(now=101.2)


def test_debug_limits_reports_bound_hits(cfg, capsys):
    """debug_limits prints which variables sit at their bounds (ref
    acados_solver_interface.cpp:426-446)."""
    from mpc_planner_tpu.planner import Planner
    from mpc_planner_tpu.types import RealTimeData

    cfg2 = cfg.replace(debug_limits=True)
    model, modules = configuration_basic(cfg2)
    planner = Planner(model, modules, cfg2)
    Z = np.zeros((cfg2.N + 1, model.nvar))
    Z[:, model.index("a")] = model.upper_bound[model.index("a")]  # saturated
    Z[:, model.index("v")] = model.lower_bound[model.index("v")]
    planner._report_bound_hits(Z)
    captured = capsys.readouterr()
    assert "'a' hits its upper bound" in captured.out
    assert "'v' hits its lower bound" in captured.out
