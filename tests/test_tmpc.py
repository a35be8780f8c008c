"""T-MPC++ integration tests: guidance generation, batched optimize,
closed-loop corridor run (model: the reference's Gazebo corridor
experiments, mpc_planner_jackalsimulator/README.md)."""

import numpy as np
import pytest

from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import configuration_tmpc, corridor_scene
from mpc_planner_tpu.sim import ClosedLoopSimulator
from mpc_planner_tpu.sim.simulator import Pedestrian

pytestmark = pytest.mark.slow  # >20 s/test on CPU; fast tier skips


@pytest.fixture
def tmpc_planner(cfg):
    model, modules = configuration_tmpc(cfg)
    return Planner(model, modules, cfg), model, modules


def _blocking_scene(cfg):
    """Deterministic scene with a pedestrian straight ahead on the path."""
    from mpc_planner_tpu.data_preparation import (
        HostObstacle,
        ensure_obstacle_size,
        get_constant_velocity_prediction,
        pack_obstacles,
    )

    state, data = corridor_scene(cfg, n_pedestrians=0, seed=0)
    obstacles = []
    for i, (px, py) in enumerate([(1.2, 0.05), (2.2, -0.3)]):
        o = HostObstacle(index=i, position=np.array([px, py]), angle=0.0, radius=0.4)
        o.prediction = get_constant_velocity_prediction(
            o.position, np.zeros(2), cfg.dt, cfg.N, cfg.probabilistic.enable
        )
        obstacles.append(o)
    obstacles = ensure_obstacle_size(
        obstacles, state, cfg.max_obstacles, cfg.N, cfg.dt, cfg.probabilistic.enable
    )
    data.dynamic_obstacles = obstacles
    data.obstacle_block = pack_obstacles(obstacles, cfg.N)
    return state, data


def test_guidance_classes_distinct(cfg, tmpc_planner):
    """Guidance produces homotopy-distinct trajectories around obstacles."""
    planner, model, modules = tmpc_planner
    state, data = _blocking_scene(cfg)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    gmod = modules.get("GuidanceConstraints")
    trajs = gmod._trajectories
    assert len(trajs) >= 2
    sigs = {t.signature for t in trajs}
    assert len(sigs) == len(trajs)  # all distinct classes


def test_tmpc_optimize_selects_feasible(cfg, tmpc_planner):
    planner, model, modules = tmpc_planner
    state, data = _blocking_scene(cfg)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
    gmod = modules.get("GuidanceConstraints")
    assert gmod._selected_planner >= 0


def test_tmpc_consistency_bonus(cfg):
    """The selected class is remembered and matched next cycle
    (ref guidance_constraints.cpp:358-359, 380). Guided-only configuration
    (use_t-mpc++ off) so a guided class must win."""
    cfg = cfg.replace(t_mpc=cfg.t_mpc.__class__(use_tmpc_pp=False))
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = _blocking_scene(cfg)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    gmod = modules.get("GuidanceConstraints")
    if not out.success:
        pytest.skip("no guided planner feasible at test iteration counts")
    assert gmod.guidance.selected_signature is not None
    planner.solve_mpc(state, data)
    assert any(t.previously_selected for t in gmod._trajectories)


def test_guidance_braking_class(cfg):
    """With braking_class on, a decelerate-to-stop class is in the batch."""
    cfg = cfg.replace(t_mpc=cfg.t_mpc.__class__(braking_class=True))
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = _blocking_scene(cfg)
    planner.on_data_received(data, "reference_path")
    planner.solve_mpc(state, data)
    gmod = modules.get("GuidanceConstraints")
    braking = [t for t in gmod._trajectories if t.braking]
    assert len(braking) == 1
    bt = braking[0]
    # Progress must be monotone and stalling (decelerating to a stop)
    ds = np.diff(bt.s)
    assert (ds >= -1e-9).all()
    assert ds[-1] <= ds[0] + 1e-9
    v0 = state.get("v")
    expect_stop_steps = int(np.ceil(v0 / (cfg.t_mpc.braking_deceleration * cfg.dt)))
    if expect_stop_steps < cfg.N:
        assert ds[-1] < 1e-6  # fully stopped within the horizon


def test_tmpc_blocked_corridor_brakes(cfg):
    """A wall of pedestrians blocks every passing side: the braking class
    keeps the cycle feasible and the plan decelerates instead of failing."""
    from mpc_planner_tpu.data_preparation import (
        HostObstacle,
        ensure_obstacle_size,
        get_constant_velocity_prediction,
        pack_obstacles,
    )

    cfg = cfg.replace(t_mpc=cfg.t_mpc.__class__(braking_class=True))
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = corridor_scene(cfg, n_pedestrians=0, seed=0)
    state.set("v", 1.0)
    obstacles = []
    for i, py in enumerate(np.linspace(-1.6, 1.6, 7)):
        o = HostObstacle(index=i, position=np.array([2.5, py]), angle=0.0, radius=0.45)
        o.prediction = get_constant_velocity_prediction(
            o.position, np.zeros(2), cfg.dt, cfg.N, cfg.probabilistic.enable
        )
        obstacles.append(o)
    obstacles = ensure_obstacle_size(
        obstacles, state, cfg.max_obstacles, cfg.N, cfg.dt, cfg.probabilistic.enable
    )
    data.dynamic_obstacles = obstacles
    data.obstacle_block = pack_obstacles(obstacles, cfg.N)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
    # The winning plan must not drive through the wall at x=2.5
    xs = np.asarray(out.trajectory.positions)[:, 0]
    assert xs.max() < 2.5


def test_tmpc_closed_loop_no_collisions(cfg):
    """Short corridor run: progress without collisions or infeasibility."""
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    rng = np.random.default_rng(5)
    peds = [
        Pedestrian(
            position=np.array([rng.uniform(4, 10), rng.uniform(-1.5, 1.5)]),
            velocity=np.array([rng.uniform(-0.5, 0.2), rng.uniform(-0.5, 0.5)]),
            radius=0.4,
        )
        for _ in range(4)
    ]
    xs = np.linspace(0, 14, 8)
    sim = ClosedLoopSimulator(planner, cfg, peds, {"x": xs, "y": np.zeros_like(xs)})
    res = sim.run(max_steps=40)
    assert res.collisions == 0
    assert res.infeasible_cycles <= 4
    # Made forward progress along the corridor
    assert res.trajectory[-1][0] > 2.0
