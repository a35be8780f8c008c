"""Visibility-PRM guidance backend tests (guidance/prm.py).

Mirrors the reference guidance_planner's contract (SURVEY.md §2.4):
homotopy-distinct, collision-free space-time trajectories from a seeded
PRM, interchangeable with the lateral backend inside T-MPC.
"""

import numpy as np
import pytest

from mpc_planner_tpu.guidance import (
    GuidancePlanner,
    VisibilityPRMPlanner,
    make_guidance_planner,
)
from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import configuration_tmpc, corridor_scene


def _scene(cfg, obstacle_positions, velocities=None):
    from mpc_planner_tpu.data_preparation import (
        HostObstacle,
        ensure_obstacle_size,
        get_constant_velocity_prediction,
        pack_obstacles,
    )

    state, data = corridor_scene(cfg, n_pedestrians=0, seed=0)
    velocities = velocities or [np.zeros(2)] * len(obstacle_positions)
    obstacles = []
    for i, (p, v) in enumerate(zip(obstacle_positions, velocities)):
        o = HostObstacle(index=i, position=np.asarray(p, float), angle=0.0, radius=0.4)
        o.prediction = get_constant_velocity_prediction(
            o.position, np.asarray(v, float), cfg.dt, cfg.N, cfg.probabilistic.enable
        )
        obstacles.append(o)
    obstacles = ensure_obstacle_size(
        obstacles, state, cfg.max_obstacles, cfg.N, cfg.dt, cfg.probabilistic.enable
    )
    data.dynamic_obstacles = obstacles
    data.obstacle_block = pack_obstacles(obstacles, cfg.N)
    return state, data


@pytest.fixture
def prm_cfg(cfg):
    return cfg.replace(t_mpc=cfg.t_mpc.__class__(guidance_backend="prm"))


def test_factory_selects_backend(cfg, prm_cfg):
    assert isinstance(make_guidance_planner(cfg), GuidancePlanner)
    assert isinstance(make_guidance_planner(prm_cfg), VisibilityPRMPlanner)
    assert not isinstance(make_guidance_planner(cfg), VisibilityPRMPlanner)
    bad = cfg.replace(t_mpc=cfg.t_mpc.__class__(guidance_backend="nope"))
    with pytest.raises(ValueError):
        make_guidance_planner(bad)


def test_prm_finds_distinct_classes(prm_cfg):
    """One blocking pedestrian -> at least left and right passing classes."""
    cfg = prm_cfg
    state, data = _scene(cfg, [(1.2, 0.0)])
    from mpc_planner_tpu.spline_fit import PathSpline2D

    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    prm = VisibilityPRMPlanner(cfg)
    trajs = prm.update(state, path, data.obstacle_block, 0.0, v_ref=1.5)
    assert 1 <= len(trajs) <= cfg.t_mpc.n_paths
    sigs = {(t.obstacle_ids, t.signature) for t in trajs}
    assert len(sigs) == len(trajs)  # all homotopy-distinct
    sides = {t.signature[0] for t in trajs if len(t.signature) == 1}
    assert {+1, -1} <= sides  # both passing sides found


def test_prm_trajectories_collision_free(prm_cfg):
    cfg = prm_cfg
    state, data = _scene(cfg, [(1.2, 0.0), (2.4, 0.5)])
    from mpc_planner_tpu.spline_fit import PathSpline2D

    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    prm = VisibilityPRMPlanner(cfg)
    trajs = prm.update(state, path, data.obstacle_block, 0.0, v_ref=1.5)
    blk = data.obstacle_block
    pred = np.concatenate(
        [blk.position[:, None, :], blk.pred_position], axis=1
    )[:, : cfg.N + 1]
    for t in trajs:
        d = np.linalg.norm(t.positions[None, :, :] - pred, axis=-1)  # [M, N+1]
        # Real obstacles only (dummies are parked far away anyway)
        min_d = d.min()
        assert min_d > cfg.robot_radius + 0.2, f"guidance intersects obstacle: {min_d}"


def test_prm_deterministic_and_shaped(prm_cfg):
    cfg = prm_cfg
    state, data = _scene(cfg, [(1.5, 0.1)])
    from mpc_planner_tpu.spline_fit import PathSpline2D

    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    t1 = VisibilityPRMPlanner(cfg).update(state, path, data.obstacle_block, 0.0, 1.5)
    t2 = VisibilityPRMPlanner(cfg).update(state, path, data.obstacle_block, 0.0, 1.5)
    assert len(t1) == len(t2)
    for a, b in zip(t1, t2):
        np.testing.assert_allclose(a.positions, b.positions)
        assert a.signature == b.signature
    for t in t1:
        assert t.positions.shape == (cfg.N + 1, 2)
        assert t.s.shape == (cfg.N + 1,)
        assert np.all(np.diff(t.s) >= -1e-6)  # monotone progress
        np.testing.assert_allclose(t.positions[0], [state.get("x"), state.get("y")],
                                   atol=1e-6)


def test_prm_empty_scene_reaches_goal(prm_cfg):
    """No obstacles: PRM still returns a straight-ahead class."""
    cfg = prm_cfg
    state, data = _scene(cfg, [])
    from mpc_planner_tpu.spline_fit import PathSpline2D

    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    prm = VisibilityPRMPlanner(cfg)
    trajs = prm.update(state, path, data.obstacle_block, 0.0, v_ref=1.5)
    assert len(trajs) >= 1
    # progress should advance toward the nominal end
    assert trajs[0].s[-1] > 1.0


def test_prm_consistency_bookkeeping(prm_cfg):
    """Selected class is re-identified across cycles (ref :358-359, :380)."""
    cfg = prm_cfg
    state, data = _scene(cfg, [(1.2, 0.0)])
    from mpc_planner_tpu.spline_fit import PathSpline2D

    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    prm = VisibilityPRMPlanner(cfg)
    trajs = prm.update(state, path, data.obstacle_block, 0.0, 1.5)
    prm.override_selected(trajs[0])
    trajs2 = prm.update(state, path, data.obstacle_block, 0.0, 1.5)
    matched = [t for t in trajs2 if t.previously_selected]
    assert len(matched) == 1
    assert matched[0].signature == trajs[0].signature


@pytest.mark.slow
def test_tmpc_cycle_with_prm_backend(prm_cfg):
    """End-to-end planner cycle with the PRM guidance backend."""
    cfg = prm_cfg
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = _scene(cfg, [(1.2, 0.05), (2.2, -0.3)])
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
    gmod = modules.get("GuidanceConstraints")
    assert isinstance(gmod.guidance, VisibilityPRMPlanner)
    assert gmod._selected_planner >= 0


def test_prm_samples_per_class_scale_out(prm_cfg):
    """samples_per_class > 1 emits retimed variants with the same class
    signature (batch-axis scale-out, SURVEY.md §7.7)."""
    cfg = prm_cfg.replace(t_mpc=prm_cfg.t_mpc.__class__(
        guidance_backend="prm", samples_per_class=3))
    state, data = _scene(cfg, [(1.2, 0.0)])
    from mpc_planner_tpu.spline_fit import PathSpline2D

    # Long path: variant scale-out is gated OFF within 6 m of the
    # path end (endgame crawl guard), so the expansion needs headroom.
    path = PathSpline2D(np.linspace(0, 14, 13), np.zeros(13))
    base = VisibilityPRMPlanner(prm_cfg).update(
        state, path, data.obstacle_block, 0.0, 1.5)
    trajs = VisibilityPRMPlanner(cfg).update(
        state, path, data.obstacle_block, 0.0, 1.5)
    assert len(trajs) == 3 * len(base)
    # Variant-major ordering: [bases..., variant1 of each class...,
    # variant2 of each class...] (vectorized _expand_classes)
    C = len(base)
    for i, t in enumerate(trajs):
        assert t.signature == base[i % C].signature
        assert t.positions.shape == base[0].positions.shape
    # Variants are genuinely distinct warmstarts, not repeats
    for v in range(1, 3):
        assert not np.allclose(trajs[v * C].positions, base[0].positions)
    assert not np.allclose(trajs[C].positions, trajs[2 * C].positions)


def test_resample_spline_smoothing_reduces_kinks():
    """Selected node paths are cubic-spline smoothed before becoming
    warmstarts (ref guidance_planner spline_optimization): the smoothed
    resampling interpolates the PRM nodes but carries far smaller
    stage-to-stage acceleration (second differences) than the linear
    polyline, whose corner kinks the finite-difference warmstart
    reconstruction turns into acceleration spikes (VERDICT r4 #6)."""
    from mpc_planner_tpu.guidance.prm import VisibilityPRMPlanner

    # A zig-zag node chain in (x, y) over stages 0..12
    tk = np.array([0.0, 4.0, 8.0, 12.0])
    pos = np.array([[0.0, 0.0], [2.0, 1.2], [4.0, -1.0], [6.0, 0.0]])
    node_path = [0, 1, 2, 3]
    N = 12
    smooth = VisibilityPRMPlanner._resample(node_path, pos, tk, N, smooth=True)
    linear = VisibilityPRMPlanner._resample(node_path, pos, tk, N, smooth=False)
    # Both interpolate the nodes at their stages
    for arr in (smooth, linear):
        np.testing.assert_allclose(arr[[0, 4, 8, 12]], pos, atol=1e-8)
    # Corner acceleration: max second difference at the interior nodes
    acc = lambda a: np.max(np.linalg.norm(np.diff(a, n=2, axis=0), axis=-1))
    assert acc(smooth) < 0.6 * acc(linear)
