"""Device-side sampled guidance backend tests (guidance/device_prm.py).

Same contract as the PRM backend (tests/test_prm.py): homotopy-distinct,
collision-free guidance trajectories, interchangeable inside T-MPC — but
produced by one jitted batched sweep instead of a host graph search.
"""

import numpy as np
import pytest

from mpc_planner_tpu.guidance import make_guidance_planner
from mpc_planner_tpu.guidance.device_prm import DeviceSampledPlanner
from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import configuration_tmpc
from mpc_planner_tpu.spline_fit import PathSpline2D

from tests.test_prm import _scene


@pytest.fixture
def samp_cfg(cfg):
    return cfg.replace(
        t_mpc=cfg.t_mpc.__class__(guidance_backend="sampled",
                                  sampled_n_samples=512)
    )


def test_factory_selects_sampled_backend(samp_cfg):
    assert isinstance(make_guidance_planner(samp_cfg), DeviceSampledPlanner)


def test_sampled_finds_distinct_classes(samp_cfg):
    """One blocking pedestrian -> both passing sides among the classes."""
    cfg = samp_cfg
    state, data = _scene(cfg, [(1.2, 0.0)])
    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    g = DeviceSampledPlanner(cfg)
    trajs = g.update(state, path, data.obstacle_block, 0.0, v_ref=1.5)
    assert 1 <= len(trajs) <= cfg.t_mpc.n_paths
    sigs = {(t.obstacle_ids, t.signature) for t in trajs}
    assert len(sigs) == len(trajs)  # homotopy-distinct
    sides = {t.signature[0] for t in trajs if len(t.signature) == 1}
    assert {+1, -1} <= sides


def test_sampled_trajectories_collision_free(samp_cfg):
    cfg = samp_cfg
    state, data = _scene(cfg, [(1.2, 0.0), (2.4, 0.5)])
    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    g = DeviceSampledPlanner(cfg)
    trajs = g.update(state, path, data.obstacle_block, 0.0, v_ref=1.5)
    blk = data.obstacle_block
    pred = np.concatenate(
        [blk.position[:, None, :], blk.pred_position], axis=1
    )[:, : cfg.N + 1]
    for t in trajs:
        d = np.linalg.norm(t.positions[None, :, :] - pred, axis=-1)
        assert d.min() > cfg.robot_radius + 0.2, f"guidance intersects: {d.min()}"


def test_sampled_deterministic_and_shaped(samp_cfg):
    cfg = samp_cfg
    state, data = _scene(cfg, [(1.5, 0.1)])
    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    t1 = DeviceSampledPlanner(cfg).update(state, path, data.obstacle_block, 0.0, 1.5)
    t2 = DeviceSampledPlanner(cfg).update(state, path, data.obstacle_block, 0.0, 1.5)
    assert len(t1) == len(t2)
    for a, b in zip(t1, t2):
        np.testing.assert_allclose(a.positions, b.positions)
        assert a.signature == b.signature
    for t in t1:
        assert t.positions.shape == (cfg.N + 1, 2)
        assert t.s.shape == (cfg.N + 1,)
        assert np.all(np.diff(t.s) >= -1e-6)
        np.testing.assert_allclose(
            t.positions[0], [state.get("x"), state.get("y")], atol=1e-5
        )


def test_sampled_scale_out_per_class(samp_cfg):
    """samples_per_class > 1 keeps several genuinely different candidates
    per signature (unlike the host backends' retimed copies)."""
    cfg = samp_cfg.replace(
        t_mpc=samp_cfg.t_mpc.__class__(
            guidance_backend="sampled", sampled_n_samples=512,
            samples_per_class=3)
    )
    state, data = _scene(cfg, [(1.2, 0.0)])
    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    trajs = DeviceSampledPlanner(cfg).update(
        state, path, data.obstacle_block, 0.0, 1.5)
    by_sig = {}
    for t in trajs:
        by_sig.setdefault((t.obstacle_ids, t.signature), []).append(t)
    assert any(len(v) > 1 for v in by_sig.values())
    for variants in by_sig.values():
        for a, b in zip(variants, variants[1:]):
            assert not np.allclose(a.positions, b.positions)


def test_sampled_empty_scene_falls_back(samp_cfg):
    cfg = samp_cfg
    state, data = _scene(cfg, [])
    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    trajs = DeviceSampledPlanner(cfg).update(
        state, path, data.obstacle_block, 0.0, 1.5)
    assert len(trajs) >= 1
    assert trajs[0].s[-1] > 1.0


def test_sampled_consistency_bookkeeping(samp_cfg):
    cfg = samp_cfg
    state, data = _scene(cfg, [(1.2, 0.0)])
    path = PathSpline2D(np.linspace(0, 6, 13), np.zeros(13))
    g = DeviceSampledPlanner(cfg)
    trajs = g.update(state, path, data.obstacle_block, 0.0, 1.5)
    g.override_selected(trajs[0])
    trajs2 = g.update(state, path, data.obstacle_block, 0.0, 1.5)
    matched = [t for t in trajs2 if t.previously_selected]
    assert len(matched) >= 1
    assert matched[0].signature == trajs[0].signature


@pytest.mark.slow
def test_tmpc_cycle_with_sampled_backend(samp_cfg):
    cfg = samp_cfg
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = _scene(cfg, [(1.2, 0.05), (2.2, -0.3)])
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
    gmod = modules.get("GuidanceConstraints")
    assert isinstance(gmod.guidance, DeviceSampledPlanner)
    assert gmod._selected_planner >= 0
