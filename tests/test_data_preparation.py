"""Data-preparation tests (ref mpc_planner/src/data_preparation.cpp)."""

import numpy as np

from mpc_planner_tpu.data_preparation import (
    HostObstacle,
    define_robot_area,
    ensure_obstacle_size,
    get_constant_velocity_prediction,
    pack_obstacles,
    propagate_prediction_uncertainty,
)
from mpc_planner_tpu.types import PredictionType, State


def test_robot_area_single_disc():
    area = define_robot_area(0.65, 0.65, 1)
    assert area == [(0.0, 0.325)]


def test_robot_area_multi_disc():
    # (ref data_preparation.cpp:16-47): first at back, last at front
    area = define_robot_area(4.54, 2.25, 3)
    offsets = [o for o, _ in area]
    radius = 2.25 / 2
    assert np.isclose(offsets[0], -4.54 / 2 + radius)
    assert np.isclose(offsets[-1], -4.54 / 2 + 4.54 - radius)
    assert offsets[0] < offsets[1] < offsets[2]


def test_constant_velocity_prediction():
    pred = get_constant_velocity_prediction(
        np.array([1.0, 0.0]), np.array([0.5, 0.0]), 0.2, 10, probabilistic=False
    )
    np.testing.assert_allclose(pred.positions[0, 5], [1.0 + 0.5 * 0.2 * 5, 0.0])
    assert pred.type == int(PredictionType.DETERMINISTIC)


def test_uncertainty_propagation_accumulates():
    # sigma_{k+1} = sqrt(sigma_k^2 + (sigma*dt)^2) (ref :170-186)
    pred = get_constant_velocity_prediction(
        np.zeros(2), np.zeros(2), 0.2, 10, probabilistic=True
    )
    major = pred.major[0]
    assert np.all(np.diff(major) > 0)  # grows over the horizon
    np.testing.assert_allclose(major[0], 0.3 * 0.2, atol=1e-9)


def test_ensure_size_sorts_by_horizon_distance():
    cfg_N, dt = 10, 0.2
    state = State(nx=5)
    state.set("v", 1.0)

    def obs(x, y, idx):
        o = HostObstacle(index=idx, position=np.array([x, y]), angle=0.0, radius=0.4)
        o.prediction = get_constant_velocity_prediction(
            o.position, np.zeros(2), dt, cfg_N, False
        )
        return o

    # 4 obstacles, keep closest 2. The reference's metric projects the ego
    # forward by v*k (NO dt, data_preparation.cpp:117-123), so obstacles the
    # ego "passes through" on that projection rank closest: (1,0) and (5,0).
    obstacles = [obs(10.0, 0, 0), obs(1.0, 0, 1), obs(5.0, 0, 2), obs(0.5, 1.0, 3)]
    kept = ensure_obstacle_size(obstacles, state, 2, cfg_N, dt, False)
    assert len(kept) == 2
    xs = sorted(o.position[0] for o in kept)
    assert xs == [1.0, 5.0]
    # re-indexed sequentially (ref :143-147)
    assert sorted(o.index for o in kept) == [0, 1]


def test_ensure_size_pads_with_dummies():
    state = State(nx=5)
    kept = ensure_obstacle_size([], state, 3, 10, 0.2, False)
    assert len(kept) == 3
    assert all(o.index == -1 for o in kept)
    assert all(np.all(o.position >= 100.0) for o in kept)


def test_pack_extends_short_predictions():
    o = HostObstacle(index=0, position=np.zeros(2), angle=0.0, radius=0.4)
    o.prediction = get_constant_velocity_prediction(
        np.zeros(2), np.array([1.0, 0.0]), 0.2, 5, False
    )
    blk = pack_obstacles([o], 10)
    # steps beyond the prediction hold the last value
    np.testing.assert_allclose(
        blk.pred_position[0, 5:], np.tile(blk.pred_position[0, 4], (5, 1))
    )
