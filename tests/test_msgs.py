"""Message schema tests (ref mpc_planner_msgs/msg/*.msg)."""

import numpy as np

from mpc_planner_tpu.msgs import GaussianMsg, ObstacleArrayMsg, ObstacleGMMMsg


def test_roundtrip():
    g = GaussianMsg(mean_x=[1, 2], mean_y=[3, 4], major_semiaxis=[0.1, 0.2],
                    minor_semiaxis=[0.05, 0.1])
    o = ObstacleGMMMsg(id=7, pose_x=1.0, pose_y=2.0, pose_psi=0.3,
                       gaussians=[g], probabilities=[1.0])
    arr = ObstacleArrayMsg(obstacles=[o])
    arr2 = ObstacleArrayMsg.from_dict(arr.to_dict())
    assert arr2.obstacles[0].id == 7
    assert arr2.obstacles[0].gaussians[0].mean_x == [1, 2]


def test_to_raw_obstacle_picks_best_mode():
    g1 = GaussianMsg(mean_x=[0], mean_y=[0], major_semiaxis=[1], minor_semiaxis=[1])
    g2 = GaussianMsg(mean_x=[9], mean_y=[9], major_semiaxis=[2], minor_semiaxis=[2])
    o = ObstacleGMMMsg(id=1, gaussians=[g1, g2], probabilities=[0.2, 0.8])
    raw = o.to_raw_obstacle()
    np.testing.assert_allclose(raw["prediction"]["positions"], [[9, 9]])


def test_msgs_feed_conversion(cfg):
    from mpc_planner_tpu.systems import convert_obstacle_messages
    from mpc_planner_tpu.types import State

    g = GaussianMsg(mean_x=list(np.linspace(3, 5, cfg.N)),
                    mean_y=[0.0] * cfg.N,
                    major_semiaxis=[0.2] * cfg.N,
                    minor_semiaxis=[0.1] * cfg.N)
    arr = ObstacleArrayMsg(obstacles=[
        ObstacleGMMMsg(id=0, pose_x=3.0, pose_y=0.0, gaussians=[g],
                       probabilities=[1.0])
    ])
    obstacles = convert_obstacle_messages(cfg, State(nx=5), arr.to_raw_obstacles())
    assert len(obstacles) == cfg.max_obstacles
    assert obstacles[0].index == 0
