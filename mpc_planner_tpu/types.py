"""Core data types as fixed-shape pytrees.

TPU-native equivalent of the reference's
mpc_planner_types/include/mpc_planner_types/data_types.h:13-137 and
realtime_data.h:16-49. Where the reference keeps std::vectors of structs,
everything here is a struct-of-arrays with *static* shapes
([max_obstacles, N, ...]) so the whole control cycle traces into one XLA
program; absent obstacles are padded dummies far away (the reference does
the same with +100 m dummies, data_preparation.cpp:49-56).
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Optional

import chex
import jax.numpy as jnp
import numpy as np


class PredictionType(enum.IntEnum):
    """Ref data_types.h: DETERMINISTIC / GAUSSIAN / NONGAUSSIAN."""

    NONE = 0
    DETERMINISTIC = 1
    GAUSSIAN = 2
    NONGAUSSIAN = 3


@chex.dataclass(frozen=True)
class Disc:
    """Robot collision disc (ref data_types.h Disc): offset along the body
    x-axis from the robot center + radius."""

    offset: chex.Array  # [n_discs]
    radius: chex.Array  # [n_discs]

    def position(self, robot_pos: chex.Array, psi: chex.Array) -> chex.Array:
        """Disc centers for a robot at `robot_pos` with heading `psi`.

        robot_pos [..., 2], psi [...] -> [..., n_discs, 2].
        """
        direction = jnp.stack([jnp.cos(psi), jnp.sin(psi)], axis=-1)  # [..., 2]
        return robot_pos[..., None, :] + self.offset[:, None] * direction[..., None, :]


@chex.dataclass(frozen=True)
class Halfspace:
    """A x <= b halfspaces (ref data_types.h Halfspace), struct-of-arrays."""

    A: chex.Array  # [..., 2]
    b: chex.Array  # [...]


@chex.dataclass(frozen=True)
class Prediction:
    """Obstacle motion predictions over the horizon, all modes batched.

    Ref data_types.h Prediction{modes, probabilities} with
    PredictionStep{position, angle, major_radius, minor_radius}. Fixed
    shape: [n_obstacles, n_modes, N, ...].
    """

    position: chex.Array  # [M, modes, N, 2]
    angle: chex.Array  # [M, modes, N]
    major_radius: chex.Array  # [M, modes, N] (std dev along major axis for GAUSSIAN)
    minor_radius: chex.Array  # [M, modes, N]
    probabilities: chex.Array  # [M, modes]
    type: chex.Array  # [M] int32 PredictionType per obstacle

    @property
    def n_modes(self) -> int:
        return self.position.shape[1]


@chex.dataclass(frozen=True)
class DynamicObstacle:
    """Current obstacle states (ref data_types.h DynamicObstacle), padded to
    max_obstacles. `index` < 0 marks a dummy."""

    index: chex.Array  # [M] int32
    position: chex.Array  # [M, 2]
    angle: chex.Array  # [M]
    radius: chex.Array  # [M]
    prediction: Prediction


@chex.dataclass(frozen=True)
class ReferencePath:
    """Waypoints of the 2D reference path (+ optional per-point bounds /
    velocity), padded to a static capacity with `valid` mask.

    Ref data_types.h ReferencePath{x, y, psi, v, s}.
    """

    x: chex.Array  # [P]
    y: chex.Array  # [P]
    psi: chex.Array  # [P]
    v: chex.Array  # [P]
    s: chex.Array  # [P]
    valid: chex.Array  # [P] bool


@chex.dataclass(frozen=True)
class FixedSizeTrajectory:
    """Positions with a static capacity (ref data_types.h FixedSizeTrajectory)."""

    positions: chex.Array  # [K, 2]
    valid: chex.Array  # [K] bool


class Trajectory:
    """Host-side output trajectory (ref data_types.h Trajectory)."""

    def __init__(self, dt: float = 0.0, positions: Optional[np.ndarray] = None):
        self.dt = dt
        self.positions = (
            np.zeros((0, 2)) if positions is None else np.asarray(positions, dtype=float)
        )

    def add(self, x: float, y: float) -> None:
        self.positions = np.vstack([self.positions, [x, y]])

    def __len__(self) -> int:
        return len(self.positions)


class PlannerOutput:
    """Ref planner.h PlannerOutput{trajectory, success}."""

    def __init__(self, dt: float = 0.0, N: int = 0):
        self.trajectory = Trajectory(dt)
        self.success = False
        self.N = N


class State:
    """Current robot state addressed by model-map names
    (ref mpc_planner_solver/src/state.cpp:7-44)."""

    def __init__(self, model: "Any" = None, nx: Optional[int] = None):
        if model is not None:
            self._names = list(model.states)
        else:
            self._names = ["x", "y", "psi", "v", "spline"][: nx or 5]
        self._values = np.zeros(len(self._names))

    @property
    def names(self):
        return list(self._names)

    def get(self, name: str) -> float:
        if name not in self._names:
            return 0.0
        return float(self._values[self._names.index(name)])

    def set(self, name: str, value: float) -> None:
        if name in self._names:
            self._values[self._names.index(name)] = float(value)

    def get_position(self) -> np.ndarray:
        return np.array([self.get("x"), self.get("y")])

    def as_array(self) -> np.ndarray:
        return self._values.copy()

    def from_array(self, arr: np.ndarray) -> "State":
        self._values = np.asarray(arr, dtype=float).copy()
        return self

    def reset(self) -> None:
        self._values[:] = 0.0

    def __repr__(self) -> str:
        return "State(" + ", ".join(f"{n}={v:.3f}" for n, v in zip(self._names, self._values)) + ")"


class RealTimeData:
    """All sensor-side inputs for one cycle
    (ref mpc_planner_types/realtime_data.h:16-49). Host-side container; the
    `prepare` half of each module turns it into device parameter tensors.
    """

    def __init__(self):
        self.robot_area: list = []  # list of (offset, radius)
        self.dynamic_obstacles: list = []  # list of host obstacle dicts
        self.reference_path: Optional[Dict[str, np.ndarray]] = None
        self.left_bound: Optional[np.ndarray] = None  # [P, 2]
        self.right_bound: Optional[np.ndarray] = None  # [P, 2]
        self.goal: Optional[np.ndarray] = None  # [2]
        self.goal_received: bool = False
        self.costmap: Optional[np.ndarray] = None  # occupancy grid [H, W]
        self.costmap_meta: Optional[Dict[str, float]] = None  # origin_x/y, resolution
        self.past_trajectory: list = []
        self.intrusion: float = 0.0
        self.planning_start_time: float = 0.0
        self.obstacle_block = None  # ObstacleBlock (struct-of-arrays, padded)
        self.ego_position: np.ndarray = np.zeros(2)

    def reset(self) -> None:
        """Ref realtime_data.h: reset clears everything except robot_area."""
        robot_area = self.robot_area
        self.__init__()
        self.robot_area = robot_area


class ModuleData:
    """Per-cycle shared blackboard between modules
    (ref mpc_planner_types/module_data.h:21-34). Host-side and mutable:
    modules run on host each cycle filling parameter tensors; anything
    device-bound goes through the ParameterBlock."""

    def __init__(self):
        self.static_obstacles: Optional[np.ndarray] = None  # [N, H, 3] rows (a1, a2, b)
        self.path = None  # PathSpline2D
        self.path_velocity = None  # CubicSpline of v(s)
        self.path_width_left = None  # CubicSpline
        self.path_width_right = None  # CubicSpline
        self.current_path_segment: int = 0
        self.warmstart: Optional[np.ndarray] = None  # [N+1, nvar] ego prediction
        self.warmstart_xy: Optional[np.ndarray] = None  # [N+1, 2]
        self.warmstart_psi: Optional[np.ndarray] = None  # [N+1]
        self.warmstart_spline: Optional[np.ndarray] = None  # [N+1] predicted progress
        # Set by the planner before the module optimize chain:
        self.pblock = None  # ParameterBlock (main fill)
        self.xinit: Optional[np.ndarray] = None  # [nx]
        self.num_iterations: int = 10


def dummy_obstacles(
    max_obstacles: int, n_modes: int, N: int, far: float = 100.0
) -> DynamicObstacle:
    """All-dummy obstacle block at +`far` m (ref data_preparation.cpp:49-56)."""
    M = max_obstacles
    pos = jnp.full((M, 2), far)
    pred_pos = jnp.broadcast_to(pos[:, None, None, :], (M, n_modes, N, 2))
    return DynamicObstacle(
        index=jnp.full((M,), -1, dtype=jnp.int32),
        position=pos,
        angle=jnp.zeros((M,)),
        radius=jnp.full((M,), 0.0),
        prediction=Prediction(
            position=pred_pos,
            angle=jnp.zeros((M, n_modes, N)),
            major_radius=jnp.zeros((M, n_modes, N)),
            minor_radius=jnp.zeros((M, n_modes, N)),
            probabilities=jnp.concatenate(
                [jnp.ones((M, 1)), jnp.zeros((M, n_modes - 1))], axis=1
            )
            if n_modes > 1
            else jnp.ones((M, 1)),
            type=jnp.full((M,), int(PredictionType.DETERMINISTIC), dtype=jnp.int32),
        ),
    )
