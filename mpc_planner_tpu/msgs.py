"""Obstacle message schemas + (de)serialization.

Equivalent of mpc_planner_msgs (ref mpc_planner_msgs/msg/*.msg:
Gaussian — mean path + major/minor semiaxes; ObstacleGMM — id, pose,
gaussians[], probabilities[]; ObstacleArray). Instead of ROS IDL these
are plain dataclasses with dict/JSON round-trip, feeding
`systems.convert_obstacle_messages` / the data-preparation layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import numpy as np


@dataclass
class GaussianMsg:
    """Ref Gaussian.msg: mean path + uncertainty semiaxes per step."""

    mean_x: List[float] = field(default_factory=list)
    mean_y: List[float] = field(default_factory=list)
    major_semiaxis: List[float] = field(default_factory=list)
    minor_semiaxis: List[float] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "mean_x": list(self.mean_x),
            "mean_y": list(self.mean_y),
            "major_semiaxis": list(self.major_semiaxis),
            "minor_semiaxis": list(self.minor_semiaxis),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "GaussianMsg":
        return cls(**{k: list(d.get(k, [])) for k in
                      ("mean_x", "mean_y", "major_semiaxis", "minor_semiaxis")})


@dataclass
class ObstacleGMMMsg:
    """Ref ObstacleGMM.msg: multi-modal Gaussian prediction."""

    id: int = 0
    pose_x: float = 0.0
    pose_y: float = 0.0
    pose_psi: float = 0.0
    radius: float = 0.4
    gaussians: List[GaussianMsg] = field(default_factory=list)
    probabilities: List[float] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "pose": [self.pose_x, self.pose_y, self.pose_psi],
            "radius": self.radius,
            "gaussians": [g.to_dict() for g in self.gaussians],
            "probabilities": list(self.probabilities),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ObstacleGMMMsg":
        pose = d.get("pose", [0.0, 0.0, 0.0])
        return cls(
            id=int(d.get("id", 0)),
            pose_x=pose[0], pose_y=pose[1],
            pose_psi=pose[2] if len(pose) > 2 else 0.0,
            radius=float(d.get("radius", 0.4)),
            gaussians=[GaussianMsg.from_dict(g) for g in d.get("gaussians", [])],
            probabilities=list(d.get("probabilities", [])),
        )

    def to_raw_obstacle(self) -> dict:
        """-> the `systems.convert_obstacle_messages` input schema, using
        the highest-probability mode (the reference's single-mode
        conversion, ros1_jackalsimulator.cpp:302-339)."""
        raw = {"id": self.id, "position": [self.pose_x, self.pose_y],
               "angle": self.pose_psi, "radius": self.radius}
        if self.gaussians:
            probs = self.probabilities or [1.0] * len(self.gaussians)
            g = self.gaussians[int(np.argmax(probs))]
            raw["prediction"] = {
                "positions": np.stack([g.mean_x, g.mean_y], axis=-1),
                "major": np.asarray(g.major_semiaxis, dtype=float),
                "minor": np.asarray(g.minor_semiaxis, dtype=float),
            }
        return raw


@dataclass
class ObstacleArrayMsg:
    """Ref ObstacleArray.msg."""

    obstacles: List[ObstacleGMMMsg] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {"obstacles": [o.to_dict() for o in self.obstacles]}

    @classmethod
    def from_dict(cls, d: dict) -> "ObstacleArrayMsg":
        return cls(obstacles=[ObstacleGMMMsg.from_dict(o) for o in d.get("obstacles", [])])

    def to_raw_obstacles(self) -> List[dict]:
        return [o.to_raw_obstacle() for o in self.obstacles]
