"""Simulator-agnostic geometry/control types.

Replaces the carla Python egg's C++ types (carla.VehicleControl,
carla.Transform, carla.BoundingBox — SURVEY.md §2.10) with plain
numpy-backed dataclasses, so the agent/harness stack runs hermetically and
talks to a real CARLA server only through a thin adapter.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Location:
    x: float = 0.0
    y: float = 0.0
    z: float = 0.0

    def as_array(self) -> np.ndarray:
        return np.array([self.x, self.y, self.z])

    def distance(self, other: "Location") -> float:
        # Scalar math, not np.linalg.norm: this runs for every
        # (actor, tick) pair in the proximity filters of the expert and
        # the traffic manager, and the 3 tiny-array constructions per
        # call dominated it (profiled at 24 s per benchmark route).
        dx = self.x - other.x
        dy = self.y - other.y
        dz = self.z - other.z
        return math.sqrt(dx * dx + dy * dy + dz * dz)

    def __add__(self, other: "Location") -> "Location":
        return Location(self.x + other.x, self.y + other.y, self.z + other.z)

    def __sub__(self, other: "Location") -> "Location":
        return Location(self.x - other.x, self.y - other.y, self.z - other.z)


@dataclass
class Rotation:
    """Degrees, CARLA convention (pitch, yaw, roll)."""

    pitch: float = 0.0
    yaw: float = 0.0
    roll: float = 0.0

    def matrix(self) -> np.ndarray:
        cy, sy = math.cos(math.radians(self.yaw)), math.sin(math.radians(self.yaw))
        cp, sp = math.cos(math.radians(self.pitch)), math.sin(math.radians(self.pitch))
        cr, sr = math.cos(math.radians(self.roll)), math.sin(math.radians(self.roll))
        return np.array([
            [cp * cy, cy * sp * sr - sy * cr, -cy * sp * cr - sy * sr],
            [cp * sy, sy * sp * sr + cy * cr, -sy * sp * cr + cy * sr],
            [sp, -cp * sr, cp * cr],
        ])

    def forward_vector(self) -> np.ndarray:
        return self.matrix()[:, 0]

    def right_vector(self) -> np.ndarray:
        return self.matrix()[:, 1]

    def up_vector(self) -> np.ndarray:
        return self.matrix()[:, 2]


@dataclass
class Transform:
    location: Location = field(default_factory=Location)
    rotation: Rotation = field(default_factory=Rotation)

    def matrix(self) -> np.ndarray:
        m = np.eye(4)
        m[:3, :3] = self.rotation.matrix()
        m[:3, 3] = self.location.as_array()
        return m

    def transform_point(self, p: np.ndarray) -> np.ndarray:
        return self.rotation.matrix() @ p + self.location.as_array()


@dataclass
class BoundingBox:
    location: Location = field(default_factory=Location)  # center
    extent: Location = field(default_factory=Location)    # half sizes
    rotation: Rotation = field(default_factory=Rotation)


@dataclass
class VehicleControl:
    steer: float = 0.0
    throttle: float = 0.0
    brake: float = 0.0
    hand_brake: bool = False
    reverse: bool = False
    manual_gear_shift: bool = False
    gear: int = 0

    def clipped(self) -> "VehicleControl":
        return VehicleControl(
            steer=float(np.clip(self.steer, -1.0, 1.0)),
            throttle=float(np.clip(self.throttle, 0.0, 1.0)),
            brake=float(np.clip(self.brake, 0.0, 1.0)),
            hand_brake=self.hand_brake, reverse=self.reverse,
            manual_gear_shift=self.manual_gear_shift, gear=self.gear)
