"""GPS denoising buffer: kinematic forward-prediction + averaging.

Reference: submission_agent.py:456-469 (update_gps_buffer) + the 100-deep
buffer averaged in tick (submission_agent.py:196-199). Each stored GPS
sample is rolled forward through the bicycle model with the applied
control, so averaging the buffer denoises without lag.
"""

from __future__ import annotations

from collections import deque
from typing import Deque

import numpy as np

from ..geometry import EgoModel


class GPSBuffer:
    def __init__(self, maxlen: int = 100, carla_fps: int = 20):
        self.buffer: Deque[np.ndarray] = deque(maxlen=maxlen)
        self.ego_model = EgoModel(dt=1.0 / carla_fps)

    def append(self, gps: np.ndarray) -> None:
        self.buffer.append(np.asarray(gps, dtype=np.float64))

    def update(self, steer: float, throttle: float, brake: bool,
               theta: float, speed: float) -> None:
        """Roll every buffered location forward one sim tick."""
        yaw = np.array([theta - np.pi / 2.0])
        spd = np.array([speed])
        action = np.array([steer, throttle, float(brake)])
        for i in range(len(self.buffer)):
            loc = self.buffer[i]
            # Bicycle model uses a rotated coordinate system.
            loc_temp = np.array([loc[1], -loc[0]])
            next_temp, _, _ = self.ego_model.forward(loc_temp, yaw, spd,
                                                     action)
            self.buffer[i] = np.array([-next_temp[1], next_temp[0]])

    def denoised(self) -> np.ndarray:
        return np.mean(self.buffer, axis=0)

    def __len__(self) -> int:
        return len(self.buffer)
