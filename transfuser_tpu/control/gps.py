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
        if not self.buffer:
            return
        # One batched bicycle-model step over every buffered fix
        # (elementwise numerics identical to rolling them one by one;
        # this ran once per entry per tick in the expert loop).
        yaw = np.array([[theta - np.pi / 2.0]])
        spd = np.array([[speed]])
        action = np.array([[steer, throttle, float(brake)]])
        locs = np.stack(list(self.buffer))
        # Bicycle model uses a rotated coordinate system.
        temp = np.stack([locs[:, 1], -locs[:, 0]], axis=1)
        next_temp, _, _ = self.ego_model.forward(temp, yaw, spd, action)
        out = np.stack([-next_temp[:, 1], next_temp[:, 0]], axis=1)
        for i in range(len(self.buffer)):
            self.buffer[i] = out[i]

    def denoised(self) -> np.ndarray:
        return np.mean(self.buffer, axis=0)

    def __len__(self) -> int:
        return len(self.buffer)
