"""GPS-space route planner with min/max-distance pop window.

Reference: submission_agent.py:604-660 (agent variant) and
team_code_autopilot/nav_planner.py:96-188 (expert variant with precomputed
leg distances). CARLA 0.9.10 lat/lon scale constants.
"""

from __future__ import annotations

from collections import deque
from copy import deepcopy
from typing import Deque, List, Tuple

import numpy as np

GPS_CARLA_SCALE = np.array([111324.60662786, 111319.490945])


class RoutePlanner:
    def __init__(self, min_distance: float, max_distance: float):
        self.route: Deque[Tuple[np.ndarray, object]] = deque()
        self.saved_route: Deque = deque()
        self.min_distance = min_distance
        self.max_distance = max_distance
        self.is_last = False
        self.mean = np.array([0.0, 0.0])
        self.scale = GPS_CARLA_SCALE.copy()

    def set_route(self, global_plan: List[Tuple[object, object]],
                  gps: bool = False) -> None:
        self.route.clear()
        for pos, cmd in global_plan:
            if gps:
                pos = np.array([pos["lat"], pos["lon"]])
                pos = (pos - self.mean) * self.scale
            else:
                # pos is a transform-like with .location.x/.y
                pos = np.array([pos.location.x, pos.location.y]) - self.mean
            self.route.append((pos, cmd))

    def run_step(self, gps: np.ndarray) -> Deque:
        """Pop waypoints the vehicle has passed; returns the active route."""
        if len(self.route) <= 2:
            self.is_last = True
            return self.route

        to_pop = 0
        farthest_in_range = -np.inf
        cumulative_distance = 0.0
        for i in range(1, len(self.route)):
            if cumulative_distance > self.max_distance:
                break
            cumulative_distance += np.linalg.norm(
                self.route[i][0] - self.route[i - 1][0])
            distance = np.linalg.norm(self.route[i][0] - gps)
            if distance <= self.min_distance and distance > farthest_in_range:
                farthest_in_range = distance
                to_pop = i

        for _ in range(to_pop):
            if len(self.route) > 2:
                self.route.popleft()
        return self.route

    def save(self) -> None:
        self.saved_route = deepcopy(self.route)

    def load(self) -> None:
        self.route = self.saved_route
        self.is_last = False
