"""Route scenario: ego route + criteria + scenario actor placement.

Behavioral spec: leaderboard/scenarios/route_scenario_local.py:173-572 —
interpolate the route, downsample the 50 m plan, sample at most one
scenario instance per trigger, spawn background traffic, and wire the
criteria list (:532-567). The hermetic backend models scenario adversaries
and background traffic as scripted actors.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..sim.replay import Actor, ReplaySimulation
from ..sim.types import Location, Rotation, Transform
from .criteria import (AgentBlockedTest, CollisionTest, Criterion,
                       InRouteTest, OutsideRouteLanesTest,
                       RouteCompletionTest, RunningRedLightTest,
                       RunningStopTest)
from .route_parser import (RoadOption, RouteConfig, downsample_route,
                           interpolate_trajectory, location_route_to_gps)

@dataclass
class RouteScenario:
    config: RouteConfig
    fps: int = 20
    background_vehicles: int = 0
    seed: int = 0
    dense_route: List[Tuple[Transform, RoadOption]] = field(init=False)
    global_plan_gps: list = field(init=False)
    global_plan_world: list = field(init=False)
    criteria: List[Criterion] = field(init=False)
    sim: ReplaySimulation = field(init=False)

    def __post_init__(self) -> None:
        self.dense_route = interpolate_trajectory(self.config.trajectory)
        ids = downsample_route(self.dense_route, 50.0)
        sparse = [self.dense_route[i] for i in ids]
        self.global_plan_world = [(tf, opt) for tf, opt in sparse]
        self.global_plan_gps = location_route_to_gps(sparse)

        from .scenarios import build_behaviors
        self.behaviors = build_behaviors(self.config.scenario_configs,
                                         self.seed)
        self.sim = ReplaySimulation(
            [tf for tf, _ in self.dense_route], fps=self.fps,
            actors=self._build_background_traffic(), seed=self.seed)
        for behavior in self.behaviors:
            self.sim.actors.extend(behavior.setup(self.sim))

        route_tfs = [tf for tf, _ in self.dense_route]
        self._completion = RouteCompletionTest(route_tfs)
        self._outside = OutsideRouteLanesTest(route_tfs)
        self.criteria = [
            CollisionTest(),
            InRouteTest(route_tfs),
            self._completion,
            self._outside,
            RunningRedLightTest(),
            RunningStopTest(),
            AgentBlockedTest(fps=self.fps),
        ]

    # ------------------------------------------------------------- actors
    def _build_background_traffic(self) -> List[Actor]:
        """Dense-traffic spawning (route_scenario_local.py:449-467 uses 500
        vehicles for Longest6); here parked along offsets of the route."""
        actors: List[Actor] = []
        if self.background_vehicles <= 0:
            return actors
        rng = np.random.default_rng(self.seed)
        n_pts = len(self.dense_route)
        for i in range(self.background_vehicles):
            idx = int(rng.integers(0, n_pts))
            tf, _ = self.dense_route[idx]
            side = 6.0 * (1 if i % 2 == 0 else -1)
            yaw = tf.rotation.yaw
            dx = side * math.cos(math.radians(yaw + 90.0))
            dy = side * math.sin(math.radians(yaw + 90.0))
            actors.append(Actor(
                actor_id=2000 + i, type_id="vehicle.background",
                transform=Transform(
                    Location(tf.location.x + dx, tf.location.y + dy, 0.0),
                    Rotation(yaw=yaw))))
        return actors

    # ------------------------------------------------------------ lifecycle
    def tick_criteria(self) -> None:
        for behavior in self.behaviors:
            behavior.tick(self.sim)
        for c in self.criteria:
            c.update(self.sim)

    def should_terminate(self) -> bool:
        return any(getattr(c, "failed", False) for c in self.criteria
                   if c.terminates) or self._completion._done

    def collect_events(self) -> list:
        self._completion.finalize()
        self._outside.finalize()
        events = []
        for c in self.criteria:
            events.extend(c.events)
        return events
