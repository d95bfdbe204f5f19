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

# Scenario name -> adversary behavior kind (route_scenario_local.py:56-67
# maps Scenario1-10 onto srunner classes; the hermetic backend realizes them
# as scripted actors with equivalent trigger semantics).
SCENARIO_BEHAVIORS: Dict[str, str] = {
    "Scenario1": "control_loss",
    "Scenario2": "follow_leading_vehicle",
    "Scenario3": "dynamic_object_crossing",
    "Scenario4": "vehicle_turning_route",
    "Scenario5": "other_leading_vehicle",
    "Scenario6": "maneuver_opposite_direction",
    "Scenario7": "signal_junction_crossing",
    "Scenario8": "no_signal_junction_crossing",
    "Scenario9": "no_signal_junction_crossing",
    "Scenario10": "no_signal_junction_crossing",
}


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

        actors = self._build_scenario_actors()
        actors += self._build_background_traffic()
        self.sim = ReplaySimulation(
            [tf for tf, _ in self.dense_route], fps=self.fps, actors=actors,
            seed=self.seed)

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
    def _build_scenario_actors(self) -> List[Actor]:
        actors: List[Actor] = []
        next_id = 1000
        for sc in self.config.scenario_configs:
            behavior = SCENARIO_BEHAVIORS.get(sc["scenario_type"])
            if behavior is None:
                continue
            trigger: Transform = sc["trigger_position"]
            # Adversary placed near the trigger; crossing scenarios get a
            # track cutting the route.
            offset = 8.0
            yaw = trigger.rotation.yaw
            dx = offset * math.cos(math.radians(yaw + 90.0))
            dy = offset * math.sin(math.radians(yaw + 90.0))
            kind = "walker.pedestrian.0001" \
                if behavior == "dynamic_object_crossing" else \
                "vehicle.adversary"
            actor = Actor(
                actor_id=next_id, type_id=kind,
                transform=Transform(
                    Location(trigger.location.x + dx,
                             trigger.location.y + dy, 0.0),
                    Rotation(yaw=yaw - 90.0)),
                extent=Location(0.4, 0.4, 1.0) if kind.startswith("walker")
                else Location(2.4, 1.0, 0.75),
                speed=0.0)
            actors.append(actor)
            next_id += 1
        return actors

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
