"""Scripted scenario behaviors (the srunner scenario-class subset).

Behavioral spec: route_scenario_local.py:56-67 maps Scenario1-10 onto the
srunner classes (srunner/scenarios/*.py); each is a triggered adversary
maneuver. The hermetic equivalents reproduce the trigger ("ScenarioTriggerer"
+ oneshot, route_scenario_local.py:486-530) and maneuver semantics against
the replay backend's actor model:

  Scenario1  ControlLoss               — transient ego steering noise
  Scenario2  FollowLeadingVehicle      — lead vehicle drives then brakes
  Scenario3  DynamicObjectCrossing     — walker crosses in front
  Scenario4  VehicleTurningRoute       — vehicle cuts across at a junction
  Scenario5  OtherLeadingVehicle       — lead vehicle decelerates abruptly
  Scenario6  ManeuverOppositeDirection — oncoming vehicle invades the lane
  Scenario7-10 (No)SignalJunctionCrossing — crossing traffic at a junction
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from ..sim.replay import Actor, ReplaySimulation
from ..sim.types import Location, Rotation, Transform


class ScenarioBehavior:
    """Triggered, oneshot scripted behavior."""

    TRIGGER_DISTANCE = 15.0  # ScenarioTriggerer proximity

    def __init__(self, trigger: Transform, actor_id: int, seed: int = 0,
                 params: Optional[dict] = None):
        self.trigger = trigger
        self.actor_id = actor_id
        self.triggered = False
        self.done = False
        self.elapsed = 0.0
        self.params = params or {}
        self._rng = np.random.default_rng(seed + actor_id)

    def _param(self, name: str, default: float) -> float:
        """Per-event tunable from the scenario JSON's `other_parameters`
        (srunner convention: values may be wrapped as {"value": x},
        basic_scenario.py config.other_parameters)."""
        v = self.params.get(name, default)
        if isinstance(v, dict):
            v = v.get("value", default)
        try:
            return float(v)
        except (TypeError, ValueError):
            return default

    # ------------------------------------------------------------ lifecycle
    def setup(self, sim: ReplaySimulation) -> List[Actor]:
        """Actors to pre-spawn (before trigger)."""
        return []

    def on_trigger(self, sim: ReplaySimulation) -> None:
        pass

    def behave(self, sim: ReplaySimulation, dt: float) -> None:
        pass

    def tick(self, sim: ReplaySimulation) -> None:
        if self.done:
            return
        ego = sim.ego_transform.location
        if not self.triggered:
            d = math.hypot(ego.x - self.trigger.location.x,
                           ego.y - self.trigger.location.y)
            if d < self.TRIGGER_DISTANCE:
                self.triggered = True
                self.on_trigger(sim)
            return
        self.elapsed += sim.dt
        self.behave(sim, sim.dt)

    def _actor(self, sim: ReplaySimulation) -> Optional[Actor]:
        for a in sim.actors:
            if a.actor_id == self.actor_id:
                return a
        return None

    def _offset_transform(self, forward: float, lateral: float,
                          yaw_add: float = 0.0) -> Transform:
        yaw = math.radians(self.trigger.rotation.yaw)
        c, s = math.cos(yaw), math.sin(yaw)
        x = self.trigger.location.x + forward * c - lateral * s
        y = self.trigger.location.y + forward * s + lateral * c
        return Transform(Location(x, y, 0.0),
                         Rotation(yaw=self.trigger.rotation.yaw + yaw_add))


class ControlLoss(ScenarioBehavior):
    """Scenario1: steering perturbation for ~1.5 s (control_loss.py)."""

    DURATION = 1.5
    NOISE = 0.12

    def behave(self, sim: ReplaySimulation, dt: float) -> None:
        if self.elapsed > self._param("duration", self.DURATION):
            self.done = True
            return
        noise = float(self._rng.normal(
            0.0, self._param("noise_std", self.NOISE)))
        sim.perturb_steer(noise)


class FollowLeadingVehicle(ScenarioBehavior):
    """Scenario2: lead vehicle ahead; drives then stops, ego must react."""

    def setup(self, sim: ReplaySimulation) -> List[Actor]:
        # srunner follow_leading_vehicle.py: _first_vehicle_location=25
        tf = self._offset_transform(
            self._param("first_vehicle_location", 25.0), 0.0)
        self._lead = Actor(actor_id=self.actor_id, type_id="vehicle.lead",
                           transform=tf, speed=0.0)
        return [self._lead]

    def behave(self, sim: ReplaySimulation, dt: float) -> None:
        lead = self._actor(sim)
        if lead is None:
            self.done = True
            return
        if self.elapsed < 6.0:
            lead.speed = self._param("first_vehicle_speed", 3.0)
        else:
            lead.speed = 0.0  # stop; ego must brake behind
        yaw = math.radians(lead.transform.rotation.yaw)
        lead.transform = Transform(
            Location(lead.transform.location.x + lead.speed * dt
                     * math.cos(yaw),
                     lead.transform.location.y + lead.speed * dt
                     * math.sin(yaw), 0.0),
            lead.transform.rotation)
        lead.control.throttle = 0.5 if lead.speed > 0 else 0.0
        lead.control.brake = 0.0 if lead.speed > 0 else 1.0


class DynamicObjectCrossing(ScenarioBehavior):
    """Scenario3: walker steps onto the road in front of the ego."""

    def setup(self, sim: ReplaySimulation) -> List[Actor]:
        # srunner object_crossing.py: _start_distance; walker speed 1.8
        tf = self._offset_transform(self._param("distance", 12.0), -5.0,
                                    yaw_add=90.0)
        yaw = math.radians(tf.rotation.yaw)
        walker = Actor(actor_id=self.actor_id, type_id="walker.pedestrian",
                       transform=tf, extent=Location(0.4, 0.4, 1.0),
                       speed=0.0,
                       direction=(math.cos(yaw), math.sin(yaw), 0.0))
        return [walker]

    def on_trigger(self, sim: ReplaySimulation) -> None:
        w = self._actor(sim)
        if w is not None:
            w.speed = self._param("walker_speed", 1.8)

    def behave(self, sim: ReplaySimulation, dt: float) -> None:
        if self.elapsed > 8.0:
            w = self._actor(sim)
            if w is not None:
                w.speed = 0.0
            self.done = True


class _CrossingVehicle(ScenarioBehavior):
    """Vehicle crossing the ego path at a junction (base for 4, 7-10)."""

    APPROACH = 20.0
    SPEED = 6.0

    def setup(self, sim: ReplaySimulation) -> List[Actor]:
        tf = self._offset_transform(
            10.0, -self._param("approach", self.APPROACH), yaw_add=90.0)
        self._veh = Actor(actor_id=self.actor_id,
                          type_id="vehicle.crossing", transform=tf,
                          speed=0.0)
        return [self._veh]

    def on_trigger(self, sim: ReplaySimulation) -> None:
        v = self._actor(sim)
        if v is not None:
            v.speed = self._param("speed", self.SPEED)
            v.control.throttle = 0.7

    def behave(self, sim: ReplaySimulation, dt: float) -> None:
        v = self._actor(sim)
        if v is None or self.elapsed > 10.0:
            self.done = True
            return
        yaw = math.radians(v.transform.rotation.yaw)
        v.transform = Transform(
            Location(v.transform.location.x + v.speed * dt * math.cos(yaw),
                     v.transform.location.y + v.speed * dt * math.sin(yaw),
                     0.0), v.transform.rotation)


class VehicleTurningRoute(_CrossingVehicle):
    SPEED = 4.0


class OtherLeadingVehicle(FollowLeadingVehicle):
    """Scenario5: leading vehicle decelerates abruptly."""

    def behave(self, sim: ReplaySimulation, dt: float) -> None:
        lead = self._actor(sim)
        if lead is None:
            self.done = True
            return
        lead.speed = 6.0 if self.elapsed < 4.0 else 1.0
        yaw = math.radians(lead.transform.rotation.yaw)
        lead.transform = Transform(
            Location(lead.transform.location.x + lead.speed * dt
                     * math.cos(yaw),
                     lead.transform.location.y + lead.speed * dt
                     * math.sin(yaw), 0.0),
            lead.transform.rotation)


class ManeuverOppositeDirection(ScenarioBehavior):
    """Scenario6: oncoming vehicle briefly invades the ego lane."""

    def setup(self, sim: ReplaySimulation) -> List[Actor]:
        # srunner maneuver_opposite_direction.py: _first_vehicle_location=50
        tf = self._offset_transform(
            self._param("start_distance", 45.0), 0.0, yaw_add=180.0)
        self._veh = Actor(actor_id=self.actor_id, type_id="vehicle.oncoming",
                          transform=tf, speed=0.0)
        return [self._veh]

    def on_trigger(self, sim: ReplaySimulation) -> None:
        v = self._actor(sim)
        if v is not None:
            v.speed = self._param("speed", 7.0)

    def behave(self, sim: ReplaySimulation, dt: float) -> None:
        v = self._actor(sim)
        if v is None or self.elapsed > 8.0:
            self.done = True
            return
        yaw = math.radians(v.transform.rotation.yaw)
        v.transform = Transform(
            Location(v.transform.location.x + v.speed * dt * math.cos(yaw),
                     v.transform.location.y + v.speed * dt * math.sin(yaw),
                     0.0), v.transform.rotation)


class SignalJunctionCrossing(_CrossingVehicle):
    pass


class NoSignalJunctionCrossing(_CrossingVehicle):
    pass


BEHAVIOR_CLASSES = {
    "Scenario1": ControlLoss,
    "Scenario2": FollowLeadingVehicle,
    "Scenario3": DynamicObjectCrossing,
    "Scenario4": VehicleTurningRoute,
    "Scenario5": OtherLeadingVehicle,
    "Scenario6": ManeuverOppositeDirection,
    "Scenario7": SignalJunctionCrossing,
    "Scenario8": NoSignalJunctionCrossing,
    "Scenario9": NoSignalJunctionCrossing,
    "Scenario10": NoSignalJunctionCrossing,
}


def build_behaviors(scenario_configs: List[dict],
                    seed: int = 0) -> List[ScenarioBehavior]:
    behaviors: List[ScenarioBehavior] = []
    next_id = 1000
    for sc in scenario_configs:
        cls = BEHAVIOR_CLASSES.get(sc["scenario_type"])
        if cls is None:
            continue
        behaviors.append(cls(sc["trigger_position"], next_id, seed,
                             params=sc.get("other_parameters")))
        next_id += 1
    return behaviors
