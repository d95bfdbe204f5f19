"""Background traffic: light phases + car-following vehicles on the lane
graph.

Hermetic equivalent of CARLA's TrafficManager autopiloting the ~500
background vehicles of Longest6 (route_scenario_local.py:449-467) and of
the simulator's traffic-light state machines. Vehicles follow lane
centerlines, keep time-headway gaps behind leaders (including the ego),
stop for red lights at stop lines, and pick random turns at junctions.

Host-side numpy only.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..geometry import EgoModel, obb_corners, obb_intersect
from .replay import Actor, ReplaySimulation

# World-on-Rails bicycle-model constants for _steer_for_yaw_rate — hoisted
# to module scope (the per-call import + attribute walks ran once per
# moving managed vehicle per tick).
_STEER_EGO = EgoModel()
_STEER_REAR_WB = _STEER_EGO.rear_wb
_STEER_WB_SUM = _STEER_EGO.front_wb + _STEER_EGO.rear_wb
_STEER_GAIN = _STEER_EGO.steer_gain
from .town_map import TownMap, TrafficLightSpec
from .types import Location, Rotation, Transform, VehicleControl


class TrafficLightController:
    """Cycles every light group: phase-0 approaches green while phase-1 red,
    with yellow + all-red interphases; then swap."""

    def __init__(self, town_map: TownMap, green: float = 10.0,
                 yellow: float = 2.0, all_red: float = 1.0):
        self.map = town_map
        self.green = green
        self.yellow = yellow
        self.all_red = all_red
        self.period = 2.0 * (green + yellow + all_red)
        self.t = 0.0

    def state(self, light: TrafficLightSpec) -> str:
        t = self.t % self.period
        if light.phase == 1:
            t = (t + self.period / 2.0) % self.period
        if t < self.green:
            return "Green"
        if t < self.green + self.yellow:
            return "Yellow"
        return "Red"

    def step(self, dt: float) -> None:
        self.t += dt

    def apply_to_actors(self, actors_by_light: Dict[int, Actor]) -> None:
        for light in self.map.traffic_lights:
            actor = actors_by_light.get(light.light_id)
            if actor is not None:
                actor.state = self.state(light)


@dataclass
class ManagedVehicle:
    actor: Actor
    lane_id: int
    s: float
    target_speed: float
    next_lane: Optional[int] = None  # chosen successor (persists per lane)
    speed: float = 0.0
    blocked_time: float = 0.0  # seconds stuck behind a stationary leader
    back_off: float = 0.0  # meters left to reverse out of an interlock
    hold: bool = False  # after a backoff: wait for the blocker to move
    hold_time: float = 0.0  # seconds spent in the current hold


class TrafficManager:
    """Steps managed vehicles with an IDM-lite follower model."""

    ACCEL = 2.0         # m/s^2
    BRAKE = 4.5
    MIN_GAP = 5.0       # bumper gap at standstill
    HEADWAY = 1.2       # seconds
    LOOKAHEAD = 40.0    # meters for leader/light search
    SWEEP_HALF_WIDTH = 1.5  # half-width of the corridor a lane-following
    #                         vehicle sweeps (body 1.06 + margin)

    def __init__(self, town_map: TownMap, seed: int = 0,
                 controller: Optional[TrafficLightController] = None):
        self.map = town_map
        self._rng = np.random.default_rng(seed)
        self.controller = controller
        self.vehicles: List[ManagedVehicle] = []
        # light_id -> Actor: set by the scenario that materialized light
        # actors; step() keeps their .state in sync with the controller.
        self.light_actors: Dict[int, Actor] = {}
        # lane -> preferred predecessor (non-junction approach first):
        # the lane a junction-interlocked vehicle reverses back onto.
        self._preds: Dict[int, int] = {}
        for lane in town_map.lanes.values():
            for succ in lane.successors:
                cur = self._preds.get(int(succ))
                if cur is None or (self.map.lanes[cur].is_junction
                                   and not lane.is_junction):
                    self._preds[int(succ)] = lane.lane_id

    # ------------------------------------------------------------- spawning
    def spawn(self, n: int, first_actor_id: int = 2000,
              avoid_xy: Optional[Tuple[float, float]] = None,
              avoid_radius: float = 15.0) -> List[Actor]:
        """Place up to n vehicles on spawn points ("use all spawn points",
        route_scenario_local.py:449-467); returns the created actors."""
        points = self.map.spawn_points()
        self._rng.shuffle(points)
        actors: List[Actor] = []
        for lane_id, s in points:
            if len(actors) >= n:
                break
            xy, yaw = self.map.lanes[lane_id].position(s)
            if avoid_xy is not None and math.hypot(
                    xy[0] - avoid_xy[0], xy[1] - avoid_xy[1]) < avoid_radius:
                continue
            actor = Actor(
                actor_id=first_actor_id + len(actors),
                type_id="vehicle.background",
                transform=Transform(Location(float(xy[0]), float(xy[1])),
                                    Rotation(yaw=yaw)))
            mv = ManagedVehicle(
                actor=actor, lane_id=lane_id, s=s,
                target_speed=float(self.map.lanes[lane_id].speed_limit
                                   * self._rng.uniform(0.65, 0.95)))
            self._choose_next(mv)
            self.vehicles.append(mv)
            actors.append(actor)
        return actors

    def _choose_next(self, mv: ManagedVehicle) -> None:
        succ = self.map.lanes[mv.lane_id].successors
        mv.next_lane = (int(succ[int(self._rng.integers(0, len(succ)))])
                        if succ else None)

    # ------------------------------------------------------------- stepping
    def step(self, sim: ReplaySimulation, dt: float) -> None:
        if self.controller is not None:
            self.controller.step(dt)
            self.controller.apply_to_actors(self.light_actors)

        # index every road user by lane for leader lookup
        occupancy: Dict[int, List[Tuple[float, float]]] = {}
        managed_ids = set()
        for mv in self.vehicles:
            occupancy.setdefault(mv.lane_id, []).append(
                (mv.s, mv.actor.extent.x, mv.speed))
            managed_ids.add(mv.actor.actor_id)

        # Non-managed road users — the EGO, crossing walkers (Scenario3/4)
        # and scripted scenario adversaries — occupy EVERY lane they
        # overlap (a vehicle stopped inside a junction straddles several
        # connector lanes), so background cars brake for them instead of
        # driving through (CARLA TM's collision detection covers all
        # registered actors).
        occ_cache = getattr(self, "_occ_cache", None)
        if occ_cache is None:
            occ_cache = self._occ_cache = {}

        def occupy(key: int, x: float, y: float, ext_x: float, ext_y: float,
                   yaw_deg: float, speed: float) -> None:
            # Project the actor's ORIENTED box onto each nearby lane: a
            # lane-aligned car only claims its own lane (lateral half
            # extent = half width), a perpendicular crossing car claims
            # what its length actually sweeps. A symmetric max(x, y)
            # footprint made one parked adversary block both lanes of a
            # two-lane road.
            # Lane geometry is static, so the (lane, s, half_s) set is a
            # pure function of the actor's pose — cached while the actor
            # stands still (parked adversaries and waiting walkers
            # dominated TrafficManager.step's profile; only the entry
            # SPEED is refreshed on a cache hit).
            cached = occ_cache.get(key)
            if cached is not None and cached[0] == (x, y, yaw_deg):
                for lane_id, s, half_s in cached[1]:
                    occupancy.setdefault(lane_id, []).append(
                        (s, half_s, speed))
                return
            entries: List[Tuple[int, float, float]] = []
            for lane in self.map.lanes_near(x, y, radius=2.0 * 3.5):
                s, lat = lane.project(x, y)
                cx, cy, lane_yaw = lane.position_f(s)
                d = math.radians(yaw_deg - lane_yaw)
                c, sn = abs(math.cos(d)), abs(math.sin(d))
                half_lat = c * ext_y + sn * ext_x
                half_s = c * ext_x + sn * ext_y
                # Block the lane only if the actor's box TRULY overlaps
                # the corridor a centerline-driving vehicle sweeps (body
                # half-width + margin), not the full paved width: an ego
                # whose corner grazes a connector's edge must not freeze
                # the car turning through it (mutual ego<->TM standoffs
                # at junction entries were the #1 agent-blocked cause at
                # Longest6 density). Cheap projected-extent reject
                # first; exact OBB-vs-corridor SAT on the borderline.
                if abs(lat) <= self.SWEEP_HALF_WIDTH + half_lat:
                    corridor = obb_corners(
                        np.array([cx, cy]), np.array([half_s + 1.0, 1.26]),
                        math.radians(lane_yaw))
                    box = obb_corners(
                        np.array([x, y]),
                        np.array([ext_x + 0.2, ext_y + 0.2]),
                        math.radians(yaw_deg))
                    if obb_intersect(corridor, box):
                        entries.append((lane.lane_id, s, half_s))
            occ_cache[key] = ((x, y, yaw_deg), entries)
            for lane_id, s, half_s in entries:
                occupancy.setdefault(lane_id, []).append((s, half_s, speed))

        occupy(-1, sim.ego_transform.location.x,
               sim.ego_transform.location.y,
               sim.ego_extent.x, sim.ego_extent.y,
               sim.ego_transform.rotation.yaw, sim.ego_speed)
        for actor in sim.actors:
            t = actor.type_id
            if actor.actor_id in managed_ids or not (
                    t.startswith("vehicle") or t.startswith("walker")):
                continue
            occupy(actor.actor_id, actor.transform.location.x,
                   actor.transform.location.y,
                   float(actor.extent.x), float(actor.extent.y),
                   actor.transform.rotation.yaw, float(actor.speed))

        self.last_occupancy = occupancy  # introspection (debug tooling)

        for mv in self.vehicles:
            desired = mv.target_speed
            gap, lead_spd = self._leader_gap(mv, occupancy)
            if gap is not None:
                # IDM-lite: brake to keep headway
                safe = self.MIN_GAP + mv.speed * self.HEADWAY
                if gap < safe:
                    desired = 0.0 if gap < self.MIN_GAP else \
                        mv.speed * (gap - self.MIN_GAP) / max(
                            safe - self.MIN_GAP, 1e-3)
            # Auto lane change around long-stationary blockers (CARLA
            # TM's lane-change behavior): without it a single parked
            # scenario adversary necroses its road and gridlocks the
            # town — queues behind it never drain.
            if gap is not None and gap < self.MIN_GAP + 0.5:
                if mv.speed < 0.3:
                    mv.blocked_time += dt
                if mv.blocked_time > 4.0 \
                        and self._try_lane_change(mv, occupancy):
                    gap, lead_spd = self._leader_gap(mv, occupancy)
                    desired = mv.target_speed
            else:
                mv.blocked_time = 0.0

            # A held vehicle resumes once its blocker moves or clears.
            if mv.hold:
                mv.hold_time += dt
                if gap is None or gap >= self.MIN_GAP or lead_spd > 1.0:
                    mv.hold = False
                    mv.hold_time = 0.0

            # Junction interlock BACKOFF: a vehicle wedged inside a
            # junction behind a STATIONARY blocker (usually the ego
            # stopped at an entry whose corner clips this connector, or
            # a jammed exit queue — the push-through's gap > 0.3 guard
            # can never fire) reverses along its connector — across the
            # lane boundary, back onto the approach road if need be —
            # to reopen the crossing, then HOLDS until the blocker
            # moves. Real drivers back out of an interlocked box;
            # without this the standoff outlasts the 180 s blocked
            # criterion (routes 8/25/35 of the Longest6-scale artifact
            # all ended exactly this way: a connector car at d<6 m
            # blocked ~178 s in front of the stalled ego). A hold that
            # stagnates mid-junction (still <4 m of space after the
            # first 6 m budget) re-arms and keeps reversing.
            on_junction = self.map.lanes[mv.lane_id].is_junction
            if (mv.back_off <= 0.0 and gap is not None and on_junction
                    and lead_spd < 1.0
                    and ((mv.blocked_time > 12.0 and gap <= 0.5)
                         or (mv.hold and mv.hold_time > 15.0
                             and gap < 4.0))):
                mv.back_off = 6.0
                mv.hold = False
                mv.hold_time = 0.0
            if mv.back_off > 0.0:
                if gap is None or gap >= 4.0:
                    mv.back_off = 0.0
                    mv.hold = True
                    mv.blocked_time = 0.0
                else:
                    rear = self._rear_gap(mv, occupancy)
                    step_d = min(1.2 * dt, mv.back_off,
                                 max(rear - 1.0, 0.0))
                    s_new = mv.s - step_d
                    if s_new < 0.05 and on_junction:
                        # reverse across the boundary onto the approach
                        # lane (evacuating the junction box) when its
                        # tail is clear; re-enter this connector later.
                        pred = self._preds.get(mv.lane_id)
                        plen = (self.map.lanes[pred].length
                                if pred is not None else 0.0)
                        tail_clear = pred is not None and all(
                            s_o + half < plen - 8.0
                            for s_o, half, _spd in
                            occupancy.get(pred, ()))
                        if tail_clear:
                            mv.next_lane = mv.lane_id
                            mv.lane_id = int(pred)
                            s_new = max(plen + s_new, 0.0)
                        else:
                            step_d = max(mv.s - 0.05, 0.0)
                            s_new = mv.s - step_d
                    elif s_new < 0.05:
                        step_d = max(mv.s - 0.05, 0.0)
                        s_new = mv.s - step_d
                    if step_d <= 1e-9:
                        mv.back_off = 0.0  # boxed in; at least stop
                        mv.hold = True     # pushing into the wedge
                        mv.blocked_time = 0.0
                    else:
                        mv.back_off -= step_d
                        if mv.back_off <= 1e-9:
                            mv.back_off = 0.0
                            mv.hold = True
                            mv.blocked_time = 0.0
                        mv.s = s_new
                        mv.speed = 0.0
                        px, py, yaw = self.map.lanes[mv.lane_id].position_f(
                            mv.s)
                        mv.actor.transform = Transform(
                            Location(px, py), Rotation(yaw=yaw))
                        mv.actor.speed = 0.0
                        mv.actor.control = VehicleControl(brake=1.0)
                        continue
            dist_red = self._red_light_distance(mv)
            if dist_red is None:
                # Junction admission: treat a blocked junction ahead like
                # a red light at the stop line. A vehicle only enters a
                # connector that is empty (one at a time — and the EGO's
                # occupancy counts, so background traffic yields to an
                # ego mid-junction) and whose exit has standing room;
                # stopping INSIDE a junction is what gridlocks dense
                # towns (CARLA TM's equivalent junction management).
                dist_red = self._junction_entry_stop(mv, occupancy)
            if dist_red is not None:
                # comfortable stop at the line: v^2 <= 2 b d
                v_allow = math.sqrt(max(
                    2.0 * self.BRAKE * max(dist_red - 1.0, 0.0), 0.0))
                desired = min(desired, v_allow if dist_red > 1.0 else 0.0)

            # Junction push-through: a vehicle wedged INSIDE a junction
            # behind a stationary GRAZE (occupancy overlap with real
            # physical room left) noses past at walking speed after a
            # few seconds instead of deadlocking. The classic standoff:
            # the ego stops at an entry waiting for a turning car whose
            # connector exit the ego's corner clips — each would wait on
            # the other forever (the blocked criterion fires at 180 s).
            if (mv.blocked_time > 6.0 and gap is not None and gap > 0.3
                    and not mv.hold
                    and self.map.lanes[mv.lane_id].is_junction):
                desired = max(desired, 1.2)

            if mv.speed < desired:
                mv.speed = min(mv.speed + self.ACCEL * dt, desired)
            else:
                mv.speed = max(mv.speed - self.BRAKE * dt, desired, 0.0)

            yaw_before = mv.actor.transform.rotation.yaw
            self._advance(mv, mv.speed * dt)
            px, py, yaw = self.map.lanes[mv.lane_id].position_f(mv.s)
            mv.actor.transform = Transform(
                Location(px, py), Rotation(yaw=yaw))
            mv.actor.speed = mv.speed
            # privileged dynamic state for the expert's forecasting:
            # publish the steering a bicycle model would need to produce
            # the observed yaw rate, so forecasts curve through junctions
            # the way the vehicle actually will instead of extrapolating
            # straight across the ego's path (submission_agent forecasts
            # other vehicles under their current control).
            steer = 0.0
            if mv.speed > 0.5 and dt > 0.0:
                dyaw = math.radians(
                    (yaw - yaw_before + 540.0) % 360.0 - 180.0) / dt
                steer = self._steer_for_yaw_rate(dyaw, mv.speed)
            mv.actor.control = VehicleControl(
                throttle=0.75 if mv.speed < desired - 0.1 else 0.0,
                brake=1.0 if (desired < 0.1 and mv.speed < 0.5) else 0.0,
                steer=steer)

    def _advance(self, mv: ManagedVehicle, dist: float) -> None:
        lane = self.map.lanes[mv.lane_id]
        s = mv.s + dist
        guard = 0
        while s > lane.length and guard < 10:
            if mv.next_lane is None:
                s = lane.length
                break
            s -= lane.length
            mv.lane_id = mv.next_lane
            lane = self.map.lanes[mv.lane_id]
            self._choose_next(mv)
            guard += 1
        mv.s = s

    def _chain(self, mv: ManagedVehicle) -> List[int]:
        chain = [mv.lane_id]
        if mv.next_lane is not None:
            chain.append(mv.next_lane)
            nxt = self.map.lanes[mv.next_lane].successors
            if nxt:
                chain.append(nxt[0])
        return chain

    def _leader_gap(self, mv: ManagedVehicle,
                    occupancy: Dict[int, List[Tuple[float, float]]]
                    ) -> Tuple[Optional[float], float]:
        """(bumper distance, speed) of the closest road user ahead on this
        vehicle's lane chain within LOOKAHEAD; (None, 0.0) when clear."""
        base = -mv.s  # arclength offset of each chain lane's origin
        best: Optional[float] = None
        best_spd = 0.0
        lanes = self.map.lanes
        lookahead = self.LOOKAHEAD
        ext_x = mv.actor.extent.x
        occ_get = occupancy.get
        for li, lid in enumerate(self._chain(mv)):
            for s_o, half_len, spd in occ_get(lid, ()):
                ahead = base + s_o
                if li == 0 and ahead <= 1e-6:
                    continue  # behind us on our own lane (or ourselves)
                if 0.0 < ahead <= lookahead:
                    gap = ahead - half_len - ext_x
                    if best is None or gap < best:
                        best = gap
                        best_spd = float(spd)
            base += lanes[lid].length
            if base > lookahead:
                break
        return best, best_spd

    def _rear_gap(self, mv: ManagedVehicle,
                  occupancy: Dict[int, List[Tuple[float, float]]]
                  ) -> float:
        """Bumper clearance to the closest road user BEHIND on this
        vehicle's own lane (inf when clear) — bounds how far a backoff
        may reverse without hitting the queue behind."""
        best = math.inf
        for s_o, half_len, _spd in occupancy.get(mv.lane_id, ()):
            behind = mv.s - s_o
            if behind <= 1e-6:
                continue  # ahead of us, or ourselves
            best = min(best, behind - half_len - mv.actor.extent.x)
        return best

    def _try_lane_change(self, mv: ManagedVehicle,
                         occupancy: Dict[int, List[Tuple[float, float]]]
                         ) -> bool:
        """Move to a same-direction adjacent lane whose corresponding
        stretch is free; True on success. Occupancy includes the ego and
        external actors, so a change never lands on (or right in front
        of) them."""
        lane = self.map.lanes[mv.lane_id]
        x, y = (mv.actor.transform.location.x,
                mv.actor.transform.location.y)
        for nb in (lane.left_neighbor, lane.right_neighbor):
            if nb is None or nb not in self.map.lanes:
                continue
            nb_lane = self.map.lanes[nb]
            if nb_lane.is_junction:
                continue
            s, _ = nb_lane.project(x, y)
            back = 2.0 * mv.actor.extent.x + self.MIN_GAP
            fwd = back + self.MIN_GAP
            clear = all(s_o + half < s - back or s_o - half > s + fwd
                        for s_o, half, _spd in occupancy.get(nb, ()))
            if clear:
                mv.lane_id = int(nb)
                mv.s = min(s, nb_lane.length)
                self._choose_next(mv)
                mv.blocked_time = 0.0
                return True
        return False

    def _junction_entry_stop(self, mv: ManagedVehicle,
                             occupancy: Dict[int, List[Tuple[float, float]]]
                             ) -> Optional[float]:
        """Distance to the junction entry line when the connector ahead
        must not be entered yet (occupied, or exit lacks standing room);
        None when entry is allowed or no junction is ahead."""
        lane = self.map.lanes[mv.lane_id]
        if lane.is_junction or mv.next_lane is None:
            return None
        dist = lane.length - mv.s
        if dist > self.LOOKAHEAD:
            return None
        conn = self.map.lanes[mv.next_lane]
        if not conn.is_junction:
            return None
        for _s_o, _half, spd in occupancy.get(mv.next_lane, ()):
            if spd < 1.0:
                # a (near-)stationary occupant — possibly a stopped ego
                # — means entering would strand this car inside too;
                # MOVING occupants are fine to follow (platooning
                # through junctions keeps throughput at CARLA-TM levels;
                # strict one-at-a-time entry let queues outlast the
                # evaluator's 180 s blocked criterion)
                return dist
        succ = conn.successors
        if succ:
            need = 2.0 * mv.actor.extent.x + self.MIN_GAP
            for s_o, half, _spd in occupancy.get(int(succ[0]), ()):
                if s_o - half < need:
                    return dist  # exit lane has no standing room
        return None

    def _steer_for_yaw_rate(self, yaw_rate: float, speed: float) -> float:
        """Invert the World-on-Rails bicycle model: the steer action that
        yields `yaw_rate` at `speed` (so expert forecasts of this vehicle
        follow its actual curved path)."""
        sin_beta = max(-0.99, min(0.99, yaw_rate * _STEER_REAR_WB / speed))
        beta = math.asin(sin_beta)
        tan_wheel = math.tan(beta) * _STEER_WB_SUM / _STEER_REAR_WB
        steer = math.atan(tan_wheel) / _STEER_GAIN
        return max(-1.0, min(1.0, steer))

    def _red_light_distance(self, mv: ManagedVehicle) -> Optional[float]:
        """Distance to the stop line of a non-green light governing the
        current lane (None when clear). Junction connectors inherit their
        approach light, so a vehicle already inside keeps moving."""
        if self.controller is None:
            return None
        lane = self.map.lanes[mv.lane_id]
        if lane.is_junction:
            return None  # committed to the junction
        light = self.map.light_for_lane(mv.lane_id)
        if light is None:
            return None
        if self.controller.state(light) == "Green":
            return None
        dist = lane.length - mv.s
        return dist if dist <= self.LOOKAHEAD else None
