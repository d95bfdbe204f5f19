"""Hermetic simulation backend.

Stands in for the CARLA server + TCP client (SURVEY.md §2.10): the same
harness/agent stack runs against either this backend or a live CARLA
adapter. Two modes:

  * synthetic: ego integrates a kinematic bicycle model; sensors return
    procedurally generated frames; scripted NPC actors follow waypoint
    tracks. Enough to exercise the full evaluator/criteria/scoring path
    end-to-end without the 10 GB simulator.
  * replay: sensor dicts recorded from a real run are replayed frame by
    frame (agent-behavior golden tests).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..geometry import EgoModel
from .types import BoundingBox, Location, Rotation, Transform, VehicleControl


class _LazyFrame(dict):
    """Sensor-frame dict whose expensive entries (cameras, lidar) are
    synthesized on first __getitem__ — agents that never read them never
    pay for the synthesis."""

    def __init__(self, base: Dict[str, Any], lazy: Dict[str, Any]):
        super().__init__(base)
        self._lazy = lazy

    def __getitem__(self, key):
        if not dict.__contains__(self, key) and key in self._lazy:
            self[key] = self._lazy[key]()
        return dict.__getitem__(self, key)

    def __contains__(self, key):
        return super().__contains__(key) or key in self._lazy


@dataclass
class Actor:
    actor_id: int
    type_id: str  # "vehicle.*" | "walker.*" | "static.*" | "traffic_light"
    transform: Transform
    extent: Location = field(default_factory=lambda: Location(2.45, 1.06, 0.75))
    speed: float = 0.0
    # scripted path: list of (x, y, yaw_deg) followed at `speed`
    track: Optional[List[Tuple[float, float, float]]] = None
    state: str = "Green"  # for traffic lights
    trigger_extent: float = 5.0
    # privileged dynamic state the expert reads (autopilot.py:560-670)
    control: VehicleControl = field(default_factory=VehicleControl)
    direction: Tuple[float, float, float] = (1.0, 0.0, 0.0)  # walkers
    # traffic-light / stop-sign trigger volume (local offset + half extents)
    trigger_location: Location = field(default_factory=Location)
    trigger_box: Location = field(default_factory=lambda: Location(2.0, 2.0, 2.0))

    def location(self) -> Location:
        return self.transform.location


class ReplaySimulation:
    """World + ego + sensors, stepped synchronously at a fixed rate."""

    def __init__(self, trajectory: Sequence[Transform], fps: int = 20,
                 actors: Optional[List[Actor]] = None,
                 recorded_frames: Optional[List[Dict[str, Any]]] = None,
                 seed: int = 0,
                 camera_shape: Tuple[int, int] = (480, 960),
                 lidar_points: int = 2000,
                 junction_fn=None,
                 gnss_noise: Optional[Dict[str, float]] = None,
                 imu_noise: Optional[Dict[str, float]] = None,
                 lidar_dropoff: float = 0.0,
                 town_map=None):
        self.fps = fps
        self.dt = 1.0 / fps
        self.frame = 0
        self.game_time = 0.0
        self.trajectory = list(trajectory)
        self.actors: List[Actor] = actors or []
        self.recorded = recorded_frames
        self._rng = np.random.default_rng(seed)
        self._camera_shape = camera_shape
        self._lidar_points = lidar_points
        self._ego_model = EgoModel(dt=self.dt)

        start = self.trajectory[0]
        self.ego_transform = Transform(
            Location(start.location.x, start.location.y, start.location.z),
            Rotation(yaw=start.rotation.yaw))
        self.ego_speed = 0.0
        self.ego_extent = Location(2.4508416652679443, 1.0641621351242065,
                                   0.7553732395172119)
        self._last_control = VehicleControl()
        self.applied_control = VehicleControl()
        self.collision_events: List[Actor] = []
        self._junction_fn = junction_fn
        # Pinned leaderboard sensor noise profiles
        # (agent_wrapper_local.py:125-184): applied by the backend's sensor
        # synthesis, so GPS denoising / lidar robustness are exercised.
        self._gnss_noise = gnss_noise
        self._imu_noise = imu_noise
        self._lidar_dropoff = float(lidar_dropoff)
        # ControlLoss-style in-sim actuation perturbation (one tick each).
        self._steer_perturbation = 0.0
        self.town_map = town_map
        # camera render cache: {sensor_id: (frame, data)}; frames
        # re-render every `camera_refresh` ticks. 2 = one render per
        # compute frame (action-repeat 2): eval agents see <=0.1 s-stale
        # frames; datagen pays nothing extra (sensor delivery is lazy and
        # the DataAgent's weather shuffle clears the cache per save).
        self.camera_refresh = 2
        self._camera_cache: Dict[str, Tuple[int, Any]] = {}
        # raw (sem, depth) renders shared across the rgb/semantic/depth
        # sensors mounted at one pose: {pose_key: (frame, sem, depth)}
        self._pose_render_cache: Dict[Tuple, Tuple[int, Any, Any]] = {}
        self._camera_objs: Dict[Tuple, Any] = {}
        # weather state applied by the sensor synthesis (DataAgent's
        # shuffle_weather, data_agent.py:222-242)
        self.weather = {"weather": "Clear", "daytime": "Noon"}
        # Optional sim.traffic.TrafficManager: stepped inside tick() so
        # background vehicles + light phases advance with the world.
        self.traffic = None

    def set_weather(self, setting: Dict[str, str]) -> None:
        self.weather = dict(setting)
        self._camera_cache.clear()  # re-render under the new conditions
        self._pose_render_cache.clear()

    def is_junction(self, location: Location) -> bool:
        """Map query stand-in (the live adapter asks the OpenDRIVE map)."""
        if self.town_map is not None:
            return bool(self.town_map.is_junction(location.x, location.y))
        if self._junction_fn is None:
            return False
        return bool(self._junction_fn(location))

    # -------------------------------------------------------------- control
    def apply_control(self, control: VehicleControl) -> None:
        self._last_control = control.clipped()

    def perturb_steer(self, delta: float) -> None:
        """Add an actuation-level steering perturbation for the next tick
        (ControlLoss scenario; replaces mutating the agent's control)."""
        self._steer_perturbation += float(delta)

    def tick(self) -> int:
        c = self._last_control
        if self._steer_perturbation:
            c = VehicleControl(
                steer=float(np.clip(c.steer + self._steer_perturbation,
                                    -1.0, 1.0)),
                throttle=c.throttle, brake=c.brake)
            self._steer_perturbation = 0.0
        self.applied_control = c
        loc = np.array([self.ego_transform.location.x,
                        self.ego_transform.location.y])
        yaw = np.array([math.radians(self.ego_transform.rotation.yaw)])
        spd = np.array([self.ego_speed])
        act = np.array([c.steer, c.throttle, float(c.brake > 0.5)])
        nloc, nyaw, nspd = self._ego_model.forward(loc, yaw, spd, act)
        self.ego_transform = Transform(
            Location(float(nloc[0]), float(nloc[1]),
                     self.ego_transform.location.z),
            Rotation(yaw=math.degrees(float(np.ravel(nyaw)[0]))))
        self.ego_speed = float(np.ravel(nspd)[0])

        self._advance_actors()
        if self.traffic is not None:
            self.traffic.step(self, self.dt)
        self._detect_collisions()
        self.frame += 1
        self.game_time += self.dt
        return self.frame

    def _advance_actors(self) -> None:
        for actor in self.actors:
            if actor.track:
                tgt_idx = min(int(self.game_time * actor.speed),
                              len(actor.track) - 1)
                x, y, yaw = actor.track[tgt_idx]
                actor.transform = Transform(Location(x, y),
                                            Rotation(yaw=yaw))
            elif actor.type_id.startswith("walker") and actor.speed > 0:
                # walkers integrate their control direction
                loc = actor.transform.location
                actor.transform = Transform(
                    Location(loc.x + actor.direction[0] * actor.speed * self.dt,
                             loc.y + actor.direction[1] * actor.speed * self.dt,
                             loc.z),
                    actor.transform.rotation)

    def _detect_collisions(self) -> None:
        from ..geometry import obb_corners, obb_intersect
        ex = self.ego_transform.location.x
        ey = self.ego_transform.location.y
        ego_r = math.hypot(self.ego_extent.x, self.ego_extent.y)
        ego_c = obb_corners(
            np.array([ex, ey]),
            np.array([self.ego_extent.x, self.ego_extent.y]),
            math.radians(self.ego_transform.rotation.yaw))
        self.collision_events = []
        for actor in self.actors:
            if actor.type_id.startswith("traffic_light"):
                continue
            # circumscribed-circle reject: boxes further apart than the
            # sum of their half-diagonals cannot intersect (full SAT on
            # every actor every tick dominated dense-traffic runs)
            dx = actor.transform.location.x - ex
            dy = actor.transform.location.y - ey
            r = ego_r + math.hypot(actor.extent.x, actor.extent.y)
            if dx * dx + dy * dy > r * r:
                continue
            a_c = obb_corners(
                np.array([actor.transform.location.x,
                          actor.transform.location.y]),
                np.array([actor.extent.x, actor.extent.y]),
                math.radians(actor.transform.rotation.yaw))
            if obb_intersect(ego_c, a_c):
                self.collision_events.append(actor)

    # -------------------------------------------------------------- sensors
    def sensor_frame(self) -> Dict[str, Any]:
        """Raw data for the current frame, keyed by canonical sensor kind.

        Camera and lidar synthesis is LAZY — materialized on first
        access, so agents whose sensor suite omits them (the privileged
        expert uses only imu/gnss/speed) never pay for it. Synthesizing
        three unread camera frames per tick was ~25% of dense-traffic
        benchmark wall-clock."""
        if self.recorded is not None:
            idx = min(self.frame, len(self.recorded) - 1)
            return self.recorded[idx]
        h, w = self._camera_shape

        def make_rgb():
            return self._rng.integers(0, 255, (h, w, 3), dtype=np.uint8)

        def make_lidar():
            from .sensors import rain_dropoff, synth_lidar
            lidar = synth_lidar(self, ground_points=self._lidar_points,
                                rng=self._rng)
            dropoff = self._lidar_dropoff + rain_dropoff(self.weather)
            if dropoff > 0.0:
                # eval-profile general dropoff (agent_wrapper_local.py:
                # 133-138) plus atmospheric attenuation under rain presets
                keep = self._rng.random(lidar.shape[0]) >= dropoff
                lidar = lidar[keep]
            return lidar

        frame = _LazyFrame({
            "gps": self._gps(),
            "imu": self._imu(),
            "speed": {"speed": self.ego_speed},
        }, {"rgb": make_rgb, "rgb_left": make_rgb, "rgb_right": make_rgb,
            "lidar": make_lidar})
        return frame

    def _imu(self) -> np.ndarray:
        imu = np.array([0, 0, 9.81, 0, 0, 0,
                        math.radians(self.ego_transform.rotation.yaw)
                        + math.pi / 2.0], np.float64)
        if self._imu_noise:
            n = self._imu_noise
            imu[:6] += self._rng.normal(0.0, [
                n.get("noise_accel_stddev_x", 0.0),
                n.get("noise_accel_stddev_y", 0.0),
                n.get("noise_accel_stddev_z", 0.0),
                n.get("noise_gyro_stddev_x", 0.0),
                n.get("noise_gyro_stddev_y", 0.0),
                n.get("noise_gyro_stddev_z", 0.0)])
        return imu

    def _gps(self) -> np.ndarray:
        # CARLA 9.10 convention: lat ~ -y, lon ~ x (route_manipulation.py).
        from ..control.route_planner import GPS_CARLA_SCALE
        lat = -self.ego_transform.location.y / GPS_CARLA_SCALE[0]
        lon = self.ego_transform.location.x / GPS_CARLA_SCALE[1]
        gps = np.array([lat, lon, 0.0])
        if self._gnss_noise:
            n = self._gnss_noise
            gps += self._rng.normal(0.0, [
                n.get("noise_lat_stddev", 0.0),
                n.get("noise_lon_stddev", 0.0),
                n.get("noise_alt_stddev", 0.0)])
        return gps

    # -------------------------------------------------------------- cameras
    def render_camera(self, spec: Dict[str, Any], kind: str) -> np.ndarray:
        """Synthesize a camera frame for a declared sensor spec.

        kind: 'semantic' -> (H, W, 1) raw CARLA class ids, 'depth' ->
        (H, W, 3) 24-bit RGB encoding, 'rgb' -> (H, W, 3) palette render.
        Frames are cached and re-rendered every `camera_refresh` ticks.
        """
        from .sensors import (PinholeCamera, encode_depth_rgb,
                              semantic_to_rgb)
        key = f"{spec.get('id', '?')}:{kind}"
        cached = self._camera_cache.get(key)
        if cached is not None and self.frame - cached[0] < self.camera_refresh:
            return cached[1]
        # The raw (semantic, depth) render is shared across modalities of
        # the same camera pose: the datagen rig declares rgb/semantics/
        # depth as THREE sensors per mount point, which tripled the
        # renders before this cache.
        pose_key = (spec.get("x", 1.3), spec.get("y", 0.0),
                    spec.get("z", 2.3), spec.get("yaw", 0.0),
                    spec.get("width", 320), spec.get("height", 160),
                    spec.get("fov", 60))
        pose_hit = self._pose_render_cache.get(pose_key)
        if pose_hit is not None \
                and self.frame - pose_hit[0] < self.camera_refresh:
            sem, depth = pose_hit[1], pose_hit[2]
        else:
            cam = self._camera_objs.get(pose_key)
            if cam is None:
                # camera objects carry precomputed static geometry
                # (ray grid, ground-plane hits) — build once per pose
                cam = PinholeCamera.from_spec(spec)
                self._camera_objs[pose_key] = cam
            sem, depth = cam.render(self)
            self._pose_render_cache[pose_key] = (self.frame, sem, depth)
        if kind == "semantic":
            # CARLA's semantic camera is state-blind: every light pixel is
            # class 18 regardless of bulb color or viewing side. The
            # rasterizer's internal state ids (23/24) and housing id (25)
            # exist for the rgb palette render only; datagen re-adds state
            # to the LABELS with privileged access (DataAgent._change_seg_tl,
            # reference data_agent.py:562-581).
            from .sensors import TL_BACK, TL_RED, TL_YELLOW, TRAFFIC_LIGHT
            raw = sem.copy()
            raw[(raw == TL_RED) | (raw == TL_YELLOW) | (raw == TL_BACK)] \
                = TRAFFIC_LIGHT
            data = raw[..., None]
        elif kind == "depth":
            data = encode_depth_rgb(depth)
        else:
            data = semantic_to_rgb(sem, self._rng, weather=self.weather)
        self._camera_cache[key] = (self.frame, data)
        return data

    # ------------------------------------------------------------ inspection
    def ego_location(self) -> Location:
        return self.ego_transform.location

    def actors_of_type(self, prefix: str) -> List[Actor]:
        return [a for a in self.actors if a.type_id.startswith(prefix)]
