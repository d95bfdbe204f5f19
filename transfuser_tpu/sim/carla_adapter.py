"""Live CARLA server adapter.

The framework's agent/harness stack talks to the ReplaySimulation API
(sim/replay.py). This adapter implements the same surface against a real
CARLA 0.9.10 server over its TCP RPC (the reference's client boundary,
leaderboard_evaluator_local.py:79-85), so closed-loop Longest6 evaluation
runs unchanged when the simulator + carla egg are available.

Gated import: everything degrades to a clear error message without the egg
(this container has no CARLA; the hermetic backend covers CI/tests).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np

from .replay import Actor
from .types import Location, Rotation, Transform, VehicleControl


def carla_available() -> bool:
    try:
        import carla  # noqa: F401
        return True
    except ImportError:
        return False


class CarlaSimulation:
    """ReplaySimulation-compatible facade over a live CARLA world."""

    def __init__(self, host: str = "localhost", port: int = 2000,
                 town: str = "Town01", fps: int = 20,
                 traffic_manager_port: int = 8000):
        if not carla_available():
            raise RuntimeError(
                "carla egg not importable — install the CARLA 0.9.10 "
                "PythonAPI or use the hermetic ReplaySimulation backend")
        import carla

        self._carla = carla
        self.client = carla.Client(host, port)
        self.client.set_timeout(60.0)
        self.world = self.client.load_world(town)
        settings = self.world.get_settings()
        settings.synchronous_mode = True
        settings.fixed_delta_seconds = 1.0 / fps
        self.world.apply_settings(settings)
        self.tm = self.client.get_trafficmanager(traffic_manager_port)
        self.tm.set_synchronous_mode(True)

        self.fps = fps
        self.dt = 1.0 / fps
        self.frame = 0
        self.game_time = 0.0
        self.ego = None
        self._map = self.world.get_map()
        self._sensors: Dict[str, Any] = {}
        self._sensor_data: Dict[str, Any] = {}

    # --------------------------------------------------------------- spawn
    def spawn_ego(self, transform: Transform,
                  blueprint: str = "vehicle.lincoln.mkz2017") -> None:
        bp = self.world.get_blueprint_library().find(blueprint)
        bp.set_attribute("role_name", "hero")
        self.ego = self.world.spawn_actor(bp, self._to_carla_tf(transform))

    def attach_sensors(self, specs: List[Dict], callback) -> None:
        """Spawn agent-declared sensors on the ego; callback(tag, data)."""
        lib = self.world.get_blueprint_library()
        for spec in specs:
            stype = spec["type"]
            if stype in ("sensor.speedometer", "sensor.opendrive_map"):
                continue  # pseudo-sensors handled host-side
            bp = lib.find(stype)
            for attr in ("width", "height", "fov"):
                if attr in spec and bp.has_attribute(f"image_size_x"):
                    pass
            if stype == "sensor.camera.rgb":
                bp.set_attribute("image_size_x", str(spec.get("width", 800)))
                bp.set_attribute("image_size_y", str(spec.get("height", 600)))
                bp.set_attribute("fov", str(spec.get("fov", 90)))
            tf = self._carla.Transform(
                self._carla.Location(spec.get("x", 0.0), spec.get("y", 0.0),
                                     spec.get("z", 0.0)),
                self._carla.Rotation(spec.get("pitch", 0.0),
                                     spec.get("yaw", 0.0),
                                     spec.get("roll", 0.0)))
            sensor = self.world.spawn_actor(bp, tf, attach_to=self.ego)
            tag = spec["id"]
            sensor.listen(lambda data, t=tag: callback(t, data))
            self._sensors[tag] = sensor

    # -------------------------------------------------------------- control
    def apply_control(self, control: VehicleControl) -> None:
        c = self._carla.VehicleControl(
            throttle=control.throttle, steer=control.steer,
            brake=control.brake, hand_brake=control.hand_brake,
            reverse=control.reverse)
        self.ego.apply_control(c)

    def tick(self) -> int:
        self.world.tick()
        self.frame += 1
        self.game_time += self.dt
        return self.frame

    # ------------------------------------------------------------ inspection
    @property
    def ego_transform(self) -> Transform:
        return self._from_carla_tf(self.ego.get_transform())

    @property
    def ego_speed(self) -> float:
        v = self.ego.get_velocity()
        return float(math.sqrt(v.x ** 2 + v.y ** 2 + v.z ** 2))

    def is_junction(self, location: Location) -> bool:
        wp = self._map.get_waypoint(
            self._carla.Location(location.x, location.y, location.z))
        return bool(wp.is_junction)

    def actors_of_type(self, prefix: str) -> List[Actor]:
        out = []
        for actor in self.world.get_actors():
            if not actor.type_id.startswith(prefix):
                continue
            out.append(self._wrap_actor(actor))
        return out

    @property
    def actors(self) -> List[Actor]:
        return [self._wrap_actor(a) for a in self.world.get_actors()
                if a.type_id.startswith(("vehicle", "walker",
                                         "traffic_light", "static"))]

    # ------------------------------------------------------------- wrapping
    def _wrap_actor(self, actor) -> Actor:
        tf = self._from_carla_tf(actor.get_transform())
        try:
            ext = actor.bounding_box.extent
            extent = Location(ext.x, ext.y, ext.z)
        except Exception:
            extent = Location(0.5, 0.5, 1.0)
        v = actor.get_velocity()
        speed = float(math.sqrt(v.x ** 2 + v.y ** 2 + v.z ** 2))
        wrapped = Actor(actor_id=actor.id, type_id=actor.type_id,
                        transform=tf, extent=extent, speed=speed)
        if hasattr(actor, "get_control"):
            try:
                c = actor.get_control()
                if hasattr(c, "throttle"):
                    wrapped.control = VehicleControl(
                        steer=c.steer, throttle=c.throttle, brake=c.brake)
                elif hasattr(c, "direction"):  # walker control
                    wrapped.direction = (c.direction.x, c.direction.y,
                                         c.direction.z)
            except Exception:
                pass
        if actor.type_id.startswith("traffic_light"):
            wrapped.state = str(actor.state).split(".")[-1]
            tv = actor.trigger_volume
            wrapped.trigger_location = Location(tv.location.x, tv.location.y,
                                                tv.location.z)
            wrapped.trigger_box = Location(tv.extent.x, tv.extent.y,
                                           tv.extent.z)
        return wrapped

    def _to_carla_tf(self, tf: Transform):
        return self._carla.Transform(
            self._carla.Location(tf.location.x, tf.location.y,
                                 tf.location.z + 0.5),
            self._carla.Rotation(tf.rotation.pitch, tf.rotation.yaw,
                                 tf.rotation.roll))

    def _from_carla_tf(self, tf) -> Transform:
        return Transform(
            Location(tf.location.x, tf.location.y, tf.location.z),
            Rotation(tf.rotation.pitch, tf.rotation.yaw, tf.rotation.roll))

    def cleanup(self) -> None:
        for sensor in self._sensors.values():
            try:
                sensor.stop()
                sensor.destroy()
            except Exception:
                pass
        if self.ego is not None:
            self.ego.destroy()
