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
                 traffic_manager_port: int = 8000, datagen: bool = False):
        self.datagen = datagen
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
        """Spawn agent-declared sensors on the ego; callback(tag, data).

        Pins the leaderboard's fixed sensor attributes exactly
        (agent_wrapper_local.py:108-184): camera lens effects off only for
        datagen, lidar 85 m with the eval 10 Hz/600k vs datagen
        spec-driven profile + dropoff stack, gnss/imu noise.
        """
        carla = self._carla
        lib = self.world.get_blueprint_library()
        for spec in specs:
            stype = spec["type"]
            if stype in ("sensor.speedometer", "sensor.opendrive_map"):
                continue  # pseudo-sensors handled host-side
            bp = lib.find(str(stype))
            rotation = carla.Rotation(pitch=spec.get("pitch", 0.0),
                                      roll=spec.get("roll", 0.0),
                                      yaw=spec.get("yaw", 0.0))
            if stype.startswith("sensor.camera"):
                bp.set_attribute("image_size_x", str(spec["width"]))
                bp.set_attribute("image_size_y", str(spec["height"]))
                bp.set_attribute("fov", str(spec["fov"]))
                if not self.datagen:
                    bp.set_attribute("lens_circle_multiplier", str(3.0))
                    bp.set_attribute("lens_circle_falloff", str(3.0))
                if stype.startswith("sensor.camera.rgb"):
                    bp.set_attribute("chromatic_aberration_intensity",
                                     str(0.5))
                    bp.set_attribute("chromatic_aberration_offset", str(0))
            elif stype.startswith("sensor.lidar"):
                bp.set_attribute("range", str(85))
                if self.datagen:
                    bp.set_attribute("rotation_frequency",
                                     str(spec["rotation_frequency"]))
                    bp.set_attribute("points_per_second",
                                     str(spec["points_per_second"]))
                else:
                    bp.set_attribute("rotation_frequency", str(10))
                    bp.set_attribute("points_per_second", str(600000))
                bp.set_attribute("channels", str(64))
                bp.set_attribute("upper_fov", str(10))
                bp.set_attribute("atmosphere_attenuation_rate", str(0.004))
                bp.set_attribute("dropoff_general_rate", str(0.45))
                bp.set_attribute("dropoff_intensity_limit", str(0.8))
                bp.set_attribute("dropoff_zero_intensity", str(0.4))
            elif stype.startswith("sensor.other.gnss"):
                if not self.datagen:
                    bp.set_attribute("noise_alt_stddev", str(0.000005))
                    bp.set_attribute("noise_lat_stddev", str(0.000005))
                    bp.set_attribute("noise_lon_stddev", str(0.000005))
                bp.set_attribute("noise_alt_bias", str(0.0))
                bp.set_attribute("noise_lat_bias", str(0.0))
                bp.set_attribute("noise_lon_bias", str(0.0))
                rotation = carla.Rotation()  # agent_wrapper_local.py:169
            elif stype.startswith("sensor.other.imu"):
                bp.set_attribute("noise_accel_stddev_x", str(0.001))
                bp.set_attribute("noise_accel_stddev_y", str(0.001))
                bp.set_attribute("noise_accel_stddev_z", str(0.015))
                bp.set_attribute("noise_gyro_stddev_x", str(0.001))
                bp.set_attribute("noise_gyro_stddev_y", str(0.001))
                bp.set_attribute("noise_gyro_stddev_z", str(0.001))
            tf = carla.Transform(
                carla.Location(x=spec.get("x", 0.0), y=spec.get("y", 0.0),
                               z=spec.get("z", 0.0)), rotation)
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
