"""Contract test for the live CARLA adapter against a mocked `carla` egg.

Pins the exact client API sequence / coordinate conventions the real
CARLA 0.9.10 egg would see (leaderboard_evaluator_local.py:79-85 client
setup; agent_wrapper_local.py:108-184 sensor attributes), so the first
real-server run is not a leap of faith (VERDICT r2 Missing #6 / Next #8).
"""

import math
import sys
import types

import pytest


# --------------------------------------------------------------- fake egg
class FLocation:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = x, y, z


class FRotation:
    def __init__(self, pitch=0.0, yaw=0.0, roll=0.0):
        self.pitch, self.yaw, self.roll = pitch, yaw, roll


class FTransform:
    def __init__(self, location=None, rotation=None):
        self.location = location or FLocation()
        self.rotation = rotation or FRotation()


class FVehicleControl:
    def __init__(self, throttle=0.0, steer=0.0, brake=0.0,
                 hand_brake=False, reverse=False):
        self.throttle, self.steer, self.brake = throttle, steer, brake
        self.hand_brake, self.reverse = hand_brake, reverse


class FBlueprint:
    def __init__(self, bp_id):
        self.id = bp_id
        self.attributes = {}

    def set_attribute(self, key, value):
        assert isinstance(value, str), (
            f"carla requires string attribute values, got {type(value)} "
            f"for {key}")
        self.attributes[key] = value

    def has_attribute(self, key):
        return True


class FBlueprintLibrary:
    def __init__(self):
        self.found = []

    def find(self, bp_id):
        bp = FBlueprint(bp_id)
        self.found.append(bp)
        return bp


class FActor:
    _next_id = [1]

    def __init__(self, type_id, transform, parent=None):
        self.id = FActor._next_id[0]
        FActor._next_id[0] += 1
        self.type_id = type_id
        self._transform = transform
        self._velocity = FLocation(0.0, 0.0, 0.0)
        self._control = FVehicleControl()
        self.parent = parent
        self.destroyed = False
        self.listening = None
        self.stopped = False
        self.attributes = {}
        bb = types.SimpleNamespace(
            extent=FLocation(2.45, 1.06, 0.75),
            location=FLocation(0, 0, 0))
        self.bounding_box = bb

    def get_transform(self):
        return self._transform

    def get_velocity(self):
        return self._velocity

    def get_control(self):
        return self._control

    def apply_control(self, c):
        self._control = c

    def listen(self, cb):
        self.listening = cb

    def stop(self):
        self.stopped = True

    def destroy(self):
        self.destroyed = True


class FTrafficLight(FActor):
    def __init__(self, transform):
        super().__init__("traffic_light", transform)
        self.state = "TrafficLightState.Red"
        self.trigger_volume = types.SimpleNamespace(
            location=FLocation(3.0, 4.0, 0.0),
            extent=FLocation(2.0, 5.0, 1.0))


class FMap:
    def get_waypoint(self, loc):
        return types.SimpleNamespace(is_junction=abs(loc.x) < 5.0)


class FSettings:
    def __init__(self):
        self.synchronous_mode = False
        self.fixed_delta_seconds = None


class FWorld:
    def __init__(self):
        self._settings = FSettings()
        self.applied_settings = None
        self._bp_lib = FBlueprintLibrary()
        self.spawned = []
        self.tick_count = 0

    def get_settings(self):
        return self._settings

    def apply_settings(self, s):
        self.applied_settings = s

    def get_blueprint_library(self):
        return self._bp_lib

    def spawn_actor(self, bp, transform, attach_to=None):
        actor = FActor(bp.id, transform, parent=attach_to)
        actor.attributes = dict(bp.attributes)
        self.spawned.append(actor)
        return actor

    def get_map(self):
        return FMap()

    def get_actors(self):
        return list(self.spawned)

    def tick(self):
        self.tick_count += 1
        return self.tick_count


class FTrafficManager:
    def __init__(self):
        self.sync = None

    def set_synchronous_mode(self, on):
        self.sync = on


class FClient:
    last = None

    def __init__(self, host, port):
        self.host, self.port = host, port
        self.timeout = None
        self.world = FWorld()
        self.tm = FTrafficManager()
        FClient.last = self

    def set_timeout(self, t):
        self.timeout = t

    def load_world(self, town):
        self.loaded_town = town
        return self.world

    def get_trafficmanager(self, port):
        self.tm_port = port
        return self.tm


@pytest.fixture()
def fake_carla(monkeypatch):
    mod = types.ModuleType("carla")
    mod.Client = FClient
    mod.Location = FLocation
    mod.Rotation = FRotation
    mod.Transform = FTransform
    mod.VehicleControl = FVehicleControl
    monkeypatch.setitem(sys.modules, "carla", mod)
    yield mod


def _make_sim(datagen=False):
    from transfuser_tpu.sim.carla_adapter import CarlaSimulation
    return CarlaSimulation(host="h", port=2000, town="Town05", fps=20,
                           traffic_manager_port=8000, datagen=datagen)


def test_client_setup_contract(fake_carla):
    sim = _make_sim()
    client = FClient.last
    assert client.host == "h" and client.port == 2000
    assert client.loaded_town == "Town05"
    assert client.tm_port == 8000
    # sync mode @ fps (leaderboard_evaluator_local.py:200-228)
    s = client.world.applied_settings
    assert s.synchronous_mode is True
    assert s.fixed_delta_seconds == pytest.approx(0.05)
    assert client.tm.sync is True
    assert sim.dt == pytest.approx(0.05)


def test_ego_spawn_and_control_roundtrip(fake_carla):
    from transfuser_tpu.sim.types import (Location, Rotation, Transform,
                                          VehicleControl)
    sim = _make_sim()
    sim.spawn_ego(Transform(Location(10.0, -4.0, 0.0),
                            Rotation(yaw=90.0)))
    ego = sim.ego
    assert ego.attributes["role_name"] == "hero"
    # +0.5 m z-lift on spawn; pitch/yaw/roll order preserved
    assert ego.get_transform().location.z == pytest.approx(0.5)
    assert ego.get_transform().rotation.yaw == pytest.approx(90.0)

    sim.apply_control(VehicleControl(steer=-0.25, throttle=0.6, brake=0.0))
    assert ego._control.steer == pytest.approx(-0.25)
    assert ego._control.throttle == pytest.approx(0.6)

    assert sim.tick() == 1
    assert sim.game_time == pytest.approx(0.05)
    tf = sim.ego_transform
    assert tf.location.x == pytest.approx(10.0)
    ego._velocity = FLocation(3.0, 4.0, 0.0)
    assert sim.ego_speed == pytest.approx(5.0)


def test_sensor_attach_pins_leaderboard_attributes(fake_carla):
    from transfuser_tpu.sim.types import Location, Rotation, Transform
    sim = _make_sim(datagen=False)
    sim.spawn_ego(Transform(Location(), Rotation()))
    got = {}
    specs = [
        {"type": "sensor.camera.rgb", "id": "rgb", "x": 1.3, "y": 0.0,
         "z": 2.3, "pitch": 0.0, "roll": 0.0, "yaw": -60.0,
         "width": 960, "height": 480, "fov": 120},
        {"type": "sensor.lidar.ray_cast", "id": "lidar", "x": 1.3,
         "y": 0.0, "z": 2.5, "pitch": 0.0, "roll": 0.0, "yaw": -90.0},
        {"type": "sensor.other.gnss", "id": "gps", "x": 0.0, "y": 0.0,
         "z": 0.0},
        {"type": "sensor.other.imu", "id": "imu", "x": 0.0, "y": 0.0,
         "z": 0.0},
        {"type": "sensor.speedometer", "id": "speed"},
    ]
    sim.attach_sensors(specs, lambda tag, data: got.__setitem__(tag, data))

    # pseudo-sensor skipped, 4 real sensors spawned attached to ego
    assert set(sim._sensors) == {"rgb", "lidar", "gps", "imu"}
    for s in sim._sensors.values():
        assert s.parent is sim.ego

    rgb = sim._sensors["rgb"]
    assert rgb.attributes["image_size_x"] == "960"
    assert rgb.attributes["fov"] == "120"
    # eval profile keeps lens effects (agent_wrapper_local.py:113-118)
    assert rgb.attributes["lens_circle_multiplier"] == "3.0"
    assert rgb.attributes["chromatic_aberration_intensity"] == "0.5"
    assert rgb.get_transform().rotation.yaw == pytest.approx(-60.0)

    lidar = sim._sensors["lidar"]
    assert lidar.attributes["range"] == "85"
    assert lidar.attributes["rotation_frequency"] == "10"
    assert lidar.attributes["points_per_second"] == "600000"
    assert lidar.attributes["dropoff_general_rate"] == "0.45"
    assert lidar.attributes["channels"] == "64"

    gps = sim._sensors["gps"]
    assert gps.attributes["noise_lat_stddev"] == "5e-06"
    imu = sim._sensors["imu"]
    assert imu.attributes["noise_accel_stddev_z"] == "0.015"

    # callback plumbed with the right tag
    rgb.listening("frame-1")
    assert got == {"rgb": "frame-1"}


def test_sensor_attach_datagen_profile(fake_carla):
    from transfuser_tpu.sim.types import Location, Rotation, Transform
    sim = _make_sim(datagen=True)
    sim.spawn_ego(Transform(Location(), Rotation()))
    sim.attach_sensors([
        {"type": "sensor.camera.rgb", "id": "rgb", "width": 320,
         "height": 160, "fov": 60},
        {"type": "sensor.lidar.ray_cast", "id": "lidar",
         "rotation_frequency": 20, "points_per_second": 1200000},
    ], lambda *a: None)
    rgb = sim._sensors["rgb"]
    # datagen: lens effects OFF (agent_wrapper_local.py:113-118)
    assert "lens_circle_multiplier" not in rgb.attributes
    lidar = sim._sensors["lidar"]
    assert lidar.attributes["rotation_frequency"] == "20"
    assert lidar.attributes["points_per_second"] == "1200000"


def test_actor_wrapping_and_cleanup(fake_carla):
    from transfuser_tpu.sim.types import Location, Rotation, Transform
    sim = _make_sim()
    sim.spawn_ego(Transform(Location(), Rotation()))
    world = FClient.last.world
    npc = FActor("vehicle.audi.tt",
                 FTransform(FLocation(5.0, 6.0, 0.0), FRotation(yaw=45.0)))
    npc._velocity = FLocation(0.0, 2.0, 0.0)
    light = FTrafficLight(FTransform(FLocation(9.0, 9.0, 0.0), FRotation()))
    world.spawned += [npc, light]

    vehicles = sim.actors_of_type("vehicle.audi")
    assert len(vehicles) == 1
    w = vehicles[0]
    assert w.transform.location.x == pytest.approx(5.0)
    assert w.transform.rotation.yaw == pytest.approx(45.0)
    assert w.speed == pytest.approx(2.0)
    assert w.extent.x == pytest.approx(2.45)

    lights = [a for a in sim.actors if a.type_id == "traffic_light"]
    assert lights and lights[0].state == "Red"
    assert lights[0].trigger_location.x == pytest.approx(3.0)
    assert lights[0].trigger_box.y == pytest.approx(5.0)

    sim.attach_sensors([{"type": "sensor.camera.rgb", "id": "c",
                         "width": 8, "height": 8, "fov": 90}],
                       lambda *a: None)
    cam = sim._sensors["c"]
    ego = sim.ego
    sim.cleanup()
    assert cam.stopped and cam.destroyed
    assert ego.destroyed


def test_junction_query(fake_carla):
    from transfuser_tpu.sim.types import Location
    sim = _make_sim()
    assert sim.is_junction(Location(0.0, 0.0, 0.0))
    assert not sim.is_junction(Location(50.0, 0.0, 0.0))
