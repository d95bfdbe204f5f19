"""Hermetic end-to-end harness tests: route XML -> evaluator -> driving
score JSON, plus statistics/scoring unit tests."""

import json
import math
import os

import numpy as np
import pytest

from transfuser_tpu.agents.base import AutonomousAgent
from transfuser_tpu.control.pid import PIDController
from transfuser_tpu.control.route_planner import RoutePlanner
from transfuser_tpu.harness.evaluator import Evaluator, EvaluatorArgs
from transfuser_tpu.harness.events import TrafficEvent, TrafficEventType
from transfuser_tpu.harness.route_parser import (RouteIndexer,
                                                 interpolate_trajectory,
                                                 downsample_route,
                                                 parse_routes_file)
from transfuser_tpu.harness.statistics import StatisticsEngine
from transfuser_tpu.sim.types import VehicleControl


ROUTES_XML = """<?xml version='1.0' encoding='UTF-8'?>
<routes>
  <route id="0" town="Town01">
    <waypoint x="0.0" y="0.0" z="0.0" pitch="0" roll="0" yaw="0"/>
    <waypoint x="80.0" y="0.0" z="0.0" pitch="0" roll="0" yaw="0"/>
    <waypoint x="160.0" y="0.0" z="0.0" pitch="0" roll="0" yaw="0"/>
  </route>
  <route id="1" town="Town01">
    <waypoint x="0.0" y="10.0" z="0.0" pitch="0" roll="0" yaw="0"/>
    <waypoint x="100.0" y="10.0" z="0.0" pitch="0" roll="0" yaw="0"/>
  </route>
</routes>
"""

SCENARIOS_JSON = {
    "available_scenarios": [{
        "Town01": [{
            "scenario_type": "Scenario3",
            "available_event_configurations": [
                {"transform": {"x": 40.0, "y": 0.0, "z": 0.0, "yaw": 0.0,
                               "pitch": 0.0}},
            ],
        }],
    }]
}


class OracleAgent(AutonomousAgent):
    """Follows the sparse GPS plan with simple P control (no perception)."""

    def setup(self, path_to_conf_file, route_index=None):
        self._planner = RoutePlanner(min_distance=7.5, max_distance=50.0)
        self._turn = PIDController(k_p=2.0, k_i=0.0, k_d=0.2, n=20)
        self._initialized = False

    def sensors(self):
        return [
            {"type": "sensor.other.gnss", "id": "gps"},
            {"type": "sensor.other.imu", "id": "imu"},
            {"type": "sensor.speedometer", "id": "speed"},
        ]

    def run_step(self, input_data, timestamp):
        if not self._initialized:
            self._planner.set_route(self._global_plan, gps=True)
            self._initialized = True
        gps = input_data["gps"][1][:2]
        from transfuser_tpu.control.route_planner import GPS_CARLA_SCALE
        pos = np.array(gps) * GPS_CARLA_SCALE  # GPS-space (-y, x)
        compass = input_data["imu"][1][-1]     # GPS-frame heading
        speed = input_data["speed"][1]["speed"]
        route = self._planner.run_step(pos)
        target = route[1][0] if len(route) > 1 else route[0][0]
        delta = target - pos
        heading = math.atan2(delta[1], delta[0]) - compass
        heading = (heading + math.pi) % (2 * math.pi) - math.pi
        steer = float(np.clip(self._turn.step(heading / math.pi), -1, 1))
        throttle = 0.6 if speed < 5.0 else 0.0
        return VehicleControl(steer=steer, throttle=throttle, brake=0.0)


def _write_inputs(tmp_path):
    routes = os.path.join(tmp_path, "routes.xml")
    scenarios = os.path.join(tmp_path, "scenarios.json")
    with open(routes, "w") as f:
        f.write(ROUTES_XML)
    with open(scenarios, "w") as f:
        json.dump(SCENARIOS_JSON, f)
    return routes, scenarios


def test_route_parsing_and_indexing(tmp_path):
    routes, scenarios = _write_inputs(str(tmp_path))
    configs = parse_routes_file(routes)
    assert len(configs) == 2
    assert configs[0].town == "Town01"
    assert len(configs[0].trajectory) == 3

    indexer = RouteIndexer(routes, scenarios, repetitions=2)
    assert indexer.total == 4
    first = indexer.next()
    assert first.name == "RouteScenario_0"
    # scenario trigger at x=40 on route 0 must be matched
    assert len(first.scenario_configs) == 1
    assert first.scenario_configs[0]["scenario_type"] == "Scenario3"


def test_interpolation_and_downsample():
    configs = None
    from transfuser_tpu.sim.types import Location, Rotation, Transform
    traj = [Transform(Location(0, 0)), Transform(Location(100, 0)),
            Transform(Location(100, 100))]
    dense = interpolate_trajectory(traj)
    assert 195 <= len(dense) <= 205
    ids = downsample_route(dense, 50.0)
    assert ids[0] == 0 and ids[-1] == len(dense) - 1
    # roughly every 50 m
    assert 3 <= len(ids) <= 8


def test_evaluator_end_to_end(tmp_path):
    routes, scenarios = _write_inputs(str(tmp_path))
    ckpt = os.path.join(str(tmp_path), "results.json")
    args = EvaluatorArgs(
        routes=routes, scenarios=None, checkpoint=ckpt,
        agent_factory=lambda cfg: OracleAgent(),
        max_game_seconds=120.0)
    ev = Evaluator(args)
    result = ev.run()
    assert result["scores"]["score_route"] > 95.0
    assert result["scores"]["score_composed"] > 90.0

    data = json.load(open(ckpt))
    assert data["entry_status"] == "Finished"
    assert data["eligible"] is True
    assert len(data["_checkpoint"]["records"]) == 2
    assert data["labels"][0] == "Avg. driving score"
    assert float(data["values"][1]) > 95.0  # route completion


def test_evaluator_crash_taxonomy(tmp_path):
    routes, scenarios = _write_inputs(str(tmp_path))
    ckpt = os.path.join(str(tmp_path), "crash.json")

    class CrashingAgent(OracleAgent):
        def run_step(self, input_data, timestamp):
            raise RuntimeError("boom")

    args = EvaluatorArgs(routes=routes, scenarios=None, checkpoint=ckpt,
                         agent_factory=lambda cfg: CrashingAgent(),
                         max_game_seconds=30.0)
    ev = Evaluator(args)
    ev.run()
    data = json.load(open(ckpt))
    assert "Agent" in data["_checkpoint"]["records"][0]["status"]
    assert data["entry_status"] == "Finished with agent errors"


def test_statistics_penalty_product():
    eng = StatisticsEngine()
    eng.set_route("r0", 0)
    events = [
        TrafficEvent(TrafficEventType.COLLISION_PEDESTRIAN, "ped"),
        TrafficEvent(TrafficEventType.COLLISION_VEHICLE, "veh"),
        TrafficEvent(TrafficEventType.TRAFFIC_LIGHT_INFRACTION, "red"),
        TrafficEvent(TrafficEventType.STOP_INFRACTION, "stop"),
        TrafficEvent(TrafficEventType.OUTSIDE_ROUTE_LANES_INFRACTION,
                     "lanes", {"percentage": 10.0}),
        TrafficEvent(TrafficEventType.ROUTE_COMPLETION, "",
                     {"route_completed": 80.0}),
    ]

    class Loc:
        def __init__(self, x, y):
            self.x, self.y, self.z = x, y, 0.0

    rec = eng.compute_route_statistics(0, events, [Loc(0, 0), Loc(1000, 0)])
    want_penalty = 0.5 * 0.6 * 0.7 * 1.0 * 0.9
    assert rec.scores["score_penalty"] == pytest.approx(want_penalty)
    assert rec.scores["score_route"] == 80.0
    assert rec.scores["score_composed"] == pytest.approx(80.0 * want_penalty)
    assert rec.status.startswith("Failed")
    # global record normalizes infraction counts by the reference's
    # route_length_kms = score_route(%) x route_length / 1000
    # (statistics_manager_local.py:216-221)
    g = eng.compute_global_statistics(1)
    assert g.infractions["collisions_pedestrian"] == pytest.approx(1 / 80.0)


def test_evaluator_resume(tmp_path):
    routes, scenarios = _write_inputs(str(tmp_path))
    ckpt = os.path.join(str(tmp_path), "resume.json")
    args = EvaluatorArgs(routes=routes, scenarios=None, checkpoint=ckpt,
                         agent_factory=lambda cfg: OracleAgent(),
                         max_game_seconds=120.0)
    ev = Evaluator(args)
    cfg0 = ev.indexer.next()
    ev._run_route(cfg0)
    ev.indexer.save_state(ckpt)

    args2 = EvaluatorArgs(routes=routes, scenarios=None, checkpoint=ckpt,
                          agent_factory=lambda cfg: OracleAgent(),
                          resume=True, max_game_seconds=120.0)
    ev2 = Evaluator(args2)
    assert ev2.indexer._index == 1  # resumes at route 1
    ev2.run()
    data = json.load(open(ckpt))
    assert len(data["_checkpoint"]["records"]) == 2


def test_route_length_scaled_timeout(tmp_path):
    """Per-route budget = 0.8 s/m + 5 s (route_scenario_local.py:52-53,
    261-273) when no flat max_game_seconds cap is forced."""
    from transfuser_tpu.harness.route_parser import RouteIndexer
    from transfuser_tpu.harness.route_scenario import RouteScenario

    routes = tmp_path / "routes.xml"
    routes.write_text(ROUTES_XML)
    indexer = RouteIndexer(str(routes), None, 1)
    s0 = RouteScenario(indexer._configs[0])   # 160 m straight
    s1 = RouteScenario(indexer._configs[1])   # 100 m straight
    assert s0.route_length_m == pytest.approx(160.0, abs=2.0)
    assert s1.route_length_m == pytest.approx(100.0, abs=2.0)
    assert s0.timeout == int(0.8 * s0.route_length_m + 5.0)
    assert s1.timeout == int(0.8 * s1.route_length_m + 5.0)
    assert s0.timeout > s1.timeout


def test_collision_debounce_reference_semantics():
    """CollisionTest parity (atomic_criteria_local.py:299-301,376,
    397-403): same-actor re-collisions inside MAX_ID_TIME count once,
    micro-collisions within MIN_AREA_OF_COLLISION of a counted point are
    ignored, and both suppressions expire (time / distance)."""
    from transfuser_tpu.harness.criteria import CollisionTest
    from transfuser_tpu.sim.replay import Actor
    from transfuser_tpu.sim.types import Location, Rotation, Transform

    class FakeSim:
        def __init__(self):
            self.game_time = 0.0
            self.ego_transform = Transform(Location(0.0, 0.0), Rotation())
            self.collision_events = []

    def car(aid, x=0.0, y=0.0):
        return Actor(actor_id=aid, type_id="vehicle.background",
                     transform=Transform(Location(x, y), Rotation()))

    sim = FakeSim()
    crit = CollisionTest()

    # tick 0: contact with actor 7 -> one event
    sim.collision_events = [car(7)]
    crit.update(sim)
    assert len(crit.events) == 1

    # sustained contact next tick -> still one
    sim.game_time = 0.05
    crit.update(sim)
    assert len(crit.events) == 1

    # contact breaks for a tick, then the SAME actor touches again 1 cm
    # away 0.1 s later (bumper oscillation): suppressed by last_id AND
    # the 3 m micro-collision area (the round-5 expert route-8 case)
    sim.game_time = 0.10
    sim.collision_events = []
    crit.update(sim)
    sim.game_time = 0.15
    sim.ego_transform = Transform(Location(0.01, 0.0), Rotation())
    sim.collision_events = [car(7)]
    crit.update(sim)
    assert len(crit.events) == 1

    # a DIFFERENT actor while still within 3 m of the counted point:
    # micro-collision, ignored (reference ignores by area regardless of id)
    sim.game_time = 0.20
    sim.collision_events = [car(9)]
    crit.update(sim)
    assert len(crit.events) == 1

    # ego moves 6 m away (> MAX_AREA_OF_COLLISION, point forgotten) and
    # 6 s pass (> MAX_ID_TIME, last_id expired): actor 7 counts again
    sim.game_time = 6.5
    sim.ego_transform = Transform(Location(6.0, 0.0), Rotation())
    sim.collision_events = []
    crit.update(sim)
    sim.game_time = 6.55
    sim.collision_events = [car(7, x=6.0)]
    crit.update(sim)
    assert len(crit.events) == 2
