"""Scripted scenario behavior tests (trigger + maneuver semantics)."""

import math

import numpy as np
import pytest

from transfuser_tpu.harness.route_parser import RouteConfig
from transfuser_tpu.harness.route_scenario import RouteScenario
from transfuser_tpu.harness.scenarios import build_behaviors
from transfuser_tpu.sim.types import Location, Rotation, Transform


def _route_cfg(scenario_type=None, trigger_x=30.0):
    traj = [Transform(Location(float(x), 0.0), Rotation(yaw=0.0))
            for x in (0.0, 60.0, 120.0)]
    cfg = RouteConfig(name="RouteScenario_0", town="Town01", index=0,
                      trajectory=traj)
    if scenario_type:
        cfg.scenario_configs = [{
            "scenario_type": scenario_type,
            "trigger_position": Transform(Location(trigger_x, 0.0),
                                          Rotation(yaw=0.0)),
            "other_parameters": {}}]
    return cfg


def test_scenario3_walker_crossing_triggers():
    scenario = RouteScenario(_route_cfg("Scenario3"))
    sim = scenario.sim
    walkers = sim.actors_of_type("walker")
    assert len(walkers) == 1
    w0 = np.array([walkers[0].transform.location.x,
                   walkers[0].transform.location.y])
    # walker stands still until the ego approaches the trigger
    for _ in range(10):
        scenario.tick_criteria()
        sim.tick()
    w1 = np.array([walkers[0].transform.location.x,
                   walkers[0].transform.location.y])
    np.testing.assert_allclose(w0, w1, atol=1e-9)
    # teleport ego near the trigger -> walker starts crossing
    sim.ego_transform = Transform(Location(25.0, 0.0), Rotation(yaw=0.0))
    for _ in range(40):
        scenario.tick_criteria()
        sim.tick()
    w2 = np.array([walkers[0].transform.location.x,
                   walkers[0].transform.location.y])
    assert np.linalg.norm(w2 - w1) > 1.0


def test_scenario2_lead_vehicle_drives_then_stops():
    scenario = RouteScenario(_route_cfg("Scenario2", trigger_x=10.0))
    sim = scenario.sim
    leads = sim.actors_of_type("vehicle.lead")
    assert len(leads) == 1
    sim.ego_transform = Transform(Location(5.0, 0.0), Rotation(yaw=0.0))
    x0 = leads[0].transform.location.x
    for _ in range(60):  # 3 s driving phase
        scenario.tick_criteria()
        sim.tick()
    assert leads[0].transform.location.x > x0 + 3.0
    for _ in range(100):  # past 6 s -> stopped
        scenario.tick_criteria()
        sim.tick()
    x_stop = leads[0].transform.location.x
    scenario.tick_criteria()
    sim.tick()
    assert abs(leads[0].transform.location.x - x_stop) < 1e-6


def test_scenario1_control_loss_perturbs_steering():
    scenario = RouteScenario(_route_cfg("Scenario1", trigger_x=2.0))
    sim = scenario.sim
    from transfuser_tpu.sim.types import VehicleControl
    sim.apply_control(VehicleControl(steer=0.0, throttle=0.5))
    steers = []
    for _ in range(20):
        scenario.tick_criteria()
        sim.tick()
        steers.append(sim.applied_control.steer)
    # noise is injected at the actuation level; the agent's own command
    # object is never mutated
    assert max(abs(s) for s in steers) > 0.0
    assert sim._last_control.steer == 0.0


def test_oneshot_trigger_semantics():
    behaviors = build_behaviors([{
        "scenario_type": "Scenario3",
        "trigger_position": Transform(Location(0.0, 0.0), Rotation()),
        "other_parameters": {}}])
    assert len(behaviors) == 1
    b = behaviors[0]
    assert not b.triggered
    # unknown scenario types are skipped
    assert build_behaviors([{
        "scenario_type": "ScenarioX",
        "trigger_position": Transform(Location(0.0, 0.0), Rotation()),
        "other_parameters": {}}]) == []


def test_other_parameters_tune_behaviors():
    """Per-event `other_parameters` from the scenario JSON reach the
    behaviors (srunner config.other_parameters convention, including
    {"value": x} wrappers)."""
    from transfuser_tpu.harness.scenarios import (DynamicObjectCrossing,
                                                  FollowLeadingVehicle,
                                                  build_behaviors)
    from transfuser_tpu.sim.types import Location, Rotation, Transform

    trigger = Transform(Location(0.0, 0.0), Rotation(yaw=0.0))
    configs = [
        {"scenario_type": "Scenario2", "trigger_position": trigger,
         "other_parameters": {"first_vehicle_location": {"value": 40.0},
                              "first_vehicle_speed": 5.5}},
        {"scenario_type": "Scenario3", "trigger_position": trigger,
         "other_parameters": {"distance": 20.0}},
        {"scenario_type": "Scenario3", "trigger_position": trigger},
    ]
    behaviors = build_behaviors(configs)
    assert isinstance(behaviors[0], FollowLeadingVehicle)
    assert behaviors[0]._param("first_vehicle_location", 25.0) == 40.0
    assert behaviors[0]._param("first_vehicle_speed", 3.0) == 5.5
    lead = behaviors[0].setup(None)[0]
    assert abs(lead.transform.location.x - 40.0) < 1e-6

    assert isinstance(behaviors[1], DynamicObjectCrossing)
    walker = behaviors[1].setup(None)[0]
    assert abs(walker.transform.location.x - 20.0) < 1e-6
    walker_default = behaviors[2].setup(None)[0]
    assert abs(walker_default.transform.location.x - 12.0) < 1e-6


def _grid_route_cfg(scenario_type, trigger_xy, yaw=0.0, traj=None):
    from transfuser_tpu.sim.town_map import LANE_WIDTH
    y = 80.0 - LANE_WIDTH / 2.0
    traj = traj or [Transform(Location(20.0, y), Rotation(yaw=0.0)),
                    Transform(Location(140.0, y), Rotation(yaw=0.0))]
    cfg = RouteConfig(name="RouteScenario_0", town="grid", index=0,
                      trajectory=traj)
    cfg.scenario_configs = [{
        "scenario_type": scenario_type,
        "trigger_position": Transform(Location(*trigger_xy),
                                      Rotation(yaw=yaw)),
        "other_parameters": {}}]
    return cfg


@pytest.fixture(scope="module")
def lane_town():
    from transfuser_tpu.sim.town_map import grid_town
    return grid_town(blocks=2, block_size=80.0, lights_at=[(1, 1)])


def test_crossing_vehicle_rides_junction_connector(lane_town):
    """Scenario7-10 adversaries must traverse the junction's actual
    connector lanes (srunner no_signal_junction_crossing.py drives map
    waypoints), not a straight ray through free space."""
    from transfuser_tpu.sim.town_map import LANE_WIDTH
    y = 80.0 - LANE_WIDTH / 2.0
    scenario = RouteScenario(_grid_route_cfg("Scenario7", (55.0, y)),
                             town_map=lane_town)
    sim = scenario.sim
    crossers = [a for a in sim.actors if a.type_id == "vehicle.crossing"]
    assert len(crossers) == 1
    v = crossers[0]
    # spawned on a REAL perpendicular approach lane: on-road, yaw ~ +-90
    assert lane_town.on_road(v.transform.location.x,
                             v.transform.location.y, margin=0.6)
    rel = abs((v.transform.rotation.yaw - 0.0 + 180.0) % 360.0 - 180.0)
    assert 45.0 <= rel <= 135.0
    # trigger and drive: the adversary must enter the junction area and
    # stay on the road network the whole way through
    sim.ego_transform = Transform(Location(50.0, y), Rotation(yaw=0.0))
    entered_junction = False
    for _ in range(200):
        scenario.tick_criteria()
        sim.tick()
        x, yy = v.transform.location.x, v.transform.location.y
        assert lane_town.on_road(x, yy, margin=0.8)
        if lane_town.is_junction(x, yy):
            entered_junction = True
    assert entered_junction


def test_lead_vehicle_follows_lane_chain(lane_town):
    """Scenario2's lead rides the lane graph (curves included), staying
    on the road network instead of extrapolating a straight ray."""
    from transfuser_tpu.sim.town_map import LANE_WIDTH
    y = 80.0 - LANE_WIDTH / 2.0
    scenario = RouteScenario(_grid_route_cfg("Scenario2", (50.0, y)),
                             town_map=lane_town)
    sim = scenario.sim
    leads = sim.actors_of_type("vehicle.lead")
    assert len(leads) == 1
    assert lane_town.on_road(leads[0].transform.location.x,
                             leads[0].transform.location.y, margin=0.6)
    sim.ego_transform = Transform(Location(45.0, y), Rotation(yaw=0.0))
    p0 = (leads[0].transform.location.x, leads[0].transform.location.y)
    for _ in range(150):
        scenario.tick_criteria()
        sim.tick()
        assert lane_town.on_road(leads[0].transform.location.x,
                                 leads[0].transform.location.y,
                                 margin=0.8)
    p1 = (leads[0].transform.location.x, leads[0].transform.location.y)
    assert math.hypot(p1[0] - p0[0], p1[1] - p0[1]) > 3.0


def test_opposite_direction_invades_ego_lane(lane_town):
    """Scenario6 rides the actual opposing lane and swings into the
    ego's lane mid-run (maneuver_opposite_direction.py semantics)."""
    from transfuser_tpu.sim.town_map import LANE_WIDTH
    y = 80.0 - LANE_WIDTH / 2.0
    scenario = RouteScenario(_grid_route_cfg("Scenario6", (25.0, y)),
                             town_map=lane_town)
    sim = scenario.sim
    cars = sim.actors_of_type("vehicle.oncoming")
    assert len(cars) == 1
    v = cars[0]
    # spawned on the OPPOSING lane (yaw ~180 vs ego), on the road
    rel = abs((v.transform.rotation.yaw - 180.0 + 180.0) % 360.0 - 180.0)
    assert rel < 45.0
    assert lane_town.on_road(v.transform.location.x,
                             v.transform.location.y, margin=0.6)
    sim.ego_transform = Transform(Location(22.0, y), Rotation(yaw=0.0))
    lateral_seen = []
    for _ in range(160):
        scenario.tick_criteria()
        sim.tick()
        lateral_seen.append(v.transform.location.y)
    # excursion toward the ego lane: y moves from the opposing lane's
    # centerline (80 + w/2) toward the ego's (80 - w/2) and back
    y_opp = 80.0 + LANE_WIDTH / 2.0
    assert min(lateral_seen) < y_opp - 0.8 * LANE_WIDTH
    assert abs(lateral_seen[-1] - y_opp) < 1.0
