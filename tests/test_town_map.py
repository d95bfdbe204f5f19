"""Road network, moving traffic, and map-true criteria semantics."""

import math

import numpy as np
import pytest

from transfuser_tpu.harness.criteria import (OutsideRouteLanesTest,
                                             RunningRedLightTest,
                                             RunningStopTest)
from transfuser_tpu.harness.route_parser import RouteConfig
from transfuser_tpu.harness.route_scenario import RouteScenario
from transfuser_tpu.sim.replay import Actor, ReplaySimulation
from transfuser_tpu.sim.town_map import (LANE_WIDTH, TownMap, TriggerVolume,
                                         grid_town)
from transfuser_tpu.sim.traffic import (TrafficLightController,
                                        TrafficManager)
from transfuser_tpu.sim.types import Location, Rotation, Transform


@pytest.fixture(scope="module")
def town():
    return grid_town(blocks=2, block_size=80.0, lights_at=[(1, 1)],
                     stops_at=[(0, 1)])


def test_grid_town_topology(town):
    # every lane reaches somewhere and is reachable
    assert all(l.successors for l in town.lanes.values())
    assert all(l.predecessors for l in town.lanes.values()
               if l.is_junction)
    # connectors join road-lane endpoints exactly
    for lane in town.lanes.values():
        if not lane.is_junction:
            continue
        for pred in lane.predecessors:
            end = town.lanes[pred].centerline[-1]
            assert np.allclose(end, lane.centerline[0], atol=1e-6)
        for succ in lane.successors:
            start = town.lanes[succ].centerline[0]
            assert np.allclose(start, lane.centerline[-1], atol=1e-6)


def test_grid_town_queries(town):
    # east-bound lane of the road south edge: y = -1.75
    assert town.on_road(40.0, -1.75)
    assert not town.on_road(40.0, -9.0)
    assert town.is_junction(80.0, 80.0)
    assert not town.is_junction(40.0, -1.75)
    lane, s, lat = town.nearest_lane(40.0, -1.0)
    assert abs(lat - 0.75) < 1e-6  # left of the east-bound lane center


def test_route_topology_walk(town):
    route = town.route((20.0, -1.75), (81.75, 140.0))
    pts = np.array([[t.location.x, t.location.y] for t in route])
    assert len(pts) > 100
    # contiguous: max step ~1 m
    steps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert steps.max() < 2.0
    # every route point is on the road
    for p in pts[:: max(len(pts) // 20, 1)]:
        assert town.on_road(float(p[0]), float(p[1]), margin=0.6)


def test_light_controller_phases(town):
    ctrl = TrafficLightController(town, green=10.0, yellow=2.0, all_red=1.0)
    l0 = [tl for tl in town.traffic_lights if tl.phase == 0][0]
    l1 = [tl for tl in town.traffic_lights if tl.phase == 1][0]
    assert ctrl.state(l0) == "Green"
    assert ctrl.state(l1) == "Red"
    ctrl.step(10.5)  # into yellow for phase-0
    assert ctrl.state(l0) == "Yellow"
    ctrl.step(2.6)   # all red
    assert ctrl.state(l0) == "Red"
    states = set()
    for _ in range(int(ctrl.period)):
        ctrl.step(1.0)
        states.add((ctrl.state(l0), ctrl.state(l1)))
    assert ("Green", "Red") in states and ("Red", "Green") in states
    assert ("Green", "Green") not in states


def _sim_for(town, start=(12.0, -1.75), yaw=0.0):
    traj = [Transform(Location(*start), Rotation(yaw=yaw)),
            Transform(Location(start[0] + 50.0, start[1]),
                      Rotation(yaw=yaw))]
    return ReplaySimulation(traj, fps=10, town_map=town)


def test_traffic_vehicles_move_and_follow(town):
    sim = _sim_for(town)
    tm = TrafficManager(town, seed=3)
    sim.actors.extend(tm.spawn(12))
    sim.traffic = tm
    p0 = {mv.actor.actor_id: (mv.actor.transform.location.x,
                              mv.actor.transform.location.y)
          for mv in tm.vehicles}
    for _ in range(100):  # 10 s
        sim.tick()
    moved = 0
    for mv in tm.vehicles:
        d = math.hypot(mv.actor.transform.location.x - p0[mv.actor.actor_id][0],
                       mv.actor.transform.location.y - p0[mv.actor.actor_id][1])
        if d > 5.0:
            moved += 1
        # vehicles stay on the road network
        assert town.on_road(mv.actor.transform.location.x,
                            mv.actor.transform.location.y, margin=0.6)
    assert moved >= len(tm.vehicles) // 2


def test_traffic_keeps_headway(town):
    # two vehicles on one long lane; leader parked
    lane = next(l for l in town.lanes.values()
                if not l.is_junction and l.length > 50)
    tm = TrafficManager(town, seed=0)
    sim = _sim_for(town, start=(200.0, 300.0))  # ego far away
    from transfuser_tpu.sim.traffic import ManagedVehicle
    lead = Actor(actor_id=9001, type_id="vehicle.background",
                 transform=Transform(Location(0, 0), Rotation()))
    rear = Actor(actor_id=9002, type_id="vehicle.background",
                 transform=Transform(Location(0, 0), Rotation()))
    mv_lead = ManagedVehicle(actor=lead, lane_id=lane.lane_id, s=45.0,
                             target_speed=0.0)
    mv_rear = ManagedVehicle(actor=rear, lane_id=lane.lane_id, s=5.0,
                             target_speed=8.0)
    tm.vehicles = [mv_lead, mv_rear]
    sim.actors.extend([lead, rear])
    sim.traffic = tm
    for _ in range(200):
        sim.tick()
    # rear approached but never collided: bumper gap stays positive
    gap = mv_lead.s - mv_rear.s - lead.extent.x - rear.extent.x
    assert 0.0 < gap < 20.0


def test_traffic_stops_at_red_light(town):
    ctrl = TrafficLightController(town, green=1e-6, yellow=1e-6,
                                  all_red=1e9)  # permanently red
    tm = TrafficManager(town, seed=0, controller=ctrl)
    ctrl.step(1.0)
    # vehicle approaching the lit intersection (1,1) east-bound:
    # road lane from (0,1) to (1,1): y = 80 - 1.75, x in [8, 72]
    lane, s, _ = town.nearest_lane(40.0, 80.0 - LANE_WIDTH / 2)
    light = town.light_for_lane(lane.lane_id)
    assert light is not None
    from transfuser_tpu.sim.traffic import ManagedVehicle
    car = Actor(actor_id=9003, type_id="vehicle.background",
                transform=Transform(Location(0, 0), Rotation()))
    mv = ManagedVehicle(actor=car, lane_id=lane.lane_id, s=5.0,
                        target_speed=8.0)
    tm.vehicles = [mv]
    sim = _sim_for(town, start=(200.0, 300.0))
    sim.actors.append(car)
    sim.traffic = tm
    for _ in range(300):
        sim.tick()
    assert mv.speed < 0.2
    assert mv.s < lane.length - 0.2  # stopped before the stop line
    assert mv.s > lane.length - 12.0  # ... but close to it


def _drive_segment(criterion, sim, path, speed=5.0):
    for (x, y) in path:
        sim.ego_transform = Transform(Location(x, y), Rotation(yaw=0.0))
        sim.ego_speed = speed
        criterion.update(sim)


def test_red_light_stop_line_semantics(town):
    spec = next(tl for tl in town.traffic_lights
                if abs(tl.transform.rotation.yaw - 0.0) < 1e-6)
    # approach east-bound toward x=72 stop line at y=80-1.75
    y = 80.0 - LANE_WIDTH / 2
    actors = {spec.light_id: Actor(actor_id=1, type_id="traffic_light",
                                   transform=spec.transform, state="Red")}
    sim = _sim_for(town, start=(60.0, y))
    # crossing while red -> infraction
    crit = RunningRedLightTest(light_specs=[spec], light_actors=actors)
    _drive_segment(crit, sim, [(66.0, y), (69.0, y), (71.0, y), (73.5, y)])
    assert crit.test_status == "FAILURE" and len(crit.events) == 1
    # stopping before the line -> none
    crit2 = RunningRedLightTest(light_specs=[spec], light_actors=actors)
    _drive_segment(crit2, sim, [(66.0, y), (69.0, y), (70.5, y)])
    assert crit2.test_status == "INIT"
    # crossing while green -> none
    actors[spec.light_id].state = "Green"
    crit3 = RunningRedLightTest(light_specs=[spec], light_actors=actors)
    _drive_segment(crit3, sim, [(66.0, y), (71.0, y), (74.0, y)])
    assert crit3.test_status == "INIT"


def test_stop_sign_trigger_volume(town):
    spec = town.stop_signs[0]
    yaw = math.radians(spec.transform.rotation.yaw)
    fwd = np.array([math.cos(yaw), math.sin(yaw)])
    c = spec.trigger.center
    path_thru = [tuple(c + fwd * d) for d in np.linspace(-6, 6, 13)]
    sim = _sim_for(town, start=(200.0, 300.0))
    crit = RunningStopTest(stop_specs=[spec])
    _drive_segment(crit, sim, path_thru, speed=4.0)
    assert crit.test_status == "FAILURE"
    # with a stop inside the volume -> clean
    crit2 = RunningStopTest(stop_specs=[spec])
    for i, (x, y) in enumerate(path_thru):
        sim.ego_transform = Transform(Location(x, y), Rotation())
        sim.ego_speed = 0.0 if i == 6 else 4.0
        crit2.update(sim)
    assert crit2.test_status == "INIT"


def test_outside_route_lanes_uses_map(town):
    route = [Transform(Location(float(x), -1.75), Rotation())
             for x in np.linspace(10, 70, 61)]
    crit = OutsideRouteLanesTest(route, town_map=town)
    sim = _sim_for(town)
    # on-road drive: no outside distance
    for x in np.linspace(10, 30, 21):
        sim.ego_transform = Transform(Location(float(x), -1.75), Rotation())
        crit.update(sim)
    assert crit._outside_distance == 0.0
    # veer off the road (y=-10 is off-network)
    for x in np.linspace(30, 50, 21):
        sim.ego_transform = Transform(Location(float(x), -10.0), Rotation())
        crit.update(sim)
    assert crit._outside_distance > 10.0
    crit.finalize()
    assert crit.events and "outside its route lanes" in crit.events[0].get_message()


def test_route_scenario_with_town_map(town):
    y = -1.75
    cfg = RouteConfig(name="t", town="grid_town", index=0, trajectory=[
        Transform(Location(12.0, y), Rotation(yaw=0.0)),
        Transform(Location(70.0, y), Rotation(yaw=0.0))])
    sc = RouteScenario(cfg, fps=10, background_vehicles=10, town_map=town)
    assert len(sc.sim.actors_of_type("traffic_light")) == 4
    assert len(sc.sim.actors_of_type("static.prop.stop")) == 3
    assert len(sc.sim.actors_of_type("vehicle.background")) == 10
    states0 = [a.state for a in sc.sim.actors_of_type("traffic_light")]
    assert "Green" in states0 and "Red" in states0
    pos0 = [(a.transform.location.x, a.transform.location.y)
            for a in sc.sim.actors_of_type("vehicle.background")]
    for _ in range(150):  # 15 s: phases change, vehicles move
        sc.tick_criteria()
        sc.sim.tick()
    pos1 = [(a.transform.location.x, a.transform.location.y)
            for a in sc.sim.actors_of_type("vehicle.background")]
    moved = sum(1 for p0, p1 in zip(pos0, pos1)
                if math.hypot(p1[0] - p0[0], p1[1] - p0[1]) > 3.0)
    assert moved >= 5
    states1 = [a.state for a in sc.sim.actors_of_type("traffic_light")]
    assert states1 != states0  # light phases advanced


# ------------------------------------------------------------- multi-lane

@pytest.fixture(scope="module")
def town2():
    return grid_town(blocks=2, block_size=80.0, lights_at=[(1, 1)],
                     lanes_per_dir=2)


def test_multilane_adjacency(town2):
    road_lanes = [l for l in town2.lanes.values() if not l.is_junction]
    with_left = [l for l in road_lanes if l.left_neighbor is not None]
    with_right = [l for l in road_lanes if l.right_neighbor is not None]
    assert len(with_left) == len(road_lanes) // 2
    assert len(with_right) == len(road_lanes) // 2
    for lane in with_right:
        nb = town2.lanes[lane.right_neighbor]
        assert nb.left_neighbor == lane.lane_id
        # parallel, one lane-width apart, same heading
        d = np.linalg.norm(nb.centerline[0] - lane.centerline[0])
        assert d == pytest.approx(LANE_WIDTH, abs=1e-6)
        assert lane.position(1.0)[1] == pytest.approx(nb.position(1.0)[1])


def test_multilane_topology_and_signals(town2):
    # every lane has a successor (no dead ends even with turn discipline)
    assert all(l.successors for l in town2.lanes.values())
    # lights control both incoming lanes of each approach
    for tl in town2.traffic_lights:
        incoming = [lid for lid in tl.controlled_lanes
                    if not town2.lanes[lid].is_junction]
        assert len(incoming) == 2


def test_route_with_lane_change(town2):
    # start on the OUTER east-bound lane of the road y<0, goal on the
    # INNER lane far ahead on the same road: BFS must use the neighbor
    # edge, and the densified route must be continuous.
    half = LANE_WIDTH / 2.0
    start = (15.0, -(half + LANE_WIDTH))   # outer lane (k=1)
    goal = (70.0, -half)                   # inner lane (k=0)
    route = town2.route(start, goal)
    pts = np.array([(t.location.x, t.location.y) for t in route])
    gaps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert gaps.max() < 2.0              # no teleports
    assert abs(pts[-1, 1] - (-half)) < 0.3   # ends on the inner lane
    assert abs(pts[0, 1] - (-(half + LANE_WIDTH))) < 0.3
    # monotone forward progress in x
    assert (np.diff(pts[:, 0]) > -0.2).all()


def test_route_without_lane_change_flag(town2):
    half = LANE_WIDTH / 2.0
    start = (15.0, -(half + LANE_WIDTH))
    goal = (70.0, -half)
    # without neighbor edges the router must go around (longer) or fail;
    # with them the route is direct
    direct = town2.route(start, goal, allow_lane_change=True)
    pts = np.array([(t.location.x, t.location.y) for t in direct])
    direct_len = float(np.linalg.norm(np.diff(pts, axis=0), axis=1).sum())
    assert direct_len < 80.0


def test_route_backwards_goal_routes_around(town):
    # goal BEHIND the start on the same lane: must loop via topology,
    # not degenerate to a single point (round-2 review finding)
    r = town.route((60.0, -1.75), (20.0, -1.75))
    pts = np.array([(t.location.x, t.location.y) for t in r])
    assert len(pts) > 100
    assert np.linalg.norm(np.diff(pts, axis=0), axis=1).max() < 2.0
    assert np.linalg.norm(pts[-1] - [20.0, -1.75]) < 1.0


def test_traffic_brakes_for_crossing_walker(town):
    """Background cars must see NON-managed road users (walkers crossing,
    scenario adversaries) as obstacles — CARLA's TM collision detection
    covers all registered actors, not just its own vehicles."""
    lane = next(l for l in town.lanes.values()
                if not l.is_junction and l.length > 50)
    from transfuser_tpu.sim.traffic import ManagedVehicle
    car = Actor(actor_id=9005, type_id="vehicle.background",
                transform=Transform(Location(0, 0), Rotation()))
    mv = ManagedVehicle(actor=car, lane_id=lane.lane_id, s=5.0,
                        target_speed=8.0)
    tm = TrafficManager(town, seed=0)
    tm.vehicles = [mv]
    # a walker standing mid-lane 35 m ahead
    wxy, _ = lane.position(40.0)
    walker = Actor(actor_id=9100, type_id="walker.pedestrian",
                   transform=Transform(Location(float(wxy[0]),
                                                float(wxy[1])),
                                       Rotation()),
                   extent=Location(0.4, 0.4, 1.0))
    sim = _sim_for(town, start=(200.0, 300.0))
    sim.actors.extend([car, walker])
    sim.traffic = tm
    for _ in range(200):
        sim.tick()
    # car stopped short of the walker, never drove through it
    assert mv.speed < 0.3
    assert mv.lane_id == lane.lane_id
    assert mv.s < 40.0 - car.extent.x
    assert mv.s > 10.0  # did approach before stopping


def test_interpolate_trajectory_follows_lanes(town):
    """Map-aware densification routes keypoint pairs ALONG the lane
    network (the linear fallback cuts junction corners, which both
    misleads the expert planner and mis-scores OutsideRouteLanes)."""
    from transfuser_tpu.harness.route_parser import (RoadOption,
                                                     interpolate_trajectory)
    # southbound on x=78.25 through junction (80, 0), exiting west on the
    # westbound lane y=+1.75: a right turn whose straight-line chord
    # crosses the block interior
    traj = [Transform(Location(78.25, 30.0), Rotation(yaw=-90.0)),
            Transform(Location(40.0, 1.75), Rotation(yaw=180.0))]
    linear = interpolate_trajectory(traj)
    assert any(not town.on_road(t.location.x, t.location.y)
               for t, _ in linear)  # the chord leaves the road
    dense = interpolate_trajectory(traj, town_map=town)
    assert all(town.on_road(t.location.x, t.location.y, margin=0.6)
               for t, _ in dense)
    opts = [o for _, o in dense]
    assert RoadOption.RIGHT in opts  # junction span labeled by yaw delta
    assert opts[0] == RoadOption.LANEFOLLOW
    # off-network keypoints fall back to the linear leg
    off = [Transform(Location(500.0, 500.0)), Transform(Location(520.0, 500.0))]
    assert len(interpolate_trajectory(off, town_map=town)) >= 2


def test_turn_connectors_above_min_turning_radius(town):
    """Junction connector arcs must stay above the ego's physical minimum
    turning radius (~3.6 m, WoR bicycle model) — a quadratic bezier's apex
    radius was half the tangent-arc's and made tight right turns
    untrackable."""
    for lane in town.lanes.values():
        if not lane.is_junction:
            continue
        pts = np.asarray(lane.centerline)
        if len(pts) < 7:
            continue
        d1 = np.gradient(pts, axis=0)
        d2 = np.gradient(d1, axis=0)
        num = np.abs(d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0])
        den = np.maximum((d1 ** 2).sum(axis=1) ** 1.5, 1e-9)
        curvature = num / den
        # ignore endpoints (gradient boundary effects)
        assert curvature[3:-3].max() < 1.0 / 3.6, (
            f"lane {lane.lane_id}: min radius "
            f"{1.0 / max(curvature[3:-3].max(), 1e-9):.2f} m")


def test_junction_interior_is_paved(town):
    # junction boxes are paved wall to wall (CARLA junctions): a point
    # inside the box but off every connector centerline strip is on-road
    assert town.on_road(75.0, 75.0)   # inside junction (80, 80) corner
    assert not town.on_road(40.0, 40.0)  # block interior stays off-road


def test_traffic_lane_changes_around_blocker():
    """A parked external actor mid-lane must not necrose the road: the
    following TM vehicle changes to the free adjacent lane and passes
    (CARLA TM auto-lane-change equivalent)."""
    town2 = grid_town(blocks=2, block_size=80.0, lanes_per_dir=2,
                      lights_at=[])
    lane = next(l for l in town2.lanes.values()
                if not l.is_junction and l.length > 50
                and (l.left_neighbor is not None
                     or l.right_neighbor is not None))
    xy, yaw = lane.position(40.0)
    sim = _sim_for(town2, start=(200.0, 300.0))  # ego far away
    blocker = Actor(actor_id=9100, type_id="vehicle.parked",
                    transform=Transform(Location(float(xy[0]),
                                                 float(xy[1])),
                                        Rotation(yaw=yaw)))
    tm = TrafficManager(town2, seed=0)
    from transfuser_tpu.sim.traffic import ManagedVehicle
    follower = Actor(actor_id=9101, type_id="vehicle.background",
                     transform=Transform(Location(0, 0), Rotation()))
    mv = ManagedVehicle(actor=follower, lane_id=lane.lane_id, s=5.0,
                        target_speed=8.0)
    tm.vehicles = [mv]
    sim.actors.extend([blocker, follower])
    sim.traffic = tm
    for _ in range(300):  # 30 s
        sim.tick()
    # it went around: either on the neighbor lane, or back past the
    # blocker — in all cases it progressed well beyond the blocker's s
    progressed = (mv.lane_id != lane.lane_id
                  or mv.s > 50.0)
    assert progressed, (mv.lane_id, mv.s)


def test_traffic_graze_does_not_block():
    """An actor standing just OUTSIDE the swept corridor (corner near
    the paved edge) must not stop lane traffic — occupancy is decided by
    exact OBB overlap with the sweep, not the full lane width."""
    town2 = grid_town(blocks=2, block_size=80.0, lanes_per_dir=1,
                      lights_at=[])
    lane = next(l for l in town2.lanes.values()
                if not l.is_junction and l.length > 50)
    xy, yaw = lane.position(40.0)
    # place the bystander 3.0 m laterally off the centerline, aligned
    # with the lane: its body (half width 1.06) stays ~0.9 m clear of
    # the 1.26 m sweep corridor -> no conflict
    import math as _m
    nx, ny = -_m.sin(_m.radians(yaw)), _m.cos(_m.radians(yaw))
    bystander = Actor(actor_id=9200, type_id="vehicle.parked",
                      transform=Transform(
                          Location(float(xy[0] + 3.0 * nx),
                                   float(xy[1] + 3.0 * ny)),
                          Rotation(yaw=yaw)))
    sim = _sim_for(town2, start=(200.0, 300.0))
    tm = TrafficManager(town2, seed=0)
    from transfuser_tpu.sim.traffic import ManagedVehicle
    runner = Actor(actor_id=9201, type_id="vehicle.background",
                   transform=Transform(Location(0, 0), Rotation()))
    mv = ManagedVehicle(actor=runner, lane_id=lane.lane_id, s=5.0,
                        target_speed=8.0)
    tm.vehicles = [mv]
    sim.actors.extend([bystander, runner])
    sim.traffic = tm
    for _ in range(150):  # 15 s
        sim.tick()
    assert mv.s > 50.0 or mv.lane_id != lane.lane_id, (mv.s, mv.lane_id)


def test_junction_interlock_backoff():
    """A TM vehicle wedged mid-junction at contact with a stationary
    external actor (the classic ego<->connector standoff that ended
    Longest6 routes 8/25/35 as AgentBlocked) must REVERSE along its
    connector to reopen the crossing, then hold; once the blocker
    leaves it resumes."""
    town2 = grid_town(blocks=2, block_size=80.0, lights_at=[])
    conn = next(l for l in town2.lanes.values()
                if l.is_junction and l.length > 10)
    s0 = conn.length * 0.5
    xy, yaw = conn.position(s0)
    # blocker parked dead ahead on the connector, at bumper contact
    import math as _m
    bs = min(s0 + 4.6, conn.length - 0.5)  # ~0.1 m bumper gap
    bxy, byaw = conn.position(bs)
    blocker = Actor(actor_id=9300, type_id="vehicle.parked",
                    transform=Transform(Location(float(bxy[0]),
                                                 float(bxy[1])),
                                        Rotation(yaw=byaw)))
    sim = _sim_for(town2, start=(200.0, 300.0))  # ego far away
    tm = TrafficManager(town2, seed=0)
    from transfuser_tpu.sim.traffic import ManagedVehicle
    car = Actor(actor_id=9301, type_id="vehicle.background",
                transform=Transform(Location(float(xy[0]), float(xy[1])),
                                    Rotation(yaw=yaw)))
    mv = ManagedVehicle(actor=car, lane_id=conn.lane_id, s=s0,
                        target_speed=8.0)
    tm.vehicles = [mv]
    sim.actors.extend([blocker, car])
    sim.traffic = tm
    for _ in range(300):  # 30 s: trigger (12 s blocked) + reverse
        sim.tick()
    assert mv.s < s0 - 2.0, (mv.s, s0)  # backed off the contact
    assert mv.hold, "vehicle should hold after the backoff"
    assert mv.speed == 0.0
    # blocker leaves -> hold clears and the car drives on
    sim.actors.remove(blocker)
    for _ in range(200):
        sim.tick()
    assert not mv.hold
    assert mv.s > s0 or mv.lane_id != conn.lane_id, (mv.s, mv.lane_id)
