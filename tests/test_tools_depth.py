"""Tools depth: topology-walk route/scenario generators feeding the
harness, the ANSI result table, and the town-map pixel overlay.

Reference behaviors: tools/dataset/gen_routes/* + gen_scenarios/*,
leaderboard/utils/result_writer.py:19-116, tools/result_parser.py:25-64.
"""

import json
import os

import numpy as np
import pytest

from transfuser_tpu.harness.result_writer import (ResultOutputProvider,
                                                  fancy_grid)
from transfuser_tpu.harness.route_parser import (RouteIndexer,
                                                 parse_routes_file)
from transfuser_tpu.sim.town_map import grid_town
from transfuser_tpu.tools.result_parser import (render_town_overlay,
                                                world_to_pixel)
from transfuser_tpu.tools.route_gen import (TownGraph, generate_routes,
                                            generate_scenarios, is_straight,
                                            junction_routes, topology_walks)


@pytest.fixture(scope="module")
def graph():
    return TownGraph.from_town_map(grid_town(blocks=2, block_size=80.0))


def test_town_graph_bridge(graph):
    assert len(graph.edges) > 20
    junctions = [e for e in graph.edges if e.is_junction]
    roads = [e for e in graph.edges if not e.is_junction]
    assert junctions and roads
    # connectors link into the graph
    assert any(e.successors for e in junctions)
    assert any(e.predecessors for e in junctions)
    # default grid_town has a light at (1,1): some connectors signalized
    assert any(e.signalized for e in junctions)
    assert not all(e.signalized for e in junctions)


def test_topology_walks_and_straightness(graph):
    walks = topology_walks(graph)
    assert walks, "no topology walks found"
    # the grid town has only straight roads
    assert all(is_straight(w) for w in walks)
    # synthetic curve detected as non-straight
    curve = [(np.cos(t) * 50, np.sin(t) * 50,
              np.degrees(t) + 90) for t in np.linspace(0, 1.2, 30)]
    assert not is_straight(curve)


def test_junction_routes_by_turn(graph):
    for turn in ("straight", "left", "right"):
        routes = junction_routes(graph, turn=turn)
        assert routes, f"no {turn} junction routes"
    signal = junction_routes(graph, signalized=True)
    unsignal = junction_routes(graph, signalized=False)
    assert signal and unsignal


def test_generated_routes_parse_and_drive(tmp_path, graph):
    """VERDICT 'done' criterion: generated files parse through
    harness/route_parser and drive an evaluation."""
    routes_xml = str(tmp_path / "routes.xml")
    n = generate_routes(graph, routes_xml, kind="straight")
    assert n > 0
    configs = parse_routes_file(routes_xml)
    assert len(configs) == n
    assert all(len(c.trajectory) >= 2 for c in configs)

    scen_json = str(tmp_path / "scen7.json")
    n7 = generate_scenarios(graph, scen_json, "Scenario7")
    assert n7 > 0
    data = json.load(open(scen_json))
    assert "available_scenarios" in data
    events = data["available_scenarios"][0][graph.name][0][
        "available_event_configurations"]
    assert len(events) == n7
    assert all("transform" in e and "other_actors" in e for e in events)

    # the indexer consumes both files together
    indexer = RouteIndexer(routes_xml, scen_json, repetitions=1)
    assert indexer.total == n

    # drive one short closed-loop evaluation on the generated route
    from transfuser_tpu.agents.demo_agents import DummyAgent
    from transfuser_tpu.harness.evaluator import Evaluator, EvaluatorArgs
    result = Evaluator(EvaluatorArgs(
        routes=routes_xml, scenarios=scen_json,
        agent_factory=lambda cfg: DummyAgent(),
        checkpoint=str(tmp_path / "results.json"),
        max_game_seconds=3.0, town_map="grid",
        print_route_table=False)).run()
    scores = result.get("scores", result)
    assert "score_composed" in scores


def test_scenario_trigger_selection(graph, tmp_path):
    counts = {}
    for st in ("Scenario1", "Scenario3", "Scenario4", "Scenario7",
               "Scenario8", "Scenario9", "Scenario10"):
        counts[st] = generate_scenarios(
            graph, str(tmp_path / f"{st}.json"), st)
    assert counts["Scenario1"] == 0      # grid town has no curved roads
    assert counts["Scenario3"] > 0       # straights exist
    assert counts["Scenario4"] > 0
    assert counts["Scenario7"] > 0       # signalized straight crossings
    assert counts["Scenario10"] > 0      # unsignalized junctions


def test_result_table_output():
    class FakeCriterion:
        def __init__(self, name, status, events=()):
            self.name = name
            self.test_status = status
            self.events = list(events)

    crit = [FakeCriterion("RouteCompletionTest", "SUCCESS"),
            FakeCriterion("CollisionTest", "FAILURE", [1, 2])]
    crit[0].percentage = 87.5
    provider = ResultOutputProvider(
        "RouteScenario_3", "FAILURE", 12.0, 30.0, crit, timeout=60.0,
        stdout=False)
    text = provider.create_output_text()
    assert "RouteScenario_3" in text
    assert "RouteCompletionTest" in text
    assert "87.50 %" in text
    assert "2 times" in text
    assert "\033[91m" in text and "\033[92m" in text  # red + green
    assert "╒" in text and "╘" in text               # fancy grid rules

    # alignment: every table line has the same visible width
    from transfuser_tpu.harness.result_writer import _strip_ansi
    lines = [l for l in text.splitlines() if l.startswith(("│", "╒", "├",
                                                           "╘"))]
    widths = {len(_strip_ansi(l)) for l in lines[:8]}
    assert len(widths) == 1


def test_world_to_pixel_reference_calibration():
    # Town01: pix = (x - ref) * scale with abs() flips
    px, py = world_to_pixel((100.0, 50.0), "Town01")
    assert px == int((100.0 + 8.22) * (757 / 410))
    assert py == abs(int(-(50.0 + 8.187) * (636 / 345)))
    # Town03 flips y differently
    px3, py3 = world_to_pixel((0.0, 10.0), "Town03")
    assert py3 == int(-(-10.0 - 320.126) * (637 / 590))


def test_render_town_overlay_hermetic(tmp_path):
    town = grid_town(blocks=1, block_size=60.0)
    locations = [{"type": "collisions_vehicle", "x": 30.0, "y": 0.0},
                 {"type": "red_light", "x": 10.0, "y": -1.75}]
    out = str(tmp_path / "overlay.png")
    render_town_overlay(locations, town.name, out, town_map=town)
    import cv2
    img = cv2.cvtColor(cv2.imread(out), cv2.COLOR_BGR2RGB)
    assert img is not None and img.size > 0
    # blue collision cross and yellow red-light cross both present
    assert (np.all(img == (0, 0, 255), axis=-1)).any()
    assert (np.all(img == (255, 255, 0), axis=-1)).any()
    # road pixels rendered (gray 90)
    assert (img[..., 0] == 90).any()


def test_package_submission_stages_context(tmp_path):
    """Submission packaging (make_docker.sh equivalent) stages the package,
    checkpoints, Dockerfile with the reference env contract."""
    from transfuser_tpu.tools.package_submission import stage
    import pathlib
    repo_root = str(pathlib.Path(__file__).resolve().parents[1])
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "model_0040.msgpack").write_bytes(b"\x00\x01")
    out = str(tmp_path / "sub")
    stage(repo_root, str(ckpt), out)
    assert os.path.exists(os.path.join(out, "transfuser_tpu", "harness",
                                       "cli.py"))
    assert os.path.exists(os.path.join(out, "model_ckpt",
                                       "model_0040.msgpack"))
    dockerfile = open(os.path.join(out, "Dockerfile")).read()
    for env in ("TEAM_AGENT", "TEAM_CONFIG", "ROUTES", "SCENARIOS",
                "CHECKPOINT_ENDPOINT", "RESUME",
                "CHALLENGE_TRACK_CODENAME"):
        assert f"ENV {env}" in dockerfile
    assert os.access(os.path.join(out, "run_docker.sh"), os.X_OK)


def test_routes_map_with_town_background(tmp_path, graph):
    """vis_points/set_new_scenarios debug view over the road network."""
    from transfuser_tpu.tools.visualize import render_routes_map
    routes_xml = str(tmp_path / "r.xml")
    generate_routes(graph, routes_xml, kind="straight")
    scen_json = str(tmp_path / "s.json")
    generate_scenarios(graph, scen_json, "Scenario7")
    out = render_routes_map(routes_xml, scen_json,
                            str(tmp_path / "map.png"),
                            town_map=grid_town(blocks=2))
    assert os.path.getsize(out) > 1000


def test_lane_change_generator(tmp_path):
    from transfuser_tpu.tools.route_gen import lane_change_routes
    town2 = grid_town(blocks=2, block_size=80.0, lanes_per_dir=2)
    g2 = TownGraph.from_town_map(town2)
    # adjacency survives the bridge + JSON round trip
    assert any(e.left is not None for e in g2.edges)
    p = str(tmp_path / "graph.json")
    g2.to_json(p)
    g3 = TownGraph.from_json(p)
    lefts = [(i, e.left) for i, e in enumerate(g2.edges)
             if e.left is not None]
    assert [(i, e.left) for i, e in enumerate(g3.edges)
            if e.left is not None] == lefts
    # neighbor symmetry in edge space
    for i, li in lefts:
        assert g2.edges[li].right == i

    cats = lane_change_routes(g2)
    assert all(cats[k] for k in ("lr", "ll", "rr", "rl"))
    for k, routes in cats.items():
        for r in routes:
            assert len(r) == 3
            # mid keypoint is laterally offset from the start lane
            a, m = np.array(r[0][:2]), np.array(r[1][:2])
            assert np.linalg.norm(m - a) > 3.0

    # XML emission parses through the harness route parser, and the
    # route interpolates without teleports
    xml = str(tmp_path / "lc.xml")
    n = generate_routes(g2, xml, kind="lane_change_lr")
    assert n == len(cats["lr"])
    configs = parse_routes_file(xml)
    assert len(configs) == n
    assert all(len(c.trajectory) == 3 for c in configs)
    # densify the first route through the multi-lane town's router
    c = configs[0]
    dense = town2.route(
        (c.trajectory[0].location.x, c.trajectory[0].location.y),
        (c.trajectory[1].location.x, c.trajectory[1].location.y))
    pts = np.array([(t.location.x, t.location.y) for t in dense])
    assert np.linalg.norm(np.diff(pts, axis=0), axis=1).max() < 2.0


def test_expert_benchmark_tool(tmp_path):
    """The autopilot_longest6-equivalent artifact: generated routes +
    scenarios + moving traffic, expert-driven, scored JSON out."""
    from transfuser_tpu.tools.expert_benchmark import run_expert_benchmark
    out = str(tmp_path / "expert.json")
    scores = run_expert_benchmark(out, n_routes=2, max_game_seconds=25.0,
                                  background_vehicles=8,
                                  workdir=str(tmp_path))
    assert scores["n_routes"] == 2
    assert 0.0 <= scores["score_composed"] <= 100.0
    data = json.load(open(out))
    assert data["labels"][0] == "Avg. driving score"
    assert len(data["_checkpoint"]["records"]) == 2


def test_long_routes_longest6_shape(graph):
    """Longest6-shaped generator: long multi-junction walks at the
    requested length, distinct, and parseable by the route indexer
    (leaderboard/data/longest6: 36 routes averaging ~1.5 km)."""
    from transfuser_tpu.tools.route_gen import long_routes

    routes = long_routes(graph, n=8, target_len=400.0, seed=3)
    assert len(routes) == 8
    sigs = set()
    for r in routes:
        pts = np.array([(p[0], p[1]) for p in r])
        length = float(np.linalg.norm(np.diff(pts, axis=0), axis=1).sum())
        assert length >= 0.6 * 400.0
        # keypoints are sparse (densification happens in the harness)
        gaps = np.linalg.norm(np.diff(pts, axis=0), axis=1)
        assert gaps.max() < 60.0
        sigs.add((round(pts[0][0]), round(pts[0][1]),
                  round(pts[-1][0]), round(pts[-1][1])))
    assert len(sigs) > 1  # walks are not all identical


def test_long_routes_drive_through_indexer(tmp_path, graph):
    from transfuser_tpu.tools.route_gen import long_routes, routes_to_xml

    routes = long_routes(graph, n=2, target_len=300.0, seed=0)
    path = os.path.join(tmp_path, "long.xml")
    routes_to_xml(routes, graph.name, path)
    parsed = parse_routes_file(path)
    assert len(parsed) == 2
    assert all(len(r.trajectory) >= 5 for r in parsed)
