"""Pillar voxelization golden tests (vs numpy oracle) + tools tests."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transfuser_tpu.config import PointPillarConfig
from transfuser_tpu.ops import pillars


def test_segment_ops_match_oracle(rng):
    n, cells, c = 200, 16, 3
    ids = rng.integers(0, cells, n)
    vals = rng.standard_normal((n, c)).astype(np.float32)
    mean = np.asarray(pillars.segment_mean(jnp.asarray(vals),
                                           jnp.asarray(ids), cells))
    mx = np.asarray(pillars.segment_max(jnp.asarray(vals),
                                        jnp.asarray(ids), cells))
    for s in range(cells):
        m = ids == s
        if m.any():
            np.testing.assert_allclose(mean[s], vals[m].mean(0), rtol=1e-5,
                                       atol=1e-5)
            np.testing.assert_allclose(mx[s], vals[m].max(0), rtol=1e-5,
                                       atol=1e-5)
        else:
            np.testing.assert_allclose(mx[s], 0.0)


def test_pillar_cells_and_decoration():
    pts = np.array([
        [-15.0, -30.0, 0.0, 0.5],   # valid
        [0.0, -1.0, 0.0, 0.2],      # valid
        [20.0, -1.0, 0.0, 0.1],     # out of x range
        [0.0, -1.0, 0.0, 0.9],      # padded away by num_points
    ], np.float32)
    cfg = PointPillarConfig()
    cells, valid = pillars.pillar_cells(
        jnp.asarray(pts), jnp.int32(3), cfg.min_x, cfg.max_x, cfg.min_y,
        cfg.max_y, 8)
    valid = np.asarray(valid)
    assert valid.tolist() == [True, True, False, False]
    nx = int((cfg.max_x - cfg.min_x) * 8)
    ny = int((cfg.max_y - cfg.min_y) * 8)
    assert np.asarray(cells)[2] == ny * nx  # sentinel
    feats = pillars.decorate_points(
        jnp.asarray(pts), cells, valid, ny * nx, cfg.min_x, cfg.min_y, nx, 8)
    assert feats.shape == (4, 9)
    # single point in its pillar -> zero cluster offset
    np.testing.assert_allclose(np.asarray(feats)[0, 4:7], 0.0, atol=1e-5)
    # center offsets within one cell size
    assert abs(float(feats[0, 7])) <= 0.125 + 1e-6


def test_point_pillar_net_shapes():
    from transfuser_tpu.models.point_pillar import PointPillarNet
    cfg = PointPillarConfig(min_x=-4, max_x=4, min_y=-8, max_y=0)
    net = PointPillarNet(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-6, 6, (2, 100, 4)).astype(np.float32)
    num = np.array([80, 100], np.int32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                         jnp.asarray(num), train=False)
    canvas = net.apply(variables, jnp.asarray(pts), jnp.asarray(num))
    assert canvas.shape == (2, 64, 64, 32)
    assert np.isfinite(np.asarray(canvas)).all()


def test_result_parser(tmp_path):
    from transfuser_tpu.tools import result_parser as rp
    data = {
        "_checkpoint": {"records": [{
            "route_id": "r0", "index": 0, "status": "Completed",
            "scores": {"score_composed": 50.0, "score_route": 80.0,
                       "score_penalty": 0.625},
            "infractions": {k: [] for k in rp.INFRACTION_COLUMNS},
            "meta": {"duration_game": 100.0, "route_length": 1500.0},
        }]},
    }
    data["_checkpoint"]["records"][0]["infractions"][
        "collisions_vehicle"] = [
        "Agent collided against object with type=vehicle.x and id=5 at "
        "(x=12.5, y=-3.25, z=0.1)"]
    p = str(tmp_path / "res.json")
    with open(p, "w") as f:
        json.dump(data, f)
    rows = rp.per_route_rows(rp.load_results([p]))
    assert rows[0]["n_collisions_vehicle"] == 1
    agg = rp.aggregate(rp.load_results([p]))
    assert agg["avg_score_composed"] == 50.0
    locs = rp.infraction_locations(rp.load_results([p]))
    assert locs[0]["x"] == 12.5 and locs[0]["y"] == -3.25
    csv_path = str(tmp_path / "out.csv")
    rp.write_csv(rows, csv_path)
    assert os.path.exists(csv_path)


def test_route_gen(tmp_path):
    from transfuser_tpu.tools.route_gen import (TopologyEdge, TownGraph,
                                                generate_routes,
                                                generate_scenarios)
    # a curved edge and a junction edge
    theta = np.linspace(0, np.pi / 2, 30)
    curved = TopologyEdge(points=[
        (100 * np.cos(t), 100 * np.sin(t), float(np.degrees(t) + 90))
        for t in theta])
    junction = TopologyEdge(points=[(0.0, 0.0, 0.0), (5.0, 0.0, 0.0)],
                            is_junction=True, predecessors=[0])
    curved.successors = [1]
    g = TownGraph("Town01", [curved, junction])
    xml_path = str(tmp_path / "routes.xml")
    n = generate_routes(g, xml_path, kind="curved")
    assert n == 1 and os.path.exists(xml_path)
    from transfuser_tpu.harness.route_parser import parse_routes_file
    cfgs = parse_routes_file(xml_path)
    assert cfgs[0].town == "Town01"
    js_path = str(tmp_path / "scen.json")
    # Scenario10: unsignalized-junction approach endpoints
    m = generate_scenarios(g, js_path, "Scenario10")
    assert m == 1
    from transfuser_tpu.harness.route_parser import \
        load_scenario_annotations
    ann = load_scenario_annotations(js_path)
    assert "Town01" in ann
