"""Closed-loop hermetic test: tiny TransFuser ensemble driving in the
replay backend through the full evaluator, plus checkpoint round trips."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transfuser_tpu.data.synthetic import synthetic_batch
from transfuser_tpu.models import LidarCenterNet
from transfuser_tpu.train.checkpoint import (list_ensemble_weights,
                                             load_config_snapshot,
                                             load_inference_weights,
                                             save_config_snapshot,
                                             save_inference_weights)

from helpers import tiny_config


def _make_model_dir(tmp_path, n_members=2, backbone="transFuser"):
    cfg = tiny_config(backbone=backbone)
    model_dir = str(tmp_path / "model_ckpt")
    os.makedirs(model_dir, exist_ok=True)
    save_config_snapshot(model_dir, cfg)

    model = LidarCenterNet(cfg, dtype=jnp.float32)
    batch = synthetic_batch(cfg, 1, img_hw=(64, 128), lidar_hw=(64, 64),
                            bev_hw=(40, 40))

    def extras(b):
        if backbone != "geometric_fusion":
            return {}
        return dict(bev_points=b["bev_points"], cam_points=b["cam_points"])

    for m in range(n_members):
        variables = jax.jit(lambda rngs, b: model.init(
            rngs, b["rgb"], b["lidar"], b["target_point"],
            b["target_point_image"], b["speed"], train=False,
            **extras(b)))(
            {"params": jax.random.PRNGKey(m),
             "dropout": jax.random.PRNGKey(100 + m)}, batch)
        save_inference_weights(
            os.path.join(model_dir, f"model_{m}.msgpack"),
            jax.device_get(variables))
    return cfg, model_dir


def test_config_snapshot_roundtrip(tmp_path):
    cfg, model_dir = _make_model_dir(tmp_path, n_members=1)
    loaded = load_config_snapshot(model_dir)
    assert loaded.model.backbone == cfg.model.backbone
    assert loaded.sensors.img_resolution == (64, 128)
    assert loaded.model.gpt.n_layer == cfg.model.gpt.n_layer
    assert len(list_ensemble_weights(model_dir)) == 1


def test_hybrid_agent_closed_loop(tmp_path):
    cfg, model_dir = _make_model_dir(tmp_path, n_members=2)

    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.harness.evaluator import (Evaluator, EvaluatorArgs,
                                                  default_sensor_feeder)

    routes = str(tmp_path / "routes.xml")
    with open(routes, "w") as f:
        f.write("""<?xml version='1.0' encoding='UTF-8'?>
<routes><route id="0" town="Town01">
  <waypoint x="0.0" y="0.0" z="0.0" pitch="0" roll="0" yaw="0"/>
  <waypoint x="40.0" y="0.0" z="0.0" pitch="0" roll="0" yaw="0"/>
</route></routes>""")

    args = EvaluatorArgs(
        routes=routes, scenarios=None,
        checkpoint=str(tmp_path / "results.json"),
        agent_factory=lambda c: HybridAgent(model_dir),
        max_game_seconds=4.0,  # a few dozen model steps
        timeout=600.0)
    ev = Evaluator(args)
    result = ev.run()

    data = json.load(open(str(tmp_path / "results.json")))
    rec = data["_checkpoint"]["records"][0]
    # Untrained net: we don't expect it to drive, only that the whole
    # pipeline (sensors -> jitted ensemble -> NMS -> PID -> control ->
    # criteria -> score) runs without crashing; timing out / getting
    # blocked are legitimate outcomes for random weights.
    assert "crashed" not in rec["status"].lower(), rec["status"]
    assert rec["scores"]["score_penalty"] <= 1.0
    assert data["labels"][0] == "Avg. driving score"


def test_agent_action_repeat_and_buffers(tmp_path):
    cfg, model_dir = _make_model_dir(tmp_path, n_members=1)
    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.harness.route_parser import location_route_to_gps, \
        RoadOption
    from transfuser_tpu.sim.replay import ReplaySimulation
    from transfuser_tpu.sim.types import Location, Rotation, Transform

    agent = HybridAgent(model_dir)
    traj = [Transform(Location(float(x), 0.0)) for x in range(0, 100, 10)]
    plan = location_route_to_gps([(t, RoadOption.LANEFOLLOW) for t in traj])
    agent.set_global_plan(plan, [(t, RoadOption.LANEFOLLOW) for t in traj])
    for spec in agent.sensors():
        agent.sensor_interface.register_sensor(spec["id"], spec["type"])

    sim = ReplaySimulation(traj, fps=20)
    from transfuser_tpu.harness.evaluator import default_sensor_feeder
    controls = []
    for _ in range(4):
        default_sensor_feeder(sim, agent)
        controls.append(agent(sim.game_time))
        sim.tick()
    # action repeat 2: frames 1 and 2 (0-indexed step 0/1) share the action
    assert controls[0].steer == controls[1].steer
    assert controls[0].throttle == controls[1].throttle
    assert len(agent.gps_buffer) == 4


def test_agent_geometric_correspondence_wiring(tmp_path, monkeypatch):
    """For the geometric family the agent computes per-frame lidar<->cam
    correspondence grids (submission_agent.py:302-312) and passes them to
    the ensemble forward; grid shapes match the default anchors."""
    import dataclasses

    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.config import GlobalConfig
    from transfuser_tpu.harness.evaluator import default_sensor_feeder
    from transfuser_tpu.harness.route_parser import (RoadOption,
                                                     location_route_to_gps)
    from transfuser_tpu.sim.replay import ReplaySimulation
    from transfuser_tpu.sim.types import Location, Transform
    from transfuser_tpu.train.checkpoint import save_config_snapshot

    # full-size geometric snapshot (anchor geometry is the reference's);
    # stub the ensemble build to avoid the full-size compile
    cfg = GlobalConfig()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                backbone="geometric_fusion"))
    model_dir = str(tmp_path / "geo")
    os.makedirs(model_dir, exist_ok=True)
    save_config_snapshot(model_dir, cfg)

    captured = {}

    def stub_build(self, weight_files):
        self.model_count = 1
        g = self.config.model.gpt

        def fake_forward(rgb, lidar, tp, tpi, speed, bev_points,
                         cam_points):
            captured["bev"] = np.asarray(bev_points).shape
            captured["cam"] = np.asarray(cam_points).shape
            k = self.config.model.centernet.top_k_center_keypoints
            return (jnp.zeros((1, 1, 4, 2)), jnp.zeros((1, 1, k, 8)),
                    jnp.zeros((1, 1, k), jnp.int32))
        self._forward = fake_forward

    monkeypatch.setattr(HybridAgent, "_build_ensemble", stub_build)
    agent = HybridAgent(model_dir)
    assert agent.backbone == "geometric_fusion"

    traj = [Transform(Location(float(x), 0.0)) for x in range(0, 100, 10)]
    plan = location_route_to_gps([(t, RoadOption.LANEFOLLOW) for t in traj])
    agent.set_global_plan(plan, [(t, RoadOption.LANEFOLLOW) for t in traj])
    for spec in agent.sensors():
        agent.sensor_interface.register_sensor(spec["id"], spec["type"])
    sim = ReplaySimulation(traj, fps=20)
    for _ in range(2):
        default_sensor_feeder(sim, agent)
        agent(sim.game_time)
        sim.tick()

    g = cfg.model.gpt
    assert captured["bev"] == (1, g.lidar_vert_anchors,
                               g.lidar_horz_anchors, 5, 2)
    assert captured["cam"] == (1, g.img_vert_anchors,
                               g.img_horz_anchors, 5, 2)


def test_agent_pipelined_fetch(tmp_path):
    """pipelined_fetch=True: frame N's control comes from the forward
    dispatched at frame N-2 (one compute frame of latency, hidden under
    the action repeat); the first compute frame only primes the pipe."""
    import dataclasses

    cfg, model_dir = _make_model_dir(tmp_path, n_members=1)
    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.harness.evaluator import default_sensor_feeder
    from transfuser_tpu.harness.route_parser import (RoadOption,
                                                     location_route_to_gps)
    from transfuser_tpu.sim.replay import ReplaySimulation
    from transfuser_tpu.sim.types import Location, Transform

    agent = HybridAgent(model_dir)
    agent.config = agent.config.replace(
        controller=dataclasses.replace(agent.config.controller,
                                       pipelined_fetch=True))
    traj = [Transform(Location(float(x), 0.0)) for x in range(0, 100, 10)]
    plan = location_route_to_gps([(t, RoadOption.LANEFOLLOW) for t in traj])
    agent.set_global_plan(plan, [(t, RoadOption.LANEFOLLOW) for t in traj])
    for spec in agent.sensors():
        agent.sensor_interface.register_sensor(spec["id"], spec["type"])

    sim = ReplaySimulation(traj, fps=20)
    controls = []
    for _ in range(6):
        default_sensor_feeder(sim, agent)
        controls.append(agent(sim.game_time))
        sim.tick()
    # step 0 primes the pipeline: initial control held, forward pending
    assert controls[0].brake == 1.0
    assert agent._pending is not None
    # step 2 fetches step 0's forward: real waypoints drive the control
    assert agent.pred_wp is not None
    # action repeat still applies each computed action for two frames
    assert controls[2].steer == controls[3].steer
    assert controls[4].steer == controls[5].steer
    assert len(agent.gps_buffer) == 6


def test_agent_async_inference(tmp_path):
    """async_inference=True: the packed upload->dispatch->fetch chain runs
    on the _InferenceWorker thread; the control loop sees the same
    one-frame lag as pipelined_fetch but never blocks on the tunnel. The
    controls stream must match the pipelined mode exactly (same model,
    same lag, same priming)."""
    import dataclasses

    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.harness.evaluator import default_sensor_feeder
    from transfuser_tpu.harness.route_parser import (RoadOption,
                                                     location_route_to_gps)
    from transfuser_tpu.sim.replay import ReplaySimulation
    from transfuser_tpu.sim.types import Location, Transform

    cfg, model_dir = _make_model_dir(tmp_path, n_members=1)
    traj = [Transform(Location(float(x), 0.0)) for x in range(0, 100, 10)]
    plan = location_route_to_gps([(t, RoadOption.LANEFOLLOW) for t in traj])

    def drive(**ctrl_kw):
        agent = HybridAgent(model_dir)
        agent.config = agent.config.replace(
            controller=dataclasses.replace(agent.config.controller,
                                           **ctrl_kw))
        agent.set_global_plan(plan,
                              [(t, RoadOption.LANEFOLLOW) for t in traj])
        for spec in agent.sensors():
            agent.sensor_interface.register_sensor(spec["id"], spec["type"])
        sim = ReplaySimulation(traj, fps=20)
        controls = []
        for _ in range(8):
            default_sensor_feeder(sim, agent)
            controls.append(agent(sim.game_time))
            sim.tick()
        agent.destroy()
        return agent, controls

    agent_a, async_controls = drive(async_inference=True)
    assert agent_a._worker is None  # destroy() closed it
    assert agent_a.pred_wp is not None
    _, piped_controls = drive(pipelined_fetch=True)
    for a, p in zip(async_controls, piped_controls):
        assert a.steer == p.steer and a.throttle == p.throttle \
            and a.brake == p.brake


@pytest.mark.parametrize("backbone", ["transFuser", "geometric_fusion"])
def test_packed_forward_matches_direct(tmp_path, backbone):
    """The single-RPC packed frame path (one uint8 buffer up, one
    flattened array down — PERF_NOTES 'HybridAgent RPC census') must be
    numerically identical to calling the vmapped ensemble with the
    separate arrays, including the float32 target_point/speed bitcast
    round trip through uint8 bytes and (geometric_fusion) the int32
    correspondence grids' round trip through uint8 cell indices."""
    import jax.numpy as jnp
    cfg, model_dir = _make_model_dir(tmp_path, n_members=2,
                                     backbone=backbone)
    from transfuser_tpu.agents.hybrid_agent import HybridAgent

    agent = HybridAgent(model_dir)
    assert agent._forward_packed is not None
    rgb_sh, lid_sh, tpi_sh, n_rgb, n_lid, n_tpi = agent._pack_layout

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, rgb_sh, dtype=np.uint8)
    lidar = rng.integers(0, 32, lid_sh, dtype=np.uint8)
    tpi = rng.integers(0, 2, tpi_sh, dtype=np.uint8) * 255
    target_point = np.array([[7.25, -3.5]], np.float32)
    speed = np.array([2.125], np.float32)

    direct_args = [jnp.asarray(rgb), jnp.asarray(lidar),
                   jnp.asarray(target_point), jnp.asarray(tpi),
                   jnp.asarray(speed)]
    geo_parts = []
    if backbone == "geometric_fusion":
        g = cfg.model.gpt
        bev_pts = rng.integers(
            0, min(g.img_vert_anchors, g.img_horz_anchors),
            (1, g.lidar_vert_anchors, g.lidar_horz_anchors, 5, 2)
        ).astype(np.int32)
        cam_pts = rng.integers(
            0, min(g.lidar_vert_anchors, g.lidar_horz_anchors),
            (1, g.img_vert_anchors, g.img_horz_anchors, 5, 2)
        ).astype(np.int32)
        direct_args += [jnp.asarray(bev_pts), jnp.asarray(cam_pts)]
        geo_parts = [bev_pts.astype(np.uint8).ravel(),
                     cam_pts.astype(np.uint8).ravel()]

    direct = agent._forward(*direct_args)
    wp_d, boxes_d = np.asarray(direct[0]), np.asarray(direct[1])

    scal = np.concatenate([target_point.ravel(), speed.ravel()])
    buf = np.concatenate([rgb.ravel(), lidar.ravel(), tpi.ravel(),
                          scal.view(np.uint8)] + geo_parts)
    flat = np.asarray(agent._forward_packed(jnp.asarray(buf)))
    wp_p = flat[:agent._wp_size].reshape(agent._wp_shape)
    boxes_p = flat[agent._wp_size:].reshape(agent._boxes_shape)

    assert wp_p.shape == wp_d.shape
    assert boxes_p.shape == boxes_d.shape
    np.testing.assert_allclose(wp_p, wp_d, rtol=0, atol=0)
    np.testing.assert_allclose(boxes_p, boxes_d, rtol=0, atol=0)
