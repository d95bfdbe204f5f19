"""Full framework lifecycle, hermetically: the privileged expert
collects a dataset -> the training reader loads it -> the Trainer fits
on it (loss decreases) -> the run exports HybridAgent-format weights ->
the trained agent drives the closed-loop evaluator.

This is the end-to-end contract a reference user exercises across
datagen.sh -> train.py -> local_evaluation.sh."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import tiny_config
from test_autopilot import _drive, _straight_route, _wire_agent
from transfuser_tpu.agents.data_agent import DataAgent
from transfuser_tpu.data.dataset import CarlaDataset, collate
from transfuser_tpu.train.checkpoint import (save_config_snapshot,
                                             save_inference_weights)
from transfuser_tpu.train.trainer import Trainer


def test_datagen_train_eval_lifecycle(tmp_path, monkeypatch):
    # ---- 1. expert datagen in the hermetic sim
    monkeypatch.setenv("SAVE_PATH", str(tmp_path / "data"))
    agent = DataAgent(route_index=0)
    sim = _wire_agent(agent, _straight_route(length=200.0))
    _drive(agent, sim, 240)
    sp = agent.save_path
    assert len(os.listdir(sp / "measurements")) >= 20

    # ---- 2. the training reader consumes the written dataset at the
    # tiny config's shapes (crop/histogram/bev resolutions follow cfg)
    cfg = tiny_config()
    ds = CarlaDataset([str(sp)], cfg, augment=False)
    assert len(ds) >= 8
    batch = collate([ds[i] for i in range(4)])
    assert batch["rgb"].shape == (4, 64, 128, 3)
    assert batch["lidar"].shape == (4, 64, 64, 2)

    # ---- 3. train on it; loss must decrease on real (non-synthetic)
    # samples
    trainer = Trainer(cfg, dtype=jnp.float32)
    state = trainer.init_state(batch, seed=0)
    losses = []
    for _ in range(12):
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics["loss_total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses

    # ---- 4. export the run the way the train CLI does: config
    # snapshot + inference-format weights
    model_dir = str(tmp_path / "model_ckpt")
    os.makedirs(model_dir, exist_ok=True)
    save_config_snapshot(model_dir, cfg)
    save_inference_weights(
        os.path.join(model_dir, "model_0.msgpack"),
        {"params": state.params, "batch_stats": state.batch_stats})

    # ---- 5. the trained agent drives the closed-loop evaluator
    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.harness.evaluator import Evaluator, EvaluatorArgs

    routes = str(tmp_path / "routes.xml")
    with open(routes, "w") as f:
        f.write("""<?xml version='1.0' encoding='UTF-8'?>
<routes><route id="0" town="Town01">
  <waypoint x="0.0" y="0.0" z="0.0" pitch="0" roll="0" yaw="0"/>
  <waypoint x="40.0" y="0.0" z="0.0" pitch="0" roll="0" yaw="0"/>
</route></routes>""")
    result = Evaluator(EvaluatorArgs(
        routes=routes, scenarios=None,
        checkpoint=str(tmp_path / "results.json"),
        agent_factory=lambda c: HybridAgent(model_dir),
        max_game_seconds=4.0, timeout=600.0,
        print_route_table=False)).run()
    rec = json.load(open(str(tmp_path / "results.json")))[
        "_checkpoint"]["records"][0]
    assert "crashed" not in rec["status"].lower(), rec["status"]
