"""Smoke + invariants for the full LidarCenterNet model (tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transfuser_tpu.data.synthetic import synthetic_batch
from transfuser_tpu.models import LidarCenterNet
from transfuser_tpu.train.losses import compute_losses, total_loss

from helpers import tiny_config


@pytest.fixture(scope="module")
def model_and_vars():
    cfg = tiny_config()
    model = LidarCenterNet(cfg, dtype=jnp.float32)
    batch = synthetic_batch(cfg, 2, img_hw=(64, 128), lidar_hw=(64, 64),
                            bev_hw=(40, 40))
    init_fn = jax.jit(lambda rngs, rgb, lidar, tp, tpi, speed: model.init(
        rngs, rgb, lidar, tp, tpi, speed, train=False))
    variables = init_fn(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["rgb"], batch["lidar"], batch["target_point"],
        batch["target_point_image"], batch["speed"])
    return cfg, model, variables, batch


def test_forward_shapes(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out = model.apply(variables, batch["rgb"], batch["lidar"],
                      batch["target_point"], batch["target_point_image"],
                      batch["speed"], train=False)
    assert out["pred_wp"].shape == (2, 4, 2)
    assert out["pred_bev"].shape == (2, 40, 40, 3)
    assert out["head_heatmap"].shape == (2, 16, 16, 1)
    assert out["head_wh"].shape == (2, 16, 16, 2)
    assert out["head_yaw_class"].shape == (2, 16, 16, 12)
    assert out["pred_semantic"].shape == (2, 64, 128, 7)
    assert out["pred_depth"].shape == (2, 64, 128)
    # heatmap is a sigmoid output
    hm = np.asarray(out["head_heatmap"])
    assert (hm > 0).all() and (hm < 1).all()


def test_losses_finite_and_weighted(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out = model.apply(variables, batch["rgb"], batch["lidar"],
                      batch["target_point"], batch["target_point_image"],
                      batch["speed"], train=False)
    detailed = compute_losses(out, {k: jnp.asarray(v) for k, v in batch.items()},
                              cfg)
    assert set(detailed) == set(cfg.loss.detailed_losses)
    for name, val in detailed.items():
        assert np.isfinite(float(val)), name
    tot = float(total_loss(detailed, cfg))
    assert np.isfinite(tot) and tot > 0


def test_train_mode_with_dropout_and_batchstats(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    out, mutated = model.apply(
        variables, batch["rgb"], batch["lidar"], batch["target_point"],
        batch["target_point_image"], batch["speed"], train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert "batch_stats" in mutated
    assert np.isfinite(np.asarray(out["pred_wp"])).all()


def test_forward_ego_decode(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    pred_wp, boxes, labels = model.apply(
        variables, batch["rgb"], batch["lidar"], batch["target_point"],
        batch["target_point_image"], batch["speed"],
        method=LidarCenterNet.forward_ego)
    assert pred_wp.shape == (2, 4, 2)
    assert boxes.shape == (2, 100, 8)
    assert labels.shape == (2, 100)
    scores = np.asarray(boxes[..., 7])
    assert (scores[:, :-1] >= scores[:, 1:]).all()  # top-k sorted


def test_gradients_flow(model_and_vars):
    cfg, model, variables, batch = model_and_vars
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    def loss_fn(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jbatch["rgb"], jbatch["lidar"], jbatch["target_point"],
            jbatch["target_point_image"], jbatch["speed"], train=True,
            rngs={"dropout": jax.random.PRNGKey(3)},
            mutable=["batch_stats"])[0]
        return total_loss(compute_losses(out, jbatch, cfg), cfg)

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # some gradient must be nonzero
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
