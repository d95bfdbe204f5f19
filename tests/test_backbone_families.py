"""Forward+loss smoke for every backbone family + a training-convergence
check (tiny shapes, CPU)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transfuser_tpu.data.synthetic import synthetic_batch
from transfuser_tpu.models import LidarCenterNet
from transfuser_tpu.train.losses import compute_losses, total_loss

from helpers import tiny_config

SMALL = dict(img_hw=(64, 128), lidar_hw=(64, 64), bev_hw=(40, 40))


def _init_and_outputs(cfg, batch):
    model = LidarCenterNet(cfg, dtype=jnp.float32)
    kwargs = {}
    if cfg.model.backbone == "geometric_fusion":
        kwargs = dict(bev_points=batch["bev_points"],
                      cam_points=batch["cam_points"])
    if cfg.model.point_pillars.use_point_pillars:
        kwargs["num_points"] = batch["num_points"]
    lidar_in = batch["lidar_raw"] \
        if cfg.model.point_pillars.use_point_pillars else batch["lidar"]
    init_fn = jax.jit(lambda r: model.init(
        r, batch["rgb"], lidar_in, batch["target_point"],
        batch["target_point_image"], batch["speed"], train=False, **kwargs))
    variables = init_fn({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)})
    out = jax.jit(lambda v: model.apply(
        v, batch["rgb"], lidar_in, batch["target_point"],
        batch["target_point_image"], batch["speed"], train=False,
        **kwargs))(variables)
    return model, variables, out


@pytest.mark.parametrize("backbone", ["late_fusion", "latentTF",
                                      "geometric_fusion"])
def test_backbone_family_forward_and_loss(backbone):
    cfg = tiny_config(backbone)
    batch = synthetic_batch(cfg, 2, **SMALL)
    model, variables, out = _init_and_outputs(cfg, batch)
    assert out["pred_wp"].shape == (2, 4, 2)
    assert out["head_heatmap"].shape[0] == 2
    detailed = compute_losses(out, {k: jnp.asarray(v)
                                    for k, v in batch.items()}, cfg)
    assert np.isfinite(float(total_loss(detailed, cfg)))


def test_point_pillars_variant():
    cfg = tiny_config("transFuser")
    pp = dataclasses.replace(cfg.model.point_pillars,
                             use_point_pillars=True, max_lidar_points=500,
                             min_x=-4.0, max_x=4.0, min_y=-8.0, max_y=0.0)
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                point_pillars=pp))
    batch = synthetic_batch(cfg, 2, **SMALL)
    model, variables, out = _init_and_outputs(cfg, batch)
    assert out["pred_wp"].shape == (2, 4, 2)
    assert np.isfinite(np.asarray(out["pred_wp"])).all()


def test_training_reduces_loss():
    """30 steps on one fixed batch must cut the loss substantially."""
    from transfuser_tpu.train.trainer import Trainer

    cfg = tiny_config()
    batch = synthetic_batch(cfg, 4, **SMALL)
    trainer = Trainer(cfg, mesh=None, dtype=jnp.float32)
    state = trainer.init_state(batch)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state, m0 = trainer.train_step(state, jbatch)
    first = float(m0["loss_total"])
    for _ in range(30):
        state, m = trainer.train_step(state, jbatch)
    last = float(m["loss_total"])
    assert np.isfinite(last)
    assert last < first * 0.9, (first, last)


@pytest.mark.parametrize("family", ["geometric_fusion", "pillars"])
def test_trainer_supports_every_family(family):
    """The shipped Trainer must train geometric fusion (correspondence
    tensors) and point pillars (raw cloud + counts), not just the
    histogram families (round-2 fix: init/apply forward the extras)."""
    from transfuser_tpu.train.trainer import Trainer

    if family == "pillars":
        cfg = tiny_config("transFuser")
        pp = dataclasses.replace(cfg.model.point_pillars,
                                 use_point_pillars=True,
                                 max_lidar_points=500, min_x=-4.0,
                                 max_x=4.0, min_y=-8.0, max_y=0.0)
        cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                    point_pillars=pp))
    else:
        cfg = tiny_config(family)
    batch = synthetic_batch(cfg, 2, **SMALL)
    trainer = Trainer(cfg, dtype=jnp.float32)
    state = trainer.init_state(batch)
    state, metrics = trainer.train_step(state, batch)
    assert np.isfinite(float(metrics["loss_total"]))


def test_geometric_reference_view_flag():
    """reference_grid_view reproduces the reference's x-major raw view
    (transpose to x-major memory, re-view as (h, w)); the config flag
    changes outputs but not the param tree."""
    import numpy as np
    from transfuser_tpu.models.geometric_fusion import reference_grid_view

    # numpy oracle: build the x-major buffer, raw-view it as (h, w)
    rng = np.random.default_rng(0)
    clean = rng.integers(0, 7, (1, 5, 22, 5, 2))
    xmajor = np.transpose(clean, (0, 2, 1, 3, 4))  # G[x, y] memory
    expected = xmajor.reshape(1, 5, 22, 5, 2)      # reference raw view
    got = np.asarray(reference_grid_view(jnp.asarray(clean)))
    np.testing.assert_array_equal(got, expected)

    cfg = tiny_config("geometric_fusion")
    cfg_q = cfg.replace(model=dataclasses.replace(
        cfg.model, geometric_reference_view=True))
    batch = synthetic_batch(cfg, 2, **SMALL)
    model, variables, out = _init_and_outputs(cfg, batch)
    model_q, variables_q, out_q = _init_and_outputs(cfg_q, batch)
    assert jax.tree.structure(variables["params"]) == \
        jax.tree.structure(variables_q["params"])
    # the scramble must actually change the fusion output
    assert not np.allclose(np.asarray(out["pred_wp"]),
                           np.asarray(out_q["pred_wp"]))
