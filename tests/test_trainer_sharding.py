"""Multi-chip training-step tests on the 8-device virtual CPU mesh:
data-parallel + tensor-parallel GPT + ZeRO-1 opt-state sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from transfuser_tpu.data.synthetic import synthetic_batch
from transfuser_tpu.parallel import sharding as shd
from transfuser_tpu.train.trainer import Trainer

from helpers import tiny_config


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_train_step_dp_tp_zero1():
    cfg = tiny_config()
    mesh = shd.make_mesh(shd.MeshSpec(data=4, model=2))
    trainer = Trainer(cfg, mesh=mesh, dtype=jnp.float32)
    batch = synthetic_batch(cfg, 8, img_hw=(64, 128), lidar_hw=(64, 64),
                            bev_hw=(40, 40))
    state = trainer.init_state(batch)

    # TP: GPT qkv kernels are sharded over 'model'.
    gpt_params = state.params["backbone"]["transformer1"]["block_0"]["attn"]
    qspec = gpt_params["query"]["kernel"].sharding.spec
    assert qspec == P(None, "model")
    pspec = gpt_params["proj"]["kernel"].sharding.spec
    assert pspec == P("model", None)

    # ZeRO-1: a large adam moment leaf is sharded over 'data'.
    leaves_with_sharding = [
        (l.shape, l.sharding.spec)
        for l in jax.tree.leaves(state.opt_state)
        if hasattr(l, "sharding") and np.prod(l.shape) >= 1024
    ]
    assert any("data" in str(spec) for _, spec in leaves_with_sharding)

    state2, metrics = trainer.train_step(state, trainer.put_batch(batch))
    assert np.isfinite(float(metrics["loss_total"]))
    assert int(state2.step) == 1

    # Second step runs from donated/updated state.
    trainer.state = state2
    _, m2 = trainer.train_step(state2, trainer.put_batch(batch))
    assert np.isfinite(float(m2["loss_total"]))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dp_matches_single_device_loss():
    """Same batch, same seed: the 8-way sharded step computes the same loss
    as the unsharded step (GSPMD is semantics-preserving)."""
    cfg = tiny_config()
    batch = synthetic_batch(cfg, 8, img_hw=(64, 128), lidar_hw=(64, 64),
                            bev_hw=(40, 40))

    t_single = Trainer(cfg, mesh=None, dtype=jnp.float32)
    s0 = t_single.init_state(batch, seed=7)
    _, m_single = t_single.train_step(s0, batch)

    mesh = shd.make_mesh(shd.MeshSpec(data=8, model=1))
    t_mesh = Trainer(cfg, mesh=mesh, dtype=jnp.float32)
    s1 = t_mesh.init_state(batch, seed=7)
    _, m_mesh = t_mesh.train_step(s1, t_mesh.put_batch(batch))

    np.testing.assert_allclose(float(m_single["loss_total"]),
                               float(m_mesh["loss_total"]),
                               rtol=2e-4)
