"""Training checkpoint save/restore roundtrip (orbax + msgpack paths).

Reference behavior: train.py:381-384 saves model_%d.pth + optimizer_%d.pth
every epoch; resume via --load_file/--start_epoch (train.py:179-183).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from helpers import tiny_config
from transfuser_tpu.data.synthetic import synthetic_batch
from transfuser_tpu.train.checkpoint import (restore_checkpoint,
                                             save_checkpoint)
from transfuser_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def trained_state():
    cfg = tiny_config()
    model = dataclasses.replace(cfg.model, multitask=False)
    cfg = cfg.replace(model=model)
    trainer = Trainer(cfg, dtype=jnp.float32)
    batch = synthetic_batch(cfg, 2)
    state = trainer.init_state(batch)
    state, _ = trainer.train_step(state, batch)  # non-trivial opt state
    trainer.state = state
    return trainer, batch


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("use_orbax", [False, True])
def test_checkpoint_roundtrip(tmp_path, trained_state, use_orbax):
    if use_orbax:
        pytest.importorskip("orbax.checkpoint")
    trainer, batch = trained_state
    logdir = str(tmp_path / ("orbax" if use_orbax else "msgpack"))
    save_checkpoint(logdir, trainer.state, epoch=7, use_orbax=use_orbax)

    # fresh template with different values
    cfg = trainer.config
    fresh = Trainer(cfg, dtype=jnp.float32)
    template = fresh.init_state(batch, seed=123)
    restored = restore_checkpoint(logdir, 7, template,
                                  use_orbax=use_orbax)

    _assert_tree_equal(restored.params, trainer.state.params)
    _assert_tree_equal(restored.batch_stats, trainer.state.batch_stats)
    _assert_tree_equal(restored.opt_state, trainer.state.opt_state)
    assert int(restored.step) == int(trainer.state.step)

    # training continues from the restored state identically
    fresh.state = restored
    s1, m1 = trainer.train_step(trainer.state, batch)
    s2, m2 = fresh.train_step(restored, batch)
    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m2["loss_total"]), rtol=1e-6)
