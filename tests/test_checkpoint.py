"""Training checkpoint save/restore roundtrip (orbax + msgpack paths).

Reference behavior: train.py:381-384 saves model_%d.pth + optimizer_%d.pth
every epoch; resume via --load_file/--start_epoch (train.py:179-183).
"""

import dataclasses
import os

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


def test_async_writer_mesh_sharded_roundtrip(tmp_path):
    """Orbax async checkpointing under a dp x tp mesh: the save overlaps
    training, the restore lands sharded (ROADMAP #11)."""
    pytest.importorskip("orbax.checkpoint")
    from transfuser_tpu.parallel import sharding as shd
    from transfuser_tpu.train.checkpoint import AsyncCheckpointWriter

    cfg = tiny_config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                multitask=False))
    mesh = shd.make_mesh(shd.MeshSpec(data=4, model=2))
    trainer = Trainer(cfg, mesh=mesh, dtype=jnp.float32)
    batch = synthetic_batch(cfg, 8)
    state = trainer.init_state(batch, seed=3)
    state, _ = trainer.train_step(state, trainer.put_batch(batch))
    logdir = str(tmp_path / "mesh_ckpt")
    with AsyncCheckpointWriter(logdir) as ckpt:
        assert ckpt.use_orbax
        ckpt.save(2, state)
        ckpt.wait()

        fresh = Trainer(cfg, mesh=mesh, dtype=jnp.float32)
        template = fresh.init_state(batch, seed=99)
        restored = ckpt.restore(2, template)
    _assert_tree_equal(restored.params, state.params)
    _assert_tree_equal(restored.opt_state, state.opt_state)
    # restored arrays keep the mesh sharding of the template
    leaf = jax.tree.leaves(restored.params)[0]
    assert getattr(leaf, "sharding", None) is not None
    assert leaf.sharding.mesh.shape == mesh.shape

    # training continues identically from the restored state
    s1, m1 = trainer.train_step(state, trainer.put_batch(batch))
    s2, m2 = fresh.train_step(restored, fresh.put_batch(batch))
    np.testing.assert_allclose(float(m1["loss_total"]),
                               float(m2["loss_total"]), rtol=1e-6)


def test_cross_process_resume(tmp_path):
    """A checkpoint written by one process restores in a fresh process
    (the driver's restart-from-checkpoint path)."""
    import subprocess
    import sys as _sys
    logdir = str(tmp_path / "xproc")
    script = f"""
import os, sys
for k in list(os.environ):
    if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
        del os.environ[k]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tests")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
sys.path.insert(0, "/root/repo")
import dataclasses
import jax.numpy as jnp
from helpers import tiny_config
from transfuser_tpu.data.synthetic import synthetic_batch
from transfuser_tpu.train.checkpoint import AsyncCheckpointWriter
from transfuser_tpu.train.trainer import Trainer
cfg = tiny_config()
cfg = cfg.replace(model=dataclasses.replace(cfg.model, multitask=False))
trainer = Trainer(cfg, dtype=jnp.float32)
batch = synthetic_batch(cfg, 2)
state = trainer.init_state(batch, seed=5)
state, m = trainer.train_step(state, batch)
with AsyncCheckpointWriter({logdir!r}) as ckpt:
    ckpt.save(1, state)
print("CHILD_LOSS", float(m["loss_total"]))
"""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    proc = subprocess.run([_sys.executable, "-c", script], env=env,
                          capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]

    from transfuser_tpu.train.checkpoint import AsyncCheckpointWriter
    cfg = tiny_config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                multitask=False))
    trainer = Trainer(cfg, dtype=jnp.float32)
    batch = synthetic_batch(cfg, 2)
    template = trainer.init_state(batch, seed=111)
    with AsyncCheckpointWriter(logdir) as ckpt:
        restored = ckpt.restore(1, template)
    assert int(restored.step) == 1
    # continues training without error and with a finite loss
    _s, m = trainer.train_step(restored, batch)
    assert np.isfinite(float(m["loss_total"]))
