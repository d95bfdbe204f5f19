"""The jitted training/eval steps + the epoch engine.

Replaces the reference Engine (train.py:213-379). One XLA program covers:
forward (all heads), in-graph CenterNet target generation, the 11-loss
weighted sum, backward, AdamW update and metric reduction. Under a
('data','model') mesh the same program runs data-parallel (+ optional
tensor-parallel GPT) with XLA-inserted collectives over ICI — the
NCCL/DDP/ZeRO-1/SyncBN stack of the reference collapses into sharding
annotations (see parallel/sharding.py).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import GlobalConfig
from ..models import LidarCenterNet
from ..parallel import sharding as shd
from .losses import compute_losses, total_loss
from .train_state import TrainState, create_train_state, make_optimizer

MODEL_INPUT_KEYS = ("rgb", "lidar", "target_point", "target_point_image",
                    "speed")


def _apply_model(model: LidarCenterNet, params, batch_stats, batch,
                 train: bool, dropout_rng=None):
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(train=train)
    if train:
        kwargs["rngs"] = {"dropout": dropout_rng}
    extra = {}
    if "bev_points" in batch:
        extra = dict(bev_points=batch["bev_points"],
                     cam_points=batch["cam_points"])
    if "num_points" in batch:
        extra["num_points"] = batch["num_points"]
    if train:
        return model.apply(
            variables, batch["rgb"], batch["lidar"], batch["target_point"],
            batch.get("target_point_image"), batch.get("speed"),
            mutable=["batch_stats"], **extra, **kwargs)
    out = model.apply(
        variables, batch["rgb"], batch["lidar"], batch["target_point"],
        batch.get("target_point_image"), batch.get("speed"), **extra,
        **kwargs)
    return out, {"batch_stats": batch_stats}


def make_train_step(model: LidarCenterNet, config: GlobalConfig,
                    tx: optax.GradientTransformation,
                    donate: bool = True) -> Callable:
    base_rng = jax.random.PRNGKey(config.train.seed)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out, mutated = _apply_model(model, params, state.batch_stats,
                                        batch, train=True, dropout_rng=rng)
            detailed = compute_losses(out, batch, config)
            return total_loss(detailed, config), (detailed, mutated)

        (loss, (detailed, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               batch_stats=mutated["batch_stats"],
                               opt_state=opt_state)
        metrics = {"loss_total": loss, **detailed}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: LidarCenterNet, config: GlobalConfig) -> Callable:
    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                  ) -> Dict[str, jnp.ndarray]:
        out, _ = _apply_model(model, state.params, state.batch_stats, batch,
                              train=False)
        detailed = compute_losses(out, batch, config)
        return {"loss_total": total_loss(detailed, config), **detailed}

    return jax.jit(eval_step)


class Trainer:
    """Epoch engine: sharded state init, train/validate loops, metrics.

    Host-side loop only; each step is one device program. Checkpointing via
    orbax lives in train/checkpoint.py.
    """

    def __init__(self, config: GlobalConfig,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 steps_per_epoch: Optional[int] = None,
                 dtype: Any = None):
        self.config = config
        self.mesh = mesh
        if dtype is None:
            dtype = jnp.bfloat16 \
                if config.train.compute_dtype == "bfloat16" else jnp.float32
        self.model = LidarCenterNet(config, dtype=dtype)
        self.tx = make_optimizer(config, steps_per_epoch)
        self.train_step = make_train_step(self.model, config, self.tx)
        self.eval_step = make_eval_step(self.model, config)
        self.state: Optional[TrainState] = None
        self.epoch = 0

    # ------------------------------------------------------------------ init
    def init_state(self, example_batch: Dict[str, np.ndarray],
                   seed: int = 0) -> TrainState:
        rngs = {"params": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 1)}

        def init_fn(rngs, batch):
            variables = self.model.init(
                rngs, batch["rgb"], batch["lidar"], batch["target_point"],
                batch.get("target_point_image"), batch.get("speed"),
                train=False)
            return create_train_state(variables, self.tx)

        if self.mesh is None:
            self.state = jax.jit(init_fn)(rngs, example_batch)
            return self.state

        # Shape-evaluate to plan shardings, then init directly into them.
        abstract = jax.eval_shape(init_fn, rngs, example_batch)
        p_shard = shd.param_sharding(abstract.params, self.mesh)
        o_shard = shd.opt_state_sharding(
            abstract.opt_state, p_shard, self.mesh,
            zero1=self.config.train.zero_redundancy_optimizer)
        state_shardings = TrainState(
            step=jax.sharding.NamedSharding(self.mesh,
                                            jax.sharding.PartitionSpec()),
            params=p_shard,
            batch_stats=shd.replicated_sharding(abstract.batch_stats,
                                                self.mesh),
            opt_state=o_shard)
        self._state_shardings = state_shardings
        batch_shardings = shd.batch_sharding(example_batch, self.mesh)
        init_jit = jax.jit(init_fn, out_shardings=state_shardings)
        batch_dev = jax.device_put(example_batch, batch_shardings)
        self.state = init_jit(rngs, batch_dev)
        return self.state

    def put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is None:
            return batch
        return jax.device_put(batch, shd.batch_sharding(batch, self.mesh))

    # ----------------------------------------------------------------- loops
    def train_epoch(self, batches: Iterable[Dict[str, np.ndarray]]
                    ) -> Dict[str, float]:
        agg: Dict[str, float] = {}
        n = 0
        for batch in batches:
            self.state, metrics = self.train_step(self.state,
                                                  self.put_batch(batch))
            n += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        self.epoch += 1
        return {k: v / max(n, 1) for k, v in agg.items()}

    def validate(self, batches: Iterable[Dict[str, np.ndarray]]
                 ) -> Dict[str, float]:
        agg: Dict[str, float] = {}
        n = 0
        for batch in batches:
            metrics = self.eval_step(self.state, self.put_batch(batch))
            n += 1
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        return {"val_" + k: v / max(n, 1) for k, v in agg.items()}
