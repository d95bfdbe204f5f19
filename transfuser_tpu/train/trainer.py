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
from ..data.pack import unpack_batch
from ..models import LidarCenterNet
from ..parallel import sharding as shd
from .losses import compute_losses, total_loss
from .train_state import TrainState, create_train_state, make_optimizer

MODEL_INPUT_KEYS = ("rgb", "lidar", "target_point", "target_point_image",
                    "speed")


def _model_inputs(batch):
    """(positional args, optional kwargs) for LidarCenterNet from a
    batch dict. Shared by init_state and the train/eval steps so the
    initialized graph always matches the trained one (geometric-fusion
    correspondences, point-pillar raw cloud + counts)."""
    extra = {}
    if "bev_points" in batch:
        extra = dict(bev_points=batch["bev_points"],
                     cam_points=batch["cam_points"])
    if "lidar_raw" in batch:
        # point pillars consume the padded raw cloud, not the
        # histogram; direct indexing fails loudly on half-built batches
        lidar = batch["lidar_raw"]
        extra["num_points"] = batch["num_points"]
    else:
        lidar = batch["lidar"]
    args = (batch["rgb"], lidar, batch["target_point"],
            batch.get("target_point_image"), batch.get("speed"))
    return args, extra


def _apply_model(model: LidarCenterNet, params, batch_stats, batch,
                 train: bool, dropout_rng=None):
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(train=train)
    if train:
        kwargs["rngs"] = {"dropout": dropout_rng}
    args, extra = _model_inputs(batch)
    if train:
        return model.apply(variables, *args, mutable=["batch_stats"],
                           **extra, **kwargs)
    out = model.apply(variables, *args, **extra, **kwargs)
    return out, {"batch_stats": batch_stats}


def make_train_step(model: LidarCenterNet, config: GlobalConfig,
                    tx: optax.GradientTransformation,
                    donate: bool = False,
                    split: bool = True) -> Callable:
    """Build the training step.

    split=True compiles TWO device programs — (forward+backward) and
    (optimizer update) — chained without host sync; each sub-program
    compiles faster than the monolith and the boundary gives the runtime
    a natural point to release grad buffers. (Round-1's '17x faster than
    monolithic' claim was a dispatch-timing artifact — PERF_NOTES; the
    honest comparison is re-measured by `bench.py --monolithic`.)
    """
    seed = int(config.train.seed)

    def grad_fn(params, batch_stats, step, batch):
        # Packed (uint8/uint16 wire-format) batches are widened here so
        # the cast+scale is fused on-device; identity on fp32 batches
        # (data/pack.py — the tunnel is bandwidth-bound at ~120 MB/s).
        batch = unpack_batch(batch)
        # Key derived in-trace from the static seed: a closure-captured
        # device array would ride along as an extra runtime constant.
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), step)

        def loss_fn(p):
            out, mutated = _apply_model(model, p, batch_stats, batch,
                                        train=True, dropout_rng=rng)
            detailed = compute_losses(out, batch, config)
            return total_loss(detailed, config), (detailed, mutated)

        (loss, (detailed, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return grads, loss, detailed, mutated["batch_stats"]

    def update_fn(grads, opt_state, params, step):
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt_state, step + 1

    if not split:
        def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
            grads, loss, detailed, batch_stats = grad_fn(
                state.params, state.batch_stats, state.step, batch)
            params, opt_state, step = update_fn(grads, state.opt_state,
                                                state.params, state.step)
            new_state = TrainState(step=step, params=params,
                                   batch_stats=batch_stats,
                                   opt_state=opt_state)
            return new_state, {"loss_total": loss, **detailed}
        fused = jax.jit(train_step, donate_argnums=(0,) if donate else ())
        fused.jit_programs = (fused,)
        return fused

    grad_jit = jax.jit(grad_fn)
    # Donate grads/opt/params into the update so each step recycles the
    # previous generation's buffers — without donation a deep async
    # dispatch pipeline pins every generation and exhausts HBM.
    update_jit = jax.jit(update_fn,
                         donate_argnums=(0, 1, 2) if donate else ())

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        grads, loss, detailed, batch_stats = grad_jit(
            state.params, state.batch_stats, state.step, batch)
        params, opt_state, step = update_jit(grads, state.opt_state,
                                             state.params, state.step)
        new_state = TrainState(step=step, params=params,
                               batch_stats=batch_stats,
                               opt_state=opt_state)
        return new_state, {"loss_total": loss, **detailed}

    # Exposed for cost analysis (bench.py computes MFU from the lowered
    # HLO of the actual shipped programs).
    train_step.jit_programs = (grad_jit, update_jit)
    train_step.grad_jit = grad_jit
    train_step.update_jit = update_jit
    return train_step


def make_eval_step(model: LidarCenterNet, config: GlobalConfig) -> Callable:
    from .metrics import eval_metrics

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                  ) -> Dict[str, jnp.ndarray]:
        batch = unpack_batch(batch)
        out, _ = _apply_model(model, state.params, state.batch_stats, batch,
                              train=False)
        detailed = compute_losses(out, batch, config)
        return {"loss_total": total_loss(detailed, config), **detailed,
                **eval_metrics(out, batch)}

    return jax.jit(eval_step)


class Trainer:
    """Epoch engine: sharded state init, train/validate loops, metrics.

    Host-side loop only; each step is one device program. Checkpointing via
    orbax lives in train/checkpoint.py.
    """

    def __init__(self, config: GlobalConfig,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 steps_per_epoch: Optional[int] = None,
                 dtype: Any = None, split_step: bool = True):
        self.config = config
        self.mesh = mesh
        if dtype is None:
            dtype = jnp.bfloat16 \
                if config.train.compute_dtype == "bfloat16" else jnp.float32
        self.model = LidarCenterNet(config, dtype=dtype)
        self.tx = make_optimizer(config, steps_per_epoch)
        self.train_step = make_train_step(self.model, config, self.tx,
                                          split=split_step)
        self.eval_step = make_eval_step(self.model, config)
        self.state: Optional[TrainState] = None
        self.epoch = 0

    # ------------------------------------------------------------------ init
    def init_state(self, example_batch: Dict[str, np.ndarray],
                   seed: int = 0) -> TrainState:
        rngs = {"params": jax.random.PRNGKey(seed),
                "dropout": jax.random.PRNGKey(seed + 1)}

        def model_init(rngs, batch):
            args, extra = _model_inputs(unpack_batch(batch))
            return self.model.init(rngs, *args, train=False, **extra)

        def init_fn(rngs, batch):
            return create_train_state(model_init(rngs, batch), self.tx)

        if self.mesh is None:
            variables = jax.jit(model_init)(rngs, example_batch)
            opt_state = jax.jit(self.tx.init)(variables["params"])
            self.state = TrainState(step=jnp.zeros((), jnp.int32),
                                    params=variables["params"],
                                    batch_stats=variables.get("batch_stats",
                                                              {}),
                                    opt_state=opt_state)
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
        init_jit = jax.jit(init_fn, out_shardings=state_shardings)
        # put_batch, not a bare device_put: under multi-process each host
        # holds only its loader shard and the global array must be
        # assembled from process-local rows.
        batch_dev = self.put_batch(example_batch)
        self.state = init_jit(rngs, batch_dev)
        return self.state

    def put_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        if self.mesh is None:
            return batch
        shardings = shd.batch_sharding(batch, self.mesh)
        if jax.process_count() > 1:
            # Each host holds only its loader shard (PrefetchLoader
            # shard_rank/shard_count); assemble the global array from the
            # process-local rows. Replaces torch DistributedSampler +
            # per-rank DataLoader (train.py:156-163).
            return jax.tree.map(
                lambda leaf, s: jax.make_array_from_process_local_data(
                    s, np.asarray(leaf)), batch, shardings)
        return jax.device_put(batch, shardings)

    # ----------------------------------------------------------------- loops
    def train_epoch(self, batches: Iterable[Dict[str, np.ndarray]],
                    fetch_metrics: bool = True) -> Dict[str, float]:
        """fetch_metrics=True reads every step's metrics device->host.
        On the axon tunnel a fetch of a computed value is the ONLY real
        sync point (PERF_NOTES 'axon sync semantics') — it works, it just
        serializes the pipeline; fetch_metrics=False keeps the dispatch
        queue deep and fetches only the final step's metrics at epoch
        end (round-1's 'mid-stream fetch corrupts the stream' was wrong)."""
        agg: Dict[str, float] = {}
        n = 0
        metrics: Dict[str, jnp.ndarray] = {}
        for batch in batches:
            self.state, metrics = self.train_step(self.state,
                                                  self.put_batch(batch))
            n += 1
            if fetch_metrics:
                for k, v in metrics.items():
                    agg[k] = agg.get(k, 0.0) + float(v)
        self.epoch += 1
        if fetch_metrics:
            return {k: v / max(n, 1) for k, v in agg.items()}
        jax.block_until_ready(metrics)
        return {k: float(v) for k, v in metrics.items()}

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
