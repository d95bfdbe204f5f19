"""Train state + optimizer factory.

Reference: AdamW lr 1e-4 with x0.1 step drops at epochs 30/40
(train.py:138-142, 194-199). The schedule is expressed in optimizer steps
via optax.piecewise_constant_schedule so the whole update rule lives inside
the jitted train step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from ..config import GlobalConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(config: GlobalConfig,
                   steps_per_epoch: Optional[int] = None) -> optax.GradientTransformation:
    t = config.train
    if steps_per_epoch:
        schedule = optax.piecewise_constant_schedule(
            init_value=t.lr,
            boundaries_and_scales={
                t.schedule_reduce_epoch_01 * steps_per_epoch: t.schedule_gamma,
                t.schedule_reduce_epoch_02 * steps_per_epoch: t.schedule_gamma,
            })
    else:
        schedule = t.lr
    adamw = optax.adamw(schedule, b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps,
                        weight_decay=t.weight_decay)
    if t.grad_clip_norm and t.grad_clip_norm > 0:
        # clip BEFORE the moment update so one bad batch can't poison
        # the Adam statistics (the round-4 loss_wp spikes, VERDICT r4)
        return optax.chain(optax.clip_by_global_norm(t.grad_clip_norm),
                           adamw)
    return adamw


def create_train_state(variables: Dict[str, Any],
                       tx: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )
