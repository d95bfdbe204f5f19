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
        if t.warmup_epochs > 0:
            # Random-init stabilizer (the reference starts from ImageNet
            # weights and needs none): linear 0 -> lr before the
            # piecewise-constant drops take over.
            warm = max(1, int(t.warmup_epochs * steps_per_epoch))
            schedule = optax.join_schedules(
                [optax.linear_schedule(0.0, t.lr, warm), schedule], [warm])
    else:
        schedule = t.lr
    adamw = optax.adamw(schedule, b1=t.adam_b1, b2=t.adam_b2, eps=t.adam_eps,
                        weight_decay=t.weight_decay)
    clips = []
    if t.agc_clip and t.agc_clip > 0:
        # Per-block adaptive clipping (NFNet AGC): bounds each parameter
        # block's update RELATIVE to its own weight norm, so one head's
        # gradient burst can neither poison Adam's second moment for
        # epochs (the r4/r5 loss_wp spike mechanism) nor starve the
        # other heads the way a fixed GLOBAL norm measurably did
        # (PERF_NOTES "grad clipping divergence").
        clips.append(optax.adaptive_grad_clip(t.agc_clip))
    if t.grad_clip_norm and t.grad_clip_norm > 0:
        # clip BEFORE the moment update so one bad batch can't poison
        # the Adam statistics (the round-4 loss_wp spikes, VERDICT r4)
        clips.append(optax.clip_by_global_norm(t.grad_clip_norm))
    if clips:
        return optax.chain(*clips, adamw)
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
