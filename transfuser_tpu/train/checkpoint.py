"""Checkpointing: orbax async sharded checkpoints + config snapshot.

Replaces the reference's per-epoch torch.save of model/optimizer state
(train.py:381-384) and the args.txt round trip (train.py:174-175 ->
submission_agent.py:41-74): every run directory carries a config.json that
the inference agent uses to rebuild the exact architecture, ensembles
included (any number of model_* checkpoints in one directory).
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

from ..config import GlobalConfig
from .train_state import TrainState

CONFIG_SNAPSHOT = "config.json"


def save_config_snapshot(logdir: str, config: GlobalConfig) -> None:
    os.makedirs(logdir, exist_ok=True)
    config.save(os.path.join(logdir, CONFIG_SNAPSHOT))


def load_config_snapshot(logdir: str) -> GlobalConfig:
    return GlobalConfig.load(os.path.join(logdir, CONFIG_SNAPSHOT))


# ------------------------------------------------------------------- orbax

def _use_orbax() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401
        return True
    except Exception:
        return False


def save_checkpoint(logdir: str, state: TrainState, epoch: int,
                    use_orbax: Optional[bool] = None) -> str:
    """Save model+optimizer state for `epoch`; returns the checkpoint path."""
    use_orbax = _use_orbax() if use_orbax is None else use_orbax
    path = os.path.join(logdir, f"model_{epoch}")
    if use_orbax:
        import orbax.checkpoint as ocp
        with ocp.CheckpointManager(
                os.path.abspath(logdir),
                options=ocp.CheckpointManagerOptions(create=True,
                                                     max_to_keep=None),
        ) as mngr:
            mngr.save(epoch, args=ocp.args.StandardSave(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state,
                 "step": np.asarray(state.step)}))
        return os.path.join(logdir, str(epoch))
    # msgpack fallback (single-host)
    os.makedirs(logdir, exist_ok=True)
    blob = serialization.to_bytes(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats),
         "step": int(state.step)})
    with open(path + ".msgpack", "wb") as f:
        f.write(blob)
    opt_blob = serialization.to_bytes(jax.device_get(state.opt_state))
    with open(os.path.join(logdir, f"optimizer_{epoch}.msgpack"), "wb") as f:
        f.write(opt_blob)
    return path + ".msgpack"


def restore_checkpoint(logdir: str, epoch: int, target_state: TrainState,
                       use_orbax: Optional[bool] = None) -> TrainState:
    use_orbax = _use_orbax() if use_orbax is None else use_orbax
    if use_orbax and os.path.isdir(os.path.join(logdir, str(epoch))):
        import orbax.checkpoint as ocp
        with ocp.CheckpointManager(os.path.abspath(logdir)) as mngr:
            restored = mngr.restore(
                epoch, args=ocp.args.StandardRestore(
                    {"params": target_state.params,
                     "batch_stats": target_state.batch_stats,
                     "opt_state": target_state.opt_state,
                     "step": np.asarray(target_state.step)}))
        return TrainState(step=restored["step"], params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"])
    path = os.path.join(logdir, f"model_{epoch}.msgpack")
    with open(path, "rb") as f:
        data = serialization.from_bytes(
            {"params": target_state.params,
             "batch_stats": target_state.batch_stats,
             "step": 0}, f.read())
    opt_path = os.path.join(logdir, f"optimizer_{epoch}.msgpack")
    opt_state = target_state.opt_state
    if os.path.exists(opt_path):
        with open(opt_path, "rb") as f:
            opt_state = serialization.from_bytes(target_state.opt_state,
                                                 f.read())
    return TrainState(step=np.int32(data["step"]), params=data["params"],
                      batch_stats=data["batch_stats"], opt_state=opt_state)


class AsyncCheckpointWriter:
    """Epoch-loop checkpointing that overlaps the save with training.

    Keeps ONE orbax CheckpointManager open across the run (async
    checkpointing on: `save` returns after staging the arrays, the
    serialization thread writes in the background — the orbax equivalent
    of the reference's per-epoch torch.save, train.py:381-384, without
    stalling the step pipeline). Under a sharding Mesh the arrays carry
    their NamedShardings, so the checkpoint is written sharded and
    restores sharded. Falls back to the synchronous msgpack path when
    orbax is unavailable.
    """

    def __init__(self, logdir: str, use_orbax: Optional[bool] = None):
        self.logdir = logdir
        self.use_orbax = _use_orbax() if use_orbax is None else use_orbax
        self._mngr = None
        if self.use_orbax:
            import orbax.checkpoint as ocp
            os.makedirs(logdir, exist_ok=True)
            self._mngr = ocp.CheckpointManager(
                os.path.abspath(logdir),
                options=ocp.CheckpointManagerOptions(
                    create=True, max_to_keep=None,
                    enable_async_checkpointing=True))

    def save(self, epoch: int, state: TrainState) -> None:
        if self._mngr is not None:
            import orbax.checkpoint as ocp
            self._mngr.save(epoch, args=ocp.args.StandardSave(
                {"params": state.params,
                 "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state,
                 "step": np.asarray(state.step)}))
        else:
            save_checkpoint(self.logdir, state, epoch, use_orbax=False)

    def restore(self, epoch: int, target_state: TrainState) -> TrainState:
        self.wait()
        return restore_checkpoint(self.logdir, epoch, target_state,
                                  use_orbax=self.use_orbax)

    def wait(self) -> None:
        if self._mngr is not None:
            self._mngr.wait_until_finished()

    def close(self) -> None:
        if self._mngr is not None:
            self._mngr.close()
            self._mngr = None

    def __enter__(self) -> "AsyncCheckpointWriter":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def save_inference_weights(path: str, variables: Dict[str, Any]) -> None:
    """Standalone inference weights (one ensemble member): model_*.msgpack."""
    blob = serialization.to_bytes(jax.device_get(variables))
    with open(path, "wb") as f:
        f.write(blob)


def load_inference_weights(path: str, template: Dict[str, Any]
                           ) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def list_ensemble_weights(model_dir: str) -> List[str]:
    """Every model_*.msgpack (native) or model_*.pth (reference torch
    checkpoint, converted on load) in the directory is an ensemble member
    (reference loads every *.pth, submission_agent.py:84-99)."""
    out = []
    for f in sorted(os.listdir(model_dir)):
        if f.startswith("model_") and f.endswith((".msgpack", ".pth")):
            out.append(os.path.join(model_dir, f))
    return out
