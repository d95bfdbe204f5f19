"""Mesh + sharding rules: GSPMD replaces the reference's whole NCCL stack.

Reference parallelism (SURVEY.md §2.9/§5.8): single-node DDP allreduce
(train.py:134), optional ZeRO-1 (`ZeroRedundancyOptimizer`, train.py:138-140)
and SyncBatchNorm (train.py:132-133). Here all three fall out of one
('data','model') mesh:

  * data parallelism   — batch sharded on 'data'; XLA inserts the gradient
    all-reduce over ICI (what DDP+NCCL did by hand),
  * ZeRO-1             — optimizer moments sharded along 'data' on each
    leaf's largest divisible axis (what ZeroRedundancyOptimizer did),
  * SyncBatchNorm      — free: under a sharded batch, BatchNorm's batch
    statistics are logically global, XLA lowers them to cross-replica means,
  * tensor parallelism — GPT fusion q/k/v + MLP-in column-sharded and
    proj/MLP-out row-sharded on 'model' (Megatron layout; not present in the
    reference, which caps at ~168M params, but free to enable here).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    data: int = 1
    model: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.model


def make_mesh(spec: MeshSpec, devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if len(devices) < spec.n_devices:
        raise ValueError(
            f"need {spec.n_devices} devices, have {len(devices)}")
    arr = np.asarray(devices[: spec.n_devices]).reshape(spec.data, spec.model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# -------------------------------------------------------------- param rules

# Megatron-style column-parallel (output dim sharded) / row-parallel
# (input dim sharded) assignments for the GPT fusion blocks.
_COL_PARALLEL = re.compile(r"(query|key|value|mlp_fc)$")
_ROW_PARALLEL = re.compile(r"(proj|mlp_proj)$")


def _spec_for_param(path: Tuple[str, ...], shape: Tuple[int, ...],
                    model_size: int) -> P:
    if model_size > 1 and len(path) >= 2:
        parent, leaf = path[-2], path[-1]
        if _COL_PARALLEL.search(parent):
            if leaf == "kernel" and shape[-1] % model_size == 0:
                return P(None, MODEL_AXIS)
            if leaf == "bias" and shape[0] % model_size == 0:
                return P(MODEL_AXIS)
        if _ROW_PARALLEL.search(parent) and leaf == "kernel" \
                and shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
    return P()


def _tree_paths_map(fn, tree: Any) -> Any:
    def walk(path, node):
        if isinstance(node, dict):
            return {k: walk(path + (k,), v) for k, v in node.items()}
        return fn(path, node)
    return walk((), tree)


def param_sharding(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a params pytree (dict-of-dicts of arrays)."""
    model_size = mesh.shape[MODEL_AXIS]

    def assign(path, leaf):
        return NamedSharding(mesh,
                             _spec_for_param(path, np.shape(leaf), model_size))
    return _tree_paths_map(assign, params)


def replicated_sharding(tree: Any, mesh: Mesh) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def opt_state_sharding(opt_state: Any, params_sharding: Any,
                       mesh: Mesh, zero1: bool = True) -> Any:
    """ZeRO-1: shard large optimizer moments along the data axis.

    Each moment leaf mirrors a param's shape. If the param itself is
    model-sharded we keep that spec; otherwise we shard the leaf's largest
    axis that divides the data-axis size. Scalars/small leaves replicate.
    """
    data_size = mesh.shape[DATA_AXIS]

    def moment_spec(leaf) -> NamedSharding:
        shape = np.shape(leaf)
        if not zero1 or data_size <= 1 or len(shape) == 0 \
                or np.prod(shape) < 1024:
            return NamedSharding(mesh, P())
        order = np.argsort(shape)[::-1]
        for ax in order:
            if shape[ax] % data_size == 0:
                spec = [None] * len(shape)
                spec[ax] = DATA_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(moment_spec, opt_state)


def batch_sharding(batch: Any, mesh: Mesh) -> Any:
    """Shard the leading (batch) dim of every input over 'data'."""
    def spec(leaf):
        ndim = np.ndim(leaf)
        return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))
    return jax.tree.map(spec, batch)
