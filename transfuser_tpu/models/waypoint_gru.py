"""Autoregressive waypoint GRU decoder.

Reference: team_code_transfuser/model.py:592-646. A join MLP compresses the
512-d fused feature to the 64-d GRU state; a GRUCell consuming
[x, y, (target_point)] rolls out pred_len deltas. The 4-step rollout is a
static unroll (XLA fuses the 4 tiny cells into one fusion; no scan overhead).

GRU equations follow torch.nn.GRUCell:
    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class TorchGRUCell(nn.Module):
    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        dense = lambda name: nn.Dense(3 * self.hidden_size, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        gi = dense("weight_ih")(x)
        gh = dense("weight_hh")(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class WaypointGRU(nn.Module):
    pred_len: int = 4
    hidden_size: int = 64
    concat_target_point: bool = True
    lidar_pos_x: float = 1.3
    dtype: Dtype = jnp.float32  # tiny op; keep fp32 for control accuracy

    @nn.compact
    def __call__(self, fused: jnp.ndarray,
                 target_point: jnp.ndarray) -> jnp.ndarray:
        """fused (B, 512), target_point (B, 2) -> waypoints (B, pred_len, 2)
        in the lidar coordinate frame (x shifted by -lidar_pos_x)."""
        b = fused.shape[0]
        z = fused.astype(self.dtype)
        for i, width in enumerate((256, 128, self.hidden_size)):
            z = nn.relu(nn.Dense(width, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"join_{i}")(z))

        cell = TorchGRUCell(self.hidden_size, dtype=self.dtype, name="cell")
        out = nn.Dense(3, dtype=self.dtype, param_dtype=jnp.float32,
                       name="output")

        tp = target_point.astype(self.dtype) * jnp.asarray([1.0, -1.0],
                                                           self.dtype)
        x = jnp.zeros((b, 2), self.dtype)
        wps = []
        for _ in range(self.pred_len):
            x_in = jnp.concatenate([x, tp], axis=-1) \
                if self.concat_target_point else x
            z = cell(x_in, z)
            dx = out(z)
            x = dx[:, :2] + x
            wps.append(x)
        pred_wp = jnp.stack(wps, axis=1)
        # vehicle frame -> lidar frame (model.py:639)
        return pred_wp - jnp.asarray([self.lidar_pos_x, 0.0], self.dtype)
