"""Latent TransFuser (camera-only): the TransFuser fusion graph with the
LiDAR histogram replaced by a fixed 2-channel linspace positional grid.

Reference: team_code_transfuser/latentTF.py:8-218 (its GPT/encoder stack is
structurally identical to transfuser.py; only the input substitution at
latentTF.py:132-137 differs, plus the agent feeding dummy zero LiDAR,
submission_agent.py:260-261).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import GlobalConfig
from .transfuser import TransfuserBackbone

Dtype = Any


def positional_grid(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """(H, W, 2): ch0 = top-down linspace, ch1 = left-right linspace."""
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    ch0 = jnp.broadcast_to(ys[:, None], (h, w))
    ch1 = jnp.broadcast_to(xs[None, :], (h, w))
    return jnp.stack([ch0, ch1], axis=-1)


class LatentTFBackbone(nn.Module):
    config: GlobalConfig
    lidar_in_channels: int = 3
    dtype: Dtype = jnp.bfloat16

    def setup(self) -> None:
        self.inner = TransfuserBackbone(
            self.config, self.lidar_in_channels, self.dtype, name="inner")

    def __call__(self, image: jnp.ndarray, lidar_bev: jnp.ndarray,
                 velocity: Optional[jnp.ndarray] = None, train: bool = False):
        b, h, w, c = lidar_bev.shape
        grid = positional_grid(h, w, lidar_bev.dtype)
        grid = jnp.broadcast_to(grid[None], (b, h, w, 2))
        # Channels 0/1 become the positional encoding; any extra channel
        # (target-point raster) passes through untouched.
        lidar_bev = jnp.concatenate([grid, lidar_bev[..., 2:]], axis=-1)
        return self.inner(image, lidar_bev, velocity, train)
