"""PointPillars LiDAR encoder (optional alternative to the BEV histogram).

Reference: team_code_transfuser/point_pillar.py:11-122 (from LAV). A
PointNet (Linear+BN+ReLU stack) runs on decorated points; per-pillar max
pooling scatters features onto a dense canvas. All shapes static: the
padded (max_lidar_points, 4) contract from data.py:310-316 is kept.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import PointPillarConfig
from ..ops import pillars

Dtype = Any


class DynamicPointNet(nn.Module):
    num_features: tuple = (32, 32)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: jnp.ndarray, valid: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        x = feats.astype(self.dtype)
        for i, width in enumerate(self.num_features):
            x = nn.Dense(width, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"fc{i}")(x)
            # masked batch norm over valid points only
            bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=jnp.float32,
                              param_dtype=jnp.float32, name=f"bn{i}",
                              use_fast_variance=False)
            x = bn(x).astype(self.dtype)
            x = nn.relu(x)
            x = jnp.where(valid[..., None], x, 0.0)
        return x


class PointPillarNet(nn.Module):
    config: PointPillarConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, points: jnp.ndarray, num_points: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """points (B, N, 4), num_points (B,) -> canvas (B, ny, nx, C)."""
        cfg = self.config
        ppm = int(8)  # pixels_per_meter cast as in model.py:558
        nx = int((cfg.max_x - cfg.min_x) * ppm)
        ny = int((cfg.max_y - cfg.min_y) * ppm)
        num_cells = ny * nx
        point_net = DynamicPointNet(cfg.num_features, self.dtype)

        def per_sample(pts, n):
            cell_ids, valid = pillars.pillar_cells(
                pts, n, cfg.min_x, cfg.max_x, cfg.min_y, cfg.max_y, ppm)
            feats = pillars.decorate_points(pts, cell_ids, valid, num_cells,
                                            cfg.min_x, cfg.min_y, nx, ppm)
            return feats, cell_ids, valid

        feats, cell_ids, valid = jax.vmap(per_sample)(points, num_points)
        point_feats = point_net(feats, valid, train)

        def pool(f, ids, v):
            f = jnp.where(v[:, None], f, pillars.NEG_INF)
            pooled = pillars.segment_max(f.astype(jnp.float32), ids,
                                         num_cells)
            return pillars.scatter_to_canvas(pooled, ny, nx)

        canvas = jax.vmap(pool)(point_feats, cell_ids, valid)
        return canvas.astype(self.dtype)
