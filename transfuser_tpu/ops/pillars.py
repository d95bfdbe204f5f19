"""Dynamic-pillar voxelization ops (replaces torch-scatter CUDA kernels).

Reference: team_code_transfuser/point_pillar.py:37-122 — filter points to
the grid, compute per-pillar means (decoration), per-pillar feature max,
scatter to a dense (ny, nx, C) canvas.

TPU-native formulation: everything is static-shape masked scatter.
``segment_mean``/``segment_max`` lower to XLA scatter-add/-max, which the
TPU backend rewrites into sorted segment reductions — the role
torch-scatter's CUDA kernels play on GPU. Invalid (padding) points target
a sentinel cell that is sliced away.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def pillar_cells(points: jnp.ndarray, num_points: jnp.ndarray,
                 min_x: float, max_x: float, min_y: float, max_y: float,
                 pixels_per_meter: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """points (N, 4) -> (cell_ids (N,), valid (N,)). Sentinel = ny*nx."""
    n = points.shape[0]
    nx = int((max_x - min_x) * pixels_per_meter)
    ny = int((max_y - min_y) * pixels_per_meter)
    idx = jnp.arange(n)
    in_range = (points[:, 0] >= min_x) & (points[:, 0] < max_x) & \
        (points[:, 1] >= min_y) & (points[:, 1] < max_y)
    valid = in_range & (idx < num_points)
    cx = jnp.floor((points[:, 0] - min_x) * pixels_per_meter).astype(jnp.int32)
    cy = jnp.floor((points[:, 1] - min_y) * pixels_per_meter).astype(jnp.int32)
    cx = jnp.clip(cx, 0, nx - 1)
    cy = jnp.clip(cy, 0, ny - 1)
    cell = cy * nx + cx
    return jnp.where(valid, cell, ny * nx), valid


def segment_mean(values: jnp.ndarray, cell_ids: jnp.ndarray,
                 num_cells: int) -> jnp.ndarray:
    """Per-cell mean of values (N, C) -> (num_cells+1, C)."""
    sums = jnp.zeros((num_cells + 1, values.shape[-1]),
                     values.dtype).at[cell_ids].add(values)
    counts = jnp.zeros((num_cells + 1, 1), values.dtype) \
        .at[cell_ids].add(1.0)
    return sums / jnp.maximum(counts, 1.0)


def segment_max(values: jnp.ndarray, cell_ids: jnp.ndarray,
                num_cells: int) -> jnp.ndarray:
    """Per-cell max of values (N, C) -> (num_cells+1, C); empty cells 0."""
    out = jnp.full((num_cells + 1, values.shape[-1]), NEG_INF,
                   values.dtype).at[cell_ids].max(values)
    return jnp.where(out <= NEG_INF / 2, 0.0, out)


def decorate_points(points: jnp.ndarray, cell_ids: jnp.ndarray,
                    valid: jnp.ndarray, num_cells: int,
                    min_x: float, min_y: float, nx: int,
                    pixels_per_meter: int) -> jnp.ndarray:
    """9-feature decoration (point_pillar.py:54-67): [x y z i,
    cluster-offset xyz, center-offset xy]."""
    xyz = points[:, :3]
    means = segment_mean(jnp.where(valid[:, None], xyz, 0.0), cell_ids,
                         num_cells)
    cluster = xyz - means[cell_ids]
    cx = (cell_ids % nx).astype(points.dtype) / pixels_per_meter + min_x
    cy = (cell_ids // nx).astype(points.dtype) / pixels_per_meter + min_y
    xp = xyz[:, 0:1] - cx[:, None]
    yp = xyz[:, 1:2] - cy[:, None]
    feats = jnp.concatenate([points, cluster, xp, yp], axis=-1)
    return jnp.where(valid[:, None], feats, 0.0)


def scatter_to_canvas(pillar_feats: jnp.ndarray, ny: int, nx: int
                      ) -> jnp.ndarray:
    """(num_cells+1, C) -> (ny, nx, C) dense canvas with the reference's
    vertical flip (canvas row = ny-1-cy, point_pillar.py:93-96)."""
    canvas = pillar_feats[:-1].reshape(ny, nx, -1)
    return canvas[::-1]
