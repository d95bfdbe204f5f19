"""Geometric fusion: multi-scale bidirectional LiDAR<->camera point
projection fusion.

Reference: team_code_transfuser/geometric_fusion.py:6-300. At each scale the
branch features are 1x1-projected to n_embd, pooled onto the anchor grids,
and exchanged through precomputed pixel correspondences (5 samples per
cell, built host-side from the raw point cloud — data.py:675-842,
ops in data/correspondences.py here):

  bev_points (B, 8, 8, 5, 2)  int (x, y) indices into the (5, 22) image grid
  cam_points (B, 5, 22, 5, 2) int (x, y) indices into the (8, 8) lidar grid

The reference's batched-diagonal gather trick becomes a plain
take_along_axis over the flattened grid (no (B,B,...) blowup).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import GlobalConfig
from ..ops.image_ops import (adaptive_avg_pool, global_avg_pool,
                             normalize_imagenet, resize_bilinear)
from .decoders import TopDown
from .encoders import make_encoder

Dtype = Any


def reference_grid_view(points: jnp.ndarray) -> jnp.ndarray:
    """Replicate the reference model's consumption of its x-major
    correspondence grids (ROADMAP quirk): the data writes G[x_cell,
    y_cell] (data.py:636-637) and the model raw-views the buffer as
    (h, w) (geometric_fusion.py:134-136) — a deterministic spatial
    scramble the reference's training absorbs. Our data pipeline stores
    the clean (h, w) layout, so reproducing the reference graph =
    transpose back to x-major memory order, then re-view as (h, w)."""
    b, h, w, k, two = points.shape
    return points.transpose(0, 2, 1, 3, 4).reshape(b, h, w, k, two)


def gather_correspondences(grid: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """grid (B,H,W,C); points (B,h,w,5,2) int (x,y) into grid -> (B,h,w,C)
    sum over the 5 sampled correspondences."""
    b, h, w, c = grid.shape
    _, oh, ow, k, _ = points.shape
    x = jnp.clip(points[..., 0], 0, w - 1)
    y = jnp.clip(points[..., 1], 0, h - 1)
    idx = (y * w + x).reshape(b, oh * ow * k)
    flat = grid.reshape(b, h * w, c)
    gathered = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return gathered.reshape(b, oh, ow, k, c).sum(axis=3)


class _ProjectionMLP(nn.Module):
    hid_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(3):
            x = nn.relu(nn.Dense(self.hid_dim, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 name=f"fc{i}")(x))
        return x


class GeometricFusionBackbone(nn.Module):
    config: GlobalConfig
    lidar_in_channels: int = 3
    dtype: Dtype = jnp.bfloat16

    def setup(self) -> None:
        cfg = self.config
        mcfg = cfg.model
        self.image_encoder = make_encoder(
            mcfg.image_architecture, 3, self.dtype,
            group_lowering=mcfg.group_lowering, remat=mcfg.remat)
        self.lidar_encoder = make_encoder(
            mcfg.lidar_architecture, self.lidar_in_channels, self.dtype,
            group_lowering=mcfg.group_lowering, remat=mcfg.remat)
        dims = self.image_encoder.feature_dims
        n_embd = mcfg.gpt.n_embd

        def conv1x1(feat):
            return nn.Conv(feat, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32)

        self.image_convs = [conv1x1(n_embd) for _ in range(4)]
        self.lidar_convs = [conv1x1(n_embd) for _ in range(4)]
        self.image_deconvs = [conv1x1(dims[i]) for i in range(4)]
        self.lidar_deconvs = [conv1x1(dims[i]) for i in range(4)]
        self.image_projections = [_ProjectionMLP(n_embd, self.dtype)
                                  for _ in range(4)]
        self.lidar_projections = [_ProjectionMLP(n_embd, self.dtype)
                                  for _ in range(4)]
        if mcfg.use_velocity:
            self.vel_embs = [nn.Dense(dims[i], dtype=self.dtype,
                                      param_dtype=jnp.float32)
                             for i in range(4)]
        feats = mcfg.perception_output_features
        if dims[-1] != feats:
            self.change_channel_conv_image = conv1x1(feats)
            self.change_channel_conv_lidar = conv1x1(feats)
        else:
            self.change_channel_conv_image = None
            self.change_channel_conv_lidar = None
        self.top_down = TopDown(
            channel=cfg.bev.bev_features_channels,
            upsample_factor=cfg.bev.bev_upsample_factor, dtype=self.dtype)

    def __call__(self, image: jnp.ndarray, lidar_bev: jnp.ndarray,
                 velocity: Optional[jnp.ndarray] = None,
                 bev_points: Optional[jnp.ndarray] = None,
                 cam_points: Optional[jnp.ndarray] = None,
                 train: bool = False):
        cfg = self.config
        mcfg = cfg.model
        g = mcfg.gpt
        img_anchors = (g.img_vert_anchors, g.img_horz_anchors)
        lidar_anchors = (g.lidar_vert_anchors, g.lidar_horz_anchors)

        x_img = normalize_imagenet(image.astype(self.dtype))
        x_lid = lidar_bev.astype(self.dtype)
        x_img = self.image_encoder.stem(x_img, train)
        x_lid = self.lidar_encoder.stem(x_lid, train)

        if mcfg.geometric_reference_view:
            bev_points = reference_grid_view(bev_points)
            cam_points = reference_grid_view(cam_points)

        for i in range(4):
            x_img = self.image_encoder.stage(i, x_img, train)
            x_lid = self.lidar_encoder.stage(i, x_lid, train)
            # Scale gating follows reference n_scale semantics
            # (geometric_fusion.py:132, layer i runs when n_scale >= 4-i).
            if g.n_scale < 4 - i:
                continue

            img_embd = adaptive_avg_pool(self.image_convs[i](x_img),
                                         img_anchors)
            lid_embd = adaptive_avg_pool(self.lidar_convs[i](x_lid),
                                         lidar_anchors)

            # image -> BEV
            bev_enc = gather_correspondences(img_embd, bev_points)
            bev_enc = self.image_projections[i](bev_enc)
            bev_enc = resize_bilinear(bev_enc, x_lid.shape[1:3])
            x_lid = x_lid + self.lidar_deconvs[i](bev_enc)

            # BEV -> image
            img_enc = gather_correspondences(lid_embd, cam_points)
            img_enc = self.lidar_projections[i](img_enc)
            img_enc = resize_bilinear(img_enc, x_img.shape[1:3])
            x_img = x_img + self.image_deconvs[i](img_enc)

            if mcfg.use_velocity:
                vel = self.vel_embs[i](
                    velocity.reshape(-1, 1).astype(self.dtype))
                x_lid = x_lid + vel[:, None, None, :]
                x_img = x_img + vel[:, None, None, :]

        if self.change_channel_conv_image is not None:
            x_img = self.change_channel_conv_image(x_img)
            x_lid = self.change_channel_conv_lidar(x_lid)

        image_features_grid = x_img
        fused = global_avg_pool(x_img) + global_avg_pool(x_lid)
        pyramid = self.top_down(x_lid)
        return pyramid, image_features_grid, fused
