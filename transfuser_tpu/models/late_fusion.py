"""Late-fusion baseline: independent branches, global-pool + add fusion.

Reference: team_code_transfuser/late_fusion.py:5-111.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import GlobalConfig
from ..ops.image_ops import global_avg_pool, normalize_imagenet
from .decoders import TopDown
from .encoders import make_encoder

Dtype = Any


class LateFusionBackbone(nn.Module):
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
        feats = mcfg.perception_output_features
        self._img_is_convnext = mcfg.image_architecture.startswith("convnext")
        self._lid_is_convnext = mcfg.lidar_architecture.startswith("convnext")
        if self.image_encoder.feature_dims[-1] != feats:
            self.reduce_channels_conv_image = nn.Conv(
                feats, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
            self.reduce_channels_conv_lidar = nn.Conv(
                feats, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
        else:
            self.reduce_channels_conv_image = None
            self.reduce_channels_conv_lidar = None
        if self._img_is_convnext:
            self.norm_after_pool_img = nn.LayerNorm(
                epsilon=1e-6, dtype=jnp.promote_types(self.dtype,
                                                      jnp.float32),
                param_dtype=jnp.float32)
        if self._lid_is_convnext:
            self.norm_after_pool_lidar = nn.LayerNorm(
                epsilon=1e-6, dtype=jnp.promote_types(self.dtype,
                                                      jnp.float32),
                param_dtype=jnp.float32)
        if mcfg.use_velocity:
            self.vel_emb = nn.Dense(feats, dtype=self.dtype,
                                    param_dtype=jnp.float32)
        self.top_down = TopDown(
            channel=cfg.bev.bev_features_channels,
            upsample_factor=cfg.bev.bev_upsample_factor, dtype=self.dtype)

    def __call__(self, image: jnp.ndarray, lidar_bev: jnp.ndarray,
                 velocity: Optional[jnp.ndarray] = None, train: bool = False):
        x_img = normalize_imagenet(image.astype(self.dtype))
        x_img = self.image_encoder(x_img, train)
        if self.reduce_channels_conv_image is not None:
            x_img = self.reduce_channels_conv_image(x_img)
        image_features_grid = x_img
        img_vec = global_avg_pool(x_img)
        if self._img_is_convnext:
            img_vec = self.norm_after_pool_img(img_vec).astype(self.dtype)

        x_lid = self.lidar_encoder(lidar_bev.astype(self.dtype), train)
        if self.reduce_channels_conv_lidar is not None:
            x_lid = self.reduce_channels_conv_lidar(x_lid)
        pyramid = self.top_down(x_lid)
        lid_vec = global_avg_pool(x_lid)
        if self._lid_is_convnext:
            lid_vec = self.norm_after_pool_lidar(lid_vec).astype(self.dtype)

        fused = img_vec + lid_vec
        if self.config.model.use_velocity:
            assert velocity is not None
            fused = fused + self.vel_emb(
                velocity.reshape(-1, 1).astype(self.dtype))
        return pyramid, image_features_grid, fused
