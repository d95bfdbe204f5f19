"""TransFuser backbone: dual CNN branches fused by GPT attention at 4 scales.

Reference: team_code_transfuser/transfuser.py:7-211. TPU-native rewrite:
NHWC, bf16 compute, exact-divisor anchor pooling (reshape-mean), bilinear
residual upsampling, all inside one XLA program.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import GlobalConfig
from ..ops.image_ops import (adaptive_avg_pool, global_avg_pool,
                             normalize_imagenet, resize_bilinear)
from .decoders import TopDown
from .encoders import make_encoder
from .gpt import GPTFusion

Dtype = Any


class TransfuserBackbone(nn.Module):
    """Returns (bev_pyramid (p2..p5), image_feature_grid, fused_features)."""

    config: GlobalConfig
    lidar_in_channels: int = 3  # 2-ch histogram + target-point raster
    dtype: Dtype = jnp.bfloat16

    def setup(self) -> None:
        cfg = self.config
        mcfg = cfg.model
        g = mcfg.gpt
        self.image_encoder = make_encoder(
            mcfg.image_architecture, 3, self.dtype,
            group_lowering=mcfg.group_lowering, remat=mcfg.remat)
        self.lidar_encoder = make_encoder(
            mcfg.lidar_architecture, self.lidar_in_channels, self.dtype,
            group_lowering=mcfg.group_lowering, remat=mcfg.remat)
        dims = self.image_encoder.feature_dims
        self.transformers = [
            GPTFusion(
                n_embd=dims[i], n_head=g.n_head, n_layer=g.n_layer,
                block_exp=g.block_exp,
                img_anchors=(g.img_vert_anchors, g.img_horz_anchors),
                lidar_anchors=(g.lidar_vert_anchors, g.lidar_horz_anchors),
                embd_pdrop=g.embd_pdrop, attn_pdrop=g.attn_pdrop,
                resid_pdrop=g.resid_pdrop, init_std=g.linear_init_std,
                use_velocity=mcfg.use_velocity,
                reference_view_unpack=g.reference_view_unpack,
                remat=mcfg.remat in (True, "all"), dtype=self.dtype,
                name=f"transformer{i + 1}")
            for i in range(4)
        ]
        feats = mcfg.perception_output_features
        if dims[-1] != feats:
            self.change_channel_conv_image = nn.Conv(
                feats, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
            self.change_channel_conv_lidar = nn.Conv(
                feats, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)
        else:
            self.change_channel_conv_image = None
            self.change_channel_conv_lidar = None
        self.top_down = TopDown(
            channel=cfg.bev.bev_features_channels,
            upsample_factor=cfg.bev.bev_upsample_factor, dtype=self.dtype)

    def __call__(self, image: jnp.ndarray, lidar_bev: jnp.ndarray,
                 velocity: Optional[jnp.ndarray] = None, train: bool = False):
        g = self.config.model.gpt
        img_anchors = (g.img_vert_anchors, g.img_horz_anchors)
        lidar_anchors = (g.lidar_vert_anchors, g.lidar_horz_anchors)

        x_img = normalize_imagenet(image.astype(self.dtype))
        x_lid = lidar_bev.astype(self.dtype)

        x_img = self.image_encoder.stem(x_img, train)
        x_lid = self.lidar_encoder.stem(x_lid, train)

        for i in range(4):
            x_img = self.image_encoder.stage(i, x_img, train)
            x_lid = self.lidar_encoder.stage(i, x_lid, train)

            img_embd = adaptive_avg_pool(x_img, img_anchors)
            lid_embd = adaptive_avg_pool(x_lid, lidar_anchors)
            img_out, lid_out = self.transformers[i](
                img_embd, lid_embd, velocity, train)
            x_img = x_img + resize_bilinear(img_out, x_img.shape[1:3])
            x_lid = x_lid + resize_bilinear(lid_out, x_lid.shape[1:3])

        if self.change_channel_conv_image is not None:
            x_img = self.change_channel_conv_image(x_img)
            x_lid = self.change_channel_conv_lidar(x_lid)

        image_features_grid = x_img
        fused = global_avg_pool(x_img) + global_avg_pool(x_lid)
        bev_pyramid = self.top_down(x_lid)
        return bev_pyramid, image_features_grid, fused
