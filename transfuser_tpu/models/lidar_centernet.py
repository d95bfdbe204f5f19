"""Top-level perception+planning model (all four backbone families).

Reference: team_code_transfuser/model.py:538-805. Owns the fusion backbone,
BEV segmentation head, CenterNet detection head, seg/depth decoders and the
waypoint GRU. Training forward returns prediction maps; the loss (including
in-graph CenterNet target generation) lives in train/losses.py so the whole
step is one XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config import GlobalConfig
from ..ops import centernet as cn
from ..ops.dtypes import acc_dtype, at_least_f32
from ..ops.image_ops import resize_bilinear
from .decoders import DepthDecoder, SegDecoder
from .heads import LidarCenterNetHead
from .waypoint_gru import WaypointGRU

Dtype = Any


def _make_backbone(config: GlobalConfig, lidar_in_channels: int, dtype: Dtype):
    name = config.model.backbone
    if name == "transFuser":
        from .transfuser import TransfuserBackbone
        return TransfuserBackbone(config, lidar_in_channels, dtype,
                                  name="backbone")
    if name == "late_fusion":
        from .late_fusion import LateFusionBackbone
        return LateFusionBackbone(config, lidar_in_channels, dtype,
                                  name="backbone")
    if name == "geometric_fusion":
        from .geometric_fusion import GeometricFusionBackbone
        return GeometricFusionBackbone(config, lidar_in_channels, dtype,
                                       name="backbone")
    if name == "latentTF":
        from .latent_tf import LatentTFBackbone
        return LatentTFBackbone(config, lidar_in_channels, dtype,
                                name="backbone")
    raise ValueError(
        f"unknown backbone '{name}'; options: transFuser, late_fusion, "
        "geometric_fusion, latentTF")


class LidarCenterNet(nn.Module):
    config: GlobalConfig
    dtype: Dtype = jnp.bfloat16

    def setup(self) -> None:
        cfg = self.config
        mcfg = cfg.model
        lidar_ch = 2 * mcfg.lidar_seq_len
        if mcfg.point_pillars.use_point_pillars:
            lidar_ch = mcfg.point_pillars.num_features[-1]
        if mcfg.use_target_point_image:
            lidar_ch += 1
        self._backbone = _make_backbone(cfg, lidar_ch, self.dtype)
        if mcfg.multitask:
            deconv = dict(c1=mcfg.deconv_channel_num_1,
                          c2=mcfg.deconv_channel_num_2,
                          c3=mcfg.deconv_channel_num_3,
                          scale_1=mcfg.deconv_scale_factor_1,
                          scale_2=mcfg.deconv_scale_factor_2)
            self.seg_decoder = SegDecoder(num_class=mcfg.num_class,
                                          dtype=self.dtype, **deconv)
            self.depth_decoder = DepthDecoder(dtype=self.dtype, **deconv)
        ch = mcfg.centernet.channel
        self.pred_bev_conv0 = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                                      dtype=self.dtype,
                                      param_dtype=jnp.float32)
        self.pred_bev_conv1 = nn.Conv(cfg.bev.bev_num_classes, (1, 1),
                                      dtype=self.dtype,
                                      param_dtype=jnp.float32)
        self.head = LidarCenterNetHead(
            in_channel=ch, feat_channel=ch,
            num_classes=mcfg.centernet.num_classes,
            num_dir_bins=mcfg.centernet.num_dir_bins,
            bias_init_prob=mcfg.centernet.center_net_bias_init_with_prob,
            normal_init_std=mcfg.centernet.center_net_normal_init_std,
            dtype=self.dtype)
        self.wp_gru = WaypointGRU(
            pred_len=mcfg.pred_len, hidden_size=mcfg.gru_hidden_size,
            concat_target_point=mcfg.gru_concat_target_point,
            lidar_pos_x=cfg.sensors.lidar_pos[0],
            dtype=acc_dtype(self.dtype))
        if mcfg.point_pillars.use_point_pillars:
            from .point_pillar import PointPillarNet
            self.point_pillar_net = PointPillarNet(
                config=mcfg.point_pillars, dtype=self.dtype)

    def _prepare_lidar(self, lidar_bev: jnp.ndarray,
                       target_point_image: Optional[jnp.ndarray],
                       num_points: Optional[jnp.ndarray] = None,
                       train: bool = False) -> jnp.ndarray:
        mcfg = self.config.model
        if mcfg.point_pillars.use_point_pillars:
            # lidar_bev here is raw padded points (B, N, 4).
            canvas = self.point_pillar_net(lidar_bev, num_points, train)
            # rot90(k=-1) in HW to match voxelization orientation
            # (model.py:690).
            lidar_bev = jnp.rot90(canvas, k=-1, axes=(1, 2))
        if mcfg.use_target_point_image:
            assert target_point_image is not None
            lidar_bev = jnp.concatenate(
                [lidar_bev, target_point_image.astype(lidar_bev.dtype)],
                axis=-1)
        return lidar_bev

    def __call__(self, rgb: jnp.ndarray, lidar_bev: jnp.ndarray,
                 target_point: jnp.ndarray,
                 target_point_image: Optional[jnp.ndarray] = None,
                 velocity: Optional[jnp.ndarray] = None,
                 bev_points: Optional[jnp.ndarray] = None,
                 cam_points: Optional[jnp.ndarray] = None,
                 num_points: Optional[jnp.ndarray] = None,
                 train: bool = False,
                 compute_aux: bool = True) -> Dict[str, jnp.ndarray]:
        """Full forward; returns every prediction map (fp32).

        rgb: (B,160,704,3) in [0,255]; lidar_bev: (B,256,256,2) histogram
        (or (B,N,4) raw points under point pillars); target_point: (B,2).
        """
        cfg = self.config
        lidar = self._prepare_lidar(lidar_bev, target_point_image, num_points,
                                    train)
        if cfg.model.backbone == "geometric_fusion":
            pyramid, image_grid, fused = self._backbone(
                rgb, lidar, velocity, bev_points, cam_points, train)
        else:
            pyramid, image_grid, fused = self._backbone(
                rgb, lidar, velocity, train)

        pred_wp = self.wp_gru(at_least_f32(fused), target_point)

        head_preds = self.head(pyramid[0])
        out: Dict[str, jnp.ndarray] = {
            "pred_wp": pred_wp,
            **{f"head_{k}": v for k, v in head_preds.items()},
        }

        # Aux heads are training/debug-only (the reference's forward_ego
        # skips pred_bev + seg/depth except under debug, model.py:720-724).
        # Aux maps stay in the compute dtype (HBM bandwidth: the 160x704
        # seg/depth maps are the largest tensors in the step); the losses
        # upcast to fp32 where numerics need it.
        if compute_aux:
            x = nn.relu(self.pred_bev_conv0(pyramid[0]))
            pred_bev = self.pred_bev_conv1(x)
            out["pred_bev"] = resize_bilinear(
                pred_bev,
                (cfg.bev.bev_resolution_height,
                 cfg.bev.bev_resolution_width),
                align_corners=True)  # model.py:760 uses align_corners=True
            if cfg.model.multitask:
                out["pred_semantic"] = self.seg_decoder(image_grid)
                out["pred_depth"] = self.depth_decoder(image_grid)
        return out

    def forward_ego(self, rgb: jnp.ndarray, lidar_bev: jnp.ndarray,
                    target_point: jnp.ndarray,
                    target_point_image: Optional[jnp.ndarray] = None,
                    velocity: Optional[jnp.ndarray] = None,
                    bev_points: Optional[jnp.ndarray] = None,
                    cam_points: Optional[jnp.ndarray] = None,
                    num_points: Optional[jnp.ndarray] = None):
        """Inference path (model.py:685-731): waypoints + decoded top-k boxes.

        Returns (pred_wp (B,4,2), boxes (B,k,8), labels (B,k)). Confidence
        filtering (conf > threshold) is left to the (host-side) agent, since
        the count is data-dependent.
        """
        cfg = self.config
        out = self(rgb, lidar_bev, target_point, target_point_image, velocity,
                   bev_points, cam_points, num_points, train=False,
                   compute_aux=False)
        cnc = cfg.model.centernet
        decoded = cn.decode_heatmap(
            out["head_heatmap"], out["head_wh"], out["head_offset"],
            out["head_yaw_class"], out["head_yaw_res"], out["head_velocity"],
            out["head_brake"], k=cnc.top_k_center_keypoints,
            kernel=cnc.center_net_max_pooling_kernel,
            num_dir_bins=cnc.num_dir_bins)
        return out["pred_wp"], decoded.boxes, decoded.labels
