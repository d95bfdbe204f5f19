"""The 11-term training loss (reference model.py:733-805 + mmdet head loss
model.py:150-248), fully in-graph including CenterNet target generation.

Batch layout (NHWC, fp32 unless noted):
    rgb                (B,160,704,3) in [0,255]
    lidar              (B,256,256,2) histogram
    target_point       (B,2)
    target_point_image (B,256,256,1)
    ego_waypoint       (B,4,2)
    label              (B,20,7) padded boxes  [cx,cy,w,h,yaw,speed,brake]
    bev                (B,160,160) int32 in {0,1,2}
    depth              (B,160,704)
    semantic           (B,160,704) int32 in [0,7)
    speed              (B,)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ..config import GlobalConfig
from ..ops import centernet as cn


def compute_losses(outputs: Dict[str, jnp.ndarray],
                   batch: Dict[str, jnp.ndarray],
                   config: GlobalConfig) -> Dict[str, jnp.ndarray]:
    """Returns the detailed (unweighted-by-schedule) loss dict."""
    cfg = config
    losses: Dict[str, jnp.ndarray] = {}

    # Waypoints: plain L1 (model.py:765).
    losses["loss_wp"] = jnp.mean(
        jnp.abs(outputs["pred_wp"] - batch["ego_waypoint"]))

    # BEV segmentation: class-weighted CE (model.py:762-763).
    bev_w = jnp.asarray(cfg.loss.bev_class_weights, jnp.float32)
    losses["loss_bev"] = cn.cross_entropy_mean(
        outputs["pred_bev"], batch["bev"].astype(jnp.int32), bev_w)

    # CenterNet targets + losses.
    labels = batch["label"]
    valid = jnp.sum(jnp.abs(labels), axis=-1) > 0.0  # model.py:774
    cnc = cfg.model.centernet
    feat_hw = outputs["head_heatmap"].shape[1:3]
    image_hw = (cfg.sensors.lidar_resolution_height,
                cfg.sensors.lidar_resolution_width)
    t = cn.build_targets(labels, valid, feat_hw, image_hw,
                         num_dir_bins=cnc.num_dir_bins,
                         min_overlap=cnc.gaussian_min_overlap,
                         min_radius=cnc.gaussian_min_radius)
    af = t.avg_factor
    w2 = jnp.repeat(t.weight[..., None], 2, axis=-1)
    losses["loss_center_heatmap"] = cn.gaussian_focal_loss(
        outputs["head_heatmap"], t.heatmap, af)
    losses["loss_wh"] = cn.weighted_l1_loss(
        outputs["head_wh"], t.wh, w2, af * 2.0,
        loss_weight=cnc.loss_wh_weight)
    losses["loss_offset"] = cn.weighted_l1_loss(
        outputs["head_offset"], t.offset, w2, af * 2.0)
    ce_bb = cfg.loss.reference_ce_batch_broadcast
    losses["loss_yaw_class"] = cn.weighted_ce_loss(
        outputs["head_yaw_class"], t.yaw_class, t.weight, af,
        batch_broadcast=ce_bb)
    losses["loss_yaw_res"] = cn.weighted_smooth_l1_loss(
        outputs["head_yaw_res"][..., 0], t.yaw_res, t.weight, af)
    losses["loss_velocity"] = cn.weighted_l1_loss(
        outputs["head_velocity"][..., 0], t.velocity, t.weight, af)
    losses["loss_brake"] = cn.weighted_ce_loss(
        outputs["head_brake"], t.brake, t.weight, af,
        batch_broadcast=ce_bb)

    # Multitask aux losses (model.py:780-793).
    if cfg.model.multitask:
        losses["loss_semantic"] = cfg.loss.ls_seg * cn.cross_entropy_mean(
            outputs["pred_semantic"], batch["semantic"].astype(jnp.int32))
        pd = outputs["pred_depth"]
        losses["loss_depth"] = cfg.loss.ls_depth * jnp.mean(
            jnp.abs(pd.astype(jnp.promote_types(pd.dtype, jnp.float32))
                    - batch["depth"]))
    else:
        zero = jnp.zeros_like(losses["loss_wp"])
        losses["loss_semantic"] = zero
        losses["loss_depth"] = zero
    return losses


def total_loss(detailed: Dict[str, jnp.ndarray],
               config: GlobalConfig) -> jnp.ndarray:
    """Weighted sum in the reference's detailed_losses order
    (train.py:309-311, config.py:134-136)."""
    total = jnp.zeros((), jnp.float32)
    for name, weight in zip(config.loss.detailed_losses,
                            config.loss.detailed_losses_weights):
        total = total + weight * detailed[name]
    return total
