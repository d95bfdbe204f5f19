"""Evaluation metrics beyond the training losses.

Waypoint ADE/FDE are the accuracy acceptance metrics (BASELINE.md:
"waypoint ADE parity with reference"); detection metrics summarize the
CenterNet head's agreement with the padded box labels.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def waypoint_ade(pred_wp: jnp.ndarray, gt_wp: jnp.ndarray) -> jnp.ndarray:
    """Average displacement error: mean L2 over all waypoints (B, T, 2)."""
    return jnp.linalg.norm(pred_wp - gt_wp, axis=-1).mean()


def waypoint_fde(pred_wp: jnp.ndarray, gt_wp: jnp.ndarray) -> jnp.ndarray:
    """Final displacement error: L2 at the last waypoint."""
    return jnp.linalg.norm(pred_wp[:, -1] - gt_wp[:, -1], axis=-1).mean()


def heatmap_peak_agreement(pred_heatmap: jnp.ndarray,
                           target_heatmap: jnp.ndarray,
                           threshold: float = 0.3) -> jnp.ndarray:
    """Fraction of GT peaks with a confident prediction within the same
    cell (cheap detection proxy; full AP lives in offline tools)."""
    peaks = target_heatmap >= 1.0
    hits = (pred_heatmap >= threshold) & peaks
    return hits.sum() / jnp.maximum(peaks.sum(), 1)


def eval_metrics(outputs: Dict[str, jnp.ndarray],
                 batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    out = {
        "ade": waypoint_ade(outputs["pred_wp"], batch["ego_waypoint"]),
        "fde": waypoint_fde(outputs["pred_wp"], batch["ego_waypoint"]),
    }
    if "pred_bev" in outputs and "bev" in batch:
        pred = jnp.argmax(outputs["pred_bev"], axis=-1)
        out["bev_iou_road"] = _class_iou(pred, batch["bev"], 1)
    return out


def _class_iou(pred: jnp.ndarray, target: jnp.ndarray,
               cls: int) -> jnp.ndarray:
    p = pred == cls
    t = target == cls
    inter = (p & t).sum()
    union = (p | t).sum()
    return inter / jnp.maximum(union, 1)
