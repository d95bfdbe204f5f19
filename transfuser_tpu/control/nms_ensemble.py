"""Greedy polygon-IoU NMS for fusing ensemble detections.

Reference: submission_agent.py:432-454 (greedy NMS over all members'
boxes) + 491-497 (shapely polygon IoU — replaced by the exact convex-quad
clipper in geometry.convex_iou)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..geometry import convex_iou


def non_maximum_suppression(
        bounding_boxes: Sequence[Sequence[Tuple[np.ndarray, float, float]]],
        iou_threshold: float) -> List[np.ndarray]:
    """bounding_boxes: per-ensemble-member lists of (corners(6,2+), brake,
    confidence). Returns the kept corner arrays, highest confidence first."""
    flat: List[Tuple[np.ndarray, float, float]] = [
        det for member in bounding_boxes for det in member]
    if not flat:
        return []

    confidences = np.array([det[2] for det in flat], dtype=np.float64)
    order = list(np.argsort(confidences))
    kept: List[np.ndarray] = []
    while order:
        idx = order.pop()  # highest confidence remaining
        current = flat[idx][0]
        kept.append(current)
        order = [
            j for j in order
            if convex_iou(current[:4, :2], flat[j][0][:4, :2]) <= iou_threshold
        ]
    return kept
