"""Debug visualizations: model I/O renders + route/scenario maps.

Behavioral spec: model.py:936-1030 (visualize_model_io: rgb / BEV +
pred/gt boxes + waypoints / depth / semantics panel saved per step when
config.debug) and tools/dataset/vis_points.py (route + scenario-trigger
maps). matplotlib instead of cv2/pygame; purely host-side.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

# BGR->RGB of reference classes_list (config.py:79-87).
SEMANTIC_COLORS = np.array([
    [0, 0, 0], [0, 0, 255], [128, 64, 128], [255, 0, 0],
    [0, 255, 0], [157, 234, 50], [255, 255, 255],
], np.uint8)


def semantic_to_rgb(class_ids: np.ndarray) -> np.ndarray:
    return SEMANTIC_COLORS[np.clip(class_ids, 0, len(SEMANTIC_COLORS) - 1)]


def render_model_io(save_path: str, step: int, rgb: np.ndarray,
                    lidar_bev: np.ndarray, target_point: np.ndarray,
                    pred_wp: np.ndarray,
                    pred_bev: Optional[np.ndarray] = None,
                    pred_semantic: Optional[np.ndarray] = None,
                    pred_depth: Optional[np.ndarray] = None,
                    boxes: Optional[np.ndarray] = None,
                    gt_wp: Optional[np.ndarray] = None,
                    pixels_per_meter: float = 8.0) -> str:
    """Write a combined debug panel; returns the png path."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(14, 8))
    ax = axes[0, 0]
    ax.imshow(np.clip(rgb / 255.0, 0, 1))
    ax.set_title("rgb")
    ax.axis("off")

    ax = axes[0, 1]
    bev_img = lidar_bev[..., 0] + lidar_bev[..., 1]
    ax.imshow(bev_img, cmap="gray")
    # waypoints in lidar frame -> BEV pixels (x fwd -> -row, y -> col)
    def to_px(points):
        px = 128 + points[:, 1] * pixels_per_meter
        py = 256 - (points[:, 0] + 1.3) * pixels_per_meter
        return px, py

    if gt_wp is not None:
        px, py = to_px(np.asarray(gt_wp))
        ax.plot(px, py, "go-", label="gt wp", markersize=4)
    px, py = to_px(np.asarray(pred_wp))
    ax.plot(px, py, "ro-", label="pred wp", markersize=4)
    tp = np.asarray(target_point, np.float64)
    ax.plot(128 + tp[1] * pixels_per_meter,
            256 - (tp[0] + 1.3) * pixels_per_meter, "b*", markersize=12,
            label="target")
    if boxes is not None:
        for b in boxes:
            x, y, w, h, yaw = b[:5]
            c, s = math.cos(yaw), math.sin(yaw)
            local = np.array([[-h, -w], [-h, w], [h, w], [h, -w], [-h, -w]])
            rot = local @ np.array([[c, -s], [s, c]]).T
            ax.plot(x + rot[:, 0], y + rot[:, 1], "y-", linewidth=1)
    ax.legend(fontsize=7)
    ax.set_title("BEV + waypoints")
    ax.axis("off")

    ax = axes[1, 0]
    if pred_depth is not None:
        ax.imshow(pred_depth, cmap="magma")
        ax.set_title("pred depth")
    ax.axis("off")

    ax = axes[1, 1]
    if pred_semantic is not None:
        ids = np.argmax(pred_semantic, axis=-1) \
            if pred_semantic.ndim == 3 else pred_semantic
        ax.imshow(semantic_to_rgb(ids))
        ax.set_title("pred semantics")
    elif pred_bev is not None:
        ax.imshow(np.argmax(pred_bev, axis=-1)
                  if pred_bev.ndim == 3 else pred_bev)
        ax.set_title("pred BEV seg")
    ax.axis("off")

    os.makedirs(save_path, exist_ok=True)
    out = os.path.join(save_path, f"{step:05d}.png")
    fig.tight_layout()
    fig.savefig(out, dpi=100)
    plt.close(fig)
    return out


def render_routes_map(routes_xml: str, scenarios_json: Optional[str],
                      out_path: str, town_map=None) -> str:
    """Plot route polylines + scenario trigger points (vis_points.py /
    set_new_scenarios.py debug view). With a `town_map`
    (sim/town_map.TownMap), the road network is drawn underneath."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..harness.route_parser import (load_scenario_annotations,
                                        parse_routes_file)

    fig, ax = plt.subplots(figsize=(10, 10))
    if town_map is not None:
        for lane in town_map.lanes.values():
            cl = lane.centerline
            ax.plot(cl[:, 0], cl[:, 1], color="0.8",
                    linewidth=lane.width, solid_capstyle="round",
                    zorder=0)
    for cfg in parse_routes_file(routes_xml):
        xs = [t.location.x for t in cfg.trajectory]
        ys = [t.location.y for t in cfg.trajectory]
        ax.plot(xs, ys, "-o", markersize=2, label=cfg.name)
    if scenarios_json:
        ann = load_scenario_annotations(scenarios_json)
        for town, scenarios in ann.items():
            for sc in scenarios:
                pts = [(e["transform"]["x"], e["transform"]["y"])
                      for e in sc.get("available_event_configurations", [])]
                if pts:
                    xs, ys = zip(*pts)
                    ax.scatter(xs, ys, marker="x", s=40,
                               label=sc.get("scenario_type"))
    ax.set_aspect("equal")
    ax.legend(fontsize=7)
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path
