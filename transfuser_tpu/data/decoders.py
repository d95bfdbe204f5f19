"""Host-side sample decoders: depth, bit-packed BEV, crops, augmentation,
box labels, waypoints, target point.

Behavioral parity with reference data.py (cited per function); written for
NHWC outputs and a threaded loader.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import geometry
from ..config import SEMANTIC_CONVERTER

SEM_CONVERTER = np.asarray(SEMANTIC_CONVERTER, dtype=np.uint8)


# --------------------------------------------------------------------- depth

def decode_depth(rgb_depth: np.ndarray) -> np.ndarray:
    """24-bit RGB-encoded depth -> [0,1] clipped at 50 m (data.py:358-372).
    rgb_depth: (H, W, 3) uint8 RGB."""
    d = rgb_depth.astype(np.float32)
    normalized = d[..., 0] * 65536.0 + d[..., 1] * 256.0 + d[..., 2]
    normalized /= (256.0 ** 3 - 1.0)
    return np.clip(normalized, 0.0, 0.05) * 20.0


# ------------------------------------------------------------ bit-packed BEV

def decode_bev_channels(packed: np.ndarray) -> np.ndarray:
    """3-channel uint8 png -> road/lane channels 10:12 of the 15-channel
    bit-packing (data.py:844-856; encode side map_utils.encode_npy_to_pil).
    packed: (H, W, 3) uint8 -> (2, H, W) float."""
    img = np.transpose(packed, (2, 0, 1))  # (3, H, W)
    out = np.zeros((2, img.shape[1], img.shape[2]), np.float32)
    # channel 10 = bit 8-0-1 of png ch 1 index 0... channels 10,11 come from
    # packed plane 2 (ix+5+5) at bit positions 7 and 6.
    for k, ix in enumerate((0, 1)):  # 15-channel ids 10, 11
        bit_pos = 8 - ix - 1
        out[k] = (img[2] & (1 << bit_pos)) >> bit_pos
    return out


def crop_and_encode_bev(bev_road_lane: np.ndarray, degree: float,
                        out_px: int = 160,
                        pixels_per_meter: int = 5) -> np.ndarray:
    """(2, 500, 500)-ish global crop -> (160,160) class map {0,1,2}
    (data.py:586-611): shift 7px for lidar x offset, rotate by augmentation
    angle, crop 160x160, argmax over [zeros, road, road+lane]."""
    arr = np.moveaxis(bev_road_lane, 0, -1).astype(np.float32)  # (H, W, 2)
    shifted = np.zeros_like(arr)
    shifted[7:] = arr[:-7]
    if degree != 0.0:
        # bilinear rotation about the center (reference uses
        # skimage.transform.rotate, data.py:3,601); cv2.warpAffine is
        # ~20x faster than scipy/skimage and was 63% of the per-sample
        # decode cost (PERF_NOTES host data path)
        import cv2
        h, w = shifted.shape[:2]
        m = cv2.getRotationMatrix2D(((w - 1) / 2.0, (h - 1) / 2.0),
                                    degree, 1.0)
        shifted = cv2.warpAffine(shifted, m, (w, h),
                                 flags=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=0.0)
    px = 32 * pixels_per_meter
    start_x = 250 - px // 2
    start_y = 250 - px
    crop = shifted[start_y:start_y + px, start_x:start_x + px]
    stacked = np.stack([
        np.zeros_like(crop[..., 0]),
        crop[..., 0],
        crop[..., 0] + crop[..., 1],
    ], axis=0)
    return np.argmax(stacked, axis=0).astype(np.int32)


# ------------------------------------------------------------------ cropping

def crop_image(image: np.ndarray, crop_hw: Tuple[int, int],
               crop_shift: float = 0.0) -> np.ndarray:
    """Center crop with x shift; HWC in, HWC out (data.py:545-560).

    The stored datagen strip (160x960) always has >=128 px of margin for
    the reference's +-107 px max shift; for sources with less margin the
    shift is clamped so the crop never runs off the edge (the reference
    would silently return a short slice there).
    """
    h, w = image.shape[:2]
    ch, cw = crop_hw
    if h < ch or w < cw:
        raise ValueError(
            f"source {image.shape[:2]} smaller than crop {crop_hw}")
    start_y = h // 2 - ch // 2
    start_x = w // 2 - cw // 2 + int(crop_shift)
    start_x = min(max(start_x, 0), w - cw)
    return image[start_y:start_y + ch, start_x:start_x + cw]


def convert_semantics(seg: np.ndarray) -> np.ndarray:
    """CARLA semantic ids -> 7-class ids (config.py:88-117)."""
    return SEM_CONVERTER[seg]


# ------------------------------------------------------------------- labels

def encode_bbox_label(extent: Sequence[float], position: Sequence[float],
                      yaw: float, speed: float, brake: float,
                      rad: float = 0.0) -> np.ndarray:
    """One actor record -> [cx, cy, w, h, yaw, speed, brake] in 256px BEV
    image space with augmentation rotation (data.py:472-494)."""
    dz, dx, dy = extent
    x, y = position[0], position[1]
    ppm = 8.0
    c, s = np.cos(rad), np.sin(rad)
    aug = np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]])
    t = geometry.lidar_to_bevimage() @ aug
    pos = t @ np.array([x, y, 1.0])
    pos = np.clip(pos, 0.0, 255.0)
    return np.array([pos[0], pos[1], dy * ppm, dx * ppm, yaw + rad, speed,
                     brake], dtype=np.float32)


def parse_box_labels(records: List[dict], rad: float = 0.0,
                     max_boxes: int = 20) -> Tuple[np.ndarray, Dict[int, int]]:
    """label_raw records -> padded (max_boxes, 7) + id->slot map. Filters
    boxes with <=1 lidar hits or centers outside the grid (data.py:497-514).
    """
    out = np.zeros((max_boxes, 7), np.float32)
    id_to_slot: Dict[int, int] = {}
    slot = 0
    for rec in records:
        bbox = encode_bbox_label(rec["extent"], rec["position"], rec["yaw"],
                                 rec["speed"], rec["brake"], rad)
        if rec.get("num_points", 2) <= 1:
            continue
        if not (0.0 < bbox[0] < 255.0 and 0.0 < bbox[1] < 255.0):
            continue
        if slot < max_boxes:
            out[slot] = bbox
            id_to_slot[rec["id"]] = slot
            slot += 1
    return out, id_to_slot


# ----------------------------------------------------------------- waypoints

def ego_waypoints_from_labels(label_seq: List[List[dict]], pred_len: int,
                              aug_rad: float = 0.0) -> np.ndarray:
    """Future ego positions in the virtual-lidar frame (data.py:375-409,
    297-305). label_seq: seq of label_raw record lists; ego is record 0."""
    ego_id = label_seq[0][0]["id"]
    base = np.asarray(label_seq[0][0]["ego_matrix"], np.float64)
    base_inv = np.linalg.inv(base)
    t = geometry.vehicle_to_virtual_lidar()
    wps = []
    for i in range(1, pred_len + 1):
        match = next((r for r in label_seq[i] if r["id"] == ego_id), None)
        if match is None:
            m = np.eye(4)
        else:
            m = t @ base_inv @ np.asarray(match["ego_matrix"], np.float64)
        wps.append(m[:2, 3])
    wps = np.asarray(wps, np.float32)
    c, s = np.cos(aug_rad), np.sin(aug_rad)
    rot = np.array([[c, s], [-s, c]], np.float32)
    return (rot @ wps.T).T


# -------------------------------------------------------------- target point

def local_command_point(ego_x: float, ego_y: float, ego_theta: float,
                        x_command: float, y_command: float,
                        aug_rad: float = 0.0) -> np.ndarray:
    """Far-command goal in the ego frame (data.py:338-353; LBC's 90+theta
    convention)."""
    theta = ego_theta + aug_rad
    a = np.pi / 2 + theta
    r = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
    local = r.T @ np.array([x_command - ego_x, y_command - ego_y])
    return local.astype(np.float32)


def rasterize_target_point(target_point: np.ndarray,
                           size: int = 256) -> np.ndarray:
    """Target point -> (size, size, 1) raster with a filled disc
    (data.py:616-630 draws a cv2 circle radius 5 thickness 3; we draw an
    anti-alias-free disc of outer radius 6.5 to cover the same pixels)."""
    img = np.zeros((size, size), np.float32)
    p = target_point.astype(np.float64).copy()
    p[1] += 1.3
    p *= 8.0
    p[1] *= -1
    p[1] = size - p[1]
    p[0] += size // 2
    p = np.clip(p.astype(np.int64), 0, size)
    cx, cy = int(p[0]), int(p[1])
    rr = 6  # radius 5 + thickness 3 => covered band ~[3.5, 6.5]
    ys, xs = np.ogrid[:size, :size]
    mask = (xs - cx) ** 2 + (ys - cy) ** 2 <= rr * rr
    img[mask] = 1.0
    return img[..., None]
