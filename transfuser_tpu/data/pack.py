"""Packed wire format for host->device batch transfer.

The axon tunnel moves ~110-130 MB/s host->device (PERF_NOTES round-4
transfer probe) and transfers overlap device compute, so steady-state
training throughput is min(chip rate, bandwidth / bytes-per-sample). The
fp32 sample is ~3.2 MB (38 samples/s ceiling on this tunnel); packed it is
~0.9 MB (~130 samples/s ceiling). The reference ships uint8 images to the
GPU and normalizes there for the same reason (data.py:133-197 keeps uint8,
train.py:248-271 casts on device).

Packing is EXACT for every key except depth:
  rgb                 fp32 0..255 integers      -> uint8
  lidar               two-slice histogram k/5   -> uint8 k (k in 0..5)
  semantic            class ids                 -> uint8
  bev                 class ids {0,1,2}         -> uint8
  target_point_image  {0,1} raster              -> uint8
  depth               [0,1] fp32                -> uint16 (quantization
                        1/65535 ~= 1.5e-5 on a [0,1] L1 target)
Small keys (label, ego_waypoint, target_point, speed, bev_points,
cam_points, lidar_raw, num_points) stay as-is.

unpack_batch is pure jnp and dtype-dispatched: traced into the train/eval
step it restores the exact fp32/int32 arrays the model and losses consume
(identity for an already-unpacked batch), so the cast+scale runs fused on
device and the wire stays narrow.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

DEPTH_SCALE = 65535.0
LIDAR_HIST_MAX = 5.0  # lidar_np.HIST_MAX_PER_PIXEL


def pack_sample(sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Host-side: compact dtypes for the tunnel. Idempotent."""
    out = dict(sample)
    v = out.get("rgb")
    if v is not None and v.dtype != np.uint8:
        out["rgb"] = v.astype(np.uint8)
    v = out.get("lidar")
    if v is not None and v.dtype != np.uint8:
        out["lidar"] = np.round(v * LIDAR_HIST_MAX).astype(np.uint8)
    v = out.get("depth")
    if v is not None and v.dtype != np.uint16:
        out["depth"] = np.round(
            np.clip(v, 0.0, 1.0) * DEPTH_SCALE).astype(np.uint16)
    for key in ("semantic", "bev", "target_point_image"):
        v = out.get(key)
        if v is not None and v.dtype != np.uint8:
            out[key] = v.astype(np.uint8)
    return out


def packed_nbytes(sample: Dict[str, np.ndarray]) -> int:
    return sum(v.nbytes for v in pack_sample(sample).values())


def unpack_batch(batch: Dict) -> Dict:
    """Device-side (jnp) inverse; identity on unpacked keys. Call at the
    top of any traced function that consumes a batch."""
    import jax.numpy as jnp

    out = dict(batch)
    v = out.get("rgb")
    if v is not None and v.dtype == jnp.uint8:
        out["rgb"] = v.astype(jnp.float32)
    v = out.get("lidar")
    if v is not None and v.dtype == jnp.uint8:
        out["lidar"] = v.astype(jnp.float32) / LIDAR_HIST_MAX
    v = out.get("depth")
    if v is not None and v.dtype == jnp.uint16:
        out["depth"] = v.astype(jnp.float32) / DEPTH_SCALE
    for key, dt in (("semantic", jnp.int32), ("bev", jnp.int32),
                    ("target_point_image", jnp.float32)):
        v = out.get(key)
        if v is not None and v.dtype == jnp.uint8:
            out[key] = v.astype(dt)
    return out
