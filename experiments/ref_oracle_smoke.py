"""Smoke: import the REAL reference model via the tests/ref_oracle shims
and run forward_ego + training forward at full scale on CPU."""

import os
import sys
import time

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/team_code_transfuser"
sys.path.insert(0, os.path.join(REPO, "tests", "ref_oracle"))
sys.path.insert(0, REF)

import model as ref_model  # noqa: E402
import config as ref_config  # noqa: E402

assert ref_model.__file__.startswith(REF), ref_model.__file__

torch.manual_seed(0)
cfg = ref_config.GlobalConfig(setting="eval")
net = ref_model.LidarCenterNet(cfg, "cpu", "transFuser",
                               "regnety_032", "regnety_032",
                               use_velocity=False).eval()
n_params = sum(p.numel() for p in net.parameters())
print(f"built reference LidarCenterNet: {n_params/1e6:.2f}M params")

rng = np.random.default_rng(0)
rgb = torch.from_numpy(
    rng.uniform(0, 255, (1, 3, 160, 704)).astype(np.float32))
lidar = torch.from_numpy(
    rng.uniform(0, 1.0, (1, 2, 256, 256)).astype(np.float32))
target_point = torch.from_numpy(
    rng.uniform(-20, 20, (1, 2)).astype(np.float32))
ego_vel = torch.from_numpy(np.array([[3.0]], dtype=np.float32))

t0 = time.time()
with torch.no_grad():
    pred_wp, rotated_bboxes = net.forward_ego(
        rgb, lidar, target_point, None, ego_vel)
print(f"forward_ego ok in {time.time()-t0:.1f}s: wp={pred_wp.shape} "
      f"nboxes={len(rotated_bboxes)}")
print("wp:", pred_wp.numpy())

# training forward
ego_waypoint = torch.from_numpy(
    rng.uniform(-5, 5, (1, 4, 2)).astype(np.float32))
bev = torch.from_numpy(rng.integers(
    0, 3, (1, cfg.bev_resolution_height,
           cfg.bev_resolution_width)).astype(np.int64))
label = torch.zeros((1, 20, 7), dtype=torch.float32)
label[0, 0] = torch.tensor([100., 120., 8., 16., 1.2, 2.0, 1.0])
label[0, 1] = torch.tensor([60., 200., 10., 20., 4.0, 0.0, 0.0])
depth = torch.from_numpy(
    rng.uniform(0, 1, (1, 160, 704)).astype(np.float32))
semantic = torch.from_numpy(
    rng.integers(0, 7, (1, 160, 704)).astype(np.int64))

t0 = time.time()
with torch.no_grad():
    loss = net.forward(rgb, lidar, ego_waypoint, target_point, None,
                       ego_vel, bev, label, depth, semantic)
print(f"train forward ok in {time.time()-t0:.1f}s")
for k, v in loss.items():
    print(f"  {k}: {float(v):.6f}")
