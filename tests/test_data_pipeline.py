"""Data pipeline tests: decoders + on-disk round trip + loader ordering."""

import json
import os

import numpy as np
import pytest

from transfuser_tpu.data import decoders, lidar_np
from transfuser_tpu.data.loader import PrefetchLoader

from helpers import tiny_config


def test_depth_decode_roundtrip():
    # encode a known depth in the 24-bit RGB format
    depth_m = np.array([[10.0, 49.0], [0.5, 100.0]])  # meters
    normalized = depth_m / 1000.0
    code = np.round(normalized * (256 ** 3 - 1)).astype(np.int64)
    rgb = np.stack([(code >> 16) & 255, (code >> 8) & 255, code & 255],
                   axis=-1).astype(np.uint8)
    out = decoders.decode_depth(rgb)
    want = np.clip(normalized, 0, 0.05) * 20.0
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_lidar_histogram_properties():
    pts = np.array([
        [0.0, -10.0, 0.0, 1.0],    # above split, x=0 y=-10
        [0.0, -10.0, -3.0, 1.0],   # below split, same cell
        [100.0, 100.0, 0.0, 1.0],  # out of range
    ], np.float32)
    hist = lidar_np.lidar_to_histogram(pts)
    assert hist.shape == (256, 256, 2)
    assert hist.sum() == pytest.approx(2.0 / 5.0)
    # clipping at 5 per cell
    many = np.repeat(pts[:1], 50, axis=0)
    hist2 = lidar_np.lidar_to_histogram(many)
    assert hist2.max() == pytest.approx(1.0)


def test_align_identity_and_translation():
    pts = np.array([[1.0, 2.0, 0.5, 0.7]], np.float32)
    eye = np.eye(4)
    out = lidar_np.align_lidar(pts, eye, eye, degree=0.0)
    np.testing.assert_allclose(out, pts, atol=1e-5)
    # ego moved 1m forward between frames -> points shift back in x... in
    # lidar frame (rotated -90) the shift shows on y axis after the
    # sandwich transform; just assert intensity preserved + finite.
    moved = np.eye(4)
    moved[0, 3] = 1.0
    out2 = lidar_np.align_lidar(pts, moved, eye, degree=0.0)
    assert out2[0, 3] == pytest.approx(0.7)
    assert np.isfinite(out2).all()


def test_bbox_label_matches_reference_transform():
    # box 5m ahead, 2m right in lidar metric frame
    bbox = decoders.encode_bbox_label(
        extent=[1.5, 4.0, 2.0], position=[2.0, 5.0, 0.0], yaw=0.3,
        speed=4.0, brake=0.0, rad=0.0)
    # T = lidar_to_bevimage: x' = (-y + 16)*8, y' = (-x + 32)*8
    assert bbox[0] == pytest.approx((-5.0 + 16) * 8)
    assert bbox[1] == pytest.approx((-2.0 + 32) * 8)
    assert bbox[2] == pytest.approx(2.0 * 8)   # dy * ppm
    assert bbox[3] == pytest.approx(4.0 * 8)   # dx * ppm
    assert bbox[4] == pytest.approx(0.3)


def test_target_point_rasterization():
    img = decoders.rasterize_target_point(np.array([0.0, 10.0]), size=256)
    assert img.shape == (256, 256, 1)
    assert img.max() == 1.0
    ys, xs, _ = np.nonzero(img)
    # point (0, 10): px = 0*8+128 = 128; py = 256 - (-10+(-1.3? sign...))
    assert abs(xs.mean() - 128) < 8


def _write_fake_route(root, n_frames=14):
    import cv2
    route = os.path.join(root, "Scenario1", "Town01_route0")
    for sub in ("rgb", "depth", "semantics", "lidar", "topdown", "label_raw",
                "measurements"):
        os.makedirs(os.path.join(route, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    eye = np.eye(4).tolist()
    for i in range(n_frames):
        cv2.imwrite(f"{route}/rgb/{i:04d}.png",
                    rng.integers(0, 255, (160, 704, 3)).astype(np.uint8))
        cv2.imwrite(f"{route}/depth/{i:04d}.png",
                    rng.integers(0, 255, (160, 704, 3)).astype(np.uint8))
        cv2.imwrite(f"{route}/semantics/{i:04d}.png",
                    rng.integers(0, 26, (160, 704)).astype(np.uint8))
        cv2.imwrite(f"{route}/topdown/encoded_{i:04d}.png",
                    rng.integers(0, 255, (500, 500, 3)).astype(np.uint8))
        pts = rng.uniform(-20, 20, (500, 4)).astype(np.float32)
        np.save(f"{route}/lidar/{i:04d}.npy",
                np.array([None, pts], dtype=object), allow_pickle=True)
        meas = {"x": 10.0, "y": 5.0, "theta": 0.3, "speed": 3.0,
                "x_command": 40.0, "y_command": 5.0, "steer": 0.0,
                "throttle": 0.5, "brake": False, "light_hazard": False,
                "ego_matrix": eye}
        with open(f"{route}/measurements/{i:04d}.json", "w") as f:
            json.dump(meas, f)
        labels = [
            {"id": 0, "ego_matrix": eye, "extent": [1.5, 4.9, 2.1],
             "position": [0.0, 0.0, 0.0], "yaw": 0.0, "speed": 3.0,
             "brake": 0.0, "num_points": 100, "distance": 0.0,
             "class": "Car"},
            {"id": 7, "ego_matrix": eye, "extent": [1.5, 4.0, 2.0],
             "position": [2.0, 5.0, 0.0], "yaw": 0.2, "speed": 1.0,
             "brake": 0.0, "num_points": 60, "distance": 5.0,
             "class": "Car"},
        ]
        with open(f"{route}/label_raw/{i:04d}.json", "w") as f:
            json.dump(labels, f)
    return os.path.join(root, "Scenario1")


def test_dataset_roundtrip(tmp_path):
    from transfuser_tpu.config import GlobalConfig
    from transfuser_tpu.data.dataset import CarlaDataset

    scenario_dir = _write_fake_route(str(tmp_path))
    cfg = GlobalConfig()
    ds = CarlaDataset([scenario_dir], cfg, augment=False)
    assert len(ds) > 0
    s = ds[0]
    assert s["rgb"].shape == (160, 704, 3)
    assert s["lidar"].shape == (256, 256, 2)
    assert s["bev"].shape == (160, 160)
    assert s["depth"].shape == (160, 704)
    assert s["semantic"].shape == (160, 704)
    assert s["semantic"].max() <= 6
    assert s["label"].shape == (20, 7)
    assert s["ego_waypoint"].shape == (4, 2)
    assert s["target_point"].shape == (2,)
    assert s["target_point_image"].shape == (256, 256, 1)
    # the non-ego vehicle at (2, 5) must be encoded in slot 0
    assert s["label"][0, :2].max() > 0


def test_loader_order_and_determinism(tmp_path):
    from transfuser_tpu.config import GlobalConfig
    from transfuser_tpu.data.dataset import CarlaDataset

    scenario_dir = _write_fake_route(str(tmp_path))
    cfg = GlobalConfig()
    ds = CarlaDataset([scenario_dir], cfg, augment=False)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, num_workers=3,
                            seed=5)
    b1 = [b["speed"].copy() for b in loader]
    b2 = [b["speed"].copy() for b in loader]
    assert len(b1) == len(ds) // 2
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x, y)  # same epoch -> same order
    loader.set_epoch(1)
    assert all(b.shape == (2,) for b in b1)


def test_correspondences_shapes():
    from transfuser_tpu.data.correspondences import lidar_cam_correspondences
    rng = np.random.default_rng(3)
    # points ahead of the car in carla frame (x left, y forward, z up)
    pts = np.stack([
        rng.uniform(-10, 10, 2000),
        rng.uniform(1, 30, 2000),
        rng.uniform(-2, 1, 2000),
    ], axis=1)
    bev_pts, cam_pts = lidar_cam_correspondences(pts)
    assert bev_pts.shape == (8, 8, 5, 2)
    assert cam_pts.shape == (5, 22, 5, 2)
    assert bev_pts[..., 0].max() < 22 and bev_pts[..., 1].max() < 5
    assert cam_pts[..., 0].max() < 8 and cam_pts[..., 1].max() < 8
    assert bev_pts.max() > 0  # something projected
