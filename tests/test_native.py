"""Native C fast path vs numpy reference parity."""

import numpy as np
import pytest

from transfuser_tpu import native
from transfuser_tpu.config import SEMANTIC_CONVERTER
from transfuser_tpu.data import decoders, lidar_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_lidar_histogram_parity(rng):
    pts = rng.uniform(-40, 40, (5000, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-4, 2, 5000)
    fast = native.lidar_histogram(pts)
    slow = lidar_np.lidar_to_histogram(pts, use_native=False)
    np.testing.assert_allclose(fast, slow, atol=1e-6)


def test_depth_decode_parity(rng):
    rgb = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    fast = native.decode_depth(rgb)
    slow = decoders.decode_depth(rgb)
    np.testing.assert_allclose(fast, slow, atol=1e-5)


def test_semantic_convert_parity(rng):
    seg = rng.integers(0, 26, (64, 96)).astype(np.uint8)
    lut = np.asarray(SEMANTIC_CONVERTER, np.uint8)
    fast = native.semantic_convert(seg, lut)
    slow = decoders.convert_semantics(seg)
    np.testing.assert_array_equal(fast, slow)


def test_bev_decode_parity(rng):
    packed = rng.integers(0, 255, (128, 128, 3)).astype(np.uint8)
    fast = native.decode_bev_roadlane(packed)
    slow = decoders.decode_bev_channels(packed)
    np.testing.assert_allclose(fast, slow, atol=1e-6)


def test_png_decode_parity(rng, tmp_path):
    """libpng fast path round-trips cv2-written files exactly, in every
    channel mode the dataset uses (RGB force, keep-own grayscale,
    gray->RGB promotion)."""
    import cv2

    rgb = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    p_rgb = str(tmp_path / "rgb.png")
    cv2.imwrite(p_rgb, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    np.testing.assert_array_equal(native.png_read(p_rgb, channels=3), rgb)

    gray = rng.integers(0, 26, (32, 40)).astype(np.uint8)
    p_gray = str(tmp_path / "g.png")
    cv2.imwrite(p_gray, gray)
    np.testing.assert_array_equal(native.png_read(p_gray), gray)
    np.testing.assert_array_equal(native.png_read(p_gray, channels=3),
                                  np.stack([gray] * 3, axis=-1))

    assert native.png_read(str(tmp_path / "missing.png")) is None


def test_dataset_imread_uses_native(tmp_path, rng):
    """CarlaDataset._imread_rgb/_imread_any return identical pixels to the
    cv2 fallback path."""
    import cv2

    from transfuser_tpu.data.dataset import CarlaDataset

    rgb = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
    np.testing.assert_array_equal(CarlaDataset._imread_rgb(p), rgb)
    np.testing.assert_array_equal(CarlaDataset._imread_any(p), rgb)

    gray = rng.integers(0, 26, (16, 24)).astype(np.uint8)
    pg = str(tmp_path / "s.png")
    cv2.imwrite(pg, gray)
    np.testing.assert_array_equal(CarlaDataset._imread_any(pg), gray)


def test_native_histogram_speed(rng):
    import time
    pts = rng.uniform(-40, 40, (40000, 4)).astype(np.float32)
    native.lidar_histogram(pts)  # warmup
    t0 = time.perf_counter()
    for _ in range(10):
        native.lidar_histogram(pts)
    fast_t = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        lidar_np.lidar_to_histogram(pts, use_native=False)
    slow_t = time.perf_counter() - t0
    assert fast_t < slow_t  # C path must beat numpy histogramdd
