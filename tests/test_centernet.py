"""Golden tests for CenterNet ops vs a numpy oracle that follows the
reference implementation exactly (model.py:250-374, mmdet gaussian utils)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from transfuser_tpu.ops import centernet as cn


# ------------------------------------------------------------------ oracles

def gaussian_radius_oracle(det_size, min_overlap):
    height, width = det_size
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 - sq1) / (2 * a1)
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 - sq2) / (2 * a2)
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / (2 * a3)
    return min(r1, r2, r3)


def gen_gaussian_target_oracle(heatmap, center, radius):
    """mmdet gen_gaussian_target: max-splat of a (2r+1)^2 gaussian."""
    diameter = 2 * radius + 1
    sigma = diameter / 6.0
    m, n = radius, radius
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    g = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    x0, y0 = center
    h, w = heatmap.shape
    left, right = min(x0, n), min(w - x0, n + 1)
    top, bottom = min(y0, m), min(h - y0, m + 1)
    masked = heatmap[y0 - top:y0 + bottom, x0 - left:x0 + right]
    masked_g = g[m - top:m + bottom, n - left:n + right]
    np.maximum(masked, masked_g, out=masked)
    return heatmap


def build_targets_oracle(labels, valid, feat_hw, image_hw, num_dir_bins):
    """Reference get_targets loop (model.py:307-374), single class."""
    bs, k, _ = labels.shape
    fh, fw = feat_hw
    ih, iw = image_hw
    wr = fw / iw
    hr = fh / ih
    heat = np.zeros((bs, fh, fw), np.float32)
    wh = np.zeros((bs, fh, fw, 2), np.float32)
    off = np.zeros((bs, fh, fw, 2), np.float32)
    yaw_cls = np.zeros((bs, fh, fw), np.int32)
    yaw_res = np.zeros((bs, fh, fw), np.float32)
    vel = np.zeros((bs, fh, fw), np.float32)
    brake = np.zeros((bs, fh, fw), np.int32)
    weight = np.zeros((bs, fh, fw), np.float32)
    per = 2 * np.pi / num_dir_bins
    for b in range(bs):
        for j in range(k):
            if not valid[b, j]:
                continue
            cx = labels[b, j, 0] * wr
            cy = labels[b, j, 1] * wr  # reference uses width_ratio for y too
            cxi, cyi = int(cx), int(cy)
            sw = labels[b, j, 2] * wr
            sh = labels[b, j, 3] * hr
            radius = max(2, int(gaussian_radius_oracle((sh, sw), 0.1)))
            gen_gaussian_target_oracle(heat[b], (cxi, cyi), radius)
            wh[b, cyi, cxi] = (sw, sh)
            angle = labels[b, j, 4] % (2 * np.pi)
            shifted = (angle + per / 2) % (2 * np.pi)
            c = int(shifted // per)
            yaw_cls[b, cyi, cxi] = c
            yaw_res[b, cyi, cxi] = shifted - (c * per + per / 2)
            vel[b, cyi, cxi] = labels[b, j, 5]
            brake[b, cyi, cxi] = int(labels[b, j, 6])
            off[b, cyi, cxi] = (cx - cxi, cy - cyi)
            weight[b, cyi, cxi] = 1.0
    avg = max(1.0, float((heat == 1.0).sum()))
    return heat, wh, off, yaw_cls, yaw_res, vel, brake, weight, avg


# -------------------------------------------------------------------- tests

@pytest.mark.parametrize("h,w", [(3.0, 5.0), (10.0, 4.0), (16.0, 16.0),
                                 (1.0, 1.0), (40.0, 12.0)])
def test_gaussian_radius(h, w):
    ours = float(cn.gaussian_radius(jnp.float32(h), jnp.float32(w), 0.1))
    ref = gaussian_radius_oracle((h, w), 0.1)
    assert abs(ours - ref) < 1e-4


def test_angle_class_roundtrip(rng):
    angles = rng.uniform(-np.pi, np.pi, (64,)).astype(np.float32)
    cls, res = cn.angle_to_class(jnp.asarray(angles), 12)
    rec = np.asarray(cn.class_to_angle(cls, res, 12))
    # round trip up to 2pi wrap into [-pi, pi]
    diff = np.abs(((rec - angles) + np.pi) % (2 * np.pi) - np.pi)
    assert diff.max() < 1e-4


def test_build_targets_matches_reference_loop(rng):
    bs, k = 3, 20
    fh = fw = 16
    ih = iw = 64
    labels = np.zeros((bs, k, 7), np.float32)
    n = 6
    labels[:, :n, 0] = rng.uniform(4, iw - 4, (bs, n))
    labels[:, :n, 1] = rng.uniform(4, ih - 4, (bs, n))
    labels[:, :n, 2] = rng.uniform(6, 30, (bs, n))
    labels[:, :n, 3] = rng.uniform(10, 50, (bs, n))
    labels[:, :n, 4] = rng.uniform(-np.pi, np.pi, (bs, n))
    labels[:, :n, 5] = rng.uniform(0, 12, (bs, n))
    labels[:, :n, 6] = rng.integers(0, 2, (bs, n))
    valid = np.abs(labels).sum(-1) > 0

    t = cn.build_targets(jnp.asarray(labels), jnp.asarray(valid), (fh, fw),
                         (ih, iw), num_dir_bins=12)
    heat, wh, off, yaw_cls, yaw_res, vel, brake, weight, avg = \
        build_targets_oracle(labels, valid, (fh, fw), (ih, iw), 12)

    np.testing.assert_allclose(np.asarray(t.heatmap)[..., 0], heat,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.wh), wh, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.offset), off, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(t.yaw_class), yaw_cls)
    np.testing.assert_allclose(np.asarray(t.yaw_res), yaw_res,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t.velocity), vel, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(t.brake), brake)
    np.testing.assert_allclose(np.asarray(t.weight), weight, atol=1e-6)
    assert abs(float(t.avg_factor) - avg) < 1e-5


def test_decode_recovers_targets(rng):
    """Build targets from boxes, then decode the target maps as if they were
    predictions -> should recover the box parameters."""
    bs, k = 1, 20
    fh = fw = 64
    ih = iw = 256
    labels = np.zeros((bs, k, 7), np.float32)
    # Three well-separated boxes.
    centers = [(60, 60), (160, 120), (220, 200)]
    for j, (cx, cy) in enumerate(centers):
        labels[0, j] = [cx, cy, 24, 40, 0.5 + 0.3 * j, 3.0 + j, j % 2]
    valid = np.abs(labels).sum(-1) > 0

    t = cn.build_targets(jnp.asarray(labels), jnp.asarray(valid), (fh, fw),
                         (ih, iw), num_dir_bins=12)
    heat = np.asarray(t.heatmap)
    yaw_onehot = np.eye(12, dtype=np.float32)[np.asarray(t.yaw_class)]
    brake_onehot = np.eye(2, dtype=np.float32)[np.asarray(t.brake)]
    decoded = cn.decode_heatmap(
        jnp.asarray(heat), t.wh, t.offset, jnp.asarray(yaw_onehot),
        t.yaw_res[..., None], t.velocity[..., None], jnp.asarray(brake_onehot),
        k=10, kernel=3, num_dir_bins=12)
    boxes = np.asarray(decoded.boxes)[0]
    top = boxes[boxes[:, 7] >= 0.999]  # score==1 peaks
    assert top.shape[0] == 3
    got = sorted([tuple(np.round(b[:2]).astype(int)) for b in top])
    want = sorted(centers)
    for (gx, gy), (wx, wy) in zip(got, want):
        assert abs(gx - wx) <= 2 and abs(gy - wy) <= 2
    # yaw/velocity/brake recovered per box
    for b in top:
        j = centers.index(
            min(centers, key=lambda c: (c[0] - b[0]) ** 2 + (c[1] - b[1]) ** 2))
        assert abs(b[4] - labels[0, j, 4]) < 1e-3
        assert abs(b[5] - labels[0, j, 5]) < 1e-4
        assert int(b[6]) == int(labels[0, j, 6])
        assert abs(b[2] - 24) < 1e-3 and abs(b[3] - 40) < 1e-3


def test_gaussian_focal_loss_matches_mmdet_semantics(rng):
    pred = rng.uniform(0.01, 0.99, (2, 8, 8, 1)).astype(np.float32)
    target = np.zeros((2, 8, 8, 1), np.float32)
    target[0, 3, 3, 0] = 1.0
    target[0, 3, 4, 0] = 0.6
    af = 1.0
    ours = float(cn.gaussian_focal_loss(jnp.asarray(pred),
                                        jnp.asarray(target), af))
    eps = 1e-12
    pos_w = (target == 1.0)
    neg_w = (1 - target) ** 4
    pos = -np.log(pred + eps) * (1 - pred) ** 2 * pos_w
    neg = -np.log(1 - pred + eps) * pred ** 2 * neg_w
    ref = (pos + neg).sum() / af
    assert abs(ours - ref) < 1e-3
