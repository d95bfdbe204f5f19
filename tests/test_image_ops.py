"""Golden tests: image ops vs torch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from transfuser_tpu.ops import image_ops


def to_torch_nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def from_torch_nchw(t):
    return np.transpose(t.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((40, 176), (5, 22)),   # transfuser img anchors, exact divisor
    ((64, 64), (8, 8)),     # lidar anchors
    ((2, 4), (5, 22)),      # general (upsampling) path
    ((10, 44), (5, 22)),
    ((7, 13), (3, 5)),      # ragged windows
])
def test_adaptive_avg_pool_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(image_ops.adaptive_avg_pool(jnp.asarray(x), out_hw))
    ref = from_torch_nchw(
        torch.nn.AdaptiveAvgPool2d(out_hw)(to_torch_nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((5, 22), (40, 176)),
    ((8, 8), (64, 64)),
    ((16, 16), (160, 160)),
    ((13, 7), (40, 30)),
])
def test_resize_bilinear_matches_torch(rng, align_corners, in_hw, out_hw):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(image_ops.resize_bilinear(
        jnp.asarray(x), out_hw, align_corners=align_corners))
    ref = from_torch_nchw(F.interpolate(
        to_torch_nchw(x), size=out_hw, mode="bilinear",
        align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 17, 33, 4)).astype(np.float32)
    ours = np.asarray(image_ops.max_pool(jnp.asarray(x), 3, 2, 1))
    ref = from_torch_nchw(
        torch.nn.MaxPool2d(3, stride=2, padding=1)(to_torch_nchw(x)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_normalize_imagenet(rng):
    x = rng.uniform(0, 255, (1, 4, 4, 3)).astype(np.float32)
    out = np.asarray(image_ops.normalize_imagenet(jnp.asarray(x)))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    ref = (x / 255.0 - mean) / std
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_global_avg_pool(rng):
    x = rng.standard_normal((2, 5, 22, 8)).astype(np.float32)
    out = np.asarray(image_ops.global_avg_pool(jnp.asarray(x)))
    np.testing.assert_allclose(out, x.mean(axis=(1, 2)), rtol=1e-5, atol=1e-6)
