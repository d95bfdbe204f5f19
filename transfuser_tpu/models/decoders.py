"""BEV FPN top-down decoder + image-space seg/depth decoders.

Reference: transfuser.py:99-118 (FPN), 214-281 (SegDecoder/DepthDecoder).
NHWC; bilinear upsampling matches torch align_corners=False.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.image_ops import resize_bilinear

Dtype = Any


class TopDown(nn.Module):
    """c5 (H,W,512) -> (p2,p3,p4,p5) feature pyramid at x8,x4,x2,x1."""

    channel: int = 64
    upsample_factor: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        def conv1x1(name):
            return nn.Conv(self.channel, (1, 1), dtype=self.dtype,
                           param_dtype=jnp.float32, name=name)

        def up(t):
            n, h, w, c = t.shape
            return resize_bilinear(
                t, (h * self.upsample_factor, w * self.upsample_factor))

        p5 = nn.relu(conv1x1("c5_conv")(x))
        p4 = nn.relu(conv1x1("up_conv5")(up(p5)))
        p3 = nn.relu(conv1x1("up_conv4")(up(p4)))
        p2 = nn.relu(conv1x1("up_conv3")(up(p3)))
        return p2, p3, p4, p5


class _DeconvStack(nn.Module):
    """Shared 3-stage conv + upsample trunk of the seg/depth decoders."""

    out_channels: int
    c1: int = 128
    c2: int = 64
    c3: int = 32
    scale_1: int = 8
    scale_2: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def conv(feat, name):
            return nn.Conv(feat, (3, 3), padding=((1, 1), (1, 1)),
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=name)

        x = nn.relu(conv(self.c1, "deconv1_0")(x))
        x = nn.relu(conv(self.c2, "deconv1_1")(x))
        n, h, w, c = x.shape
        x = resize_bilinear(x, (h * self.scale_1, w * self.scale_1))
        x = nn.relu(conv(self.c3, "deconv2_0")(x))
        x = nn.relu(conv(self.c3, "deconv2_1")(x))
        n, h, w, c = x.shape
        x = resize_bilinear(x, (h * self.scale_2, w * self.scale_2))
        x = nn.relu(conv(self.c3, "deconv3_0")(x))
        x = conv(self.out_channels, "deconv3_1")(x)
        return x


class SegDecoder(nn.Module):
    num_class: int = 7
    c1: int = 128
    c2: int = 64
    c3: int = 32
    scale_1: int = 8
    scale_2: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _DeconvStack(self.num_class, self.c1, self.c2, self.c3,
                            self.scale_1, self.scale_2, dtype=self.dtype,
                            name="stack")(x)


class DepthDecoder(nn.Module):
    c1: int = 128
    c2: int = 64
    c3: int = 32
    scale_1: int = 8
    scale_2: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _DeconvStack(1, self.c1, self.c2, self.c3, self.scale_1,
                         self.scale_2, dtype=self.dtype, name="stack")(x)
        return nn.sigmoid(x[..., 0])  # loss upcasts; keeps bandwidth low
