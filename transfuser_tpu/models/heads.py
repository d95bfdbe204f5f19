"""CenterNet detection head (7 conv branches over BEV FPN p2).

Reference: team_code_transfuser/model.py:33-147. Each branch is
conv3x3 -> ReLU -> conv1x1. The heatmap branch's final bias is initialized
to bias_init_with_prob(0.1) = -log((1-p)/p) and the wh/offset branches use
a tight normal init (model.py:101-108).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dtypes import at_least_f32

Dtype = Any


def _bias_init_with_prob(prior: float) -> float:
    return float(-math.log((1 - prior) / prior))


class _Branch(nn.Module):
    feat_channel: int
    out_channel: int
    final_bias: float = 0.0
    kernel_std: float | None = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kinit = (nn.initializers.normal(self.kernel_std)
                 if self.kernel_std is not None
                 else nn.initializers.lecun_normal())
        x = nn.Conv(self.feat_channel, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=kinit, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channel, (1, 1), kernel_init=kinit,
                    bias_init=nn.initializers.constant(self.final_bias),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        return x


class LidarCenterNetHead(nn.Module):
    in_channel: int = 64
    feat_channel: int = 64
    num_classes: int = 1
    num_dir_bins: int = 12
    bias_init_prob: float = 0.1
    normal_init_std: float = 0.001
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """feat: (B, H, W, C) -> dict of NHWC prediction maps (fp32)."""
        heatmap = _Branch(self.feat_channel, self.num_classes,
                          final_bias=_bias_init_with_prob(self.bias_init_prob),
                          dtype=self.dtype, name="heatmap")(feat)
        wh = _Branch(self.feat_channel, 2, kernel_std=self.normal_init_std,
                     dtype=self.dtype, name="wh")(feat)
        offset = _Branch(self.feat_channel, 2, kernel_std=self.normal_init_std,
                         dtype=self.dtype, name="offset")(feat)
        yaw_class = _Branch(self.feat_channel, self.num_dir_bins,
                            dtype=self.dtype, name="yaw_class")(feat)
        yaw_res = _Branch(self.feat_channel, 1, dtype=self.dtype,
                          name="yaw_res")(feat)
        velocity = _Branch(self.feat_channel, 1, dtype=self.dtype,
                           name="velocity")(feat)
        brake = _Branch(self.feat_channel, 2, dtype=self.dtype,
                        name="brake")(feat)
        up = at_least_f32
        return {
            "heatmap": nn.sigmoid(up(heatmap)),
            "wh": up(wh),
            "offset": up(offset),
            "yaw_class": up(yaw_class),
            "yaw_res": up(yaw_res),
            "velocity": up(velocity),
            "brake": up(brake),
        }
