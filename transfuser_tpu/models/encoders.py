"""Staged CNN encoders (RegNetY / ResNet / ConvNeXt) in flax, NHWC.

Re-implements the timm backbones the reference wires up via module surgery
(`transfuser.py:369-488`). Each encoder exposes the same staged interface the
fusion backbones need:

    stem(x, train)   -> features after stem (+maxpool for resnet)
    stage(i, x, train), i in 0..3
    feature_dims     -> per-stage output channels (timm feature_info[1..4])

TPU notes: params are fp32, compute dtype is configurable (bfloat16 by
default). Convolutions use lax.conv via flax nn.Conv with NHWC layout so XLA
tiles them onto the MXU directly. BatchNorm under a GSPMD-sharded batch
computes *global* batch statistics, which matches the reference's optional
SyncBatchNorm (train.py:132-133) at no extra cost.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv + BatchNorm (+ optional ReLU). torch padding semantics."""

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x)
        x = x.astype(self.dtype)
        if self.act:
            x = nn.relu(x)
        return x


class SEModule(nn.Module):
    """Squeeze-excitation with explicit reduction channels (timm RegNetY)."""

    rd_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_channels, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(s)
        return x * nn.sigmoid(s)


class RegNetYBlock(nn.Module):
    """RegNetY bottleneck block (bottleneck ratio 1, SE)."""

    in_chs: int
    out_chs: int
    stride: int
    group_width: int
    se_ratio: float = 0.25
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        w = self.out_chs  # bottleneck_ratio == 1.0 for regnety_032
        groups = w // self.group_width
        out = ConvBN(w, kernel=1, dtype=self.dtype)(x, train)
        out = ConvBN(w, kernel=3, stride=self.stride, groups=groups,
                     dtype=self.dtype)(out, train)
        rd = int(round(self.in_chs * self.se_ratio))
        out = SEModule(rd, dtype=self.dtype)(out)
        out = ConvBN(self.out_chs, kernel=1, act=False, dtype=self.dtype)(out, train)
        if self.stride != 1 or self.in_chs != self.out_chs:
            identity = ConvBN(self.out_chs, kernel=1, stride=self.stride,
                              act=False, dtype=self.dtype)(x, train)
        return nn.relu(out + identity)


class RegNetStage(nn.Module):
    depth: int
    in_chs: int
    out_chs: int
    group_width: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i in range(self.depth):
            x = RegNetYBlock(
                in_chs=self.in_chs if i == 0 else self.out_chs,
                out_chs=self.out_chs, stride=2 if i == 0 else 1,
                group_width=self.group_width, dtype=self.dtype)(x, train)
        return x


class RegNetY(nn.Module):
    """RegNetY trunk; regnety_032: depths (2,5,13,1), widths
    (72,216,576,1512), group width 24, stem 32."""

    depths: Tuple[int, ...] = (2, 5, 13, 1)
    widths: Tuple[int, ...] = (72, 216, 576, 1512)
    group_width: int = 24
    stem_width: int = 32
    in_channels: int = 3
    dtype: Dtype = jnp.bfloat16

    @property
    def feature_dims(self) -> Tuple[int, ...]:
        return self.widths

    def setup(self) -> None:
        self._stem = ConvBN(self.stem_width, kernel=3, stride=2, dtype=self.dtype)
        ins = (self.stem_width,) + self.widths[:-1]
        self._stages = [
            RegNetStage(depth=d, in_chs=i, out_chs=o,
                        group_width=self.group_width, dtype=self.dtype)
            for d, i, o in zip(self.depths, ins, self.widths)
        ]

    def stem(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self._stem(x, train)

    def stage(self, i: int, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        return self._stages[i](x, train)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.stem(x, train)
        for i in range(4):
            x = self.stage(i, x, train)
        return x


class BasicBlock(nn.Module):
    out_chs: int
    stride: int
    in_chs: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = ConvBN(self.out_chs, kernel=3, stride=self.stride,
                     dtype=self.dtype)(x, train)
        out = ConvBN(self.out_chs, kernel=3, act=False, dtype=self.dtype)(out, train)
        if self.stride != 1 or self.in_chs != self.out_chs:
            identity = ConvBN(self.out_chs, kernel=1, stride=self.stride,
                              act=False, dtype=self.dtype)(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet-18/34 (BasicBlock) trunk."""

    depths: Tuple[int, ...] = (3, 4, 6, 3)  # resnet34; resnet18 = (2,2,2,2)
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    in_channels: int = 3
    dtype: Dtype = jnp.bfloat16

    @property
    def feature_dims(self) -> Tuple[int, ...]:
        return self.widths

    def setup(self) -> None:
        self._conv1 = nn.Conv(64, (7, 7), strides=(2, 2),
                              padding=((3, 3), (3, 3)), use_bias=False,
                              dtype=self.dtype, param_dtype=jnp.float32)
        self._bn1 = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                 dtype=jnp.float32, param_dtype=jnp.float32)
        blocks = []
        in_chs = 64
        for si, (d, w) in enumerate(zip(self.depths, self.widths)):
            stage = []
            for bi in range(d):
                stride = 2 if (bi == 0 and si > 0) else 1
                stage.append(BasicBlock(out_chs=w, stride=stride,
                                        in_chs=in_chs, dtype=self.dtype))
                in_chs = w
            blocks.append(stage)
        self._stages = blocks

    def stem(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from ..ops.image_ops import max_pool
        x = self._conv1(x)
        x = self._bn1(x, use_running_average=not train).astype(self.dtype)
        x = nn.relu(x)
        return max_pool(x, window=3, stride=2, padding=1)

    def stage(self, i: int, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for block in self._stages[i]:
            x = block(x, train)
        return x

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.stem(x, train)
        for i in range(4):
            x = self.stage(i, x, train)
        return x


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        x = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x).astype(self.dtype)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,), jnp.float32)
        return shortcut + x * gamma.astype(self.dtype)


class ConvNeXt(nn.Module):
    """ConvNeXt trunk; base = dims (128,256,512,1024), depths (3,3,27,3)."""

    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (128, 256, 512, 1024)
    in_channels: int = 3
    dtype: Dtype = jnp.bfloat16

    @property
    def feature_dims(self) -> Tuple[int, ...]:
        return self.dims

    def setup(self) -> None:
        self._stem_conv = nn.Conv(self.dims[0], (4, 4), strides=(4, 4),
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self._stem_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                       param_dtype=jnp.float32)
        stages = []
        downs = []
        for si, (d, dim) in enumerate(zip(self.depths, self.dims)):
            stages.append([ConvNeXtBlock(dim=dim, dtype=self.dtype)
                           for _ in range(d)])
            if si > 0:
                downs.append((
                    nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 param_dtype=jnp.float32),
                    nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            param_dtype=jnp.float32),
                ))
        self._stages = stages
        self._downs = downs

    def stem(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self._stem_conv(x)
        return self._stem_norm(x).astype(self.dtype)

    def stage(self, i: int, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if i > 0:
            norm, conv = self._downs[i - 1]
            x = conv(norm(x).astype(self.dtype))
        for block in self._stages[i]:
            x = block(x)
        return x

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.stem(x, train)
        for i in range(4):
            x = self.stage(i, x, train)
        return x


_ENCODERS: dict = {
    "regnety_032": lambda in_ch, dtype: RegNetY(in_channels=in_ch, dtype=dtype),
    "resnet34": lambda in_ch, dtype: ResNet(depths=(3, 4, 6, 3),
                                            in_channels=in_ch, dtype=dtype),
    "resnet18": lambda in_ch, dtype: ResNet(depths=(2, 2, 2, 2),
                                            in_channels=in_ch, dtype=dtype),
    # Micro trunks for fast CPU tests (not reference architectures).
    "resnet_micro": lambda in_ch, dtype: ResNet(
        depths=(1, 1, 1, 1), widths=(16, 32, 64, 128),
        in_channels=in_ch, dtype=dtype),
    "regnety_micro": lambda in_ch, dtype: RegNetY(
        depths=(1, 2, 1, 1), widths=(24, 48, 96, 192), group_width=24,
        in_channels=in_ch, dtype=dtype),
    "convnext_base": lambda in_ch, dtype: ConvNeXt(in_channels=in_ch, dtype=dtype),
    "convnext_tiny": lambda in_ch, dtype: ConvNeXt(
        depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
        in_channels=in_ch, dtype=dtype),
}


def make_encoder(arch: str, in_channels: int = 3,
                 dtype: Dtype = jnp.bfloat16) -> nn.Module:
    if arch not in _ENCODERS:
        raise ValueError(
            f"unknown encoder '{arch}'; available: {sorted(_ENCODERS)}")
    return _ENCODERS[arch](in_channels, dtype)


def encoder_feature_dims(arch: str) -> Tuple[int, ...]:
    dummy = make_encoder(arch)
    return dummy.feature_dims
