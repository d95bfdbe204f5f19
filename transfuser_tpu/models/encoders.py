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

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class DenseGroupedConv(nn.Module):
    """Grouped conv lowered to ONE dense conv with a block-diagonal kernel.

    TPU-targeted alternative to feature_group_count: the narrow per-group
    contraction (group width 24 for regnety_032) cannot fill the 128x128
    MXU; a dense conv over the full channel width does, at groups-times the
    nominal FLOPs — a wash or a win when the grouped form is latency- or
    bandwidth-bound. The parameter keeps the grouped (kh, kw, cin/g, cout)
    shape, so checkpoints are interchangeable with the native lowering.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh = kw = self.kernel
        ci = x.shape[-1] // self.groups
        co = self.features // self.groups
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, ci, self.features), jnp.float32)
        kd = jnp.zeros((kh, kw, ci * self.groups, self.features),
                       self.dtype)
        for g in range(self.groups):
            kd = kd.at[:, :, g * ci:(g + 1) * ci,
                       g * co:(g + 1) * co].set(
                k[:, :, :, g * co:(g + 1) * co].astype(self.dtype))
        pad = (self.kernel - 1) // 2
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), kd,
            (self.stride, self.stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ChunkedDenseGroupedConv(nn.Module):
    """Grouped conv as block-diagonal dense convs over ~128-wide chunks.

    DenseGroupedConv executes G-times the nominal FLOPs (24x/63x on
    regnety_032's wide stages). Splitting the groups into chunks of
    n = 128 // group_width (5 for width 24) and running one dense
    block-diagonal conv per 120-channel chunk caps the redundancy at n
    while each conv still fills the 128-wide MXU tile — the best a
    systolic array can do for 24-wide groups without a custom kernel.
    Parameter shape matches nn.Conv's grouped kernel, so checkpoints are
    interchangeable across all lowerings.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh = kw = self.kernel
        ci = x.shape[-1] // self.groups
        co = self.features // self.groups
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, ci, self.features), jnp.float32)
        pad = (self.kernel - 1) // 2
        per_chunk = max(1, 128 // max(ci, co))
        xd = x.astype(self.dtype)
        outs = []
        for g0 in range(0, self.groups, per_chunk):
            g1 = min(g0 + per_chunk, self.groups)
            n = g1 - g0
            xs = xd[..., g0 * ci:g1 * ci]
            kd = jnp.zeros((kh, kw, n * ci, n * co), self.dtype)
            for j in range(n):
                kd = kd.at[:, :, j * ci:(j + 1) * ci,
                           j * co:(j + 1) * co].set(
                    k[:, :, :, (g0 + j) * co:(g0 + j + 1) * co]
                    .astype(self.dtype))
            outs.append(jax.lax.conv_general_dilated(
                xs, kd, (self.stride, self.stride),
                ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return outs[0] if len(outs) == 1 else \
            jnp.concatenate(outs, axis=-1)


class Im2colGroupedConv(nn.Module):
    """Grouped conv as im2col + group-batched einsum.

    In theory the groups become the batch dimension of a batched matmul
    [G, B*H*W, ci*kh*kw] x [G, ci*kh*kw, co] and the only MXU waste is
    padding co (24) up to the 128-wide tile. MEASURED (v5e, batch 16,
    regnety_032 fwd+bwd): 3.7x SLOWER than the dense lowering — XLA
    materializes the 9x im2col tensor and lowers the narrow batched
    matmul poorly. Kept as a documented negative result; use 'dense' or
    'chunked'. Parameter shape matches nn.Conv's grouped kernel.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh = kw = self.kernel
        ci = x.shape[-1] // self.groups
        co = self.features // self.groups
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, ci, self.features), jnp.float32)
        pad = (self.kernel - 1) // 2
        # (B, H', W', C*kh*kw); feature order is channel-major
        # (c, kh, kw), so each group's ci*kh*kw patch block is contiguous.
        patches = jax.lax.conv_general_dilated_patches(
            x.astype(self.dtype), (kh, kw), (self.stride, self.stride),
            ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, ho, wo, _ = patches.shape
        patches = patches.reshape(b, ho, wo, self.groups, ci * kh * kw)
        # (kh, kw, ci, G*co) -> (G, ci*kh*kw, co) in the same (c, kh, kw)
        # contraction order as the patches.
        kg = k.reshape(kh, kw, ci, self.groups, co)
        kg = kg.transpose(3, 2, 0, 1, 4).reshape(
            self.groups, ci * kh * kw, co).astype(self.dtype)
        out = jnp.einsum("bhwgk,gkn->bhwgn", patches, kg)
        return out.reshape(b, ho, wo, self.features)


# 'auto' lowering: dense executes G-times the nominal FLOPs; chunked
# caps the redundancy at ~128//group_width. Below the cap they are the
# same program, so switch to chunked only where dense actually loses.
_AUTO_DENSE_MAX_GROUPS = 6


class ConvBN(nn.Module):
    """Conv + BatchNorm (+ optional ReLU). torch padding semantics.

    group_lowering: 'native' uses feature_group_count; 'dense' lowers
    grouped convs to a block-diagonal dense conv (see DenseGroupedConv);
    'chunked' to ~128-wide block-diagonal chunks
    (ChunkedDenseGroupedConv); 'im2col' to a group-batched einsum
    (measured slower, kept documented); 'auto' picks dense for few
    groups, chunked for many.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    group_lowering: str = "native"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2
        lowering = self.group_lowering
        if lowering == "auto" and self.groups > 1:
            lowering = ("dense" if self.groups <= _AUTO_DENSE_MAX_GROUPS
                        else "chunked")
        if self.groups > 1 and lowering == "dense":
            # name matches nn.Conv's auto name so param trees are identical
            x = DenseGroupedConv(self.features, self.kernel, self.stride,
                                 self.groups, dtype=self.dtype,
                                 name="Conv_0")(x)
        elif self.groups > 1 and lowering == "chunked":
            x = ChunkedDenseGroupedConv(self.features, self.kernel,
                                        self.stride, self.groups,
                                        dtype=self.dtype, name="Conv_0")(x)
        elif self.groups > 1 and lowering == "im2col":
            x = Im2colGroupedConv(self.features, self.kernel, self.stride,
                                  self.groups, dtype=self.dtype,
                                  name="Conv_0")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=((pad, pad), (pad, pad)),
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5,
                         dtype=jnp.promote_types(self.dtype, jnp.float32),
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
    group_lowering: str = "native"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        w = self.out_chs  # bottleneck_ratio == 1.0 for regnety_032
        groups = w // self.group_width
        out = ConvBN(w, kernel=1, dtype=self.dtype)(x, train)
        out = ConvBN(w, kernel=3, stride=self.stride, groups=groups,
                     group_lowering=self.group_lowering,
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
    group_lowering: str = "native"
    remat: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # nn.remat keeps the wrapped class name, so param paths (and
        # therefore checkpoints) are identical with remat on or off.
        block_cls = nn.remat(RegNetYBlock, static_argnums=(2,)) \
            if self.remat else RegNetYBlock
        for i in range(self.depth):
            # explicit name: nn.remat prefixes the class name, which would
            # otherwise leak into auto-generated module names
            x = block_cls(
                in_chs=self.in_chs if i == 0 else self.out_chs,
                out_chs=self.out_chs, stride=2 if i == 0 else 1,
                group_width=self.group_width,
                group_lowering=self.group_lowering,
                dtype=self.dtype, name=f"RegNetYBlock_{i}")(x, train)
        return x


class RegNetY(nn.Module):
    """RegNetY trunk; regnety_032: depths (2,5,13,1), widths
    (72,216,576,1512), group width 24, stem 32."""

    depths: Tuple[int, ...] = (2, 5, 13, 1)
    widths: Tuple[int, ...] = (72, 216, 576, 1512)
    group_width: int = 24
    stem_width: int = 32
    in_channels: int = 3
    group_lowering: str = "native"
    remat: str = "none"  # none | early (stages 0-1) | all
    dtype: Dtype = jnp.bfloat16

    @property
    def feature_dims(self) -> Tuple[int, ...]:
        return self.widths

    def setup(self) -> None:
        self._stem = ConvBN(self.stem_width, kernel=3, stride=2, dtype=self.dtype)
        ins = (self.stem_width,) + self.widths[:-1]
        self._stages = [
            RegNetStage(depth=d, in_chs=i, out_chs=o,
                        group_width=self.group_width,
                        group_lowering=self.group_lowering,
                        remat=_stage_remat(self.remat, si),
                        dtype=self.dtype)
            for si, (d, i, o) in enumerate(zip(self.depths, ins,
                                               self.widths))
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
    group_lowering: str = "native"  # unused (no grouped convs)
    remat: str = "none"
    dtype: Dtype = jnp.bfloat16

    @property
    def feature_dims(self) -> Tuple[int, ...]:
        return self.widths

    def setup(self) -> None:
        self._conv1 = nn.Conv(64, (7, 7), strides=(2, 2),
                              padding=((3, 3), (3, 3)), use_bias=False,
                              dtype=self.dtype, param_dtype=jnp.float32)
        self._bn1 = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5,
            dtype=jnp.promote_types(self.dtype, jnp.float32),
            param_dtype=jnp.float32)
        blocks = []
        in_chs = 64
        for si, (d, w) in enumerate(zip(self.depths, self.widths)):
            block_cls = nn.remat(BasicBlock, static_argnums=(2,)) \
                if _stage_remat(self.remat, si) else BasicBlock
            stage = []
            for bi in range(d):
                stride = 2 if (bi == 0 and si > 0) else 1
                stage.append(block_cls(out_chs=w, stride=stride,
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
        x = nn.LayerNorm(epsilon=1e-6,
                         dtype=jnp.promote_types(self.dtype, jnp.float32),
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
    group_lowering: str = "native"  # depthwise convs stay native
    remat: str = "none"
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
            block_cls = nn.remat(ConvNeXtBlock) \
                if _stage_remat(self.remat, si) else ConvNeXtBlock
            stages.append([block_cls(dim=dim, dtype=self.dtype)
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
    "regnety_032": lambda **kw: RegNetY(**kw),
    "resnet34": lambda **kw: ResNet(depths=(3, 4, 6, 3), **kw),
    "resnet18": lambda **kw: ResNet(depths=(2, 2, 2, 2), **kw),
    # Micro trunks for fast CPU tests (not reference architectures).
    "resnet_micro": lambda **kw: ResNet(
        depths=(1, 1, 1, 1), widths=(16, 32, 64, 128), **kw),
    "regnety_micro": lambda **kw: RegNetY(
        depths=(1, 2, 1, 1), widths=(24, 48, 96, 192), group_width=24, **kw),
    "convnext_base": lambda **kw: ConvNeXt(**kw),
    "convnext_tiny": lambda **kw: ConvNeXt(
        depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw),
}


def _stage_remat(mode, stage_index: int) -> bool:
    """Stage-wise remat policy: 'early' recomputes only the two
    high-resolution stages (largest activations, cheapest channels) —
    most HBM saved per recomputed FLOP."""
    if mode in (True, "all"):
        return True
    if mode == "early":
        return stage_index < 2
    return False


def make_encoder(arch: str, in_channels: int = 3,
                 dtype: Dtype = jnp.bfloat16,
                 group_lowering: str = "native",
                 remat="none") -> nn.Module:
    if arch not in _ENCODERS:
        raise ValueError(
            f"unknown encoder '{arch}'; available: {sorted(_ENCODERS)}")
    return _ENCODERS[arch](in_channels=in_channels, dtype=dtype,
                           group_lowering=group_lowering, remat=remat)


def encoder_feature_dims(arch: str) -> Tuple[int, ...]:
    dummy = make_encoder(arch)
    return dummy.feature_dims
