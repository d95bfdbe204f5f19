"""Image-space primitives used by the models. NHWC layout.

Semantics mirror the torch ops used by the reference:
  * ``adaptive_avg_pool``: nn.AdaptiveAvgPool2d (transfuser.py:19-20). For
    TransFuser all pools have exact integer strides (e.g. 40x176 -> 5x22 is
    8x8 windows) so the op lowers to a reshape+mean, which XLA fuses; the
    general torch window formula is used otherwise.
  * ``resize_bilinear``: F.interpolate(mode='bilinear') with either
    align_corners semantics (False: transfuser.py:154; True: model.py:760).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive average pool to ``out_hw``."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        x = x.reshape(n, oh, kh, ow, kw, c)
        return x.mean(axis=(2, 4))
    # General torch adaptive pooling: window i covers
    # [floor(i*H/oh), ceil((i+1)*H/oh)). Static shapes -> unrolled gathers.
    def pool_axis(arr: jnp.ndarray, size: int, out: int, axis: int) -> jnp.ndarray:
        pieces = []
        for i in range(out):
            start = (i * size) // out
            end = -(-((i + 1) * size) // out)
            sl = [slice(None)] * arr.ndim
            sl[axis] = slice(start, end)
            pieces.append(arr[tuple(sl)].mean(axis=axis, keepdims=True))
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, h, oh, 1)
    x = pool_axis(x, w, ow, 2)
    return x


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NC global average pool."""
    return x.mean(axis=(1, 2))


def max_pool(x: jnp.ndarray, window: int, stride: int, padding: int) -> jnp.ndarray:
    """NHWC max pool with symmetric padding (torch MaxPool2d semantics)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def _linear_weights(in_size: int, out_size: int, align_corners: bool,
                    dtype=jnp.float32):
    if align_corners and out_size > 1:
        src = jnp.arange(out_size, dtype=dtype) * (
            (in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=dtype) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = src - lo.astype(dtype)
    return lo, hi, frac


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """NHWC bilinear resize matching torch F.interpolate semantics.

    align_corners=False path delegates to jax.image.resize (identical
    half-pixel sampling); align_corners=True uses explicit gathers.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    if not align_corners:
        return jax.image.resize(x, (n, oh, ow, c), method="linear")
    wdtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) \
        else jnp.float32
    wdtype = jnp.promote_types(wdtype, jnp.float32)
    ylo, yhi, yfrac = _linear_weights(h, oh, True, wdtype)
    xlo, xhi, xfrac = _linear_weights(w, ow, True, wdtype)
    top = x[:, ylo, :, :] * (1 - yfrac)[None, :, None, None] + \
        x[:, yhi, :, :] * yfrac[None, :, None, None]
    out = top[:, :, xlo, :] * (1 - xfrac)[None, None, :, None] + \
        top[:, :, xhi, :] * xfrac[None, None, :, None]
    return out.astype(x.dtype)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """uint8-range NHWC RGB -> ImageNet-normalized (transfuser.py:419-428)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype) * 255.0
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype) * 255.0
    return (x - mean) / std
