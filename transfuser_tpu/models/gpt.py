"""GPT-style fusion transformer over image+LiDAR anchor tokens.

Reference: team_code_transfuser/transfuser.py:284-366 (GPT), 491-549
(SelfAttention/Block). Sequence is tiny and fixed (5*22 + 8*8 = 174 tokens,
config.py:126-132) so attention is a plain einsum chain — XLA fuses the
whole block; no sequence-parallel machinery is warranted (SURVEY.md §5.7).

Tensor-parallel ready: q/k/v/MLP-in are sharded on the output dim and
proj/MLP-out on the input dim via the logical axis names below, so under a
('data','model') mesh the block runs Megatron-style with one all-reduce per
sublayer, riding ICI.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dtypes import acc_dtype

Dtype = Any


def _dense(features: int, std: float, dtype: Dtype, kernel_axes: tuple,
           name: Optional[str] = None) -> nn.Dense:
    # kernel_axes documents the tensor-parallel layout; the actual mesh
    # sharding is assigned by path rules in parallel/sharding.py.
    del kernel_axes
    return nn.Dense(
        features,
        kernel_init=nn.initializers.normal(stddev=std),
        bias_init=nn.initializers.zeros,
        dtype=dtype, param_dtype=jnp.float32, name=name)


class SelfAttention(nn.Module):
    n_embd: int
    n_head: int
    attn_pdrop: float
    resid_pdrop: float
    init_std: float = 0.02
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, c = x.shape
        hs = c // self.n_head
        q = _dense(c, self.init_std, self.dtype, ("embed", "heads"), "query")(x)
        k = _dense(c, self.init_std, self.dtype, ("embed", "heads"), "key")(x)
        v = _dense(c, self.init_std, self.dtype, ("embed", "heads"), "value")(x)
        q = q.reshape(b, t, self.n_head, hs)
        k = k.reshape(b, t, self.n_head, hs)
        v = v.reshape(b, t, self.n_head, hs)
        if train and self.attn_pdrop > 0.0:
            # training path keeps explicit probs for attention dropout
            acc = acc_dtype(self.dtype)
            att = jnp.einsum("bthd,bshd->bhts", q, k,
                             preferred_element_type=acc)
            att = att * (1.0 / jnp.sqrt(jnp.asarray(hs, acc)))
            att = nn.softmax(att, axis=-1).astype(self.dtype)
            att = nn.Dropout(self.attn_pdrop, deterministic=False)(att)
            y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(b, t, c)
        else:
            from ..ops.attention import attention
            y = attention(q, k, v).reshape(b, t, c)
        y = _dense(c, self.init_std, self.dtype, ("heads", "embed"), "proj")(y)
        return nn.Dropout(self.resid_pdrop, deterministic=not train)(y)


class Block(nn.Module):
    n_embd: int
    n_head: int
    block_exp: int
    attn_pdrop: float
    resid_pdrop: float
    init_std: float = 0.02
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, dtype=acc_dtype(self.dtype),
                         param_dtype=jnp.float32,
                         name="ln1")(x).astype(self.dtype)
        x = x + SelfAttention(self.n_embd, self.n_head, self.attn_pdrop,
                              self.resid_pdrop, self.init_std,
                              dtype=self.dtype, name="attn")(h, train)
        h = nn.LayerNorm(epsilon=1e-5, dtype=acc_dtype(self.dtype),
                         param_dtype=jnp.float32,
                         name="ln2")(x).astype(self.dtype)
        h = _dense(self.block_exp * self.n_embd, self.init_std, self.dtype,
                   ("embed", "mlp"), "mlp_fc")(h)
        h = nn.relu(h)
        h = _dense(self.n_embd, self.init_std, self.dtype,
                   ("mlp", "embed"), "mlp_proj")(h)
        h = nn.Dropout(self.resid_pdrop, deterministic=not train)(h)
        return x + h


class GPTFusion(nn.Module):
    """Fuse pooled image tokens (B,Hi,Wi,C) with lidar tokens (B,Hl,Wl,C)."""

    n_embd: int
    n_head: int = 4
    n_layer: int = 4
    block_exp: int = 4
    img_anchors: tuple = (5, 22)
    lidar_anchors: tuple = (8, 8)
    embd_pdrop: float = 0.1
    attn_pdrop: float = 0.1
    resid_pdrop: float = 0.1
    init_std: float = 0.02
    use_velocity: bool = True
    # Replicate the reference's token->map unpacking quirk: transfuser.py:360
    # reinterprets the (T, C) token block as (C, H, W) with a raw view — NOT
    # the inverse of the (H, W, C) input permute at :341 — so positions and
    # channels are scrambled in a fixed way the trained weights absorb.
    # Required for reference-checkpoint parity; off for from-scratch training
    # (clean NHWC unpack).
    reference_view_unpack: bool = False
    remat: bool = False  # rematerialize each block in the backward pass
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image_tokens: jnp.ndarray, lidar_tokens: jnp.ndarray,
                 velocity: Optional[jnp.ndarray] = None,
                 train: bool = False):
        b = image_tokens.shape[0]
        hi, wi = self.img_anchors
        hl, wl = self.lidar_anchors
        n_img = hi * wi
        n_tok = n_img + hl * wl

        tokens = jnp.concatenate([
            image_tokens.reshape(b, n_img, self.n_embd),
            lidar_tokens.reshape(b, hl * wl, self.n_embd),
        ], axis=1)

        pos_emb = self.param("pos_emb", nn.initializers.zeros,
                             (1, n_tok, self.n_embd), jnp.float32)
        x = tokens + pos_emb.astype(self.dtype)
        if self.use_velocity:
            assert velocity is not None
            vel = _dense(self.n_embd, self.init_std, self.dtype,
                         (None, "embed"), "vel_emb")(
                velocity.reshape(b, 1).astype(self.dtype))
            x = x + vel[:, None, :]
        x = nn.Dropout(self.embd_pdrop, deterministic=not train)(x)

        block_cls = nn.remat(Block, static_argnums=(2,)) if self.remat \
            else Block
        for i in range(self.n_layer):
            x = block_cls(self.n_embd, self.n_head, self.block_exp,
                          self.attn_pdrop, self.resid_pdrop, self.init_std,
                          dtype=self.dtype, name=f"block_{i}")(x, train)

        x = nn.LayerNorm(epsilon=1e-5, dtype=acc_dtype(self.dtype),
                         param_dtype=jnp.float32,
                         name="ln_f")(x).astype(self.dtype)

        if self.reference_view_unpack:
            image_out = x[:, :n_img].reshape(b, self.n_embd, hi, wi)
            image_out = jnp.transpose(image_out, (0, 2, 3, 1))
            lidar_out = x[:, n_img:].reshape(b, self.n_embd, hl, wl)
            lidar_out = jnp.transpose(lidar_out, (0, 2, 3, 1))
        else:
            image_out = x[:, :n_img].reshape(b, hi, wi, self.n_embd)
            lidar_out = x[:, n_img:].reshape(b, hl, wl, self.n_embd)
        return image_out, lidar_out
