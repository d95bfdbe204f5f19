"""Pallas fused attention vs einsum reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transfuser_tpu.ops.attention import (pallas_attention,
                                          reference_attention)


@pytest.mark.parametrize("b,t,h,d", [(2, 174, 4, 18), (1, 64, 4, 128)])
def test_pallas_attention_matches_reference(rng, b, t, h, d):
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    want = np.asarray(reference_attention(q, k, v))
    got = np.asarray(pallas_attention(q, k, v, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_attention_softmax_rows_sum():
    # sanity: uniform q/k -> output = mean of v
    b, t, h, d = 1, 8, 1, 4
    q = jnp.zeros((b, t, h, d))
    k = jnp.zeros((b, t, h, d))
    v = jnp.asarray(np.arange(b * t * h * d, dtype=np.float32
                              ).reshape(b, t, h, d))
    out = np.asarray(pallas_attention(q, k, v, interpret=True))
    want = np.asarray(v).mean(axis=1, keepdims=True)
    np.testing.assert_allclose(out, np.broadcast_to(want, out.shape),
                               rtol=1e-5)
