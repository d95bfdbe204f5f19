"""TPU perf knobs preserve semantics: dense grouped-conv lowering and
block rematerialization must not change param trees or numerics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from helpers import tiny_config
from transfuser_tpu.models.encoders import make_encoder
from transfuser_tpu.models.lidar_centernet import LidarCenterNet


def _paths(tree, p=()):
    out = set()
    for k, v in tree.items():
        out |= _paths(v, p + (k,)) if isinstance(v, dict) else {p + (k,)}
    return out


import pytest


@pytest.mark.parametrize("lowering", ["dense", "im2col", "chunked", "auto"])
def test_group_lowering_matches_native(lowering):
    # regnety_micro group counts are (1, 2, 4, 8): 'auto' exercises both
    # its dense (g<=6) and chunked (g>6) branches.
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    nat = make_encoder("regnety_micro", 3, jnp.float32)
    alt = make_encoder("regnety_micro", 3, jnp.float32,
                       group_lowering=lowering)
    v = nat.init(jax.random.PRNGKey(0), x, train=False)
    v2 = jax.eval_shape(lambda k: alt.init(k, x, train=False),
                        jax.random.PRNGKey(0))
    assert _paths(v["params"]) == _paths(dict(v2["params"]))
    out_nat = nat.apply(v, x, train=False)
    out_alt = alt.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_alt), np.asarray(out_nat),
                               rtol=1e-4, atol=1e-4)


def test_remat_preserves_tree_and_grads():
    cfg = tiny_config()
    gpt = dataclasses.replace(cfg.model.gpt, n_layer=1)
    base_model = dataclasses.replace(
        cfg.model, image_architecture="regnety_micro",
        lidar_architecture="regnety_micro", gpt=gpt, multitask=False)
    cfg_plain = cfg.replace(model=base_model)
    cfg_remat = cfg.replace(
        model=dataclasses.replace(base_model, remat=True))

    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.uniform(0, 255, (1, 64, 128, 3)).astype(np.float32))
    lidar = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 2)).astype(np.float32))
    tp = jnp.zeros((1, 2), jnp.float32)
    tpi = jnp.zeros((1, 64, 64, 1), jnp.float32)

    m_plain = LidarCenterNet(cfg_plain, dtype=jnp.float32)
    m_remat = LidarCenterNet(cfg_remat, dtype=jnp.float32)
    v = m_plain.init(jax.random.PRNGKey(0), rgb, lidar, tp, tpi, train=False)
    v2 = jax.eval_shape(
        lambda k: m_remat.init(k, rgb, lidar, tp, tpi, train=False),
        jax.random.PRNGKey(0))
    assert _paths(v["params"]) == _paths(dict(v2["params"]))

    def loss(model):
        def f(p):
            out = model.apply({"params": p,
                               "batch_stats": v["batch_stats"]},
                              rgb, lidar, tp, tpi, train=False)
            return (out["pred_wp"] ** 2).mean() + \
                out["head_heatmap"].mean()
        return f

    l1, g1 = jax.value_and_grad(loss(m_plain))(v["params"])
    l2, g2 = jax.value_and_grad(loss(m_remat))(v["params"])
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    flat1 = jax.tree.leaves(g1)
    flat2 = jax.tree.leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
