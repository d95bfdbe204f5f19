"""Where do the seg/depth decoders' ~52 ms go? (PERF_NOTES headroom #1)

Isolates fwd+bwd cost of: the full _DeconvStack, each resize, the
160x704 convs, and the seg CE loss — fetch-bracketed (axon: only a
device->host fetch of a computed value syncs).

Usage: PYTHONPATH=$PYTHONPATH:/root/repo python experiments/decoder_bench.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def fetch(x):
    return float(np.asarray(x))


def timeit(name, fn, *args, n=10):
    t0 = time.perf_counter()
    fetch(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        fetch(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1e3:9.2f} ms/iter  (first {compile_s:.1f}s)",
          flush=True)
    return dt


def grad_wrap(f):
    @jax.jit
    def run(*args):
        def loss(a0):
            return (f(a0, *args[1:]).astype(jnp.float32) ** 2).mean()
        l, g = jax.value_and_grad(loss)(args[0])
        return l + jnp.sum(g.astype(jnp.float32) ** 2)
    return run


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from transfuser_tpu.models.decoders import SegDecoder
    from transfuser_tpu.ops.image_ops import resize_bilinear

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}, batch {batch}",
          flush=True)

    # decoder input: 512-ch image grid at stride 32 (5x22)
    x512 = jnp.asarray(rng.standard_normal(
        (batch, 5, 22, 512)).astype(np.float32)).astype(jnp.bfloat16)

    dec = SegDecoder(num_class=7)
    v = dec.init(jax.random.PRNGKey(0), x512)

    @jax.jit
    def full(v, x):
        def loss(p):
            return (dec.apply({"params": p}, x).astype(jnp.float32)
                    ** 2).mean()
        l, g = jax.value_and_grad(loss)(v["params"])
        return l + sum(jnp.sum(t.astype(jnp.float32) ** 2)
                       for t in jax.tree.leaves(g))
    timeit("SegDecoder fwd+bwd", full, v, x512)

    # resizes
    x_mid = jnp.asarray(rng.standard_normal(
        (batch, 5, 22, 64)).astype(np.float32)).astype(jnp.bfloat16)
    timeit("resize x8 (5x22 -> 40x176, 64ch)",
           grad_wrap(lambda t: resize_bilinear(t, (40, 176))), x_mid)
    x_32 = jnp.asarray(rng.standard_normal(
        (batch, 40, 176, 32)).astype(np.float32)).astype(jnp.bfloat16)
    timeit("resize x4 (40x176 -> 160x704, 32ch)",
           grad_wrap(lambda t: resize_bilinear(t, (160, 704))), x_32)

    # the 160x704 convs
    from flax import linen as nn

    conv = nn.Conv(32, (3, 3), padding=((1, 1), (1, 1)),
                   dtype=jnp.bfloat16, param_dtype=jnp.float32)
    x_big = jnp.asarray(rng.standard_normal(
        (batch, 160, 704, 32)).astype(np.float32)).astype(jnp.bfloat16)
    vc = conv.init(jax.random.PRNGKey(0), x_big)

    @jax.jit
    def conv_grad(vc, x):
        def loss(p):
            return (conv.apply({"params": p}, x).astype(jnp.float32)
                    ** 2).mean()
        l, g = jax.value_and_grad(loss)(vc["params"])
        return l + sum(jnp.sum(t.astype(jnp.float32) ** 2)
                       for t in jax.tree.leaves(g))
    timeit("conv3x3 32ch @160x704 fwd+bwd", conv_grad, vc, x_big)

    # seg CE loss at full res
    logits = jnp.asarray(rng.standard_normal(
        (batch, 160, 704, 7)).astype(np.float32)).astype(jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 7, (batch, 160, 704)))

    def ce(lg, lb):
        lg = lg.astype(jnp.float32)
        logp = jax.nn.log_softmax(lg, axis=-1)
        return -jnp.take_along_axis(logp, lb[..., None],
                                    axis=-1).mean()
    timeit("seg CE loss @160x704 fwd+bwd", grad_wrap(ce), logits, labels)


if __name__ == "__main__":
    main()
