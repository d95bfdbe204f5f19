"""Component-level TPU timing: where does the train step's time go?

Times fwd+bwd of isolated components (image encoder, lidar encoder, GPT
stack, heads+loss) with fetch-bracketed timing (PERF_NOTES: only a
device->host fetch of a computed value syncs on axon).

Usage: python experiments/component_bench.py [batch]
"""

import os
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
    out = fn(*args)
    fetch(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        fetch(fn(*args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt * 1e3:9.2f} ms/iter  (first {compile_s:.1f}s)",
          flush=True)
    return dt


def full_model_breakdown(cfg, batch, rng):
    """Grad-step time of the full model vs ablations: no aux heads,
    wp-only loss — isolates the heads/decoders/loss cost."""
    import dataclasses

    from transfuser_tpu.data.synthetic import synthetic_batch
    from transfuser_tpu.models import LidarCenterNet
    from transfuser_tpu.train.losses import compute_losses, total_loss

    data = {k: jnp.asarray(v) for k, v in
            synthetic_batch(cfg, batch).items()}

    def bench_cfg(name, cfg_, loss_mode):
        model = LidarCenterNet(cfg_, dtype=jnp.bfloat16)
        vars_ = jax.eval_shape(
            lambda k: model.init(k, data["rgb"], data["lidar"],
                                 data["target_point"],
                                 data.get("target_point_image"),
                                 data.get("speed"), train=False),
            jax.random.PRNGKey(0))
        vars_ = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, vars_)

        @jax.jit
        def run(v, b):
            def loss_fn(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": v["batch_stats"]},
                    b["rgb"], b["lidar"], b["target_point"],
                    b.get("target_point_image"), b.get("speed"),
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                    compute_aux=loss_mode != "wp_only")
                if loss_mode == "wp_only":
                    return jnp.abs(out["pred_wp"]
                                   - b["ego_waypoint"]).mean()
                detailed = compute_losses(out, b, cfg_)
                return total_loss(detailed, cfg_)
            l, g = jax.value_and_grad(loss_fn)(v["params"])
            return l + sum(jnp.sum(t.astype(jnp.float32) ** 2)
                           for t in jax.tree.leaves(g))
        timeit(name, run, vars_, data)

    auto = cfg.replace(model=dataclasses.replace(
        cfg.model, group_lowering="auto"))
    bench_cfg("FULL step (auto lowering)", auto, "full")
    no_multi = auto.replace(model=dataclasses.replace(
        auto.model, multitask=False))
    bench_cfg("no seg/depth decoders", no_multi, "full")
    bench_cfg("wp-only loss (no heads bwd)", auto, "wp_only")
    bench_cfg("FULL step (native groups)", cfg, "full")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    from transfuser_tpu.config import GlobalConfig
    from transfuser_tpu.models.encoders import make_encoder
    from transfuser_tpu.models.gpt import GPTFusion

    cfg = GlobalConfig()
    rng = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}, batch {batch}",
          flush=True)

    h, w = cfg.sensors.img_resolution
    img = jnp.asarray(np.random.rand(batch, h, w, 3).astype(np.float32) * 255)
    lidar = jnp.asarray(np.random.rand(
        batch, cfg.sensors.lidar_resolution_height,
        cfg.sensors.lidar_resolution_width, 3).astype(np.float32))

    def grad_time(name, module, x):
        vars_ = module.init(rng, x, train=False)

        @jax.jit
        def run(v, x):
            def loss(p):
                out, _ = module.apply(
                    {"params": p, "batch_stats": v.get("batch_stats", {})},
                    x, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng})
                return (out.astype(jnp.float32) ** 2).mean()
            l, g = jax.value_and_grad(loss)(v["params"])
            return l + sum(jnp.sum(t.astype(jnp.float32) ** 2)
                           for t in jax.tree.leaves(g))
        timeit(name, run, vars_, x)

    if "--full" in sys.argv:
        full_model_breakdown(cfg, batch, rng)
        return

    if "--groups" in sys.argv:
        # Grouped-conv lowering A/B on both encoder branches.
        for lowering in ("dense", "chunked", "im2col", "auto"):
            grad_time(f"image regnety {lowering}",
                      make_encoder("regnety_032", 3,
                                   group_lowering=lowering),
                      img.astype(jnp.bfloat16))
        for lowering in ("dense", "chunked", "im2col", "auto"):
            grad_time(f"lidar regnety {lowering}",
                      make_encoder("regnety_032", 3,
                                   group_lowering=lowering),
                      lidar.astype(jnp.bfloat16))
        return

    grad_time("image regnety_032 fwd+bwd", make_encoder("regnety_032", 3),
              img.astype(jnp.bfloat16))
    grad_time("image regnety dense-groups",
              make_encoder("regnety_032", 3, group_lowering="dense"),
              img.astype(jnp.bfloat16))
    grad_time("lidar regnety_032 fwd+bwd",
              make_encoder("regnety_032", 3), lidar.astype(jnp.bfloat16))
    grad_time("image convnext_tiny fwd+bwd",
              make_encoder("convnext_tiny", 3), img.astype(jnp.bfloat16))

    # GPT stack at the four scales
    g = cfg.model.gpt
    for n_embd in (72, 216, 576, 1512):
        mod = GPTFusion(n_embd=n_embd, n_head=g.n_head, n_layer=g.n_layer,
                        block_exp=g.block_exp,
                        img_anchors=(g.img_vert_anchors, g.img_horz_anchors),
                        lidar_anchors=(g.lidar_vert_anchors,
                                       g.lidar_horz_anchors),
                        use_velocity=False)
        it = jnp.asarray(np.random.rand(
            batch, g.img_vert_anchors, g.img_horz_anchors,
            n_embd).astype(np.float32)).astype(jnp.bfloat16)
        lt = jnp.asarray(np.random.rand(
            batch, g.lidar_vert_anchors, g.lidar_horz_anchors,
            n_embd).astype(np.float32)).astype(jnp.bfloat16)
        vars_ = mod.init(rng, it, lt, train=False)

        @jax.jit
        def run(v, it, lt):
            def loss(p):
                (io_, lo), _ = mod.apply(
                    {"params": p}, it, lt, train=True, mutable=[],
                    rngs={"dropout": rng})
                return (io_.astype(jnp.float32) ** 2).mean() + \
                    (lo.astype(jnp.float32) ** 2).mean()
            l, g_ = jax.value_and_grad(loss)(v["params"])
            return l + sum(jnp.sum(t.astype(jnp.float32) ** 2)
                           for t in jax.tree.leaves(g_))
        timeit(f"gpt n_embd={n_embd} fwd+bwd", run, vars_, it, lt)


if __name__ == "__main__":
    main()
