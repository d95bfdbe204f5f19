"""Grouped-conv schedule floor on TPU (VERDICT r2 next-step #2b).

The proposal was a Pallas blocked-matmul grouped conv that "packs 5x24-wide
groups per 128 tile WITHOUT zero-padding FLOPs". This experiment shows why
that kernel cannot beat the shipped 'chunked' lowering, by measuring every
schedule family at the regnety_032 wide-stage shapes (group width 24):

  native       lax conv, feature_group_count=G (XLA's grouped-conv emitter)
  dense        one conv with a block-diagonal CxC kernel (G-times FLOPs)
  chunked      block-diagonal convs over 128-wide chunks (shipped default;
               redundancy capped at 128//24 = 5x on the grouped FLOPs)
  batch_groups groups moved to the batch dim, batch_group_count=G
  matmul_bd    the chunked contraction as an explicit matmul:
               (M, 5*216) @ block-diag(5*216, 120) per chunk
  matmul_pg    per-group batched matmul (G, M, 216) @ (G, 216, 24) — the
               BEST CASE for the proposed Pallas kernel: zero redundant
               FLOPs and the im2col patch cost excluded. If this already
               loses to matmul_bd/chunked, the Pallas kernel (which must
               additionally pay patch extraction) cannot win.

Analytic floor: the MXU consumes one 128-wide output tile per pass; a
matmul with N=24 costs the same passes as N=120. Packing 5 groups along N
requires a block-diagonal K (their K-slices differ) — i.e. exactly the
chunked schedule, zeros included. There is no schedule that both fills the
lanes and skips the zeros; 'zero-padding-free' and '128-lane-filling' are
mutually exclusive for group width 24. The measurements below put numbers
on that.

axon timing rules apply (PERF_NOTES): every timed region is a K-rep chain
with an output->input epsilon feedback, bracketed by a device->host fetch.

Usage (idle host; ONE TPU process): python experiments/grouped_conv_floor.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")

import jax
import jax.numpy as jnp
from jax import lax

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

K_REPS = 20
DTYPE = jnp.bfloat16

# regnety_032 wide stages at 160x704 input, batch 16 (PERF_NOTES shapes):
# (name, B, H, W, C, groups); group width = C // groups = 24.
SHAPES = [
    ("stage3_576c", 16, 10, 44, 576, 24),
    ("stage4_1512c", 16, 5, 22, 1512, 63),
]


def fetch(x) -> float:
    return float(np.asarray(x))


def chain(step):
    """K_REPS-rep chain with epsilon feedback so nothing folds away."""
    @jax.jit
    def run(x, w):
        def body(carry, _):
            y = step(carry, w)
            eps = (jnp.tanh(y.sum()) * 1e-24).astype(carry.dtype)
            return carry + eps, y.sum()
        _, ys = lax.scan(body, x, None, length=K_REPS)
        return ys.sum()
    return run


def timed(name, run, x, w, flops_nominal):
    t0 = time.perf_counter()
    fetch(run(x, w))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch(run(x, w))
        times.append((time.perf_counter() - t0) / K_REPS * 1e3)
    ms = float(np.median(times))
    print(f"  {name:14s} {ms:8.2f} ms/rep   "
          f"(nominal {flops_nominal / 1e9:6.1f} GFLOP -> "
          f"{flops_nominal / ms / 1e9:6.1f} TFLOP/s eff; "
          f"compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
    return ms


def main() -> None:
    rng = np.random.default_rng(0)
    results = {}
    for name, B, H, W, C, G in SHAPES:
        cg = C // G
        M = B * H * W
        # nominal (useful) FLOPs of the grouped 3x3 conv, fwd only
        flops = 2.0 * B * H * W * 9 * C * cg
        print(f"{name}: B{B} {H}x{W} C{C} G{G} (width {cg}), "
              f"M={M}, nominal {flops / 1e9:.1f} GFLOP", file=sys.stderr)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), DTYPE)
        kg = jnp.asarray(rng.standard_normal((3, 3, cg, C)) * 0.05, DTYPE)
        dn = lax.conv_dimension_numbers(x.shape, (3, 3, cg, C),
                                        ("NHWC", "HWIO", "NHWC"))

        def native(xx, w):
            return lax.conv_general_dilated(
                xx, w, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=G)

        # dense: block-diagonal (3,3,C,C) kernel
        def make_bd(w, g0, g1):
            """(3,3,(g1-g0)*cg,(g1-g0)*cg) block-diagonal slice."""
            n = g1 - g0
            blocks = []
            for i in range(n):
                col = w[..., (g0 + i) * cg:(g0 + i + 1) * cg]  # (3,3,cg,cg)
                pad = [(0, 0), (0, 0), (i * cg, (n - 1 - i) * cg), (0, 0)]
                blocks.append(jnp.pad(col, pad))
            return jnp.concatenate(blocks, axis=-1)

        dense_w = make_bd(kg, 0, G)

        def dense(xx, w):
            dnn = lax.conv_dimension_numbers(xx.shape, (3, 3, C, C),
                                             ("NHWC", "HWIO", "NHWC"))
            return lax.conv_general_dilated(xx, w, (1, 1), "SAME",
                                            dimension_numbers=dnn)

        per_chunk = max(1, 128 // cg)
        chunk_ws = []
        for g0 in range(0, G, per_chunk):
            g1 = min(g0 + per_chunk, G)
            chunk_ws.append(make_bd(kg, g0, g1))

        def chunked(xx, ws):
            outs = []
            g0 = 0
            for w in ws:
                n = w.shape[-1]
                xs = lax.slice_in_dim(xx, g0, g0 + n, axis=3)
                dnn = lax.conv_dimension_numbers(
                    xs.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
                outs.append(lax.conv_general_dilated(
                    xs, w, (1, 1), "SAME", dimension_numbers=dnn))
                g0 += n
            return jnp.concatenate(outs, axis=-1)

        # batch_group_count: (B,H,W,C) -> (G*B,H,W,cg); each batch group
        # convolves with its own cg filters; output (B,H,W,C).
        def batch_groups(xx, w):
            xb = xx.reshape(B, H, W, G, cg).transpose(3, 0, 1, 2, 4) \
                   .reshape(G * B, H, W, cg)
            dnn = lax.conv_dimension_numbers(xb.shape, (3, 3, cg, C),
                                             ("NHWC", "HWIO", "NHWC"))
            return lax.conv_general_dilated(
                xb, w, (1, 1), "SAME", dimension_numbers=dnn,
                batch_group_count=G)

        # --- explicit matmul forms (patches precomputed OUTSIDE the timed
        # step: best case for any blocked-matmul kernel).
        # per-group: (G, M, 9*cg) @ (G, 9*cg, cg)
        patches_pg = jnp.asarray(
            rng.standard_normal((G, M, 9 * cg)), DTYPE)
        w_pg = jnp.asarray(rng.standard_normal((G, 9 * cg, cg)) * 0.05,
                           DTYPE)

        def matmul_pg(p, w):
            return jnp.einsum("gmk,gkn->gmn", p, w,
                              preferred_element_type=DTYPE)

        # block-diag chunks: (M, n*9*cg) @ (n*9*cg, n*cg) per chunk
        bd_ins, bd_ws = [], []
        g0 = 0
        while g0 < G:
            n = min(per_chunk, G - g0)
            bd_ins.append(jnp.asarray(
                rng.standard_normal((M, n * 9 * cg)), DTYPE))
            bd_ws.append(jnp.asarray(
                rng.standard_normal((n * 9 * cg, n * cg)) * 0.05, DTYPE))
            g0 += n

        def matmul_bd(ps, ws):
            return jnp.concatenate(
                [p @ w for p, w in zip(ps, ws)], axis=-1)

        row = {}
        row["native"] = timed("native", chain(native), x, kg, flops)
        row["dense"] = timed("dense", chain(dense), x, dense_w,
                             flops)
        row["chunked"] = timed("chunked", chain(chunked), x, chunk_ws,
                               flops)
        row["batch_groups"] = timed("batch_groups", chain(batch_groups),
                                    x, kg, flops)

        def chain_mm(step):
            @jax.jit
            def run(p, w):
                def body(carry, _):
                    y = step(carry, w)
                    s = (jnp.tanh(y.sum() if hasattr(y, "sum")
                                  else sum(z.sum() for z in y)) * 1e-24)
                    if isinstance(carry, (list, tuple)):
                        carry = type(carry)(
                            c + s.astype(c.dtype) for c in carry)
                    else:
                        carry = carry + s.astype(carry.dtype)
                    return carry, y.sum()
                _, ys = lax.scan(body, p, None, length=K_REPS)
                return ys.sum()
            return run

        row["matmul_pg"] = timed("matmul_pg", chain_mm(matmul_pg),
                                 patches_pg, w_pg, flops)
        row["matmul_bd"] = timed("matmul_bd", chain_mm(matmul_bd),
                                 tuple(bd_ins), tuple(bd_ws), flops)
        results[name] = {k: round(v, 3) for k, v in row.items()}

    print(json.dumps({"k_reps": K_REPS, "dtype": "bfloat16",
                      "device": str(jax.devices()[0]),
                      "ms_per_rep": results}))


if __name__ == "__main__":
    main()
