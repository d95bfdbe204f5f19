"""Open-loop ADE of the DEPLOYED inference stack (export -> HybridAgent
load -> packed single-RPC forward) on the withheld-val frames, next to
the trainer's own val_ade for the same checkpoint.

Separates "the exported model is broken / the deployment path mangles
inputs" from "the policy is weak in closed loop": if this ADE matches
history.json's best val_ade, every off-line piece of the eval stack is
faithful and a bad closed-loop score is the policy/dynamics, not a bug.

Usage: PYTHONPATH=$PYTHONPATH:. python experiments/deploy_ade_probe.py \
           --model /tmp/flagship_log/flagship_r5b/best [--n 64] [--cpu]
"""

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_tests" if args.cpu
                      else "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import jax.numpy as jnp

    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.data.dataset import CarlaDataset
    from transfuser_tpu.train.checkpoint import load_config_snapshot

    agent = HybridAgent(args.model)  # setup() builds the packed ensemble
    assert agent._forward_packed is not None, "packed path missing"

    cfg = load_config_snapshot(args.model)
    _, val_dirs = cfg.resolve_splits()
    val = CarlaDataset(val_dirs, cfg, augment=False, packed=True)
    print(f"val frames: {len(val)}", flush=True)

    errs, fdes = [], []
    for i in range(0, min(args.n, len(val))):
        s = val[i * max(1, len(val) // args.n)]
        scal = np.concatenate(
            [np.asarray(s["target_point"], np.float32).ravel(),
             np.asarray(s["speed"], np.float32).ravel()])
        buf = np.concatenate(
            [np.asarray(s["rgb"], np.uint8).ravel(),
             np.asarray(s["lidar"], np.uint8).ravel(),
             np.asarray(s["target_point_image"], np.uint8).ravel(),
             scal.view(np.uint8)])
        flat = np.asarray(agent._forward_packed(jnp.asarray(buf)))
        wp = flat[:agent._wp_size].reshape(agent._wp_shape)
        pred = wp.mean(axis=0)[0]            # ensemble mean, (4, 2)
        gt = np.asarray(s["ego_waypoint"], np.float32)
        d = np.linalg.norm(pred - gt, axis=-1)
        errs.append(float(d.mean()))
        fdes.append(float(d[-1]))
    out = {"deployed_ade": float(np.mean(errs)),
           "deployed_fde": float(np.mean(fdes)),
           "n": len(errs), "model": args.model}
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
