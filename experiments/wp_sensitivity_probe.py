"""Input-sensitivity probe of the trained waypoint head.

Loads the exported ensemble, forwards several distinct val frames plus
controlled perturbations (flipped target_point, blanked rgb, blanked
lidar), and prints the ensemble-mean waypoints for each. A collapsed
head shows ~identical outputs across rows; a healthy head moves with
the target point.

Usage: PYTHONPATH=$PYTHONPATH:. python experiments/wp_sensitivity_probe.py \
           --model /tmp/flagship_log/flagship_r5b/best [--cpu]
"""

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
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

    agent = HybridAgent(args.model)
    cfg = load_config_snapshot(args.model)
    _, val_dirs = cfg.resolve_splits()
    val = CarlaDataset(val_dirs, cfg, augment=False, packed=True)

    def fwd(s, tp_scale=1.0, blank_rgb=False, blank_lidar=False):
        rgb = np.asarray(s["rgb"], np.uint8)
        lidar = np.asarray(s["lidar"], np.uint8)
        if blank_rgb:
            rgb = np.zeros_like(rgb)
        if blank_lidar:
            lidar = np.zeros_like(lidar)
        tp = np.asarray(s["target_point"], np.float32) * tp_scale
        scal = np.concatenate([tp.ravel(),
                               np.asarray(s["speed"], np.float32).ravel()])
        buf = np.concatenate(
            [rgb.ravel(), lidar.ravel(),
             np.asarray(s["target_point_image"], np.uint8).ravel(),
             scal.view(np.uint8)])
        flat = np.asarray(agent._forward_packed(jnp.asarray(buf)))
        wp = flat[:agent._wp_size].reshape(agent._wp_shape)
        return wp.mean(axis=0)[0]  # (4,2)

    idxs = [0, len(val) // 3, 2 * len(val) // 3, len(val) - 1]
    rows = []
    for i in idxs:
        s = val[i]
        wp = fwd(s)
        rows.append({"case": f"frame {i}",
                     "tp": np.asarray(s["target_point"]).tolist(),
                     "speed": float(np.asarray(s["speed"]).ravel()[0]),
                     "gt": np.asarray(s["ego_waypoint"]).tolist(),
                     "wp": wp.tolist()})
    s0 = val[idxs[0]]
    for case, kw in [("tp flipped", dict(tp_scale=-1.0)),
                     ("rgb blank", dict(blank_rgb=True)),
                     ("lidar blank", dict(blank_lidar=True))]:
        rows.append({"case": f"frame {idxs[0]} {case}",
                     "wp": fwd(s0, **kw).tolist()})
    for r in rows:
        wp = np.asarray(r["wp"])
        print(f"{r['case']:28s} wp0=({wp[0,0]:+.2f},{wp[0,1]:+.2f}) "
              f"wp3=({wp[3,0]:+.2f},{wp[3,1]:+.2f})"
              + (f"  tp=({r['tp'][0]:+.1f},{r['tp'][1]:+.1f})"
                 f" v={r['speed']:.1f}" if "tp" in r else ""))
        if "gt" in r:
            gt = np.asarray(r["gt"])
            print(f"{'':28s} gt0=({gt[0,0]:+.2f},{gt[0,1]:+.2f}) "
                  f"gt3=({gt[3,0]:+.2f},{gt[3,1]:+.2f})")
    print(json.dumps(rows))


if __name__ == "__main__":
    sys.exit(main())
