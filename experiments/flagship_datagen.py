"""Full-size expert dataset for the flagship training run (VERDICT r3 #2).

Generates Longest6-DISTRIBUTION training routes (same 4x100x2 grid town,
same route generator, DIFFERENT seed than the benchmark's seed=1) plus
saturated scenario triggers and dense traffic, then drives the DataAgent
(expert + full sensor/label writers) over them through the closed-loop
evaluator — the hermetic equivalent of the reference's datagen.sh fleet
(leaderboard/scripts/datagen.sh -> data_agent.py).

Output layout: <out>/grid_town/route{i}/ — resolve_splits-compatible
(config.py:300). The LAST `--val-routes` route dirs are renamed with a
Town02 prefix so `--setting 02_05_withheld` trains/validates on disjoint
routes.

Usage:
    PYTHONPATH=$PYTHONPATH:. python experiments/flagship_datagen.py \
        --out /tmp/flagship_data [--routes 14] [--target-len 900]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/flagship_data")
    p.add_argument("--routes", type=int, default=14)
    p.add_argument("--val-routes", type=int, default=2)
    p.add_argument("--target-len", type=float, default=900.0)
    p.add_argument("--seed", type=int, default=7,
                   help="route-walk seed; the benchmark artifact uses 1 — "
                        "keep them different (train != eval routes)")
    p.add_argument("--background", type=int, default=120)
    p.add_argument("--resume", action="store_true")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # host-only: never claim TPU

    from transfuser_tpu.agents.data_agent import DataAgent
    from transfuser_tpu.harness.evaluator import (Evaluator, EvaluatorArgs,
                                                  build_town_map)
    from transfuser_tpu.tools.expert_benchmark import (
        _write_benchmark_scenarios, _write_longest6_routes)
    from transfuser_tpu.tools.route_gen import TownGraph

    town_spec = "grid:4x100x2"
    save_root = os.path.join(args.out, "grid_town")
    os.makedirs(save_root, exist_ok=True)
    routes_xml = os.path.join(args.out, "train_routes.xml")
    scen_json = os.path.join(args.out, "train_scenarios.json")
    graph = TownGraph.from_town_map(build_town_map(town_spec))
    n, mean_len = _write_longest6_routes(graph, routes_xml, args.routes,
                                         args.target_len, seed=args.seed)
    _write_benchmark_scenarios(graph, scen_json, stride=1)
    print(f"[flagship_datagen] {n} routes, mean {mean_len:.0f} m",
          file=sys.stderr, flush=True)

    prev = os.environ.get("SAVE_PATH")
    os.environ["SAVE_PATH"] = save_root
    try:
        result = Evaluator(EvaluatorArgs(
            routes=routes_xml, scenarios=scen_json,
            agent_factory=lambda cfg: DataAgent(
                route_index=cfg.index),
            checkpoint=os.path.join(args.out, "datagen_results.json"),
            town_map=town_spec,
            background_vehicles=args.background,
            resume=args.resume,
            datagen=True,
            print_route_table=False)).run()
    finally:
        if prev is None:
            os.environ.pop("SAVE_PATH", None)
        else:
            os.environ["SAVE_PATH"] = prev

    # withheld-val naming (02_05_withheld matches 'Town02' in the dir name)
    for i in range(args.routes - args.val_routes, args.routes):
        src = os.path.join(save_root, f"route{i}")
        dst = os.path.join(save_root, f"Town02_route{i}")
        if os.path.isdir(src) and not os.path.exists(dst):
            os.rename(src, dst)

    frames = 0
    for d in sorted(os.listdir(save_root)):
        m = os.path.join(save_root, d, "measurements")
        if os.path.isdir(m):
            k = len(os.listdir(m))
            frames += k
            print(f"[flagship_datagen] {d}: {k} frames", file=sys.stderr)
    print(json.dumps({"routes": n, "frames": frames,
                      "scores": result.get("scores", result)}))


if __name__ == "__main__":
    sys.exit(main())
