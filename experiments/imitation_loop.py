"""Close the imitation loop hermetically: does a model trained on the
expert's dataset actually drive better than an untrained one?

Pipeline (all in this repo, no CARLA):
  1. the privileged expert collects a dataset over grid-town routes
     (straights + junction turns),
  2. a tiny TransFuser trains on it,
  3. trained vs untrained agents are scored on a held-out route set by
     the closed-loop evaluator.

Prints one JSON line: {"untrained": {...}, "trained": {...},
"train_loss_first": f, "train_loss_last": f}.

Usage: PYTHONPATH=$PYTHONPATH:/root/repo:/root/repo/tests \
           python experiments/imitation_loop.py [--steps 400]
(Needs tests/ on the path for the tiny-config helper.)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import tempfile


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--routes", type=int, default=8)
    p.add_argument("--ticks", type=int, default=400)
    p.add_argument("--eval_seconds", type=float, default=45.0)
    p.add_argument("--turns", action="store_true",
                   help="train/eval on routes through junctions "
                        "(grid-town lane graph) instead of straights")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    for k in list(os.environ):
        if k.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            del os.environ[k]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_cache_tests")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    sys.path.insert(0, os.path.join(repo, "tests"))
    from helpers import tiny_config
    from transfuser_tpu.agents.data_agent import DataAgent
    from transfuser_tpu.data.dataset import CarlaDataset
    from transfuser_tpu.data.loader import PrefetchLoader
    from transfuser_tpu.harness.evaluator import (Evaluator, EvaluatorArgs)
    from transfuser_tpu.harness.route_parser import (
        downsample_route, interpolate_trajectory, location_route_to_gps)
    from transfuser_tpu.sim.replay import ReplaySimulation
    from transfuser_tpu.sim.types import Location, Rotation, Transform
    from transfuser_tpu.harness.evaluator import default_sensor_feeder
    from transfuser_tpu.train.checkpoint import (save_config_snapshot,
                                                 save_inference_weights)
    from transfuser_tpu.train.trainer import Trainer

    work = tempfile.mkdtemp(prefix="imitation_loop_")

    # ---- 1. expert datagen over varied straight routes (both axes and
    # directions so steering/throttle supervision isn't one-sided)
    def straight(x0, y0, yaw, length=180.0):
        import math
        c, s = math.cos(math.radians(yaw)), math.sin(math.radians(yaw))
        return [Transform(Location(x0 + c * d, y0 + s * d),
                          Rotation(yaw=yaw))
                for d in np.arange(0.0, length, 10.0)]

    if args.turns:
        # drivable routes through junctions: smooth bezier connectors
        # from the grid town's lane graph
        from transfuser_tpu.sim.town_map import grid_town
        town = grid_town(blocks=2, block_size=80.0)
        turn_pairs = [((12.0, -1.75), (81.75, 60.0)),
                      ((148.0, 1.75), (78.25, 60.0)),
                      ((1.75, 12.0), (60.0, 81.75)),
                      ((-1.75, 148.0), (60.0, 78.25)),
                      ((12.0, 78.25), (81.75, 140.0)),
                      ((148.0, 81.75), (78.25, 20.0)),
                      ((81.75, 12.0), (148.0, 81.75)),
                      ((78.25, 148.0), (12.0, 78.25))]
        trajs = [town.route(a, b) for a, b in turn_pairs[: args.routes]]
    else:
        starts = [(12.0, -1.75, 0.0), (148.0, 1.75, 180.0),
                  (1.75, 12.0, 90.0), (-1.75, 148.0, 270.0),
                  (12.0, 78.25, 0.0), (148.0, 81.75, 180.0),
                  (81.75, 12.0, 90.0), (78.25, 148.0, 270.0)]
        trajs = [straight(*s) for s in starts[: args.routes]]
    route_dirs = []
    for ri, traj in enumerate(trajs):
        os.environ["SAVE_PATH"] = os.path.join(work, f"data_{ri}")
        agent = DataAgent(route_index=ri)
        dense = interpolate_trajectory(traj)
        ids = downsample_route(dense, 50.0)
        sparse = [dense[i] for i in ids]
        agent.set_global_plan(location_route_to_gps(sparse), sparse)
        for spec in agent.sensors():
            agent.sensor_interface.register_sensor(spec["id"],
                                                   spec["type"])
        sim = ReplaySimulation([t for t, _ in dense])
        agent.sim = sim
        for _ in range(args.ticks):
            default_sensor_feeder(sim, agent)
            sim.apply_control(agent(sim.game_time))
            sim.tick()
        route_dirs.append(str(agent.save_path))
        print(f"[datagen] route {ri}: "
              f"{len(os.listdir(agent.save_path / 'measurements'))} "
              f"samples", file=sys.stderr, flush=True)

    # ---- 2. train a tiny TransFuser on it (last route dir WITHHELD for
    # open-loop validation ADE/FDE — the 02_05_withheld analogue,
    # reference train.py:38-40,66)
    cfg = tiny_config()
    val_dirs, route_dirs = route_dirs[-1:], route_dirs[:-1]
    ds = CarlaDataset(route_dirs, cfg, augment=True)
    ds_val = CarlaDataset(val_dirs, cfg, augment=False)
    print(f"[train] dataset {len(ds)} samples "
          f"(+{len(ds_val)} withheld val)", file=sys.stderr)
    loader = PrefetchLoader(ds, args.batch, shuffle=True, num_workers=2,
                            seed=0)
    trainer = Trainer(cfg, dtype=jnp.float32)
    it = iter(loader)
    first = next(it)
    it.close()  # release the init-batch iterator's worker threads
    state = trainer.init_state(first, seed=0)
    losses = []
    step = 0
    epoch = 0
    while step < args.steps:
        for batch in loader:
            state, metrics = trainer.train_step(state, batch)
            losses.append(float(metrics["loss_total"]))
            step += 1
            if step >= args.steps:
                break
        epoch += 1
        loader.set_epoch(epoch)
    print(f"[train] loss {losses[0]:.3f} -> {np.mean(losses[-10:]):.3f} "
          f"({step} steps)", file=sys.stderr)

    # ---- 2b. withheld-route waypoint ADE/FDE (train/metrics.py)
    trainer.state = state
    val_loader = PrefetchLoader(ds_val, args.batch, shuffle=False,
                                num_workers=2, drop_last=True)
    val_metrics = trainer.validate(iter(val_loader)) \
        if len(ds_val) >= args.batch else {}
    val_ade = val_metrics.get("val_ade")
    val_fde = val_metrics.get("val_fde")
    print(f"[val] withheld-route ADE={val_ade} FDE={val_fde}",
          file=sys.stderr)

    # ---- 3. closed-loop eval, trained vs untrained, held-out routes
    from transfuser_tpu.agents.hybrid_agent import HybridAgent

    def model_dir(name, st):
        d = os.path.join(work, name)
        os.makedirs(d, exist_ok=True)
        save_config_snapshot(d, cfg)
        save_inference_weights(os.path.join(d, "model_0.msgpack"),
                               {"params": st.params,
                                "batch_stats": st.batch_stats})
        return d

    trained_dir = model_dir("trained", state)
    untrained_state = Trainer(cfg, dtype=jnp.float32).init_state(
        first, seed=123)
    untrained_dir = model_dir("untrained", untrained_state)

    # held-out routes (start offsets not in the training set)
    eval_routes = os.path.join(work, "eval_routes.xml")
    with open(eval_routes, "w") as f:
        f.write('<?xml version="1.0"?><routes>')
        if args.turns:
            eval_trajs = [town.route(a, b) for a, b in
                          [((20.0, -1.75), (81.75, 70.0)),
                           ((1.75, 20.0), (70.0, 81.75))]]
            for i, tr in enumerate(eval_trajs):
                f.write(f'<route id="{i}" town="grid_town">')
                for t in tr[:: 15] + [tr[-1]]:
                    f.write(f'<waypoint x="{t.location.x}" '
                            f'y="{t.location.y}" z="0" '
                            f'yaw="{t.rotation.yaw}" pitch="0" '
                            f'roll="0"/>')
                f.write('</route>')
        else:
            for i, (x0, y0, yaw) in enumerate(
                    [(20.0, -81.75 + 80.0, 0.0), (1.75, 20.0, 90.0)]):
                import math
                c, s = (math.cos(math.radians(yaw)),
                        math.sin(math.radians(yaw)))
                f.write(f'<route id="{i}" town="grid_town">')
                for d in (0.0, 120.0):
                    f.write(f'<waypoint x="{x0 + c * d}" '
                            f'y="{y0 + s * d}" '
                            f'z="0" yaw="{yaw}" pitch="0" roll="0"/>')
                f.write('</route>')
        f.write('</routes>')

    scores = {}
    for name, mdir in (("untrained", untrained_dir),
                       ("trained", trained_dir)):
        result = Evaluator(EvaluatorArgs(
            routes=eval_routes, scenarios=None,
            agent_factory=lambda c, d=mdir: HybridAgent(d),
            checkpoint=os.path.join(work, f"eval_{name}.json"),
            max_game_seconds=args.eval_seconds, timeout=600.0,
            print_route_table=False)).run()
        scores[name] = result.get("scores", result)
        print(f"[eval] {name}: {scores[name]}", file=sys.stderr)

    out = {"untrained": scores["untrained"], "trained": scores["trained"],
           "train_loss_first": losses[0],
           "train_loss_last": float(np.mean(losses[-10:])),
           "val_ade": None if val_ade is None else round(val_ade, 4),
           "val_fde": None if val_fde is None else round(val_fde, 4),
           "n_samples": len(ds), "steps": step}
    line = json.dumps(out)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
