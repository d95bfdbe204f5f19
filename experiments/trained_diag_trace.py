"""Instrumented short closed-loop diagnostic of the trained HybridAgent:
drives ONE benchmark route for a capped game time and dumps a per-compute-
frame trace (pose, speed, target point, predicted waypoints, control) so a
closed-loop failure can be attributed — bad predictions vs bad control
conversion vs bad localization.

Usage: PYTHONPATH=$PYTHONPATH:. python experiments/trained_diag_trace.py \
        --model <dir> [--route 0] [--seconds 40] [--tpu] \
        [--trace /tmp/diag_trace.json]
"""

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--route", default="0")
    p.add_argument("--seconds", type=float, default=40.0)
    p.add_argument("--tpu", action="store_true")
    p.add_argument("--out", default="/tmp/diag_r5.json")
    p.add_argument("--trace", default="/tmp/diag_trace.json")
    p.add_argument("--sync", action="store_true",
                   help="disable async_inference (isolate the worker lag)")
    args = p.parse_args()

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_tpu" if args.tpu
                      else "/tmp/jax_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.tools.expert_benchmark import run_expert_benchmark

    trace = []

    class TracedAgent(HybridAgent):
        def setup(self, *a, **kw):
            import dataclasses
            super().setup(*a, **kw)
            self.config = self.config.replace(
                controller=dataclasses.replace(self.config.controller,
                                               async_inference=not args.sync))

        def tick(self, input_data, lite=False):
            td = super().tick(input_data, lite=lite)
            self._last_tick = td
            return td

        def run_step(self, input_data, timestamp):
            ctl = super().run_step(input_data, timestamp)
            td = self._last_tick
            rec = {"step": self.step,
                   "gps": np.asarray(td["gps"]).tolist(),
                   "compass": float(td["compass"]),
                   "speed": float(td["speed"]),
                   "target_point": np.asarray(
                       td["target_point"]).tolist(),
                   "next_command": td.get("next_command"),
                   "steer": ctl.steer, "throttle": ctl.throttle,
                   "brake": ctl.brake}
            if self.pred_wp is not None:
                rec["pred_wp"] = np.asarray(self.pred_wp).tolist()
            trace.append(rec)
            return ctl

    scores = run_expert_benchmark(
        args.out, n_routes=36, town_spec="grid:4x100x2",
        background_vehicles=200, longest6=True,
        agent_factory=lambda cfg: TracedAgent(args.model),
        resume=False, route_subset=args.route,
        max_game_seconds=args.seconds, claim_tpu=args.tpu)

    with open(args.trace, "w") as f:
        json.dump(trace, f)
    print(json.dumps(scores))
    print(f"trace: {len(trace)} frames -> {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
