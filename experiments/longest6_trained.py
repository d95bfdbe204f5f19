"""Closed-loop trend line: a TRAINED model on the Longest6-shaped
hermetic benchmark — the counterpart of `results/longest6.json` (the
reference's trained-ensemble Longest6 score) next to the expert's
`results/autopilot_longest6_hermetic.json`.

Drives the HybridAgent (TPU inference stack, pinned to CPU here — the
hermetic sim is host-side) over the SAME routes the expert benchmark
generates, so the two artifacts are directly comparable.

Usage:
    PYTHONPATH=$PYTHONPATH:. python experiments/longest6_trained.py \
        --model <dir with model_*.msgpack + config.json> \
        [--routes 12] [--out results/trained_longest6_hermetic.json]
"""

import argparse
import json
import sys


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True)
    p.add_argument("--routes", type=int, default=36,
                   help="route count (route XML is always generated at "
                        "36 so ids match the expert artifact)")
    p.add_argument("--routes-subset", default=None,
                   help="comma-separated route ids to run")
    p.add_argument("--out", default="results/trained_longest6_hermetic.json")
    p.add_argument("--background", type=int, default=200)
    p.add_argument("--tpu", action="store_true",
                   help="run model inference on the TPU (sim stays host-"
                        "side; ~37 ms/frame pipelined vs ~1 s/frame on "
                        "this 1-core CPU). Run NOTHING else on the chip.")
    args = p.parse_args()

    import os

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache: the full-scale packed forward takes
        # minutes on the remote compiler; route 2+ (and reruns) must hit
        # the cache instead of recompiling per agent instance
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/jax_cache_tpu" if args.tpu
                                         else "/tmp/jax_cache_tests"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.tools.expert_benchmark import run_expert_benchmark

    class EvalAgent(HybridAgent):
        """async_inference on: the worker thread hides the tunnel RPC
        under sim time (one-frame lag, same as pipelined_fetch — diag
        measured 55 ms/compute-frame vs 290 synchronous)."""

        def setup(self, *a, **kw):
            import dataclasses
            super().setup(*a, **kw)
            self.config = self.config.replace(
                controller=dataclasses.replace(self.config.controller,
                                               async_inference=True))

    def factory(cfg):
        return EvalAgent(args.model)

    scores = run_expert_benchmark(
        args.out, n_routes=args.routes, town_spec="grid:4x100x2",
        background_vehicles=args.background, longest6=True,
        agent_factory=factory, resume=True,
        route_subset=args.routes_subset, claim_tpu=args.tpu)
    print(json.dumps(scores))


if __name__ == "__main__":
    sys.exit(main())
