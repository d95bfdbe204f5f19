"""cProfile one Longest6-scale benchmark route end-to-end (expert agent,
200 background vehicles) to locate host-sim hot spots before the round-4
vectorization pass (VERDICT r3 #8: the 36-route artifacts are host-sim
wall-clock-bound on this 1-core box).

Usage:
    PYTHONPATH=$PYTHONPATH:. python experiments/sim_profile.py \
        [--route 0] [--background 200] [--top 40]
"""

from __future__ import annotations

import argparse
import cProfile
import pstats
import sys
import tempfile
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--route", default="0")
    p.add_argument("--background", type=int, default=200)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--out", default="/tmp/sim_profile.json")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from transfuser_tpu.tools.expert_benchmark import run_expert_benchmark

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    scores = run_expert_benchmark(
        args.out, n_routes=36, town_spec="grid:4x100x2",
        background_vehicles=args.background, longest6=True,
        route_subset=args.route, print_route_table=False)
    prof.disable()
    wall = time.time() - t0
    print(f"\n=== wall {wall:.1f}s  scores {scores} ===\n", file=sys.stderr)
    st = pstats.Stats(prof, stream=sys.stderr)
    st.sort_stats("cumulative").print_stats(args.top)
    st.sort_stats("tottime").print_stats(args.top)


if __name__ == "__main__":
    sys.exit(main())
