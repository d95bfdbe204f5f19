"""VERDICT r4 #7: per-family throughput at n>=3 plus the batch 20/24
sweep, as one resumable driver around bench.py --train-only.

Each row is ONE bench.py invocation (bench already runs three timed
30-step chains internally and reports the median with per-run values,
so every row carries n=3). Rows run SEQUENTIALLY — one TPU process at
a time, idle host required for clean numbers (CLAUDE.md).

Writes results/family_sweep_r5.json incrementally (rerun skips rows
already present) and prints a table at the end.

Usage: python experiments/family_sweep.py [--out results/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (row key, bench.py argv tail). Flagship batch sweep first (answers
# the twice-deferred 20/24 question), then the other three families at
# the default batch.
ROWS = [
    ("transFuser_b16", ["16"]),
    ("transFuser_b20", ["20"]),
    ("transFuser_b24", ["24"]),
    ("late_fusion_b16", ["16", "--backbone=late_fusion"]),
    ("latentTF_b16", ["16", "--backbone=latentTF"]),
    ("geometric_fusion_b16", ["16", "--backbone=geometric_fusion"]),
]


def run_row(argv_tail):
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           *argv_tail, "--train-only", "--no-real-data"]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                          timeout=3600)
    line = None
    for out_line in proc.stdout.splitlines():
        out_line = out_line.strip()
        if out_line.startswith("{"):
            line = json.loads(out_line)
    if line is None:
        raise RuntimeError(
            f"bench produced no JSON (rc={proc.returncode}):\n"
            f"{proc.stderr[-2000:]}")
    line["wall_s"] = round(time.time() - t0, 1)
    return line


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(
        REPO, "results", "family_sweep_r5.json"))
    args = p.parse_args()

    results = {}
    if os.path.isfile(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for key, tail in ROWS:
        if key in results:
            print(f"[sweep] {key}: cached "
                  f"({results[key]['value']} samples/s)", flush=True)
            continue
        print(f"[sweep] {key}: running bench {' '.join(tail)}",
              flush=True)
        results[key] = run_row(tail)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        r = results[key]
        print(f"[sweep] {key}: {r['value']} samples/s "
              f"(runs {r['value_runs']}), mfu {r['mfu']}", flush=True)

    print(f"{'row':24s} {'samples/s':>10s} {'runs':>22s} "
          f"{'mfu':>6s} {'mfu_useful':>10s}")
    for key, _ in ROWS:
        r = results.get(key)
        if r:
            print(f"{key:24s} {r['value']:10.1f} "
                  f"{str(r['value_runs']):>22s} {r['mfu']:6.3f} "
                  f"{r.get('mfu_useful', 0):10.3f}")


if __name__ == "__main__":
    main()
