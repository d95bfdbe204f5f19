"""Offline evaluation-result aggregation.

Behavioral spec: tools/result_parser.py:100-374 — aggregate one or more
evaluation checkpoint JSONs into a per-route CSV with score/infraction
columns, extract infraction coordinates from event messages, and
optionally render infraction locations onto a town map image.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import re
from typing import Any, Dict, List, Optional, Tuple

INFRACTION_COLUMNS = (
    "collisions_pedestrian", "collisions_vehicle", "collisions_layout",
    "red_light", "stop_infraction", "outside_route_lanes", "route_dev",
    "route_timeout", "vehicle_blocked",
)

_COORD_RE = re.compile(
    r"x=(-?\d+\.?\d*),\s*y=(-?\d+\.?\d*)(?:,\s*z=(-?\d+\.?\d*))?")


def extract_infraction_coords(message: str) -> Optional[Tuple[float, ...]]:
    """Regex-extract (x, y[, z]) from an infraction message
    (result_parser.py coordinate scraping)."""
    m = _COORD_RE.search(message)
    if not m:
        return None
    return tuple(float(g) for g in m.groups() if g is not None)


def load_results(paths: List[str]) -> List[Dict[str, Any]]:
    out = []
    for p in paths:
        with open(p) as f:
            out.append(json.load(f))
    return out


def per_route_rows(results: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    rows = []
    for data in results:
        for rec in data.get("_checkpoint", {}).get("records", []):
            row: Dict[str, Any] = {
                "route_id": rec.get("route_id"),
                "index": rec.get("index"),
                "status": rec.get("status"),
                "score_composed": rec["scores"]["score_composed"],
                "score_route": rec["scores"]["score_route"],
                "score_penalty": rec["scores"]["score_penalty"],
                "duration_game": rec.get("meta", {}).get("duration_game"),
                "route_length": rec.get("meta", {}).get("route_length"),
            }
            for key in INFRACTION_COLUMNS:
                row[f"n_{key}"] = len(rec["infractions"].get(key, []))
            rows.append(row)
    return rows


def aggregate(results: List[Dict[str, Any]]) -> Dict[str, Any]:
    rows = per_route_rows(results)
    n = max(len(rows), 1)
    agg = {
        "routes": len(rows),
        "avg_score_composed": sum(r["score_composed"] for r in rows) / n,
        "avg_score_route": sum(r["score_route"] for r in rows) / n,
        "avg_score_penalty": sum(r["score_penalty"] for r in rows) / n,
    }
    for key in INFRACTION_COLUMNS:
        agg[f"total_{key}"] = sum(r[f"n_{key}"] for r in rows)
    return agg


def infraction_locations(results: List[Dict[str, Any]]
                         ) -> List[Dict[str, Any]]:
    locations = []
    for data in results:
        for rec in data.get("_checkpoint", {}).get("records", []):
            for key, messages in rec["infractions"].items():
                for msg in messages:
                    coords = extract_infraction_coords(str(msg))
                    if coords:
                        locations.append({
                            "route_id": rec.get("route_id"),
                            "type": key, "x": coords[0], "y": coords[1]})
    return locations


def write_csv(rows: List[Dict[str, Any]], path: str) -> None:
    if not rows:
        return
    with open(path, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)


def render_infraction_map(locations: List[Dict[str, Any]], out_path: str,
                          town_map: Optional[str] = None) -> None:
    """Scatter infraction coordinates (onto a town map image if given)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8))
    if town_map and os.path.exists(town_map):
        import matplotlib.image as mpimg
        ax.imshow(mpimg.imread(town_map))
    by_type: Dict[str, List] = {}
    for loc in locations:
        by_type.setdefault(loc["type"], []).append((loc["x"], loc["y"]))
    for t, pts in by_type.items():
        xs, ys = zip(*pts)
        ax.scatter(xs, ys, label=t, s=12)
    ax.legend(fontsize=7)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("results", nargs="+", help="evaluation checkpoint JSONs")
    p.add_argument("--csv", default="results.csv")
    p.add_argument("--map_out", default=None)
    p.add_argument("--town_map", default=None)
    args = p.parse_args()

    results = load_results(args.results)
    rows = per_route_rows(results)
    write_csv(rows, args.csv)
    print(json.dumps(aggregate(results), indent=2))
    if args.map_out:
        render_infraction_map(infraction_locations(results), args.map_out,
                              args.town_map)


if __name__ == "__main__":
    main()
