"""Route + scenario dataset generators.

Behavioral spec: tools/dataset/gen_routes/* and gen_scenarios/* — walk a
town's road topology, extract route segments of interest (curved highways,
junction traversals, lane changes) and emit route XMLs; sample trigger
transforms and emit scenario JSONs. The reference needs a live CARLA
server for the OpenDRIVE topology; here the topology source is pluggable —
a `TownGraph` built either from a live adapter or from a JSON description.
"""

from __future__ import annotations

import json
import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class TopologyEdge:
    """One directed road segment: dense polyline + junction flag."""

    points: List[Tuple[float, float, float]]  # (x, y, yaw_deg)
    is_junction: bool = False


@dataclass
class TownGraph:
    name: str
    edges: List[TopologyEdge] = field(default_factory=list)

    @staticmethod
    def from_json(path: str) -> "TownGraph":
        with open(path) as f:
            raw = json.load(f)
        return TownGraph(
            name=raw["name"],
            edges=[TopologyEdge(points=[tuple(p) for p in e["points"]],
                                is_junction=e.get("is_junction", False))
                   for e in raw["edges"]])

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"name": self.name,
                       "edges": [{"points": e.points,
                                  "is_junction": e.is_junction}
                                 for e in self.edges]}, f)


def _curvature(points: Sequence[Tuple[float, float, float]]) -> float:
    if len(points) < 3:
        return 0.0
    yaws = np.unwrap(np.radians([p[2] for p in points]))
    return float(np.abs(np.diff(yaws)).sum())


def curved_route_segments(graph: TownGraph, min_curvature: float = 0.3,
                          min_length: float = 50.0) -> List[TopologyEdge]:
    """Curved (highway) segments for scenarios 1/3
    (gen_routes_for_scen_1_3_4.py topology walk)."""
    out = []
    for edge in graph.edges:
        if edge.is_junction:
            continue
        pts = np.array([(p[0], p[1]) for p in edge.points])
        length = float(np.linalg.norm(np.diff(pts, axis=0), axis=1).sum())
        if length >= min_length and _curvature(edge.points) >= min_curvature:
            out.append(edge)
    return out


def junction_entries(graph: TownGraph) -> List[Tuple[float, float, float]]:
    """Entry transforms of junction edges (scenarios 7/8/9/10 generators)."""
    return [e.points[0] for e in graph.edges if e.is_junction and e.points]


def routes_to_xml(routes: List[List[Tuple[float, float, float]]], town: str,
                  path: str) -> None:
    root = ET.Element("routes")
    for i, pts in enumerate(routes):
        r = ET.SubElement(root, "route", id=str(i), town=town)
        for x, y, yaw in pts:
            ET.SubElement(r, "waypoint", x=f"{x}", y=f"{y}", z="0.0",
                          pitch="0.0", roll="0.0", yaw=f"{yaw}")
    ET.ElementTree(root).write(path, xml_declaration=True, encoding="UTF-8")


def scenarios_to_json(triggers: List[Tuple[float, float, float]],
                      scenario_type: str, town: str, path: str) -> None:
    events = [{"transform": {"x": x, "y": y, "z": 0.0, "yaw": yaw,
                             "pitch": 0.0}}
              for x, y, yaw in triggers]
    data = {"available_scenarios": [{town: [{
        "available_event_configurations": events,
        "scenario_type": scenario_type}]}]}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


def generate_routes(graph: TownGraph, out_xml: str,
                    kind: str = "curved") -> int:
    """Emit a route XML for the requested segment kind; returns count."""
    if kind == "curved":
        segs = curved_route_segments(graph)
    elif kind == "junction":
        segs = [e for e in graph.edges if e.is_junction]
    else:
        segs = list(graph.edges)
    routes = [[(p[0], p[1], p[2]) for p in s.points[:: max(1, len(s.points)
                                                           // 10)]]
              for s in segs]
    routes = [r for r in routes if len(r) >= 2]
    routes_to_xml(routes, graph.name, out_xml)
    return len(routes)


def generate_scenarios(graph: TownGraph, out_json: str,
                       scenario_type: str = "Scenario7") -> int:
    triggers = junction_entries(graph)
    scenarios_to_json(triggers, scenario_type, graph.name, out_json)
    return len(triggers)
