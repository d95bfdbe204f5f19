"""Road-network model: lanes, topology, junctions, lights, stop signs.

This is the hermetic stand-in for the CARLA OpenDRIVE map that the
reference queries through `carla.Map`/`GlobalRoutePlanner` and rasterizes
through `team_code_autopilot/utils/map_utils.py:89-268`. One structure
serves four consumers:

  * background traffic (sim/traffic.py) — car-following along lane
    topology, stopping at red lights;
  * criteria semantics (harness/criteria.py) — lane membership for
    OutsideRouteLanesTest, trigger volumes + stop lines for
    RunningRedLightTest / RunningStopTest (atomic_criteria_local.py);
  * map-true BEV ground-truth rasterization (data/bev_raster.py) — road
    and lane-marking channels cover the whole network, not just the ego
    route (utils/lts_rendering.py renders the full OpenDRIVE network);
  * route/scenario generators (tools/route_gen.py) — topology walks over
    the lane graph (tools/dataset/gen_routes/*.py).

Everything is numpy on the host; nothing here touches jax.
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .types import Location, Rotation, Transform

LANE_WIDTH = 3.5
SAMPLE_STEP = 1.0  # meters between centerline samples


@dataclass
class Lane:
    lane_id: int
    centerline: np.ndarray  # (N, 2) float64, ~1 m spacing
    width: float = LANE_WIDTH
    road_id: int = -1
    is_junction: bool = False
    speed_limit: float = 8.0  # m/s
    successors: List[int] = field(default_factory=list)
    predecessors: List[int] = field(default_factory=list)
    # Same-direction adjacent lanes (carla Waypoint.get_left_lane /
    # get_right_lane for Driving lanes with matching heading).
    left_neighbor: Optional[int] = None
    right_neighbor: Optional[int] = None

    def __post_init__(self) -> None:
        self.centerline = np.asarray(self.centerline, np.float64)
        seg = np.diff(self.centerline, axis=0)
        seg_len = np.hypot(seg[:, 0], seg[:, 1])
        self._cum = np.concatenate([[0.0], np.cumsum(seg_len)])
        self.length = float(self._cum[-1])
        # scalar fast-path tables (python floats): position() runs once
        # per managed vehicle per tick — numpy scalar overhead dominated
        # dense-traffic simulation
        self._cum_list = self._cum.tolist()
        self._pts_list = [(float(p[0]), float(p[1]))
                          for p in self.centerline]
        # project() fast-path tables: the segment geometry is static, so
        # precompute it once instead of re-deriving diff/denominator on
        # every call (project ran 430k times per benchmark route).
        self._proj_a = self.centerline[:-1]
        ab = self.centerline[1:] - self._proj_a
        self._proj_ab = ab
        denom = (ab * ab).sum(axis=1)
        self._proj_denom = np.where(denom < 1e-12, 1e-12, denom)
        self._proj_inv = 1.0 / self._proj_denom
        self._proj_sqrt = np.sqrt(self._proj_denom)

    def position_f(self, s: float) -> Tuple[float, float, float]:
        """(x, y, yaw_deg) at arclength s (clamped) — pure-scalar twin of
        position() for the per-(vehicle, tick) traffic loop."""
        s = min(max(s, 0.0), self.length)
        i = bisect.bisect_right(self._cum_list, s) - 1
        i = min(max(i, 0), len(self._pts_list) - 2)
        ax, ay = self._pts_list[i]
        bx, by = self._pts_list[i + 1]
        sx, sy = bx - ax, by - ay
        seg_len = math.hypot(sx, sy) or 1e-9
        t = (s - self._cum_list[i]) / seg_len
        t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
        return ax + t * sx, ay + t * sy, math.degrees(math.atan2(sy, sx))

    def position(self, s: float) -> Tuple[np.ndarray, float]:
        """(xy, yaw_deg) at arclength s (clamped)."""
        x, y, yaw = self.position_f(s)
        return np.array([x, y]), yaw

    def project(self, x: float, y: float) -> Tuple[float, float]:
        """(s, signed lateral offset) of the closest centerline point."""
        p = np.array([x, y])
        a = self._proj_a
        ab = self._proj_ab
        t = np.clip(((p - a) * ab).sum(axis=1) * self._proj_inv, 0.0, 1.0)
        proj = a + t[:, None] * ab
        d2 = ((p - proj) ** 2).sum(axis=1)
        i = int(np.argmin(d2))
        s = float(self._cum[i] + t[i] * self._proj_sqrt[i])
        # sign: left of travel direction = positive
        cross = ab[i, 0] * (p[1] - a[i, 1]) - ab[i, 1] * (p[0] - a[i, 0])
        lateral = math.copysign(math.sqrt(d2[i]), cross)
        return s, lateral


@dataclass
class TriggerVolume:
    """Axis-oriented-by-yaw box on the ground plane (CARLA trigger_volume)."""
    center: np.ndarray          # (2,)
    half_extent: np.ndarray     # (2,) along (forward, lateral)
    yaw_deg: float = 0.0

    def contains(self, x: float, y: float, margin: float = 0.0) -> bool:
        c, s = math.cos(math.radians(self.yaw_deg)), math.sin(
            math.radians(self.yaw_deg))
        dx, dy = x - self.center[0], y - self.center[1]
        fwd = dx * c + dy * s
        lat = -dx * s + dy * c
        return (abs(fwd) <= self.half_extent[0] + margin
                and abs(lat) <= self.half_extent[1] + margin)


@dataclass
class TrafficLightSpec:
    light_id: int
    transform: Transform           # pole position/orientation
    trigger: TriggerVolume         # approach box before the stop line
    stop_line: Tuple[np.ndarray, np.ndarray]  # segment ((2,), (2,))
    controlled_lanes: List[int]    # incoming lane + its junction connectors
    group: int = 0                 # lights in a group alternate phases
    phase: int = 0                 # 0: starts green, 1: starts red


@dataclass
class StopSignSpec:
    sign_id: int
    transform: Transform
    trigger: TriggerVolume


class TownMap:
    """Lane graph + signals + spatial queries."""

    def __init__(self, lanes: Sequence[Lane],
                 traffic_lights: Sequence[TrafficLightSpec] = (),
                 stop_signs: Sequence[StopSignSpec] = (),
                 name: str = "town",
                 junction_boxes: Sequence[Tuple[Tuple[float, float],
                                                float]] = ()):
        self.name = name
        self.lanes: Dict[int, Lane] = {l.lane_id: l for l in lanes}
        self.traffic_lights = list(traffic_lights)
        self.stop_signs = list(stop_signs)
        # ((cx, cy), half_extent) squares: junction interiors are FULLY
        # paved (as in CARLA), not just the connector centerline strips.
        self.junction_boxes = [((float(c[0]), float(c[1])), float(h))
                               for c, h in junction_boxes]
        self._build_index()

    # ------------------------------------------------------------ indexing
    def _build_index(self, cell: float = 8.0) -> None:
        self._cell = cell
        self._grid: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
        for lid, lane in self.lanes.items():
            for pi, pt in enumerate(lane.centerline):
                key = (int(pt[0] // cell), int(pt[1] // cell))
                self._grid.setdefault(key, []).append((lid, pi))

    def _candidates(self, x: float, y: float, radius: float
                    ) -> List[Tuple[int, int]]:
        r = int(radius // self._cell) + 1
        cx, cy = int(x // self._cell), int(y // self._cell)
        out: List[Tuple[int, int]] = []
        for ix in range(cx - r, cx + r + 1):
            for iy in range(cy - r, cy + r + 1):
                out.extend(self._grid.get((ix, iy), ()))
        return out

    # ------------------------------------------------------------- queries
    def nearest_lane(self, x: float, y: float, max_dist: float = 20.0
                     ) -> Optional[Tuple[Lane, float, float]]:
        """(lane, s, lateral) of the closest lane within max_dist."""
        best = None
        best_d = max_dist
        seen = set()
        for lid, _ in self._candidates(x, y, max_dist):
            if lid in seen:
                continue
            seen.add(lid)
            lane = self.lanes[lid]
            s, lat = lane.project(x, y)
            if abs(lat) < best_d:
                best_d = abs(lat)
                best = (lane, s, lat)
        return best

    def lanes_near(self, x: float, y: float, radius: float) -> List[Lane]:
        """All lanes with at least one centerline sample within `radius`."""
        seen = set()
        out: List[Lane] = []
        r2 = radius * radius
        for lid, pi in self._candidates(x, y, radius):
            if lid in seen:
                continue
            pt = self.lanes[lid].centerline[pi]
            if (pt[0] - x) ** 2 + (pt[1] - y) ** 2 <= r2:
                seen.add(lid)
                out.append(self.lanes[lid])
        return out

    def on_road(self, x: float, y: float, margin: float = 0.3) -> bool:
        """True if (x, y) lies within some lane's paved width or inside a
        junction interior (CARLA junction boxes are paved wall to wall;
        only checking connector strips falsely scores legal junction
        driving as outside-lane, atomic_criteria_local.py uses the map's
        Driving-lane waypoints which cover the whole box)."""
        for (cx, cy), half in self.junction_boxes:
            if abs(x - cx) <= half + margin and abs(y - cy) <= half + margin:
                return True
        hit = self.nearest_lane(x, y, max_dist=2 * LANE_WIDTH)
        if hit is None:
            return False
        lane, _s, lat = hit
        return abs(lat) <= lane.width / 2.0 + margin

    def is_junction(self, x: float, y: float) -> bool:
        hit = self.nearest_lane(x, y, max_dist=2 * LANE_WIDTH)
        return bool(hit and hit[0].is_junction
                    and abs(hit[2]) <= hit[0].width)

    def advance(self, lane_id: int, s: float, dist: float,
                rng: Optional[np.random.Generator] = None,
                choose: Optional[int] = None
                ) -> Tuple[int, float, bool]:
        """Walk `dist` meters along topology. Returns (lane_id, s, ok);
        ok=False at a dead end. Successor choice: `choose` index, else
        random via rng, else first."""
        guard = 0
        while True:
            lane = self.lanes[lane_id]
            if s + dist <= lane.length:
                return lane_id, s + dist, True
            dist -= lane.length - s
            if not lane.successors:
                return lane_id, lane.length, False
            if choose is not None:
                nxt = lane.successors[choose % len(lane.successors)]
            elif rng is not None:
                nxt = lane.successors[int(rng.integers(
                    0, len(lane.successors)))]
            else:
                nxt = lane.successors[0]
            lane_id, s = nxt, 0.0
            guard += 1
            if guard > 1000:
                return lane_id, s, False

    def route(self, start_xy: Tuple[float, float],
              goal_xy: Tuple[float, float],
              step: float = 1.0, allow_lane_change: bool = True,
              change_length: float = 15.0) -> List[Transform]:
        """Dense drivable route start->goal via BFS over the lane graph
        (the hermetic `interpolate_trajectory`/GlobalRoutePlanner).

        The graph includes same-direction neighbor edges (lane changes),
        rendered as a cosine-blended diagonal over `change_length`
        meters, so routes from the lane-change generators
        (gen_routes_lane_change.py) interpolate smoothly."""
        from collections import deque
        a = self.nearest_lane(*start_xy)
        b = self.nearest_lane(*goal_xy)
        if a is None or b is None:
            raise ValueError("start/goal not on the road network")
        (la, sa, _), (lb, sb, _) = a, b
        if la.lane_id == lb.lane_id and sb >= sa:
            chain: List[Tuple[int, str]] = [(la.lane_id, "start")]
        else:
            # The goal is detected on EDGE arrival (not dequeue) so that
            # a goal BEHIND the start on the same lane re-enters the
            # start lane via topology instead of degenerating to a
            # single point.
            goal = lb.lane_id
            prev: Dict[int, Tuple[int, str]] = {la.lane_id: (-1, "start")}
            goal_entry: Optional[Tuple[int, str]] = None
            q = deque([la.lane_id])
            while q and goal_entry is None:
                cur = q.popleft()
                lane = self.lanes[cur]
                hops = [(nxt, "s") for nxt in lane.successors]
                if allow_lane_change and not lane.is_junction:
                    for nb in (lane.left_neighbor, lane.right_neighbor):
                        if nb is not None \
                                and not self.lanes[nb].is_junction:
                            hops.append((nb, "n"))
                for nxt, kind in hops:
                    if nxt == goal:
                        goal_entry = (cur, kind)
                        break
                    if nxt not in prev:
                        prev[nxt] = (cur, kind)
                        q.append(nxt)
            if goal_entry is None:
                raise ValueError("no route between start and goal")
            chain = [(goal, goal_entry[1])]
            cur = goal_entry[0]
            while cur != -1:
                parent, kind = prev[cur]
                chain.append((cur, kind))
                cur = parent
            chain.reverse()

        pts: List[np.ndarray] = []
        cur_lid, _ = chain[0]
        cur_s = sa
        for nxt_lid, kind in chain[1:]:
            lane = self.lanes[cur_lid]
            if kind == "s":
                s = cur_s
                while s < lane.length:
                    pts.append(lane.position(s)[0])
                    s += step
                cur_lid, cur_s = nxt_lid, 0.0
            else:  # lane change: cosine blend onto the neighbor
                nxt = self.lanes[nxt_lid]
                xy0 = lane.position(cur_s)[0]
                s_n, _ = nxt.project(float(xy0[0]), float(xy0[1]))
                span = min(change_length, lane.length - cur_s,
                           nxt.length - s_n)
                t = 0.0
                while t < span:
                    w = 0.5 - 0.5 * math.cos(math.pi * t / max(span, 1e-6))
                    pa = lane.position(cur_s + t)[0]
                    pb = nxt.position(s_n + t)[0]
                    pts.append((1.0 - w) * pa + w * pb)
                    t += step
                cur_lid, cur_s = nxt_lid, s_n + span
        last = self.lanes[cur_lid]
        s = cur_s
        while s < sb:
            pts.append(last.position(s)[0])
            s += step
        # a lane change may complete past the goal's arclength; never
        # emit a backwards point
        pts.append(last.position(max(sb, cur_s))[0])

        out: List[Transform] = []
        for i, xy in enumerate(pts):
            ref = pts[i + 1] - xy if i + 1 < len(pts) else \
                xy - pts[i - 1] if i > 0 else np.array([1.0, 0.0])
            yaw = math.degrees(math.atan2(float(ref[1]), float(ref[0]))) \
                if float(np.hypot(ref[0], ref[1])) > 1e-9 else 0.0
            out.append(Transform(Location(float(xy[0]), float(xy[1])),
                                 Rotation(yaw=yaw)))
        return out

    def spawn_points(self, spacing: float = 12.0) -> List[Tuple[int, float]]:
        """(lane_id, s) pairs spread over non-junction lanes (the
        `get_spawn_points` equivalent for background traffic)."""
        pts: List[Tuple[int, float]] = []
        for lid, lane in sorted(self.lanes.items()):
            if lane.is_junction:
                continue
            s = spacing / 2.0
            while s < lane.length - 4.0:
                pts.append((lid, s))
                s += spacing
        return pts

    def light_for_lane(self, lane_id: int) -> Optional[TrafficLightSpec]:
        # Lazily index lane -> light: the linear scan over every light ran
        # once per (managed vehicle, tick). Lights are static after
        # construction (nothing in the tree mutates traffic_lights).
        cache = getattr(self, "_light_by_lane", None)
        if cache is None:
            cache = {}
            for tl in self.traffic_lights:
                for lid in tl.controlled_lanes:
                    cache.setdefault(lid, tl)
            self._light_by_lane = cache
        return cache.get(lane_id)


# --------------------------------------------------------------------------
# Procedural town builder
# --------------------------------------------------------------------------

def _turn_path(a: np.ndarray, fwd: np.ndarray, b: np.ndarray,
               fwd2: np.ndarray, step: float) -> np.ndarray:
    """Straight + circular-arc + straight connector from `a` (heading
    `fwd`) to `b` (heading `fwd2`).

    A quadratic bezier between perpendicular legs of length d has apex
    radius d/2 — for the tight right-turn connectors this fell below the
    ego's physical minimum turning radius (~3.6 m, WoR bicycle model) and
    the expert could only overshoot. The tangent arc has radius
    min(d1, d2): the largest curve that stays inside the same corner."""
    corner = _line_intersect(a, fwd, b, -fwd2)
    d1 = float(np.linalg.norm(corner - a))
    d2 = float(np.linalg.norm(b - corner))
    r = min(d1, d2)
    t1 = corner - fwd * r      # arc start (on the entry leg)
    t2 = corner + fwd2 * r     # arc end (on the exit leg)
    # arc center: offset from t1 perpendicular to fwd, toward the turn
    turn_sign = float(np.sign(fwd[0] * fwd2[1] - fwd[1] * fwd2[0]))
    normal = np.array([-fwd[1], fwd[0]]) * turn_sign
    center = t1 + normal * r
    a0 = math.atan2(t1[1] - center[1], t1[0] - center[0])
    a1 = math.atan2(t2[1] - center[1], t2[0] - center[0])
    sweep = (a1 - a0) % (2.0 * math.pi) if turn_sign > 0 else \
        -((a0 - a1) % (2.0 * math.pi))
    n_arc = max(int(abs(sweep) * r / step) + 2, 4)
    angles = a0 + np.linspace(0.0, sweep, n_arc)
    arc = center + r * np.stack([np.cos(angles), np.sin(angles)], axis=1)
    parts = [arc]
    if d1 > r + 1e-9:
        n = max(int((d1 - r) / step) + 1, 2)
        parts.insert(0, a + (t1 - a) * np.linspace(0.0, 1.0, n,
                                                   endpoint=False)[:, None])
    if d2 > r + 1e-9:
        n = max(int((d2 - r) / step) + 1, 2)
        tail = t2 + (b - t2) * np.linspace(0.0, 1.0, n + 1)[1:, None]
        parts.append(tail)
    return np.concatenate(parts, axis=0)


# Exact unit vectors for axis-aligned headings (trig of radians(90) is not
# exactly (0,1); endpoint-key matching requires bit-identical coordinates).
_FWD = {0: np.array([1.0, 0.0]), 90: np.array([0.0, 1.0]),
        180: np.array([-1.0, 0.0]), 270: np.array([0.0, -1.0])}
_RIGHT = {0: np.array([0.0, -1.0]), 90: np.array([1.0, 0.0]),
          180: np.array([0.0, 1.0]), 270: np.array([-1.0, 0.0])}


def grid_town(blocks: int = 2, block_size: float = 80.0,
              junction_half: float = 8.0,
              lights_at: Sequence[Tuple[int, int]] = ((1, 1),),
              stops_at: Sequence[Tuple[int, int]] = (),
              lanes_per_dir: int = 1,
              name: str = "grid_town") -> TownMap:
    """Manhattan-grid town: (blocks+1)^2 intersections, two-way roads,
    junction connector lanes (straight/left/right), traffic lights and stop
    signs at chosen intersections.

    Right-hand traffic: lane k (k=0 innermost) driving heading theta is
    offset LANE_WIDTH/2 + k*LANE_WIDTH to the right of the road axis.
    With lanes_per_dir > 1, same-direction lanes are wired as
    left/right neighbors (lane-change adjacency); straight junction
    connectors exist per lane, left turns leave from the innermost lane,
    right turns from the outermost (standard turn-lane discipline).
    """
    n = blocks + 1
    half_w = LANE_WIDTH / 2.0
    # A right turn runs outer lane -> outer lane with arc radius
    # junction_half - outer_offset; keep that above the ego's physical
    # minimum turning radius (~3.6 m) with margin, else the expert can
    # only overshoot the connector. Multi-lane towns therefore get a
    # wider junction box automatically (CARLA junctions likewise grow
    # with road width).
    min_turn_r = 4.5
    junction_half = max(junction_half,
                        half_w + (lanes_per_dir - 1) * LANE_WIDTH
                        + min_turn_r)
    lanes: List[Lane] = []
    lights: List[TrafficLightSpec] = []
    stops: List[StopSignSpec] = []
    next_id = [0]

    # endpoint registry for wiring topology: key=(x,y,heading) rounded
    lane_start: Dict[Tuple[int, int, int], int] = {}
    lane_end: Dict[Tuple[int, int, int], int] = {}

    def key(xy, yaw) -> Tuple[int, int, int]:
        return (int(round(xy[0] * 2)), int(round(xy[1] * 2)),
                int(round(yaw)) % 360)

    def add_lane(pts: np.ndarray, is_junction: bool, road_id: int) -> Lane:
        lane = Lane(lane_id=next_id[0], centerline=pts, road_id=road_id,
                    is_junction=is_junction)
        next_id[0] += 1
        lanes.append(lane)
        d0 = pts[1] - pts[0]
        d1 = pts[-1] - pts[-2]
        lane_start[key(pts[0], math.degrees(math.atan2(d0[1], d0[0])))] = \
            lane.lane_id
        lane_end[key(pts[-1], math.degrees(math.atan2(d1[1], d1[0])))] = \
            lane.lane_id
        return lane

    def straight(p0, p1) -> np.ndarray:
        dist = math.hypot(p1[0] - p0[0], p1[1] - p0[1])
        m = max(int(dist / SAMPLE_STEP), 2)
        return np.linspace(p0, p1, m + 1)

    def link_neighbors(dir_lanes: List[Lane]) -> None:
        """dir_lanes[k]: innermost (k=0) to outermost; left = toward the
        road axis."""
        for k in range(1, len(dir_lanes)):
            dir_lanes[k].left_neighbor = dir_lanes[k - 1].lane_id
            dir_lanes[k - 1].right_neighbor = dir_lanes[k].lane_id

    def offsets():
        return [half_w + k * LANE_WIDTH for k in range(lanes_per_dir)]

    # --- road segment lanes (between junction squares)
    road_id = 0
    for i in range(n):
        for j in range(n):
            cx, cy = i * block_size, j * block_size
            # east-bound segment to (i+1, j)
            if i + 1 < n:
                x0, x1 = cx + junction_half, cx + block_size - junction_half
                # heading +x: right side is -y
                link_neighbors([
                    add_lane(straight((x0, cy - off), (x1, cy - off)),
                             False, road_id) for off in offsets()])
                link_neighbors([
                    add_lane(straight((x1, cy + off), (x0, cy + off)),
                             False, road_id) for off in offsets()])
                road_id += 1
            if j + 1 < n:
                y0, y1 = cy + junction_half, cy + block_size - junction_half
                # heading +y: right side is +x
                link_neighbors([
                    add_lane(straight((cx + off, y0), (cx + off, y1)),
                             False, road_id) for off in offsets()])
                link_neighbors([
                    add_lane(straight((cx - off, y1), (cx - off, y0)),
                             False, road_id) for off in offsets()])
                road_id += 1

    # --- junction connectors
    # at intersection (i, j): incoming lane endpoints sit on the junction
    # square's edge. For each incoming heading, connect straight, left,
    # right to the outgoing lanes that exist.
    headings = [0, 90, 180, 270]
    lanes_by_id = {l.lane_id: l for l in lanes}
    for i in range(n):
        for j in range(n):
            cx, cy = i * block_size, j * block_size
            jid = 10000 + i * 100 + j
            def connect(src: int, in_pt: np.ndarray, h: int, turn: str,
                        dh: int, out_off: float, jid: int) -> bool:
                fwd, _right = _FWD[h], _RIGHT[h]
                h2 = (h + dh) % 360
                fwd2, right2 = _FWD[h2], _RIGHT[h2]
                out_pt = (np.array([cx, cy]) + fwd2 * junction_half
                          + right2 * out_off)
                out_key = key(out_pt, h2)
                if out_key not in lane_start:
                    return False
                dst = lane_start[out_key]
                if turn == "straight":
                    pts = straight(in_pt, out_pt)
                else:
                    # tangent-arc connector: apex radius = leg length
                    # (a quadratic bezier's is only half that, which put
                    # tight right turns under the ego's physical minimum
                    # turning radius ~3.6 m, WoR bicycle model)
                    pts = _turn_path(in_pt, fwd, out_pt, fwd2, SAMPLE_STEP)
                conn = add_lane(pts, True, jid)
                lanes_by_id[conn.lane_id] = conn
                lanes_by_id[src].successors.append(conn.lane_id)
                conn.predecessors.append(src)
                conn.successors.append(dst)
                lanes_by_id[dst].predecessors.append(conn.lane_id)
                return True

            for h in headings:
                fwd, right = _FWD[h], _RIGHT[h]
                for k, off in enumerate(offsets()):
                    # incoming lane k of heading h ends at edge point:
                    in_pt = (np.array([cx, cy]) - fwd * junction_half
                             + right * off)
                    in_key = key(in_pt, h)
                    if in_key not in lane_end:
                        continue
                    src = lane_end[in_key]
                    # turn-lane discipline: straight from every lane,
                    # left only from the innermost, right only from the
                    # outermost.
                    turns = [("straight", 0, off)]
                    if k == 0:
                        turns.append(("left", 90, offsets()[0]))
                    if k == lanes_per_dir - 1:
                        turns.append(("right", -90, offsets()[-1]))
                    for turn, dh, out_off in turns:
                        connect(src, in_pt, h, turn, dh, out_off, jid)
                    # grid-boundary fallback: a lane whose disciplined
                    # exits don't exist (e.g. inner lane at a corner)
                    # may take any existing turn rather than dead-end.
                    if not lanes_by_id[src].successors:
                        for turn, dh, out_off in (
                                ("right", -90, offsets()[-1]),
                                ("left", 90, offsets()[0])):
                            if connect(src, in_pt, h, turn, dh, out_off,
                                       jid):
                                break

    # --- signals
    def approach_signal(i: int, j: int, h: int):
        """Incoming approach of heading h at intersection (i,j):
        (incoming lanes, stop-line segment, trigger volume, pole tf).
        The stop line and trigger span every same-direction lane."""
        cx, cy = i * block_size, j * block_size
        fwd, right = _FWD[h], _RIGHT[h]
        lanes_in = []
        for off in offsets():
            in_pt = (np.array([cx, cy]) - fwd * junction_half
                     + right * off)
            in_key = key(in_pt, h)
            if in_key in lane_end:
                lanes_in.append((lane_end[in_key], in_pt))
        if not lanes_in:
            return None
        edge_mid = (np.array([cx, cy]) - fwd * junction_half
                    + right * (half_w + (lanes_per_dir - 1)
                               * LANE_WIDTH / 2.0))
        span = lanes_per_dir * LANE_WIDTH / 2.0 + half_w
        stop_a = edge_mid - right * span
        stop_b = edge_mid + right * span
        trig_center = edge_mid - fwd * 2.5
        trigger = TriggerVolume(center=trig_center,
                                half_extent=np.array([2.5, span]),
                                yaw_deg=h)
        # Pole stands sidewalk-distance off the outer lane edge (CARLA
        # signposts are ~2 m beyond the curb): 2.5 m left it only 0.75 m
        # clear of the lane and corner-adjacent vehicles clipped it.
        outer = lanes_in[-1][1]
        pole = Transform(Location(float(outer[0] + right[0] * 4.0),
                                  float(outer[1] + right[1] * 4.0)),
                         Rotation(yaw=h))
        return [lid for lid, _ in lanes_in], (stop_a, stop_b), trigger, \
            pole

    light_id = 0
    for (i, j) in lights_at:
        group = i * 100 + j
        for phase, h in ((0, 0), (1, 90), (0, 180), (1, 270)):
            sig = approach_signal(i, j, h)
            if sig is None:
                continue
            lanes_in, stop_line, trigger, pole = sig
            controlled = []
            for lane_in in lanes_in:
                controlled += [lane_in] + lanes_by_id[lane_in].successors
            lights.append(TrafficLightSpec(
                light_id=light_id, transform=pole, trigger=trigger,
                stop_line=stop_line, controlled_lanes=controlled,
                group=group, phase=phase))
            light_id += 1

    sign_id = 0
    for (i, j) in stops_at:
        for h in headings:
            sig = approach_signal(i, j, h)
            if sig is None:
                continue
            _lanes_in, _stop_line, trigger, pole = sig
            stops.append(StopSignSpec(sign_id=sign_id, transform=pole,
                                      trigger=trigger))
            sign_id += 1

    boxes = [((i * block_size, j * block_size), junction_half)
             for i in range(n) for j in range(n)]
    return TownMap(lanes, lights, stops, name=name, junction_boxes=boxes)


def _line_intersect(p0, d0, p1, d1) -> np.ndarray:
    """Intersection of p0+t*d0 and p1+u*d1 (falls back to midpoint)."""
    det = d0[0] * d1[1] - d0[1] * d1[0]
    if abs(det) < 1e-9:
        return (p0 + p1) / 2.0
    t = ((p1[0] - p0[0]) * d1[1] - (p1[1] - p0[1]) * d1[0]) / det
    return p0 + t * d0
