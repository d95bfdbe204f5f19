"""Diagnose the expert's blocked routes on the Longest6-shaped benchmark.

VERDICT r3 next-step #3: 9/36 routes end "Agent got blocked"; routes
8/25/35 block under 15% completion — reproduce them with an instrumented
AutoPilot that records WHY it is braking whenever it is stationary, and
dump the neighborhood (nearby traffic state) for the final stall.

Usage:
    PYTHONPATH=$PYTHONPATH:. python experiments/blocked_route_debug.py \
        [--routes 8,25,35] [--out /tmp/blocked_debug.json]
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def main(argv=None):
    import jax
    jax.config.update("jax_platforms", "cpu")

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--routes", default="8,25,35")
    p.add_argument("--out", default="/tmp/blocked_debug.json")
    args = p.parse_args(argv)

    from transfuser_tpu.agents.autopilot import AutoPilot
    from transfuser_tpu.tools.expert_benchmark import run_expert_benchmark

    traces = {}

    class DebugAutoPilot(AutoPilot):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.stall_log = []
            traces[id(self)] = self
            self._route_name = None

        def _get_control(self, input_data, steer=None, throttle=None):
            control = super()._get_control(input_data, steer, throttle)
            speed = float(input_data["speed"][1]["speed"])
            if speed < 0.05 and self.step > 20:
                sim = self.sim
                loc = sim.ego_transform.location if sim else None
                near = []
                tm = getattr(sim, "traffic", None) if sim else None
                if tm is not None and len(self.stall_log) % 100 == 0:
                    occ = getattr(tm, "last_occupancy", {})
                    for mv in getattr(tm, "vehicles", []):
                        ax = mv.actor.transform
                        d = math.hypot(ax.location.x - loc.x,
                                       ax.location.y - loc.y)
                        if d < 30.0:
                            gap, lead_spd = tm._leader_gap(mv, occ)
                            lane = tm.map.lanes[mv.lane_id]
                            near.append({
                                "id": mv.actor.actor_id,
                                "x": round(ax.location.x, 1),
                                "y": round(ax.location.y, 1),
                                "yaw": round(ax.rotation.yaw, 0),
                                "speed": round(mv.speed, 2),
                                "lane": mv.lane_id,
                                "jn": bool(lane.is_junction),
                                "s": round(mv.s, 1),
                                "len": round(lane.length, 1),
                                "gap": None if gap is None else round(gap, 2),
                                "lspd": round(lead_spd, 2),
                                "rear": round(min(tm._rear_gap(mv, occ),
                                                  99.0), 1),
                                "hold": mv.hold,
                                "bo": round(mv.back_off, 1),
                                "blocked_s": round(mv.blocked_time, 1),
                                "d": round(d, 1)})
                self.stall_log.append({
                    "step": self.step,
                    "hazard_ids": sorted(getattr(self, "hazard_vids", ())),
                    "x": round(loc.x, 1) if loc else None,
                    "y": round(loc.y, 1) if loc else None,
                    "brake": self.brake,
                    "light": bool(self.traffic_light_hazard),
                    "stop": bool(self.stop_sign_hazard),
                    "veh": bool(any(self.vehicle_hazard)),
                    "walker": bool(any(self.walker_hazard)),
                    "junction": bool(self.junction),
                    "near": near,
                })
            return control

    report = {}

    def factory(cfg):
        agent = DebugAutoPilot()
        agent._route_name = cfg.name
        return agent

    scores = run_expert_benchmark(
        args.out + ".scores.json", n_routes=36,
        town_spec="grid:4x100x2", background_vehicles=200,
        longest6=True, target_len=1200.0,
        agent_factory=factory, print_route_table=True,
        route_subset=args.routes)

    for agent in traces.values():
        log = agent.stall_log
        if not log:
            continue
        # classify the FINAL stall (the one the blocked criterion saw)
        tail = log[-min(len(log), 1800):]
        counts = {k: sum(1 for e in tail if e[k])
                  for k in ("light", "stop", "veh", "walker", "junction")}
        nears = [e["near"] for e in tail if e["near"]]
        report[agent._route_name or "?"] = {
            "stall_ticks_total": len(log),
            "final_stall_counts": counts,
            "final_pos": {"x": log[-1]["x"], "y": log[-1]["y"]},
            "final_hazard_ids": log[-1].get("hazard_ids", []),
            "last_neighborhood": nears[-1] if nears else [],
            "first_stall_step": log[0]["step"],
            "last_step": log[-1]["step"],
        }
    report["_scores"] = scores
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    sys.exit(main())
