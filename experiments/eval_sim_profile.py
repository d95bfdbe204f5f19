"""Profile the HOST-SIM side of the trained 36-route eval (round 5).

The trained eval is host-sim bound: with async single-RPC inference the
tunnel work hides under sim time, so wall per compute frame == host work
(sim tick x2 + sensor synthesis + the agent's numpy tick path). This
drives ONE benchmark route with a HybridAgent-shaped dummy (identical
sensors() rig and tick() processing, no model) under cProfile to locate
where those ~55 ms/frame actually go.

Usage:
    PYTHONPATH=$PYTHONPATH:. python experiments/eval_sim_profile.py \
        [--route 0] [--seconds 90] [--background 200] [--top 30]
"""

from __future__ import annotations

import argparse
import cProfile
import math
import pstats
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--route", default="0")
    p.add_argument("--seconds", type=float, default=90.0)
    p.add_argument("--background", type=int, default=200)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--out", default="/tmp/eval_sim_profile.json")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from transfuser_tpu.agents.hybrid_agent import HybridAgent
    from transfuser_tpu.config import GlobalConfig
    from transfuser_tpu.control.gps import GPSBuffer
    from transfuser_tpu.control.pid import PIDController
    from transfuser_tpu.control.route_planner import RoutePlanner
    from transfuser_tpu.data import decoders
    from transfuser_tpu.data.lidar_np import lidar_to_histogram
    from transfuser_tpu.data.pack import LIDAR_HIST_MAX
    from transfuser_tpu.sim.types import VehicleControl
    from transfuser_tpu.tools.expert_benchmark import run_expert_benchmark

    class SimOnlyAgent(HybridAgent):
        """HybridAgent's exact sensor rig + host tick path, no model:
        isolates the sim+sensor+numpy cost the eval pays per frame."""

        def setup(self, path_to_conf_file: str, route_index=None) -> None:
            from transfuser_tpu.agents.base import Track
            self.track = Track.SENSORS
            self.step = -1
            self.initialized = False
            self.config = GlobalConfig()
            cfg = self.config
            ctrl = cfg.controller
            self.backbone = cfg.model.backbone
            self.gps_buffer = GPSBuffer(maxlen=ctrl.gps_buffer_max_len,
                                        carla_fps=ctrl.carla_fps)
            self.turn_controller = PIDController(
                ctrl.turn_kp, ctrl.turn_ki, ctrl.turn_kd, ctrl.turn_n)
            self.speed_controller = PIDController(
                ctrl.speed_kp, ctrl.speed_ki, ctrl.speed_kd, ctrl.speed_n)
            self.control = VehicleControl(brake=1.0)
            self._worker = None

        def run_step(self, input_data, timestamp) -> VehicleControl:
            self.step += 1
            cfg = self.config
            ctrl = cfg.controller
            if not self.initialized:
                self._init()
            repeat = self.step % ctrl.action_repeat == 1
            tick_data = self.tick(input_data, lite=repeat)
            if repeat:
                self.gps_buffer.update(
                    self.control.steer, self.control.throttle,
                    self.control.brake > 0.5, tick_data["compass"],
                    tick_data["speed"])
                return self.control

            # the real input-prep costs (histogram, raster, packing)
            rgb = np.asarray(tick_data["rgb"])[None]
            if rgb.dtype != np.uint8:
                rgb = np.round(rgb).astype(np.uint8)
            pts = tick_data["lidar"].copy()
            pts[:, 1] *= -1.0
            lidar_bev = np.round(lidar_to_histogram(
                pts, grid=cfg.sensors.lidar_resolution_width)
                * LIDAR_HIST_MAX).astype(np.uint8)[None]
            target_point = np.asarray(tick_data["target_point"],
                                      np.float32)[None]
            tp_image = decoders.rasterize_target_point(
                target_point[0], size=cfg.sensors.lidar_resolution_width
            ).astype(np.uint8)[None]
            buf = np.concatenate(
                [rgb.ravel(), lidar_bev.ravel(), tp_image.ravel(),
                 np.concatenate([target_point.ravel(),
                                 np.asarray([tick_data["speed"]],
                                            np.float32)]).view(np.uint8)])
            del buf

            # drive toward the target point at a gentle speed so the
            # route progresses like a trained policy would
            tp = tick_data["target_point"]
            angle = math.degrees(math.atan2(tp[1], tp[0])) / 90.0
            steer = self.turn_controller.step(angle)
            steer = max(-1.0, min(1.0, steer))
            speed = tick_data["speed"]
            throttle = self.speed_controller.step(4.0 - speed)
            throttle = max(0.0, min(0.75, throttle))
            self.control = VehicleControl(steer=float(steer),
                                          throttle=float(throttle),
                                          brake=0.0)
            self.gps_buffer.update(
                self.control.steer, self.control.throttle, False,
                tick_data["compass"], tick_data["speed"])
            return self.control

    t0 = time.time()
    prof = cProfile.Profile()
    prof.enable()
    scores = run_expert_benchmark(
        args.out, n_routes=36, town_spec="grid:4x100x2",
        background_vehicles=args.background, longest6=True,
        agent_factory=lambda cfg: SimOnlyAgent(""),
        route_subset=args.route,
        max_game_seconds=args.seconds, print_route_table=False)
    prof.disable()
    wall = time.time() - t0
    ticks = args.seconds * 20.0
    print(f"\n=== wall {wall:.1f}s for {args.seconds} game-s "
          f"({wall / ticks * 1e3:.1f} ms/tick, "
          f"{wall / (ticks / 2) * 1e3:.1f} ms/compute-frame) ===\n",
          file=sys.stderr)
    st = pstats.Stats(prof, stream=sys.stderr)
    st.sort_stats("cumulative").print_stats(args.top)
    st.sort_stats("tottime").print_stats(args.top)


if __name__ == "__main__":
    sys.exit(main())
