"""Learned driving agent: jitted ensemble inference + control heuristics.

Behavioral spec (team_code_transfuser/submission_agent.py:34-537):
  * setup reads the run-config snapshot and loads EVERY model_* checkpoint
    in the directory as an ensemble member (:84-99),
  * 3 cameras are center-cropped to 320x160 and concatenated to one
    160x960 strip, then center-cropped to 160x704 (:184-234, 520-536),
  * GPS is denoised with a 100-deep buffer rolled forward through the
    bicycle model (:456-469),
  * action repeat 2: the model runs every 2nd sim frame (:252-254),
  * ensemble fusion: waypoint mean then (degenerate, single-aug) median;
    detection boxes fused by polygon-IoU NMS (:321-339),
  * stuck/creep logic + LiDAR safety box emergency stop (:284-288,
    341-390); latentTF uses predicted-box frontal check instead (:396-430).

TPU notes: one jitted forward evaluates the WHOLE ensemble in a single XLA
program — members are vmapped over stacked parameters, so n nets cost one
batched forward instead of n serial launches. Both the inference step and
the host-side control logic hold the 20 Hz / <20 ms p50 budget: static
shapes everywhere (no recompiles after the first frame).
"""

from __future__ import annotations

import math
import os
import queue
import threading
from collections import deque
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import GlobalConfig
from ..control.gps import GPSBuffer
from ..control.nms_ensemble import non_maximum_suppression
from ..control.pid import PIDController, control_pid
from ..control.route_planner import RoutePlanner
from ..control.safety import bb_detected_in_front_of_vehicle, \
    num_points_in_safety_box
from ..data import decoders
from ..data.lidar_np import lidar_to_histogram
from ..data.pack import LIDAR_HIST_MAX
from ..models import LidarCenterNet
from ..sim.types import VehicleControl
from ..train.checkpoint import (list_ensemble_weights, load_config_snapshot,
                                load_inference_weights)
from .base import AutonomousAgent, Track


class _InferenceWorker:
    """One background thread running the packed upload -> dispatch -> fetch
    chain off the control loop's critical path.

    ``submit(buf)`` hands frame N to the worker and returns frame N-1's
    fetched host result (``None`` while priming) — the same one-frame lag
    as ``ControllerConfig.pipelined_fetch``, but the ~26 ms-per-RPC tunnel
    wall (PERF_NOTES round-4 census) now overlaps the sim's next two ticks
    instead of blocking the agent: by the time frame N is submitted, frame
    N-1 has had a full compute-frame of sim time to finish its ~60 ms of
    tunnel work. After the ensemble build, every jax call happens on this
    one thread, so the jax client still sees single-threaded use.
    """

    def __init__(self, fn):
        self._fn = fn
        self._in: "queue.Queue" = queue.Queue(maxsize=1)
        self._out: "queue.Queue" = queue.Queue(maxsize=1)
        self._pending = False
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="hybrid-agent-inference")
        self._thread.start()

    def _loop(self) -> None:
        while True:
            buf = self._in.get()
            if buf is None:
                return
            try:
                self._out.put(self._fn(buf))
            except BaseException as e:  # re-raised on the consumer side
                self._out.put(e)

    def submit(self, buf):
        prev = None
        if self._pending:
            prev = self._out.get()
            if isinstance(prev, BaseException):
                self._pending = False
                raise prev
        self._in.put(buf)
        self._pending = True
        return prev

    def close(self) -> None:
        if self._pending:
            self._out.get()
            self._pending = False
        self._in.put(None)
        self._thread.join(timeout=30.0)


class HybridAgent(AutonomousAgent):
    # single-RPC frame path; set by _build_ensemble for EVERY backbone
    # family (geometric_fusion packs its correspondence grids as uint8
    # cell indices). The class default keeps stubbed/partial builds on
    # the multi-array _forward path, which run_step still supports.
    _forward_packed = None

    def setup(self, path_to_conf_file: str,
              route_index: Optional[int] = None) -> None:
        self.track = Track.SENSORS
        self.step = -1
        self.initialized = False
        self.config_path = path_to_conf_file

        if path_to_conf_file and os.path.isdir(path_to_conf_file):
            self.config = load_config_snapshot(path_to_conf_file)
            weight_files = list_ensemble_weights(path_to_conf_file)
        else:
            self.config = GlobalConfig()
            weight_files = []

        import dataclasses

        n_pth = sum(p.endswith(".pth") for p in weight_files)
        if n_pth and not self.config.model.gpt.reference_view_unpack:
            # Reference torch checkpoints carry the GPT token-unpack view
            # quirk (models/gpt.py) — a spatial permutation the whole
            # vmapped ensemble graph either has or hasn't. Flip it only
            # when EVERY member needs it; a mixed dir (converted .pth +
            # natively trained .msgpack) cannot share one graph.
            if n_pth != len(weight_files):
                raise ValueError(
                    "ensemble mixes reference .pth members (which need "
                    "the GPT view-unpack quirk) with natively trained "
                    "members (which don't): split them into separate "
                    f"model dirs ({path_to_conf_file})")
            gpt = dataclasses.replace(self.config.model.gpt,
                                      reference_view_unpack=True)
            model = dataclasses.replace(self.config.model, gpt=gpt)
            if model.backbone == "geometric_fusion":
                # same reasoning for the geometric correspondence-grid
                # consumption quirk (models/geometric_fusion.py)
                model = dataclasses.replace(
                    model, geometric_reference_view=True)
            self.config = self.config.replace(model=model)

        # inference always uses the measured-fastest grouped-conv
        # lowering: param trees and numerics are identical across
        # lowerings (tests/test_perf_knobs.py), so the training
        # snapshot's choice need not constrain the agent
        self.config = self.config.replace(model=dataclasses.replace(
            self.config.model, group_lowering="auto"))

        cfg = self.config
        self.backbone = cfg.model.backbone
        ctrl = cfg.controller

        self.model = LidarCenterNet(cfg, dtype=jnp.bfloat16)
        self._build_ensemble(weight_files)

        self.gps_buffer = GPSBuffer(maxlen=ctrl.gps_buffer_max_len,
                                    carla_fps=ctrl.carla_fps)
        self.bb_buffer: deque = deque(maxlen=1)
        self.turn_controller = PIDController(ctrl.turn_kp, ctrl.turn_ki,
                                             ctrl.turn_kd, ctrl.turn_n)
        self.speed_controller = PIDController(ctrl.speed_kp, ctrl.speed_ki,
                                              ctrl.speed_kd, ctrl.speed_n)
        self.stuck_detector = 0
        self.forced_move = 0
        self.use_lidar_safe_check = True
        self.control = VehicleControl(brake=1.0)
        self.pred_wp: Optional[np.ndarray] = None
        # pipelined_fetch: device arrays of the last dispatched forward,
        # fetched on the NEXT compute frame (overlaps tunnel RTT with sim
        # time; see ControllerConfig.pipelined_fetch)
        self._pending: Optional[tuple] = None
        # async_inference: the worker thread that owns the whole
        # upload->dispatch->fetch chain (see _InferenceWorker)
        self._worker: Optional[_InferenceWorker] = None

    # ------------------------------------------------------------- ensemble
    def _build_ensemble(self, weight_files: List[str]) -> None:
        """Stack all members' params; a single vmapped jitted program runs
        the whole ensemble per frame."""
        cfg = self.config
        from ..data.synthetic import synthetic_batch
        example = synthetic_batch(cfg, 1)
        # geometric fusion consumes per-frame lidar<->camera
        # correspondence grids (submission_agent.py:302-312 computes
        # them from the raw cloud at every inference frame)
        geometric = cfg.model.backbone == "geometric_fusion"

        def extras(b):
            if not geometric:
                return {}
            return dict(bev_points=b["bev_points"],
                        cam_points=b["cam_points"])

        init_fn = jax.jit(lambda rngs, b: self.model.init(
            rngs, b["rgb"], b["lidar"], b["target_point"],
            b["target_point_image"], b["speed"], train=False,
            **extras(b)))
        template = init_fn(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, example)
        template = jax.device_get(template)

        if weight_files:
            members = []
            for p in weight_files:
                if p.endswith(".pth"):
                    from ..train.torch_import import load_reference_checkpoint
                    members.append(load_reference_checkpoint(p, cfg))
                else:
                    members.append(load_inference_weights(p, template))
        else:
            members = [template]
        self.model_count = len(members)
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *members)

        def widen(rgb, lidar, tpi):
            # Frames cross the axon tunnel packed (uint8 image, uint8
            # histogram counts, uint8 raster — data/pack.py conventions;
            # ~0.5 MB/frame instead of ~2.1) and widen on device here.
            if rgb.dtype == jnp.uint8:
                rgb = rgb.astype(jnp.float32)
            if lidar.dtype == jnp.uint8:
                lidar = lidar.astype(jnp.float32) / LIDAR_HIST_MAX
            if tpi.dtype == jnp.uint8:
                tpi = tpi.astype(jnp.float32)
            return rgb, lidar, tpi

        if geometric:
            def single_forward(variables, rgb, lidar, tp, tpi, speed,
                               bev_points, cam_points):
                rgb, lidar, tpi = widen(rgb, lidar, tpi)
                return self.model.apply(
                    variables, rgb, lidar, tp, tpi, speed,
                    bev_points=bev_points, cam_points=cam_points,
                    method="forward_ego")
            axes = (0, None, None, None, None, None, None, None)
        else:
            def single_forward(variables, rgb, lidar, tp, tpi, speed):
                rgb, lidar, tpi = widen(rgb, lidar, tpi)
                return self.model.apply(variables, rgb, lidar, tp, tpi,
                                        speed, method="forward_ego")
            axes = (0, None, None, None, None, None)

        vm_forward = jax.vmap(single_forward, in_axes=axes)
        ensemble_forward = jax.jit(vm_forward)
        # params enter as an argument (closure-captured arrays would be
        # baked into the HLO as constants and explode compile time).
        self._stacked = stacked
        self._forward = lambda *args: ensemble_forward(self._stacked, *args)

        # Single-RPC frame path: run_step's five separate jnp.asarray
        # uploads plus two output fetches paid the axon tunnel's
        # ~26 ms per-call floor EIGHT times per compute frame
        # (measured ~430 ms wall per 50 ms sim tick on the trained
        # 36-route eval, PERF_NOTES "HybridAgent RPC census"). All
        # inputs are uint8 except 3 floats, so one packed uint8
        # buffer crosses the tunnel, unpacks in-graph, and the two
        # outputs come back as ONE flattened array: 8 RPCs -> 3.
        # geometric_fusion's per-frame correspondence grids pack too:
        # every entry is a /32-scale CELL index (< 22), so the int32
        # grids round-trip through uint8 exactly.
        rgb_sh = tuple(example["rgb"].shape)
        lid_sh = tuple(example["lidar"].shape)
        tpi_sh = tuple(example["target_point_image"].shape)
        n_rgb = int(np.prod(rgb_sh))
        n_lid = int(np.prod(lid_sh))
        n_tpi = int(np.prod(tpi_sh))
        self._pack_layout = (rgb_sh, lid_sh, tpi_sh,
                             n_rgb, n_lid, n_tpi)
        if geometric:
            bev_sh = tuple(example["bev_points"].shape)
            cam_sh = tuple(example["cam_points"].shape)
            n_bev = int(np.prod(bev_sh))
            n_cam = int(np.prod(cam_sh))
        else:
            bev_sh = cam_sh = None
            n_bev = n_cam = 0

        def packed_forward(variables, buf):
            o1, o2, o3 = n_rgb, n_rgb + n_lid, n_rgb + n_lid + n_tpi
            rgb = buf[:o1].reshape(rgb_sh)
            lidar = buf[o1:o2].reshape(lid_sh)
            tpi = buf[o2:o3].reshape(tpi_sh)
            # 3 float32 (target_point x/y, speed) bitcast from the
            # next 12 bytes (little-endian both sides)
            sc = jax.lax.bitcast_convert_type(
                buf[o3:o3 + 12].reshape(3, 4), jnp.float32)
            tp = sc[:2][None]
            speed = sc[2:3]
            geo = ()
            if geometric:
                o4 = o3 + 12
                geo = (buf[o4:o4 + n_bev].astype(jnp.int32).reshape(bev_sh),
                       buf[o4 + n_bev:o4 + n_bev + n_cam]
                       .astype(jnp.int32).reshape(cam_sh))
            wp, boxes, _labels = vm_forward(variables, rgb, lidar,
                                            tp, tpi, speed, *geo)
            return jnp.concatenate(
                [wp.astype(jnp.float32).reshape(-1),
                 boxes.astype(jnp.float32).reshape(-1)])

        packed_jit = jax.jit(packed_forward)
        self._forward_packed = lambda buf: packed_jit(self._stacked, buf)
        dummy = [jnp.zeros(rgb_sh, jnp.uint8),
                 jnp.zeros(lid_sh, jnp.uint8),
                 jnp.zeros((1, 2), jnp.float32),
                 jnp.zeros(tpi_sh, jnp.uint8),
                 jnp.zeros((1,), jnp.float32)]
        if geometric:
            dummy += [jnp.zeros(bev_sh, jnp.int32),
                      jnp.zeros(cam_sh, jnp.int32)]
        out_sh = jax.eval_shape(vm_forward, stacked, *dummy)
        self._wp_shape = tuple(out_sh[0].shape)
        self._boxes_shape = tuple(out_sh[1].shape)
        self._wp_size = int(np.prod(self._wp_shape))

    # -------------------------------------------------------------- sensors
    def sensors(self) -> List[Dict[str, Any]]:
        cfg = self.config
        s = cfg.sensors
        ctrl = cfg.controller
        cams = [("rgb_front", s.camera_rot_0), ("rgb_left", s.camera_rot_1),
                ("rgb_right", s.camera_rot_2)]
        if s.crop_equivalent_rig:
            # crop-equivalent pinhole: same fx, same principal axis as the
            # center crop of the full rig (see SensorConfig docstring);
            # _crop_camera then no-ops on the already-cropped frame
            cam_w, cam_h = s.img_width, s.img_resolution[0]
            fx = s.camera_width / (2.0 * math.tan(
                math.radians(s.camera_fov) / 2.0))
            cam_fov = math.degrees(2.0 * math.atan(cam_w / (2.0 * fx)))
        else:
            cam_w, cam_h, cam_fov = (s.camera_width, s.camera_height,
                                     s.camera_fov)
        out: List[Dict[str, Any]] = [
            {"type": "sensor.camera.rgb",
             "x": s.camera_pos[0], "y": s.camera_pos[1], "z": s.camera_pos[2],
             "roll": rot[0], "pitch": rot[1], "yaw": rot[2],
             "width": cam_w, "height": cam_h,
             "fov": cam_fov, "id": cam_id}
            for cam_id, rot in cams
        ] + [
            {"type": "sensor.other.imu", "x": 0.0, "y": 0.0, "z": 0.0,
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0,
             "sensor_tick": 1.0 / ctrl.carla_fps, "id": "imu"},
            {"type": "sensor.other.gnss", "x": 0.0, "y": 0.0, "z": 0.0,
             "roll": 0.0, "pitch": 0.0, "yaw": 0.0, "sensor_tick": 0.01,
             "id": "gps"},
            {"type": "sensor.speedometer",
             "reading_frequency": ctrl.carla_fps, "id": "speed"},
        ]
        if self.backbone != "latentTF":  # camera-only method skips LiDAR
            out.append({
                "type": "sensor.lidar.ray_cast",
                "x": s.lidar_pos[0], "y": s.lidar_pos[1], "z": s.lidar_pos[2],
                "roll": s.lidar_rot[0], "pitch": s.lidar_rot[1],
                "yaw": s.lidar_rot[2], "id": "lidar"})
        return out

    # ----------------------------------------------------------------- tick
    def _init(self) -> None:
        ctrl = self.config.controller
        self._route_planner = RoutePlanner(ctrl.route_planner_min_distance,
                                           ctrl.route_planner_max_distance)
        self._route_planner.set_route(self._global_plan, gps=True)
        self.initialized = True

    def _crop_camera(self, img: np.ndarray) -> np.ndarray:
        """960x480 camera -> center 320x160 crop."""
        s = self.config.sensors
        w3 = s.img_width
        h = s.img_resolution[0]
        start_x = img.shape[1] // 2 - w3 // 2
        start_y = img.shape[0] // 2 - h // 2
        return img[start_y:start_y + h, start_x:start_x + w3]

    def tick(self, input_data: Dict,
             lite: bool = False) -> Dict[str, Any]:
        """lite=True: pose/speed only — action-repeat frames reuse the
        previous control and never look at the model inputs, so leaving
        the camera/lidar entries untouched lets the hermetic sim's lazy
        sensor feeder skip three 960x480 rasterizations and a 60k-point
        cloud synthesis per repeat frame (they cost nothing on a real
        CARLA server, which renders regardless)."""
        s = self.config.sensors
        rgb = None
        if not lite:
            strip = np.concatenate([
                self._crop_camera(np.asarray(input_data[cam][1])[:, :, :3])
                for cam in ("rgb_left", "rgb_front", "rgb_right")], axis=1)
            # 160x960 -> center 160x704
            w = s.img_resolution[1]
            start = strip.shape[1] // 2 - w // 2
            rgb = strip[:, start:start + w]

        gps = np.asarray(input_data["gps"][1][:2], np.float64)
        speed = float(input_data["speed"][1]["speed"])
        compass = float(input_data["imu"][1][-1])
        if math.isnan(compass):  # CARLA 0.9.10 NaN guard
            compass = 0.0

        pos = (gps - self._route_planner.mean) * self._route_planner.scale
        self.gps_buffer.append(pos)
        denoised = self.gps_buffer.denoised()
        route = self._route_planner.run_step(denoised)
        next_wp, next_cmd = route[1] if len(route) > 1 else route[0]

        theta = compass + np.pi / 2.0
        r = np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
        local_command = r.T @ (np.asarray(next_wp) - denoised)

        result = {"rgb": rgb, "gps": pos, "speed": speed, "compass": compass,
                  "target_point": local_command,
                  "next_command": getattr(next_cmd, "value", next_cmd)}
        if not lite and self.backbone != "latentTF":
            result["lidar"] = np.asarray(input_data["lidar"][1])[:, :3]
        return result

    # ------------------------------------------------------------- run_step
    def run_step(self, input_data: Dict, timestamp: float) -> VehicleControl:
        self.step += 1
        cfg = self.config
        ctrl = cfg.controller
        if not self.initialized:
            self._init()

        repeat = self.step % ctrl.action_repeat == 1
        tick_data = self.tick(input_data, lite=repeat)

        # Action repeat: reuse the previous action on odd frames.
        if repeat:
            self.gps_buffer.update(self.control.steer, self.control.throttle,
                                   self.control.brake > 0.5,
                                   tick_data["compass"], tick_data["speed"])
            return self.control

        # ---------------- model inputs (all static shapes), packed wire
        # (uint8 over the tunnel; widened on device in the jitted forward.
        # Camera frames are uint8 at the source and the histogram takes
        # values k/5, so packing is exact.)
        rgb = np.asarray(tick_data["rgb"])[None]
        if rgb.dtype != np.uint8:
            rgb = np.round(rgb).astype(np.uint8)
        if self.backbone == "latentTF":
            lidar_bev = np.zeros(
                (1, cfg.sensors.lidar_resolution_height,
                 cfg.sensors.lidar_resolution_width, 2), np.uint8)
        else:
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
        speed = np.asarray([tick_data["speed"]], np.float32)

        is_stuck = False
        if self.stuck_detector > ctrl.stuck_threshold and \
                self.forced_move < ctrl.creep_duration:
            is_stuck = True
            self.forced_move += 1

        geometric = self.backbone == "geometric_fusion"
        if geometric:
            # per-frame correspondence grids from the raw cloud
            # (submission_agent.py:302-312); cell indices < 22 so they
            # ride the packed uint8 wire exactly
            from ..data.correspondences import lidar_cam_correspondences
            bev_pts, cam_pts = lidar_cam_correspondences(
                tick_data["lidar"][:, :3])
        if self._forward_packed is not None:
            # ONE upload, one dispatch, (later) one fetch — see
            # _build_ensemble's packed path for why.
            scal = np.concatenate(
                [np.asarray(target_point, np.float32).ravel(),
                 np.asarray(speed, np.float32).ravel()])
            parts = [rgb.ravel(), lidar_bev.ravel(),
                     tp_image.ravel(), scal.view(np.uint8)]
            if geometric:
                parts += [bev_pts.astype(np.uint8).ravel(),
                          cam_pts.astype(np.uint8).ravel()]
            buf = np.concatenate(parts)
            if ctrl.async_inference:
                # the worker owns the whole tunnel chain; we get frame
                # N-1's HOST result back (same lag as pipelined_fetch)
                if self._worker is None:
                    self._worker = _InferenceWorker(
                        lambda b: np.asarray(
                            self._forward_packed(jnp.asarray(b))))
                flat = self._worker.submit(buf)
                if flat is None:  # pipeline priming: hold the last control
                    self.gps_buffer.update(
                        self.control.steer, self.control.throttle,
                        self.control.brake > 0.5, tick_data["compass"],
                        tick_data["speed"])
                    return self.control
                out = None
            else:
                out = self._forward_packed(jnp.asarray(buf))
        else:
            fwd_args = [jnp.asarray(rgb), jnp.asarray(lidar_bev),
                        jnp.asarray(target_point), jnp.asarray(tp_image),
                        jnp.asarray(speed)]
            if geometric:
                fwd_args += [jnp.asarray(bev_pts[None]),
                             jnp.asarray(cam_pts[None])]
            out = self._forward(*fwd_args)
        if ctrl.pipelined_fetch and out is not None:
            # Swap in the PREVIOUS compute frame's (already executing)
            # outputs and let this frame's forward run while the sim
            # advances — the fetch below then waits only on work that has
            # had a full frame to complete.
            pending, self._pending = self._pending, out
            if pending is None:
                # pipeline priming: no result yet, hold the last control
                self.gps_buffer.update(
                    self.control.steer, self.control.throttle,
                    self.control.brake > 0.5, tick_data["compass"],
                    tick_data["speed"])
                return self.control
            out = pending
        if self._forward_packed is not None:
            if out is not None:        # sync path: fetch here
                flat = np.asarray(out)  # the ONE device->host round trip
            wp = flat[:self._wp_size].reshape(self._wp_shape)
            boxes = flat[self._wp_size:].reshape(self._boxes_shape)
        else:
            wp, boxes, _labels = out
            wp = np.asarray(wp)        # (n_models, 1, 4, 2)
            boxes = np.asarray(boxes)  # (n_models, 1, k, 8)

        # ---------------- ensemble fusion
        pred_wp = wp.mean(axis=0)[0]   # mean over members (then the
        # reference's median over aug_degrees is a no-op with one degree)
        member_boxes = [self._metric_boxes(boxes[m, 0])
                        for m in range(self.model_count)]
        fused_boxes = non_maximum_suppression(member_boxes,
                                              ctrl.iou_threshold_nms)
        self.bb_buffer.append(fused_boxes)
        self.pred_wp = pred_wp

        # ---------------- control
        steer, throttle, brake = control_pid(
            pred_wp, tick_data["speed"], self.turn_controller,
            self.speed_controller, ctrl, is_stuck=is_stuck,
            lidar_pos_x=cfg.sensors.lidar_pos[0])
        if is_stuck and self.forced_move == 1:
            steer = 0.0  # no steer on the first unblocking frame
        if brake or is_stuck:
            steer *= ctrl.steer_damping

        if tick_data["speed"] < 0.1:
            self.stuck_detector += 1
        elif not is_stuck:
            self.stuck_detector = 0
            self.forced_move = 0

        control = VehicleControl(steer=float(steer), throttle=float(throttle),
                                 brake=float(brake))

        # ---------------- safety override (only while creeping)
        if self.use_lidar_safe_check and is_stuck:
            if self.backbone == "latentTF":
                danger = bb_detected_in_front_of_vehicle(
                    fused_boxes, tick_data["speed"], ctrl)
            else:
                pts = tick_data["lidar"].copy()
                pts[:, 1] *= -1.0
                danger = num_points_in_safety_box(pts, ctrl) > 0
            if danger:
                control = VehicleControl(steer=float(steer), throttle=0.0,
                                         brake=1.0)

        self.control = control
        self.gps_buffer.update(control.steer, control.throttle,
                               control.brake > 0.5, tick_data["compass"],
                               tick_data["speed"])
        return control

    # ----------------------------------------------------------- box decode
    def _metric_boxes(self, boxes: np.ndarray
                      ) -> List[Tuple[np.ndarray, float, float]]:
        """Decoded (k, 8) image-space boxes -> metric-frame corner tuples
        (corners(6,2), brake, confidence) above the confidence threshold
        (model.py:713, 808-843)."""
        from .. import geometry
        cfg = self.config
        cnc = cfg.model.centernet
        keep = boxes[:, 7] > cnc.bb_confidence_threshold
        out: List[Tuple[np.ndarray, float, float]] = []
        t_inv = np.linalg.inv(geometry.lidar_to_bevimage())
        ppm = cfg.sensors.pixels_per_meter
        for b in boxes[keep]:
            x, y, w, h, yaw, speed, brake, conf = b
            w = w / cnc.bounding_box_divisor / ppm
            h = h / cnc.bounding_box_divisor / ppm
            center = t_inv @ np.array([x, y, 1.0])
            center = center[:2] + np.asarray(cfg.sensors.lidar_pos[:2])
            center[1] *= -1.0  # back to CARLA right-hand frame
            local = np.array([
                [-h, -w], [-h, w], [h, w], [h, -w],
                [0.0, 0.0], [0.0, h * speed * 0.5]])
            c, s = np.cos(yaw), np.sin(yaw)
            rot = np.array([[c, -s], [s, c]])
            corners = local @ rot.T + center
            out.append((corners, float(brake), float(conf)))
        return out

    def destroy(self) -> None:
        if self._worker is not None:
            self._worker.close()
            self._worker = None
        self._forward = None
