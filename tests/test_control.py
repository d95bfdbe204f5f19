"""Control-stack golden tests (PID, control law, route planner, GPS buffer,
NMS, safety box, bicycle model)."""

import numpy as np
import pytest

from transfuser_tpu.config import ControllerConfig
from transfuser_tpu.control.gps import GPSBuffer
from transfuser_tpu.control.nms_ensemble import non_maximum_suppression
from transfuser_tpu.control.pid import PIDController, control_pid
from transfuser_tpu.control.route_planner import RoutePlanner
from transfuser_tpu.control.safety import (StuckDetector,
                                           bb_detected_in_front_of_vehicle,
                                           num_points_in_safety_box)
from transfuser_tpu.geometry import (EgoModel, convex_iou, obb_corners,
                                     obb_intersect)


def test_pid_matches_reference_formula():
    pid = PIDController(k_p=1.25, k_i=0.75, k_d=0.3, n=20)
    window = [0.0] * 20
    outs = []
    for e in [0.1, 0.2, -0.05, 0.4]:
        window.append(e)
        window = window[-20:]
        integral = np.mean(window)
        derivative = window[-1] - window[-2]
        outs.append(1.25 * e + 0.75 * integral + 0.3 * derivative)
    got = [PIDController(k_p=1.25, k_i=0.75, k_d=0.3, n=20)]
    pid = got[0]
    for e, want in zip([0.1, 0.2, -0.05, 0.4], outs):
        assert abs(pid.step(e) - want) < 1e-12


def test_control_pid_straight_drive():
    cfg = ControllerConfig()
    turn = PIDController(cfg.turn_kp, cfg.turn_ki, cfg.turn_kd, cfg.turn_n)
    speed = PIDController(cfg.speed_kp, cfg.speed_ki, cfg.speed_kd,
                          cfg.speed_n)
    # Waypoints straight ahead, 1m apart (lidar frame: x forward - 1.3).
    wps = np.array([[0.7, 0.0], [1.7, 0.0], [2.7, 0.0], [3.7, 0.0]])
    steer, throttle, brake = control_pid(wps, 0.0, turn, speed, cfg)
    assert not brake
    assert throttle > 0
    assert abs(steer) < 1e-6  # speed < 0.01 -> angle zeroed


def test_control_pid_brakes_when_fast():
    cfg = ControllerConfig()
    turn = PIDController(cfg.turn_kp, cfg.turn_ki, cfg.turn_kd, cfg.turn_n)
    speed = PIDController(cfg.speed_kp, cfg.speed_ki, cfg.speed_kd,
                          cfg.speed_n)
    wps = np.array([[0.7, 0.0], [0.8, 0.0], [0.9, 0.0], [1.0, 0.0]])
    # desired = 2 * ||wp0-wp1|| = 0.2 < brake_speed -> brake
    steer, throttle, brake = control_pid(wps, 5.0, turn, speed, cfg)
    assert brake and throttle == 0.0


def test_route_planner_pops_passed_points():
    rp = RoutePlanner(min_distance=7.5, max_distance=50.0)

    class T:
        def __init__(self, x, y):
            self.location = type("L", (), {"x": x, "y": y})()

    plan = [(T(float(i * 5), 0.0), i) for i in range(10)]
    rp.set_route(plan, gps=False)
    # standing at x=12 -> points within 7.5m get popped up to the farthest
    route = rp.run_step(np.array([12.0, 0.0]))
    assert route[0][1] >= 1
    assert len(route) >= 2


def test_gps_buffer_denoise_static():
    buf = GPSBuffer(maxlen=10)
    true = np.array([5.0, -3.0])
    rng = np.random.default_rng(0)
    for _ in range(10):
        buf.append(true + rng.normal(0, 0.1, 2))
    est = buf.denoised()
    assert np.linalg.norm(est - true) < 0.15


def test_ego_model_straight_and_brake():
    m = EgoModel(dt=0.05)
    locs = np.array([0.0, 0.0])
    yaw = np.array([0.0])
    spd = np.array([10.0])
    act = np.array([0.0, 0.0, 0.0])
    nl, ny, ns = m.forward(locs, yaw, spd, act)
    assert abs(nl[0] - 0.5) < 1e-6 and abs(nl[1]) < 1e-9
    # braking reduces speed
    _, _, ns2 = m.forward(locs, yaw, spd, np.array([0.0, 0.0, 1.0]))
    assert ns2 < spd


def test_obb_intersection_and_iou():
    a = obb_corners(np.array([0.0, 0.0]), np.array([1.0, 1.0]), 0.0)
    b = obb_corners(np.array([1.5, 0.0]), np.array([1.0, 1.0]), 0.0)
    c = obb_corners(np.array([5.0, 0.0]), np.array([1.0, 1.0]), 0.3)
    assert obb_intersect(a, b)
    assert not obb_intersect(a, c)
    # a covers [-1,1]^2, b covers [0.5,2.5]x[-1,1] -> inter 0.5x2=1,
    # union 4+4-1=7 -> IoU 1/7
    assert abs(convex_iou(a, b) - 1.0 / 7.0) < 1e-6
    assert convex_iou(a, c) == 0.0


def test_nms_keeps_highest_confidence():
    mk = lambda cx, conf: (np.concatenate(
        [obb_corners(np.array([cx, 0.0]), np.array([1.0, 0.5]), 0.0),
         np.array([[cx, 0.0], [cx, 0.5]])], axis=0), 0.0, conf)
    member1 = [mk(0.0, 0.9), mk(0.2, 0.5)]   # overlapping pair
    member2 = [mk(6.0, 0.8)]                  # far away
    kept = non_maximum_suppression([member1, member2], iou_threshold=0.2)
    assert len(kept) == 2
    assert abs(kept[0][4, 0] - 0.0) < 1e-9  # highest conf first


def test_safety_box_count():
    cfg = ControllerConfig()
    pts = np.array([
        [0.0, -1.0, -1.5],   # inside
        [0.0, -1.0, 0.0],    # above z range
        [5.0, -1.0, -1.5],   # outside x
    ])
    assert num_points_in_safety_box(pts, cfg) == 1


def test_bb_frontal_collision():
    cfg = ControllerConfig()
    # Detection dead ahead at 3m.
    corners = obb_corners(np.array([3.0, 0.0]), np.array([2.0, 1.0]), 0.0)
    det = np.concatenate([corners, np.array([[3.0, 0.0], [3.0, 1.0]])], 0)
    assert bb_detected_in_front_of_vehicle([det], ego_speed=5.0, config=cfg)
    far = obb_corners(np.array([30.0, 0.0]), np.array([2.0, 1.0]), 0.0)
    det_far = np.concatenate([far, np.array([[30.0, 0.0], [30.0, 1.0]])], 0)
    assert not bb_detected_in_front_of_vehicle([det_far], 5.0, cfg)


def test_stuck_detector_cycle():
    cfg = ControllerConfig()
    sd = StuckDetector(cfg)
    for _ in range(int(cfg.stuck_threshold) + 1):
        sd.update(speed=0.0)
    assert sd.is_stuck
    # creep consumes forced moves
    for _ in range(int(cfg.creep_duration)):
        assert sd.consume_forced_move()
    assert not sd.consume_forced_move()
