"""BridgeAgent (reference ros_agent.py equivalent): an external driving
stack attached to the message bus steers the ego through the hermetic
closed-loop harness."""

import json
import os

import numpy as np
import pytest

from transfuser_tpu.agents.bridge_agent import (CLOCK_TOPIC, CONTROL_TOPIC,
                                                PLAN_TOPIC, BridgeAgent,
                                                LocalBus)
from transfuser_tpu.harness.evaluator import Evaluator, EvaluatorArgs
from transfuser_tpu.harness.route_parser import RouteConfig


class _EchoStack:
    """Minimal external stack: on every camera frame, steer toward the
    next plan pose and drive at constant throttle."""

    def __init__(self, bus: LocalBus):
        self.bus = bus
        self.frames = 0
        self.clocks = []
        self.plan = None
        bus.subscribe(CLOCK_TOPIC, lambda m: self.clocks.append(m["clock"]))
        bus.subscribe(PLAN_TOPIC, self._on_plan)
        bus.subscribe("/carla/ego_vehicle/camera/rgb/rgb/image",
                      self._on_camera)

    def _on_plan(self, msg):
        self.plan = msg["poses"]

    def _on_camera(self, msg):
        self.frames += 1
        self.bus.publish(CONTROL_TOPIC,
                         {"throttle": 0.6, "steer": 0.0, "brake": 0.0})


class _TestBridgeAgent(BridgeAgent):
    bus_instance = None

    def make_bus(self, path_to_conf_file):
        return type(self).bus_instance


@pytest.fixture()
def routes(tmp_path):
    xml = tmp_path / "routes.xml"
    xml.write_text(
        '<?xml version="1.0"?><routes>'
        '<route id="0" town="grid_town">'
        '<waypoint x="12.0" y="-1.75" z="0" yaw="0" pitch="0" roll="0"/>'
        '<waypoint x="70.0" y="-1.75" z="0" yaw="0" pitch="0" roll="0"/>'
        '</route></routes>')
    scen = tmp_path / "scen.json"
    scen.write_text(json.dumps({"available_scenarios": []}))
    return str(xml), str(scen)


def test_bridge_agent_closed_loop(tmp_path, routes):
    xml, scen = routes
    bus = LocalBus()
    stack = _EchoStack(bus)
    _TestBridgeAgent.bus_instance = bus

    result = Evaluator(EvaluatorArgs(
        routes=xml, scenarios=scen,
        agent_factory=lambda cfg: _TestBridgeAgent(),
        checkpoint=str(tmp_path / "results.json"),
        max_game_seconds=20.0, town_map="grid",
        print_route_table=False)).run()
    scores = result.get("scores", result)

    # the stack saw the topic surface...
    assert stack.frames > 10
    assert stack.clocks and stack.clocks == sorted(stack.clocks)
    assert stack.plan and len(stack.plan) >= 2
    # ...and its controls actually drove the ego along the route
    assert scores["score_route"] > 20.0


def test_stepping_mode_requires_control():
    bus = LocalBus()
    _TestBridgeAgent.bus_instance = bus
    agent = _TestBridgeAgent()
    agent.stepping = True
    agent._step_mode_possible = True
    agent.control_timeout = 0.05
    with pytest.raises(RuntimeError, match="no control"):
        agent.run_step({"rgb": (0, np.zeros((4, 4, 3)))}, 0.05)
    # a stack that answers the sensor frame unblocks the step (the
    # event must be set DURING the step — a pre-step control is stale,
    # ros_agent.py:414 clears the event at step start)
    bus.subscribe("/carla/ego_vehicle/camera/rgb/rgb/image",
                  lambda m: bus.publish(CONTROL_TOPIC,
                                        {"throttle": 0.3, "steer": 0.1}))
    ctrl = agent.run_step({"rgb": (1, np.zeros((4, 4, 3)))}, 0.1)
    assert ctrl.throttle == pytest.approx(0.3)
    assert ctrl.steer == pytest.approx(0.1)
