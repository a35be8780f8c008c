"""External-process bridge: a REAL second OS process runs the planner
behind the socket protocol (bridge.py), and this test drives a closed
control loop over it — exercising the L6 system-layer surface the way
the reference's ROS topic interface is exercised by its simulator
(ros1_jackalsimulator.cpp:58-103)."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # spawns a second planner process; fast tier skips

SERVER_SCRIPT = """
import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
from mpc_planner_tpu import default_config
from mpc_planner_tpu.models import SecondOrderUnicycleModel
from mpc_planner_tpu.modules import ModuleManager, MPCBaseModule, GoalModule
from mpc_planner_tpu.modules import EllipsoidConstraintModule
from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.bridge import PlannerBridgeServer

cfg = default_config(N=10)
cfg = cfg.replace(solver=cfg.solver.__class__(iterations=4, qp_iterations=8))
model = SecondOrderUnicycleModel()
mgr = ModuleManager()
base = mgr.add_module(MPCBaseModule(cfg))
base.weigh_variable("a", "acceleration")
base.weigh_variable("w", "angular_velocity")
mgr.add_module(GoalModule(cfg))
mgr.add_module(EllipsoidConstraintModule(cfg))
planner = Planner(model, mgr, cfg)
server = PlannerBridgeServer(planner, cfg, address={addr!r})
print("READY", flush=True)
server.serve_forever()
"""


@pytest.fixture
def bridge_server(tmp_path):
    addr = str(tmp_path / "bridge.sock")
    script = SERVER_SCRIPT.format(repo=REPO, addr=addr)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO,
    )
    line = proc.stdout.readline()
    if "READY" not in line:
        rest = proc.stdout.read()
        proc.kill()
        raise RuntimeError(f"server failed to start: {line}{rest}")
    yield addr, proc
    if proc.poll() is None:
        proc.kill()
    proc.wait()


def test_bridge_closed_loop(bridge_server):
    from mpc_planner_tpu.bridge import PlannerBridgeClient
    from mpc_planner_tpu.msgs import GaussianMsg, ObstacleGMMMsg

    addr, proc = bridge_server
    client = PlannerBridgeClient(addr, timeout=300.0)
    assert client.ping()

    assert client.set_goal([4.0, 0.0])["type"] == "ok"

    # One static obstacle off to the side, via the ObstacleGMM schema
    N = 10
    obst = ObstacleGMMMsg(
        id=0, pose_x=2.0, pose_y=1.5, radius=0.4,
        gaussians=[GaussianMsg(
            mean_x=[2.0] * N, mean_y=[1.5] * N,
            major_semiaxis=[0.1] * N, minor_semiaxis=[0.1] * N,
        )],
        probabilities=[1.0],
    )
    assert client.send_obstacles([obst])["type"] == "ok"

    # Euler-integrate the unicycle against the planner's commands
    x, y, psi, v = 0.0, 0.0, 0.0, 0.0
    dt = 0.2
    reached = False
    for i in range(60):
        resp = client.tick([x, y, psi], v)
        assert resp["type"] == "command", resp
        assert resp["success"], f"infeasible at cycle {i}: {resp}"
        assert len(resp["trajectory"]) > 0
        v = resp["v"]
        psi += resp["w"] * dt
        x += v * np.cos(psi) * dt
        y += v * np.sin(psi) * dt
        if resp["objective_reached"]:
            reached = True
            break
    assert reached or np.hypot(x - 4.0, y) < 1.0, (x, y)

    # Reset + flipped-robot guard path
    assert client.reset()["type"] == "ok"
    assert client.set_goal([1.0, 0.0])["type"] == "ok"
    resp = client.tick([0.0, 0.0, 0.0], 0.0, roll=3.0)
    assert resp["success"] is False and resp["v"] == 0.0

    assert client.shutdown()["type"] == "ok"
    proc.wait(timeout=30)
    assert proc.returncode == 0


def test_bridge_error_handling(bridge_server):
    from mpc_planner_tpu.bridge import PlannerBridgeClient

    addr, proc = bridge_server
    client = PlannerBridgeClient(addr, timeout=300.0)
    resp = client.request({"type": "no_such_thing"})
    assert resp["type"] == "error"
    # Malformed JSON doesn't kill the server
    client.sock.sendall(b"{not json\n")
    line = client.reader.readline()
    assert json.loads(line)["type"] == "error"
    assert client.ping()
    client.shutdown()
