"""Smoke-run the examples so they cannot rot.

Only the cheapest example runs in CI time; the others share the same
code paths and are exercised by the module test suites.
"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize(
    "script,expect",
    [
        ("01_goal_tracking.py", "goal reached"),
        pytest.param(
            "05_bridge_external_sim.py", "OK", marks=pytest.mark.slow,
            id="05_bridge_external_sim.py",
        ),
        # Without rclpy installed the relay documents itself and exits 0
        ("06_ros_relay.py", "relay"),
    ],
)
def test_example_runs(script, expect):
    env = dict(os.environ)
    env.pop("EXAMPLES_TPU", None)  # force the CPU path
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", script)],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.join(ROOT, "examples"),
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert expect in proc.stdout
