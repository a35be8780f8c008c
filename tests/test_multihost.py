"""Real multi-process multi-host test of the distributed layer.

Spawns TWO OS processes, each with 4 virtual CPU devices, joined by
`jax.distributed` over a localhost coordinator — the controller-per-host
topology of a TPU pod slice (parallel/distributed.py; SURVEY.md §2.5/§5:
ROS pub/sub between processes → jax.distributed, DCN collectives for the
T-MPC argmin + winner broadcast). Asserts both hosts compute the SAME
winner from disjoint batch shards without either materializing the full
batch.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # >20 s/test on CPU; fast tier skips

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_solve():
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # Escape the axon sitecustomize (forces JAX_PLATFORMS=axon) and any
    # inherited device-count flags; the worker sets its own.
    env.pop("PYTHONPATH", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, "-u", _WORKER, coord, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=_REPO,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    lines = []
    for out in outs:
        got = [ln for ln in out.splitlines() if ln.startswith("MULTIHOST")]
        assert got, f"no MULTIHOST line in: {out}"
        lines.append(got[0].split(" ", 2)[2])  # drop "MULTIHOST <pid>"

    # Identical winner index, feasibility, and replicated trajectory on
    # both hosts.
    assert lines[0] == lines[1], f"hosts disagree: {lines}"
    assert "found=True" in lines[0]
