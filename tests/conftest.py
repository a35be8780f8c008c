"""Test config: force a virtual 8-device CPU mesh (the driver validates
multi-chip sharding the same way; real-TPU benches run via bench.py)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from mpc_planner_tpu.utils.config import default_config


@pytest.fixture
def cfg():
    # Small horizon + few iterations: fast CPU tests
    c = default_config(N=10)
    return c.replace(solver=c.solver.__class__(iterations=4, qp_iterations=10))


@pytest.fixture
def rng():
    return np.random.default_rng(42)
