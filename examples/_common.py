"""Shared example setup: default to CPU so examples run in seconds.

Set EXAMPLES_TPU=1 to keep the default JAX backend (e.g. the real TPU).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def setup(cpu_devices: int = 0):
    if os.environ.get("EXAMPLES_TPU") == "1":
        return
    if cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={cpu_devices}"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
