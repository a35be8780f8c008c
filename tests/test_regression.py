"""Golden-trajectory regression tests.

The reference's parity criterion is trajectory reproduction within
tolerance (BASELINE.md). Since acados isn't available in this image,
the guard is a golden snapshot: fixed scenarios solved on the CPU
backend, committed as .npz, asserted within tolerance on every run —
any numerical regression in dynamics, modules, linearization, or the QP
shows up here. Regenerate deliberately with:
    python tests/test_regression.py --regen
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # >20 s/test on CPU; fast tier skips

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _solve_goal_scenario():
    from mpc_planner_tpu.models import SecondOrderUnicycleModel
    from mpc_planner_tpu.modules import GoalModule, ModuleManager, MPCBaseModule
    from mpc_planner_tpu.parameters import ParameterBlock
    from mpc_planner_tpu.solver import OCP, SQPSolver
    from mpc_planner_tpu.solver.warmstart import initialize_with_state
    from mpc_planner_tpu.types import ModuleData, RealTimeData, State
    from mpc_planner_tpu.utils.config import default_config

    cfg = default_config(N=15)
    model = SecondOrderUnicycleModel()
    mgr = ModuleManager()
    base = mgr.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mgr.add_module(GoalModule(cfg))
    ocp = OCP(model, mgr, cfg)
    solver = SQPSolver(ocp)
    data = RealTimeData()
    data.goal = np.array([6.0, 2.0])
    data.goal_received = True
    pblock = ParameterBlock(ocp.params, cfg.N + 1)
    mgr.set_parameters_all(data, ModuleData(), pblock)
    state = State(model)
    state.set("v", 0.5)
    Z0 = initialize_with_state(model, cfg.N, state)
    res = solver.solve(Z0, pblock.data, state.as_array(), num_iterations=10)
    return np.asarray(res.Z)


def _solve_tmpc_scenario():
    from mpc_planner_tpu.planner import Planner
    from mpc_planner_tpu.presets import configuration_tmpc, corridor_scene
    from mpc_planner_tpu.utils.config import default_config

    cfg = default_config(N=15)
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = corridor_scene(cfg, n_pedestrians=6, seed=7)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
    return planner._Z.copy()


def _solve_tmpc_n30_scenario():
    """Flagship rung at the reference jackalsimulator's horizon (N=30 @
    dt=0.2, settings.yaml:2-3) — the config the parity net was missing
    (VERDICT r3 #4)."""
    from mpc_planner_tpu.planner import Planner
    from mpc_planner_tpu.presets import configuration_tmpc, corridor_scene
    from mpc_planner_tpu.utils.config import default_config

    cfg = default_config(N=30)
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = corridor_scene(cfg, n_pedestrians=6, seed=7)
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
    return planner._Z.copy()


SCENARIOS = {
    "goal_tracking": _solve_goal_scenario,
    "tmpc_corridor": _solve_tmpc_scenario,
    "tmpc_corridor_n30": _solve_tmpc_n30_scenario,
}


@pytest.mark.parametrize("name", sorted(SCENARIOS))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file missing; run: python {__file__} --regen")
    Z = SCENARIOS[name]()
    golden = np.load(path)["Z"]
    assert Z.shape == golden.shape
    # Position tolerance (the BASELINE 'within tolerance' criterion)
    err = np.abs(Z - golden).max()
    assert err < 5e-3, f"golden mismatch for {name}: max err {err}"


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    if "--regen" in sys.argv:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, fn in SCENARIOS.items():
            path = os.path.join(GOLDEN_DIR, f"{name}.npz")
            if os.path.exists(path) and "--force" not in sys.argv:
                # Existing goldens stay as the historical anchor; only
                # missing scenarios are generated (pass --force to
                # deliberately re-baseline everything).
                print(f"kept existing {name}")
                continue
            Z = fn()
            np.savez(path, Z=Z)
            print(f"saved {name}: shape {Z.shape}")
