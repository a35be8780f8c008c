"""Per-system presets (SURVEY.md §2.3 "System nodes x4"): each reference
robot package's configuration assembles, and representative ones solve."""

import numpy as np
import pytest

from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import SYSTEMS, corridor_scene, select_system
from mpc_planner_tpu.solver import OCP
from mpc_planner_tpu.types import State


ALL_VARIANTS = [
    ("jackalsimulator", "tmpc"),
    ("jackalsimulator", "basic"),
    ("jackalsimulator", "safe_horizon"),
    ("jackalsimulator", "lmpcc"),
    ("jackal", "tmpc"),
    ("jackal", "goal"),
    ("dingo", "tmpc"),
    ("dingo", "lmpcc"),
    ("rosnavigation", "lmpcc"),
    ("rosnavigation", "tmpc"),
    ("rosnavigation", "safe_horizon"),
]


@pytest.mark.parametrize("name,variant", ALL_VARIANTS)
def test_system_preset_assembles(name, variant):
    # Small horizon override keeps OCP construction fast on CPU
    cfg, model, modules = select_system(name, variant=variant, N=8)
    assert cfg.name == name
    ocp = OCP(model, modules, cfg)
    assert ocp.N == 8
    assert ocp.nvar == model.nvar
    # Every listed variant carries at least one constraint module
    assert ocp.nh > 0


def test_system_settings_match_reference():
    """Horizon / step / iteration counts per settings.yaml of each package."""
    cfg, _, _ = select_system("jackalsimulator")
    assert (cfg.N, cfg.dt, cfg.solver.iterations) == (30, 0.2, 10)
    cfg, _, _ = select_system("jackal")
    assert (cfg.N, cfg.dt) == (30, 0.2)
    cfg, _, _ = select_system("dingo")
    assert (cfg.N, cfg.dt) == (30, 0.1)
    cfg, _, _ = select_system("rosnavigation")
    assert (cfg.N, cfg.dt, cfg.solver.iterations) == (20, 0.2, 4)


def test_jackal_tmpc_uses_gaussian_submodule():
    from mpc_planner_tpu.modules import GaussianConstraintModule

    _, _, modules = select_system("jackal", variant="tmpc", N=8)
    gmod = modules.get("GuidanceConstraints")
    assert isinstance(gmod.submodule, GaussianConstraintModule)


def test_dingo_pointmass_solves(cfg):
    """The holonomic point-mass lmpcc variant reaches toward a goal."""
    cfg_d, model, modules = select_system(
        "dingo", variant="lmpcc", N=10,
        solver=cfg.solver.__class__(iterations=4, qp_iterations=10),
    )
    planner = Planner(model, modules, cfg_d)
    state = State(model)
    _, data = corridor_scene(cfg_d, n_pedestrians=2, seed=1)
    data.goal = np.array([3.0, 0.5])
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
    # Plan accelerates toward the goal
    vx = [planner.get_solution(k, "vx") for k in range(cfg_d.N + 1)]
    assert np.isfinite(vx).all()
    assert max(vx) > 0.05


@pytest.mark.slow
def test_rosnavigation_lmpcc_solves(cfg):
    cfg_r, model, modules = select_system(
        "rosnavigation", variant="lmpcc", N=10,
        solver=cfg.solver.__class__(iterations=4, qp_iterations=10),
    )
    planner = Planner(model, modules, cfg_r)
    state = State(model)
    _, data = corridor_scene(cfg_r, n_pedestrians=2, seed=0)
    # Costmap-free scene: decomp module needs an occupancy grid; provide
    # an empty one so its constraints stay inactive.
    data.costmap = np.zeros((40, 40), dtype=np.uint8)
    data.costmap_meta = {"origin_x": -2.0, "origin_y": -4.0, "resolution": 0.2}
    planner.on_data_received(data, "reference_path")
    out = planner.solve_mpc(state, data)
    assert out.success
