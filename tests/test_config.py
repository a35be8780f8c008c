"""Config tree tests (ref CONFIG yaml singleton, settings.yaml layout)."""

import numpy as np

from mpc_planner_tpu.utils.config import Config, default_config, load_config
from mpc_planner_tpu.utils.profiling import Profiler


def test_defaults_mirror_reference_settings():
    cfg = default_config()
    # (ref mpc_planner_jackalsimulator/config/settings.yaml)
    assert cfg.N == 30
    assert cfg.integrator_step == 0.2
    assert cfg.max_obstacles == 12
    assert cfg.robot_radius == 0.325
    assert cfg.control_frequency == 20
    assert cfg.weights["contour"] == 0.05
    assert cfg.weights["lag"] == 0.75
    assert cfg.t_mpc.n_paths == 4
    assert cfg.scenario_constraints.parallel_solvers == 4


def test_load_config_from_dict_nested():
    cfg = load_config(data={
        "N": 15,
        "contouring": {"num_segments": 8},
        "t-mpc": {"use_t-mpc++": False},
        "weights": {"contour": 0.2},
    })
    assert cfg.N == 15
    assert cfg.contouring.num_segments == 8
    assert not cfg.t_mpc.use_tmpc_pp
    assert cfg.weights["contour"] == 0.2
    assert cfg.weights["lag"] == 0.75  # merged, not replaced


def test_load_config_from_yaml(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text("N: 12\nrobot_radius: 0.5\nroad:\n  width: 8.0\n")
    cfg = load_config(str(p))
    assert cfg.N == 12
    assert cfg.robot_radius == 0.5
    assert cfg.road.width == 8.0


def test_with_weights_immutable():
    cfg = default_config()
    cfg2 = cfg.with_weights(contour=1.0)
    assert cfg.weights["contour"] == 0.05
    assert cfg2.weights["contour"] == 1.0


def test_profiler_chrome_trace(tmp_path):
    import json

    prof = Profiler()
    prof.record_trace = True
    with prof.scope("planning"):
        with prof.scope("optimization"):
            pass
    path = tmp_path / "trace.json"
    prof.export_chrome_trace(str(path))
    trace = json.loads(path.read_text())
    names = [e["name"] for e in trace["traceEvents"]]
    assert "planning" in names and "optimization" in names
    assert prof.stats["planning"].count == 1
    assert "planning" in prof.summary()
