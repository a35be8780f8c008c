"""Visualization + experiment-recorder tests (ref data_visualization.cpp,
experiment_util.cpp)."""

import json
import os

import numpy as np

from mpc_planner_tpu.planner import Planner
from mpc_planner_tpu.presets import configuration_tmpc, corridor_scene
from mpc_planner_tpu.utils.experiment import ExperimentUtil
import pytest

pytestmark = pytest.mark.slow  # >20 s/test on CPU; fast tier skips


def test_planner_visualize_collects_artifacts(cfg):
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = corridor_scene(cfg, n_pedestrians=4, seed=2)
    planner.on_data_received(data, "reference_path")
    planner.solve_mpc(state, data)
    viz = planner.visualize(state, data)
    kinds = {a["type"] for a in viz.artifacts}
    assert "obstacles" in kinds
    assert "prediction_ellipses" in kinds
    assert "discs" in kinds
    # JSON round-trips
    parsed = json.loads(viz.to_json())
    assert isinstance(parsed, list) and parsed


def test_experiment_util_records_and_exports(cfg, tmp_path):
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = corridor_scene(cfg, n_pedestrians=2, seed=1)
    planner.on_data_received(data, "reference_path")

    exp = ExperimentUtil(cfg, save_folder=str(tmp_path))
    exp.num_experiments = 1
    for _ in range(3):
        planner.solve_mpc(state, data)
        exp.update(state, planner, data, runtime_s=0.01)
    exp.on_task_complete(objective_reached=False)

    path = os.path.join(str(tmp_path), f"{cfg.name}_experiment.json")
    assert os.path.exists(path)
    with open(path) as f:
        out = json.load(f)
    assert out["summary"]["num_experiments"] == 1
    assert out["data"][0]["iterations"] == 3
    assert len(out["data"][0]["metrics"][0]["obstacles"]) == 2  # non-dummies only


def test_module_save_data_hook(cfg, tmp_path):
    """Per-module saveData chain (ref controller_module.h:120-125):
    the guidance module's selection metrics land in each iteration
    record."""
    model, modules = configuration_tmpc(cfg)
    planner = Planner(model, modules, cfg)
    state, data = corridor_scene(cfg, n_pedestrians=2, seed=1)
    planner.on_data_received(data, "reference_path")

    exp = ExperimentUtil(cfg, save_folder=str(tmp_path))
    planner.solve_mpc(state, data)
    exp.update(state, planner, data, runtime_s=0.01)

    rec = exp.iteration_data[0]
    assert "modules" in rec
    m = rec["modules"]
    assert m["guidance_n_planners"] >= 2
    assert 0 <= m["guidance_selected_planner"] < m["guidance_n_planners"]
    assert 1 <= m["guidance_n_feasible"] <= m["guidance_n_planners"]
