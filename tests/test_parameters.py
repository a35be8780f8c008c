"""Parameter registry tests (model: reference solver_generator/test/
test_base_classes.py:13-90)."""

import numpy as np
import pytest

from mpc_planner_tpu.parameters import ParameterBlock, ParameterRegistry


def test_add_and_index():
    reg = ParameterRegistry()
    reg.add("alpha")
    reg.add("beta")
    reg.add("alpha")  # idempotent
    assert reg.npar == 2
    assert reg.index("alpha") == 0
    assert reg.index("beta") == 1


def test_bundles():
    reg = ParameterRegistry()
    for i in range(3):
        reg.add(f"spline_x{i}_a", bundle_name="spline_x_a")
    reg.add("other")
    assert list(reg.bundle_indices("spline_x_a")) == [0, 1, 2]


def test_save_map_roundtrip():
    reg = ParameterRegistry()
    reg.add("p0")
    reg.add("p1")
    m = reg.save_map()
    assert m == {"p0": 0, "p1": 1}


def test_freeze():
    reg = ParameterRegistry()
    reg.add("a")
    reg.freeze()
    with pytest.raises(RuntimeError):
        reg.add("b")


def test_bound_params():
    reg = ParameterRegistry()
    reg.add("a")
    reg.add("b")
    view = reg.bind(np.array([1.5, 2.5]))
    assert view.get("a") == 1.5
    assert view.get("b") == 2.5
    assert view.has_parameter("a") and not view.has_parameter("c")


def test_parameter_block_fill():
    reg = ParameterRegistry()
    reg.add("w")
    for i in range(3):
        reg.add(f"s{i}", bundle_name="s")
    blk = ParameterBlock(reg, 5)
    blk.set_all_stages("w", 2.0)
    blk.set_bundle_all_stages("s", np.array([1.0, 2.0, 3.0]))
    assert np.all(blk.data[:, 0] == 2.0)
    assert np.all(blk.data[:, 1:] == np.array([1.0, 2.0, 3.0]))
    blk.set_bundle_all_stages("s", np.arange(15).reshape(5, 3))
    assert blk.get(2, "s1") == 7.0


def test_solver_maps_contract(cfg, tmp_path):
    """The three generated-map YAMLs (ref generate_solver.py:38-46,
    util/parameters.py:69-74, solver_model.py:118-128) round-trip."""
    import yaml

    from mpc_planner_tpu.models import ContouringSecondOrderUnicycleModel
    from mpc_planner_tpu.modules import (
        ContouringModule, EllipsoidConstraintModule, ModuleManager, MPCBaseModule,
    )
    from mpc_planner_tpu.solver import OCP
    from mpc_planner_tpu.solver.maps import save_solver_maps

    model = ContouringSecondOrderUnicycleModel()
    mgr = ModuleManager()
    base = mgr.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    mgr.add_module(ContouringModule(cfg))
    mgr.add_module(EllipsoidConstraintModule(cfg))
    ocp = OCP(model, mgr, cfg)

    paths = save_solver_maps(str(tmp_path), model, ocp)
    settings = yaml.safe_load(open(paths["solver_settings"]))
    assert settings["N"] == cfg.N
    assert settings["nx"] == 5 and settings["nu"] == 2 and settings["nvar"] == 7
    assert settings["nh"] == cfg.max_obstacles * cfg.n_discs

    pmap = yaml.safe_load(open(paths["parameter_map"]))
    assert pmap == ocp.params.save_map()
    assert len(pmap) == settings["npar"]

    mmap = yaml.safe_load(open(paths["model_map"]))
    assert mmap["x"][0] == "x" and mmap["a"][0] == "u"
    assert mmap["spline"][1] == model.index("spline")
