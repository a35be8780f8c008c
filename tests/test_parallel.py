"""Sharding / multi-device tests on the 8-device CPU mesh (the driver's
dryrun uses the same path) + live weight-tuning parity."""

import jax
import jax.numpy as jnp
import numpy as np

from mpc_planner_tpu.parallel.mesh import argmin_objective, batch_mesh, shard_batch, sharded_solve_fn


def test_mesh_and_sharding():
    mesh = batch_mesh()
    assert mesh.devices.size == len(jax.devices())
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding.num_devices == len(jax.devices())
    np.testing.assert_allclose(np.asarray(xs), x)


def test_argmin_objective_selection():
    pobj = jnp.asarray([5.0, 3.0, 7.0, 4.0])
    feasible = jnp.asarray([True, False, True, True])
    idx, found = argmin_objective(pobj, feasible)
    assert bool(found) and int(idx) == 3  # 3.0 infeasible, 4.0 wins
    # consistency bonus flips selection
    idx2, _ = argmin_objective(pobj, feasible, consistency_weight=0.5,
                               previous_selected=2)
    assert int(idx2) == 2  # 7.0 * 0.5 = 3.5 < 4.0
    # all infeasible
    _, found3 = argmin_objective(pobj, jnp.zeros(4, bool))
    assert not bool(found3)


def test_sharded_solve_runs(cfg):
    """Full sharded batched solve over the virtual mesh."""
    from mpc_planner_tpu.models import SecondOrderUnicycleModel
    from mpc_planner_tpu.modules import GoalModule, ModuleManager, MPCBaseModule
    from mpc_planner_tpu.parameters import ParameterBlock
    from mpc_planner_tpu.solver import OCP, SQPSolver
    from mpc_planner_tpu.solver.warmstart import initialize_with_state
    from mpc_planner_tpu.types import ModuleData, RealTimeData, State

    model = SecondOrderUnicycleModel()
    mgr = ModuleManager()
    base = mgr.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    mgr.add_module(GoalModule(cfg))
    ocp = OCP(model, mgr, cfg)
    solver = SQPSolver(ocp)

    data = RealTimeData()
    data.goal = np.array([3.0, 0.0])
    data.goal_received = True
    pblock = ParameterBlock(ocp.params, cfg.N + 1)
    mgr.set_parameters_all(data, ModuleData(), pblock)
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)

    B = 2 * len(jax.devices())
    mesh = batch_mesh()
    Z0b, Pb, xb = shard_batch(
        mesh,
        (
            np.tile(Z0[None], (B, 1, 1)).astype(np.float32),
            np.tile(pblock.data[None], (B, 1, 1)).astype(np.float32),
            np.tile(state.as_array()[None], (B, 1)).astype(np.float32),
        ),
    )
    fn = sharded_solve_fn(solver, mesh, num_iterations=2)
    res = fn(Z0b, Pb, xb)
    assert res.Z.shape[0] == B
    assert np.all(np.asarray(res.exit_code) == 1)
    # identical problems -> identical solutions across shards
    np.testing.assert_allclose(np.asarray(res.Z[0]), np.asarray(res.Z[-1]), atol=1e-5)


def test_live_weight_tuning_no_recompile(cfg):
    """Changing weights only changes parameter values (the reference's
    rqt_reconfigure -> CONFIG['weights'] live path) — same compiled fn."""
    from mpc_planner_tpu.planner import Planner
    from mpc_planner_tpu.presets import configuration_basic, corridor_scene

    model, modules = configuration_basic(cfg)
    planner = Planner(model, modules, cfg)
    state, data = corridor_scene(cfg, n_pedestrians=2, seed=1)
    planner.on_data_received(data, "reference_path")
    out1 = planner.solve_mpc(state, data)
    n_compiled = len(planner.solver._compiled)

    # Live-tune: heavier velocity tracking
    new_cfg = cfg.with_weights(velocity=2.0)
    for m in modules:
        m.cfg = new_cfg
    out2 = planner.solve_mpc(state, data)
    assert len(planner.solver._compiled) == n_compiled  # no recompilation
    if out1.success and out2.success:
        assert abs(out1.pobj - out2.pobj) > 1e-6  # weights took effect


def test_distributed_step_on_virtual_mesh(cfg):
    """Multi-host driver layer on the 8-device virtual mesh (single
    process: every shard local; same code path as a pod slice)."""
    from mpc_planner_tpu.models import SecondOrderUnicycleModel
    from mpc_planner_tpu.modules import GoalModule, ModuleManager, MPCBaseModule
    from mpc_planner_tpu.parallel import (
        batch_mesh,
        distributed_solve_step,
        global_batch_size,
        host_shard_slice,
        host_sharded_batch,
    )
    from mpc_planner_tpu.parameters import ParameterBlock
    from mpc_planner_tpu.solver import OCP, SQPSolver
    from mpc_planner_tpu.solver.warmstart import initialize_with_state
    from mpc_planner_tpu.types import ModuleData, RealTimeData, State

    model = SecondOrderUnicycleModel()
    mgr = ModuleManager()
    base = mgr.add_module(MPCBaseModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mgr.add_module(GoalModule(cfg))
    ocp = OCP(model, mgr, cfg)
    solver = SQPSolver(ocp, iterations=2, qp_iterations=6)

    data = RealTimeData()
    data.goal = np.array([4.0, 0.0])
    data.goal_received = True
    pblock = ParameterBlock(ocp.params, cfg.N + 1)
    mgr.set_parameters_all(data, ModuleData(), pblock)

    B = global_batch_size(16)
    assert host_shard_slice(B) == slice(0, B)  # single process owns all
    state = State(model)
    Z0 = initialize_with_state(model, cfg.N, state)
    rng = np.random.default_rng(3)
    Z0b = np.tile(Z0[None], (B, 1, 1)).astype(np.float32)
    Z0b[:, 1:, model.nu:] += rng.normal(0, 0.03, Z0b[:, 1:, model.nu:].shape)
    Pb = np.tile(pblock.data[None], (B, 1, 1)).astype(np.float32)
    xb = np.tile(np.zeros(model.nx)[None], (B, 1)).astype(np.float32)
    consistency = np.ones(B, np.float32)
    consistency[3] = 0.75  # previously selected class

    mesh = batch_mesh()
    Z0b, Pb, xb, consistency = host_sharded_batch(mesh, (Z0b, Pb, xb, consistency))
    step = distributed_solve_step(solver, mesh, num_iterations=2)
    Zw, idx, found, res = step(Z0b, Pb, xb, consistency)
    assert bool(found)
    assert Zw.shape == (cfg.N + 1, model.nvar)
    assert np.all(np.isfinite(np.asarray(Zw)))
    # Winner equals its row in the batch result
    np.testing.assert_allclose(
        np.asarray(Zw), np.asarray(res.Z)[int(idx)], rtol=1e-6, atol=1e-6
    )
