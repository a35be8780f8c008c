"""MIRROR regularization variants agree (see docs/pallas_mirror_miscompile.md)."""

import numpy as np
import jax.numpy as jnp

from mpc_planner_tpu.ops.jacobi_eigh import mirror_jacobi, mirror_unpacked
import pytest


def _sym_stack(rng, M, n):
    A = rng.normal(size=(M, n, n)).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) * 0.5


def test_mirror_unpacked_matches_jacobi(rng):
    H = jnp.asarray(_sym_stack(rng, 40, 7))
    ref = np.asarray(mirror_jacobi(H, 1e-3))
    out = np.asarray(mirror_unpacked(H, 1e-3))
    assert np.abs(ref - out).max() / np.abs(ref).max() < 5e-3


def test_mirror_unpacked_eigenvalue_floor(rng):
    # Indefinite input -> SPD output with |eig| floored at lm.
    lm = 0.1
    H = _sym_stack(rng, 24, 5)
    out = np.asarray(mirror_unpacked(jnp.asarray(H), lm))
    w = np.linalg.eigvalsh(out)
    assert w.min() >= lm * 0.98
    expect = np.sort(np.maximum(np.abs(np.linalg.eigvalsh(H)), lm), axis=-1)
    np.testing.assert_allclose(np.sort(w, axis=-1), expect, rtol=1e-3, atol=1e-4)


def test_mirror_unpacked_batch_shapes(rng):
    # Works on arbitrary leading batch dims (the SQP path flattens, but
    # the function itself is shape-polymorphic).
    H = jnp.asarray(_sym_stack(rng, 12, 4)).reshape(3, 4, 4, 4)
    out = np.asarray(mirror_unpacked(H, 1e-4))
    assert out.shape == (3, 4, 4, 4)
    ref = np.asarray(mirror_jacobi(H, 1e-4))
    assert np.abs(ref - out).max() / np.abs(ref).max() < 5e-3


@pytest.mark.slow
def test_mirror_structure_probe_and_equivalence(cfg):
    """Stock configs have u-separable cost Hessians; the structured MIRROR
    (x-block-only Jacobi) must give the same solve as the dense path."""
    import numpy as np

    from mpc_planner_tpu.parameters import ParameterBlock
    from mpc_planner_tpu.presets import configuration_tmpc, corridor_scene
    from mpc_planner_tpu.solver import OCP, SQPSolver
    from mpc_planner_tpu.solver.warmstart import initialize_with_state
    from mpc_planner_tpu.types import ModuleData

    model, modules = configuration_tmpc(cfg)
    ocp = OCP(model, modules, cfg)
    s_auto = SQPSolver(ocp)
    assert s_auto._mirror_x_only  # probe detects the structure

    cfg_full = cfg.replace(solver=cfg.solver.__class__(
        iterations=cfg.solver.iterations, qp_iterations=cfg.solver.qp_iterations,
        mirror_structure="full"))
    s_full = SQPSolver(OCP(model, modules, cfg_full))
    assert not s_full._mirror_x_only

    state, data = corridor_scene(cfg, n_pedestrians=4, seed=0)
    md = ModuleData()
    modules.on_data_received(data, "reference_path")
    Z0 = initialize_with_state(model, cfg.N, state)
    md.warmstart = Z0
    md.warmstart_xy = Z0[:, [model.index("x"), model.index("y")]]
    md.warmstart_psi = Z0[:, model.index("psi")]
    md.warmstart_spline = Z0[:, model.index("spline")]
    modules.update_all(state, data, md)
    pblock = ParameterBlock(ocp.params, cfg.N + 1)
    modules.set_parameters_all(data, md, pblock)
    pblock.data[cfg.N] = pblock.data[cfg.N - 1]
    xinit = np.array([state.get(n) for n in model.states])

    r1 = s_auto.solve(Z0, pblock.data, xinit)
    r2 = s_full.solve(Z0, pblock.data, xinit)
    assert int(r1.exit_code) == int(r2.exit_code)
    np.testing.assert_allclose(np.asarray(r1.Z), np.asarray(r2.Z),
                               rtol=1e-5, atol=1e-5)


def test_mirror_structure_probe_rejects_coupled_cost(cfg):
    """A cost coupling an input with a state must defeat the probe."""
    from mpc_planner_tpu.models import SecondOrderUnicycleModel
    from mpc_planner_tpu.modules import GoalModule, ModuleManager, MPCBaseModule
    from mpc_planner_tpu.solver import OCP, SQPSolver

    class CoupledModule(MPCBaseModule):
        def cost(self, model, params, cfg_, stage_idx):
            base = super().cost(model, params, cfg_, stage_idx)
            return base + 0.1 * model.get("a") * model.get("v")

    model = SecondOrderUnicycleModel()
    mgr = ModuleManager()
    base = mgr.add_module(CoupledModule(cfg))
    base.weigh_variable("a", "acceleration")
    base.weigh_variable("w", "angular_velocity")
    mgr.add_module(GoalModule(cfg))
    solver = SQPSolver(OCP(model, mgr, cfg))
    assert not solver._mirror_x_only
