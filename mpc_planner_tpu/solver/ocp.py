"""OCP assembly: modules + model + registry -> pure stage functions.

TPU-native collapse of the reference's offline codegen pipeline
(solver_generator/generate_solver.py:13-61 + solver_definition.py:5-77):
instead of emitting C through CasADi/acados, the module expressions are
plain JAX functions and "solver generation" is jit tracing. The
parameter/model maps (parameter_map.yaml / model_map.yaml contract,
solver_generator/util/parameters.py:69-74, solver_model.py:118-128)
become in-memory registries.

Stage convention (acados-equivalent, generate_acados_solver.py:41-52):
  * running cost  at stages 0..N-1 (expression built with stage_idx=1)
  * terminal cost at node N        (expression built with stage_idx=N-1,
                                    evaluated on x_N with u = 0)
  * h-constraints at stages 0..N-1
  * box bounds: u at 0..N-1, x at 1..N (x_0 fixed to xinit)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mpc_planner_tpu.modules.base import BoundModel, ModuleManager
from mpc_planner_tpu.parameters import ParameterRegistry


class OCP:
    """Static OCP specification + traced stage functions."""

    def __init__(self, model, modules: ModuleManager, cfg):
        self.model = model
        self.modules = modules
        self.cfg = cfg
        self.N = cfg.N
        self.dt = cfg.integrator_step
        self.nu = model.nu
        self.nx = model.nx
        self.nvar = model.nvar
        self.num_segments = cfg.contouring.num_segments

        # Parameter registry (offline half of every module)
        self.params = ParameterRegistry()
        modules.define_parameters(self.params)
        self.params.freeze()
        self.npar = max(self.params.npar, 1)

        # Constraint bounds (solver_definition.py:60-77)
        self.lh = modules.constraint_lower_bounds()
        self.uh = modules.constraint_upper_bounds()
        self.nh = len(self.lh)

        # Box bounds over z
        self.lb_z = np.asarray(model.lower_bound, dtype=float)
        self.ub_z = np.asarray(model.upper_bound, dtype=float)

    # -- traced stage functions ------------------------------------------
    def running_cost(self, z, p):
        """Stage cost (stage_idx=1 expression, applied at k=0..N-1)."""
        bound = BoundModel(self.model, z)
        params = self.params.bind(p)
        return jnp.asarray(self.modules.objective(bound, params, self.cfg, 1))

    def terminal_cost(self, z, p):
        """Terminal cost (stage_idx=N-1 expression, applied at node N)."""
        bound = BoundModel(self.model, z)
        params = self.params.bind(p)
        return jnp.asarray(self.modules.objective(bound, params, self.cfg, self.cfg.N - 1))

    def constraint_fn(self, z, p):
        """h(z, p) [nh] (stage_idx=1 expression)."""
        bound = BoundModel(self.model, z)
        params = self.params.bind(p)
        hs = self.modules.constraints(bound, params, self.cfg, 1)
        if not hs:
            return jnp.zeros((0,))
        return jnp.stack([jnp.asarray(h) for h in hs])

    def dynamics_fn(self, z, p):
        """x_{k+1} = F(z_k; p_k) via RK4 (+ model discrete update)."""
        return self.model.discrete_dynamics(z, p, self.dt, num_steps=3, ocp=self)

    def total_cost(self, Z, P):
        """Nonlinear objective of a trajectory Z [N+1, nvar], P [N+1, npar]."""
        run = jax.vmap(self.running_cost)(Z[: self.N], P[: self.N])
        zN = Z[self.N].at[: self.nu].set(0.0)
        return jnp.sum(run) + self.terminal_cost(zN, P[self.N])

    def rollout(self, x0, U, P):
        """Forward simulate controls U [N, nu] from x0 [nx] -> X [N+1, nx]."""

        def step(x, inp):
            u, p = inp
            z = jnp.concatenate([u, x])
            x_next = self.dynamics_fn(z, p)
            return x_next, x_next

        _, X = jax.lax.scan(step, x0, (U, P[: self.N]))
        return jnp.concatenate([x0[None], X], axis=0)

    def eq_residual(self, Z, P):
        """max_k |F(z_k) - x_{k+1}|_inf (acados res_eq analog,
        acados_solver_interface.cpp:176-181)."""
        x_next = jax.vmap(self.dynamics_fn)(Z[: self.N], P[: self.N])
        return jnp.max(jnp.abs(x_next - Z[1:, self.nu :]))

    def save_maps(self) -> Tuple[dict, dict, dict]:
        """The three generated-YAML contracts (solver_settings /
        parameter_map / model_map; generate_solver.py:38-46)."""
        solver_settings = {
            "N": self.N,
            "nx": self.nx,
            "nu": self.nu,
            "nvar": self.nvar,
            "npar": self.npar,
        }
        return solver_settings, self.params.save_map(), self.model.save_map()
