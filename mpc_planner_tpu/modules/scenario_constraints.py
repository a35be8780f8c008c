"""Scenario-based constraints (SH-MPC).

Ref symbolic half mpc_planner_modules/scripts/scenario_constraints.py:14-94
(24 halfspaces x n_discs with slack), runtime half
mpc_planner_modules/src/scenario_constraints.cpp + the external
scenario_module (SURVEY.md §2.4): per-solver scenario sample draws,
support-subsample selection, parallel solves, best-cost selection.

TPU-native redesign: scenario sample draws and the reduction of samples
to the tightest `n_constraints` halfspaces per stage are vectorized
device-side; the `parallel_solvers` axis rides the same batch dimension
as T-MPC planners.
"""

from __future__ import annotations

import numpy as np

from mpc_planner_tpu.modules.base import BoundModel, ConstraintModule
from mpc_planner_tpu.parameters import ParameterBlock, ParameterRegistry


class ScenarioConstraintModule(ConstraintModule):
    module_name = "ScenarioConstraints"
    description = "Scenario-based obstacle avoidance under motion uncertainty"

    def __init__(self, cfg):
        self.cfg = cfg
        self.n_discs = cfg.n_discs
        self.n_constraints = cfg.scenario_constraints.n_constraints
        self.num_constraints = self.n_constraints * self.n_discs
        self.use_slack = True

    def define_parameters(self, params: ParameterRegistry) -> None:
        for d in range(self.n_discs):
            params.add(f"ego_disc_{d}_offset", bundle_name="ego_disc_offset")
            for i in range(self.n_constraints):
                params.add(f"disc_{d}_scenario_constraint_{i}_a1", bundle_name="scenario_a1")
                params.add(f"disc_{d}_scenario_constraint_{i}_a2", bundle_name="scenario_a2")
                params.add(f"disc_{d}_scenario_constraint_{i}_b", bundle_name="scenario_b")

    def lower_bounds(self):
        return [-np.inf] * self.num_constraints

    def upper_bounds(self):
        return [0.0] * self.num_constraints

    def constraints(self, model: BoundModel, params: ParameterRegistry, cfg, stage_idx: int):
        import jax.numpy as jnp

        pos_x, pos_y = model.get("x"), model.get("y")
        psi = model.get_or("psi", 0.0)
        slack = model.get_or("slack", 0.0) if self.use_slack else 0.0
        out = []
        for d in range(self.n_discs):
            offset = params.get(f"ego_disc_{d}_offset")
            px = pos_x + offset * jnp.cos(psi)
            py = pos_y + offset * jnp.sin(psi)
            for i in range(self.n_constraints):
                a1 = params.get(f"disc_{d}_scenario_constraint_{i}_a1")
                a2 = params.get(f"disc_{d}_scenario_constraint_{i}_a2")
                b = params.get(f"disc_{d}_scenario_constraint_{i}_b")
                out.append(a1 * px + a2 * py - (b + slack))
        return out

    # -- host half ---------------------------------------------------------
    # Scenario sampling + halfspace construction + the batched parallel
    # solve are orchestrated by the Planner via mpc_planner_tpu/scenario.py;
    # this fills inactive defaults when running without scenario data.

    def set_parameters(self, data, module_data, pblock: ParameterBlock) -> None:
        n_stages = pblock.n_stages
        nC = self.num_constraints
        if data.robot_area:
            pblock.set_bundle_all_stages(
                "ego_disc_offset", np.array([o for o, _ in data.robot_area])
            )
        pblock.set_bundle_all_stages("scenario_a1", np.ones((n_stages, nC)))
        pblock.set_bundle_all_stages("scenario_a2", np.zeros((n_stages, nC)))
        pblock.set_bundle_all_stages("scenario_b", np.full((n_stages, nC), 1e6))

    def is_data_ready(self, data):
        if getattr(data, "obstacle_block", None) is None:
            return False, "Obstacles"
        return True, ""
