"""T-MPC++ guidance constraints — the flagship module.

Ref symbolic half mpc_planner_modules/scripts/guidance_constraints.py:23-110
(one halfspace per obstacle w.r.t. the robot point + an embedded safety
submodule, default ellipsoid), runtime half
mpc_planner_modules/src/guidance_constraints.cpp (guidance PRM :106,
homotopy-preserving planner mapping :192-250, OpenMP parallel solves :279,
consistency bonus :358-359, best-feasible selection :416-434).

TPU-native redesign: where the reference copies the solver `n_paths+1`
times and runs OpenMP threads, here the *batch axis* of the vmapped SQP
solver carries all planners at once — each batch element gets its own
warmstart (from a guidance trajectory) and its own halfspace parameters
(linearized w.r.t. that guidance trajectory). Selection is an argmin over
the batch with the consistency weighting. Scales from the reference's 5
parallel problems to thousands without code changes.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from mpc_planner_tpu.modules.base import BoundModel, ConstraintModule
from mpc_planner_tpu.modules.ellipsoid_constraints import EllipsoidConstraintModule
from mpc_planner_tpu.parameters import ParameterBlock, ParameterRegistry


class GuidanceConstraintModule(ConstraintModule):
    module_name = "GuidanceConstraints"
    description = "T-MPC++: parallel homotopy-class MPC over a batch axis"

    def __init__(self, cfg, constraint_submodule=None):
        self.cfg = cfg
        self.max_obstacles = cfg.max_obstacles
        self.n_other_halfspaces = cfg.linearized_add_halfspaces
        self.nh_own = self.max_obstacles + self.n_other_halfspaces
        submodule_cls = constraint_submodule or EllipsoidConstraintModule
        self.submodule = submodule_cls(cfg)
        self.use_tmpc_pp = cfg.t_mpc.use_tmpc_pp
        self.enable_constraints = cfg.t_mpc.enable_constraints
        self.n_planners = cfg.t_mpc.n_paths + (1 if self.use_tmpc_pp else 0)
        # Set by the planner/guidance layer each cycle:
        self.guidance = None  # GuidancePlanner instance
        self._selected_class = -1

    def define_parameters(self, params: ParameterRegistry) -> None:
        # Own halfspaces (ref guidance_constraints.py:70-80): note the
        # reference uses names WITHOUT a disc prefix here.
        for i in range(self.nh_own):
            params.add(f"lin_constraint_{i}_a1", bundle_name="lin_constraint_a1")
            params.add(f"lin_constraint_{i}_a2", bundle_name="lin_constraint_a2")
            params.add(f"lin_constraint_{i}_b", bundle_name="lin_constraint_b")
        self.submodule.define_parameters(params)

    def lower_bounds(self):
        return [-np.inf] * self.nh_own + list(self.submodule.lower_bounds())

    def upper_bounds(self):
        return [0.0] * self.nh_own + list(self.submodule.upper_bounds())

    def constraints(self, model: BoundModel, params: ParameterRegistry, cfg, stage_idx: int):
        pos_x, pos_y = model.get("x"), model.get("y")
        out = []
        for i in range(self.nh_own):
            a1 = params.get(f"lin_constraint_{i}_a1")
            a2 = params.get(f"lin_constraint_{i}_a2")
            b = params.get(f"lin_constraint_{i}_b")
            out.append(a1 * pos_x + a2 * pos_y - b)
        out.extend(self.submodule.constraints(model, params, cfg, stage_idx))
        return out

    # -- host half ---------------------------------------------------------
    # The batched optimize() is orchestrated by the Planner together with
    # the guidance layer (mpc_planner_tpu/guidance/) and the batched solver;
    # see planner.py. This module fills the *shared* (safety submodule)
    # parameters; per-planner halfspaces are filled by the batched
    # machinery in planner.py/t_mpc.py.

    def set_parameters(self, data, module_data, pblock: ParameterBlock) -> None:
        # Default fill: inactive own halfspaces + submodule parameters.
        n_stages = pblock.n_stages
        pblock.set_bundle_all_stages("lin_constraint_a1", np.zeros((n_stages, self.nh_own)))
        pblock.set_bundle_all_stages("lin_constraint_a2", np.zeros((n_stages, self.nh_own)))
        pblock.set_bundle_all_stages("lin_constraint_b", np.full((n_stages, self.nh_own), 100.0))
        self.submodule.set_parameters(data, module_data, pblock)

    def is_data_ready(self, data):
        return self.submodule.is_data_ready(data)

    def on_data_received(self, data, data_name: str) -> None:
        self.submodule.on_data_received(data, data_name)
