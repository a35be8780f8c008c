"""Planner: one MPC cycle orchestration.

TPU-native equivalent of reference mpc_planner/src/planner.cpp:37-158:
data-ready check -> warmstart choice (shift-forward / braking on previous
infeasibility) -> xinit -> module `update` -> parameter fill ->
solve-budget iteration choice -> module `optimize` override chain
(T-MPC++/SH-MPC) else plain SQP solve -> trajectory extraction.

The timeout budget (planner.cpp:117-118: 1/f - elapsed - 6 ms) maps to a
host-side choice of RTI iteration count: TPU step time is deterministic
once compiled, so remaining-budget / measured-per-iteration-time gives
the iteration cut-off the reference implements inside its solve loop
(acados_solver_interface.cpp:108-116).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from mpc_planner_tpu.data_preparation import define_robot_area
from mpc_planner_tpu.modules.base import ModuleManager
from mpc_planner_tpu.parameters import ParameterBlock
from mpc_planner_tpu.solver.ocp import OCP
from mpc_planner_tpu.solver.sqp import EXIT_SUCCESS, SQPSolver
from mpc_planner_tpu.solver.warmstart import (
    initialize_warmstart,
    initialize_with_braking,
)
from mpc_planner_tpu.types import ModuleData, PlannerOutput, RealTimeData, State
from mpc_planner_tpu.utils.profiling import PROFILER


class Planner:
    """Ref mpc_planner/include/mpc_planner/planner.h:34-68 API."""

    def __init__(self, model, modules: ModuleManager, cfg):
        self.cfg = cfg
        self.model = model
        self.modules = modules
        self.ocp = OCP(model, modules, cfg)
        self.solver = SQPSolver(self.ocp)
        self.N = cfg.N
        self.dt = cfg.integrator_step

        self._Z = np.zeros((self.N + 1, model.nvar))
        self._output = PlannerOutput(self.dt, self.N)
        self._was_feasible = False
        self._was_reset = True
        self._module_data = ModuleData()
        self._iter_time_estimate: Optional[float] = None  # s per RTI iteration

        # Give modules a handle to the solver (the reference passes the
        # shared Solver into each module constructor, modules.h)
        for module in self.modules:
            if hasattr(module, "attach"):
                module.attach(self)

    # -- main cycle (ref planner.cpp:37-158) ------------------------------
    def solve_mpc(self, state: State, data: RealTimeData) -> PlannerOutput:
        was_feasible = self._output.success
        self._output = PlannerOutput(self.dt, self.N)
        self._module_data = ModuleData()
        module_data = self._module_data

        ready, missing = self.modules.is_data_ready(data)
        if not ready:
            self._output.success = False
            self._output.missing_data = missing
            return self._output

        with PROFILER.scope("planning"):
            # Warmstart selection (ref planner.cpp:78-86)
            shift_forward = self.cfg.shift_previous_solution_forward and self.cfg.enable_output
            if was_feasible:
                self._Z = initialize_warmstart(
                    self.model, self.N, self._Z, state, shift_forward
                )
            else:
                self._Z = initialize_with_braking(
                    self.model, self.N, self.dt, state, self.cfg.deceleration_at_infeasible
                )

            # Expose the warmstart to modules (road constraints, DR
            # projection, decomp seeds read the ego prediction)
            self._publish_warmstart(module_data)

            with PROFILER.scope("update"):
                self.modules.update_all(state, data, module_data)
            # `update` may have changed the state's spline variable
            xinit = np.array([state.get(n) for n in self.model.states])
            self._Z[0, self.model.nu :] = xinit

            with PROFILER.scope("set_parameters"):
                pblock = ParameterBlock(self.ocp.params, self.N + 1)
                self.modules.set_parameters_all(data, module_data, pblock)
                self._finalize_terminal_row(pblock)

            num_iterations = self._iterations_for_budget(data)
            module_data.pblock = pblock
            module_data.xinit = xinit
            module_data.num_iterations = num_iterations

            with PROFILER.scope("optimization"):
                # Module optimize override chain (ref planner.cpp:126-134)
                result = None
                for module in self.modules:
                    result = module.optimize(state, data, module_data)
                    if result is not None:
                        break
                if result is None:
                    t0 = time.perf_counter()
                    res = self.solver.solve(self._Z, pblock.data, xinit, num_iterations)
                    Z = np.asarray(res.Z)
                    exit_code = int(res.exit_code)
                    pobj = float(res.pobj)
                    elapsed = time.perf_counter() - t0
                    self._update_iter_time(elapsed, num_iterations)
                else:
                    Z, exit_code, pobj = result["Z"], result["exit_code"], result["pobj"]

        if exit_code != EXIT_SUCCESS:
            self._output.success = False
            return self._output

        self._Z = Z
        self._output.success = True
        self._output.pobj = pobj
        if self.cfg.debug_limits:
            self._report_bound_hits(Z)
        for k in range(1, self.N):
            self._output.trajectory.add(self.get_solution(k, "x"), self.get_solution(k, "y"))
        return self._output

    def _report_bound_hits(self, Z, tol: float = 1e-3) -> None:
        """debug_limits: report solution variables at their bounds (ref
        acados_solver_interface.cpp:426-446 printIfBoundLimited)."""
        from mpc_planner_tpu.utils.logging import print_warning as log_warning

        lb = np.asarray(self.model.lower_bound)
        ub = np.asarray(self.model.upper_bound)
        names = list(self.model.inputs) + list(self.model.states)
        Zc = np.asarray(Z)
        for j, name in enumerate(names):
            if np.isfinite(lb[j]) and np.any(Zc[:, j] <= lb[j] + tol):
                log_warning(f"[debug_limits] '{name}' hits its lower bound {lb[j]}")
            if np.isfinite(ub[j]) and np.any(Zc[:, j] >= ub[j] - tol):
                log_warning(f"[debug_limits] '{name}' hits its upper bound {ub[j]}")

    # -- helpers -----------------------------------------------------------
    def _publish_warmstart(self, module_data: ModuleData) -> None:
        module_data.warmstart = self._Z
        ix = self.model.index("x")
        iy = self.model.index("y")
        module_data.warmstart_xy = self._Z[:, [ix, iy]]
        try:
            module_data.warmstart_psi = self._Z[:, self.model.index("psi")]
        except KeyError:
            module_data.warmstart_psi = np.zeros(self.N + 1)
        try:
            module_data.warmstart_spline = self._Z[:, self.model.index("spline")]
        except KeyError:
            module_data.warmstart_spline = np.zeros(self.N + 1)

    def _finalize_terminal_row(self, pblock: ParameterBlock) -> None:
        """Terminal node gets stage N-1's parameters
        (ref acados_solver_interface.cpp:128-134)."""
        pblock.data[self.N] = pblock.data[self.N - 1]

    def _iterations_for_budget(self, data: RealTimeData) -> int:
        """Budget -> RTI iteration count (ref planner.cpp:117-118 +
        acados_solver_interface.cpp:108-116)."""
        max_iter = self.cfg.solver.iterations
        if self._iter_time_estimate is None or data.planning_start_time <= 0.0:
            return max_iter
        used = time.time() - data.planning_start_time
        budget = 1.0 / self.cfg.control_frequency - used - self.cfg.solver.timeout_margin
        if budget <= 0:
            return 1
        n = int(budget / self._iter_time_estimate)
        n = int(np.clip(n, 1, max_iter))
        # Quantize to a small set: each distinct count is its own compiled
        # executable, so an arbitrary count per cycle would thrash the
        # compile cache (the reference's per-iteration cut-off has no such
        # constraint, acados_solver_interface.cpp:108-116).
        for q in (10, 5, 3, 2, 1):
            if q <= min(n, max_iter):
                return q
        return 1

    def _update_iter_time(self, elapsed: float, iterations: int) -> None:
        per_iter = elapsed / max(iterations, 1)
        if self._iter_time_estimate is None:
            self._iter_time_estimate = per_iter
        else:  # EWMA; first compiles are outliers
            self._iter_time_estimate = 0.7 * self._iter_time_estimate + 0.3 * per_iter

    # -- ref planner.h API --------------------------------------------------
    def get_solution(self, k: int, var_name: str) -> float:
        return float(self._Z[k, self.model.index(var_name)])

    def get_ego_prediction(self, k: int, var_name: str) -> float:
        return float(self._Z[k, self.model.index(var_name)])

    def on_data_received(self, data: RealTimeData, data_name: str) -> None:
        self.modules.on_data_received(data, data_name)

    def visualize(self, state: State, data: RealTimeData):
        """Collect visualization artifacts for this cycle
        (ref planner.cpp:176-223 + per-module visualize())."""
        from mpc_planner_tpu.utils.visualization import Visualizer

        viz = Visualizer()
        if len(self._output.trajectory) > 0:
            viz.add_trajectory(self._output.trajectory.positions, "planned_trajectory")
        if self._module_data.warmstart_xy is not None:
            viz.add_trajectory(self._module_data.warmstart_xy, "warmstart_trajectory")
        if data.obstacle_block is not None:
            viz.add_obstacles(data.obstacle_block)
            viz.add_prediction_ellipses(data.obstacle_block)
        if data.robot_area:
            viz.add_robot_area(state.get_position(), state.get("psi"), data.robot_area)
        if self._module_data.static_obstacles is not None:
            hs = self._module_data.static_obstacles
            viz.add_halfspaces(hs.reshape(-1, 3), "road_constraints")
        gmod = self.modules.get("GuidanceConstraints")
        if gmod is not None and getattr(gmod, "_last_batch_Z", None) is not None:
            import numpy as _np

            viz.add_tmpc_candidates(
                _np.asarray(gmod._last_batch_Z), self.model, gmod._selected_planner
            )
        return viz

    def is_objective_reached(self, state: State, data: RealTimeData) -> bool:
        return all(m.is_objective_reached(state, data) for m in self.modules)

    def reset(self, state: Optional[State] = None, data: Optional[RealTimeData] = None) -> None:
        self.modules.reset_all()
        # _Z may be a read-only view of a device buffer after a solve
        # (np.asarray of a jax array) — replace, don't mutate in place.
        self._Z = np.zeros_like(self._Z)
        self._output = PlannerOutput(self.dt, self.N)
        self._was_reset = True
        if state is not None:
            state.reset()
        if data is not None:
            data.reset()

    def default_robot_area(self):
        return define_robot_area(self.cfg.robot.length, self.cfg.robot.width, self.cfg.n_discs)
