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
        self.n_planners = (
            cfg.t_mpc.n_paths * max(1, cfg.t_mpc.samples_per_class)
            + (1 if getattr(cfg.t_mpc, "braking_class", False) else 0)
            + (1 if self.use_tmpc_pp else 0)
        )
        # Set by the planner/guidance layer each cycle:
        self.guidance = None  # GuidancePlanner instance
        self._selected_class = -1
        self._selected_planner = -1
        self._trajectories = []
        self._planner = None
        # (lam_l, lam_u, ok) carried across cycles — kept as DEVICE
        # arrays: pulling + re-shipping ~2.6 MB of duals per cycle
        # through a remote-device link would dominate the cycle at the
        # 512+ batch scale.
        self._prev_duals = None
        self._assemble = None  # {key: jitted fused solve+select step}

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
    def attach(self, planner) -> None:
        """Called by the Planner: gives the module the batched solver
        (the reference passes a shared Solver into each module's ctor)."""
        self._planner = planner

    def update(self, state, data, module_data) -> None:
        """Run the guidance layer (ref guidance_constraints.cpp:100-130:
        global_guidance_->Update() inside update())."""
        self.submodule.update(state, data, module_data)
        self._trajectories = []
        if module_data.path is None or data.obstacle_block is None:
            return
        if self.guidance is None:
            from mpc_planner_tpu.guidance import make_guidance_planner

            self.guidance = make_guidance_planner(self.cfg)
        v_ref = self.cfg.weights.get("reference_velocity", 1.0)
        self._trajectories = self.guidance.update(
            state, module_data.path, data.obstacle_block, state.get("spline"), v_ref
        )

    def optimize(self, state, data, module_data):
        """Batched parallel optimize + selection
        (ref guidance_constraints.cpp:264-434; OpenMP loop :279 -> one
        vmapped batch solve)."""
        planner = getattr(self, "_planner", None)
        if planner is None or not self._trajectories:
            return None  # fall through to the default solver

        import numpy as _np

        cfg = self.cfg
        model = planner.model
        N = cfg.N
        B = self.n_planners
        nvar = model.nvar
        base_P = module_data.pblock.data  # [N+1, npar] main fill
        Z_main = module_data.warmstart

        from mpc_planner_tpu.utils.profiling import PROFILER

        trajs = list(self._trajectories)
        n_guided = B - (1 if self.use_tmpc_pp else 0)
        while len(trajs) < n_guided:  # pad with duplicates for static B
            trajs.append(trajs[-1])
        trajs = trajs[:n_guided]

        _host_scope = PROFILER.scope("tmpc_host_assemble")
        _host_scope.__enter__()
        Z0 = _np.zeros((B, N + 1, nvar), dtype=_np.float32)

        robot_radius = cfg.robot_radius
        blk = data.obstacle_block

        # Vectorized over all guided trajectories — at 1000+ guesses per
        # cycle (samples_per_class scale-out) a per-trajectory Python loop
        # would dominate the cycle on the host.
        Z0[: len(trajs)] = self._warmstarts_from_guidance(model, trajs, Z_main)
        # Braking class: safety submodule only, no topology halfspaces
        # (like the reference's non-guided planner) — a stop-in-lane
        # plan must stay feasible even when every passing side is
        # blocked.
        guided = _np.zeros(B, dtype=bool)
        guided[: len(trajs)] = [
            not getattr(t, "braking", False) for t in trajs
        ]
        if not self.enable_constraints:
            guided[:] = False
        if self.use_tmpc_pp:
            # T-MPC++: the non-guided planner with the main warmstart and
            # no homotopy constraints (ref :286-298 "original planner")
            Z0[B - 1] = Z_main
            guided[B - 1] = False

        n_obs = blk.position.shape[0]
        # Halfspace linearization points: the CLASS representative for
        # samples_per_class variants (same constraint geometry per class
        # -> true multistart; see GuidanceTrajectory.base_positions),
        # the trajectory itself otherwise.
        pos_all = _np.stack(
            [t.positions if t.base_positions is None else t.base_positions
             for t in trajs]
            + [Z_main[:, [model.index("x"), model.index("y")]]]
            * (B - len(trajs)),
            axis=0,
        ).astype(_np.float32)

        xinit = _np.tile(module_data.xinit[None], (B, 1)).astype(_np.float32)

        # Consistency bonus for the previously selected class (ref
        # :358-359), as a per-element multiplier shipped with the batch.
        # The braking class is exempt: it is an emergency plan, and
        # making it sticky freezes the robot. It also competes ONLY when
        # nothing else is feasible: warmstarted at a stop with no
        # topology constraints it converges to a "dawdle behind the
        # crowd" local optimum that often costs less than an overtake
        # (measured: 12-ped corridor completion 2/3 -> 0/3 when it may
        # win on cost).
        consistency = _np.ones(B, _np.float32)
        braking_mask = _np.zeros(B, dtype=bool)
        for i, traj in enumerate(trajs):
            braking_mask[i] = getattr(traj, "braking", False)
            if traj.previously_selected and not braking_mask[i]:
                consistency[i] = cfg.t_mpc.selection_weight_consistency

        # Cross-cycle dual warm start: feed last cycle's converged QP duals
        # into this cycle's first QP (extends HPIPM warm_start=2 across
        # control cycles; per-element ok flag gates shifted/braking
        # restarts). Planner i keeps its homotopy class between cycles
        # (stable guidance ordering), so duals stay aligned per element.
        warm = self._prev_duals
        if warm is not None and warm[0].shape[0] != B:
            warm = None

        # ONE fused device program per cycle (assembly + batch solve +
        # selection) and ONE bundled device->host pull: each additional
        # blocking round trip through a remote-device link costs tens of
        # ms (measured 130 ms/cycle at 4 sync points vs ~6 ms of B=5
        # solve). Same structure as parallel/distributed.py's
        # distributed_solve_step — the selection argmin rides the chip.
        import jax as _jax

        _host_scope.__exit__(None, None, None)
        n_iter = int(module_data.num_iterations)
        step = self._get_fused_step(
            B, base_P.shape, blk.pred_position.shape[0], n_iter,
            module_data.pblock.registry, warm is not None)
        out = step(
            _jax.numpy.asarray(_np.asarray(base_P, _np.float32)),
            _jax.numpy.asarray(pos_all),
            _jax.numpy.asarray(
                _np.asarray(blk.pred_position[:, : N - 1], _np.float32)),
            _jax.numpy.asarray(guided),
            _jax.numpy.float32(robot_radius),
            _jax.numpy.asarray(Z0),
            _jax.numpy.asarray(xinit),
            _jax.numpy.asarray(consistency),
            _jax.numpy.asarray(braking_mask),
            *(warm if warm is not None else ()),
        )
        (packed_d, Zall_d, ll_d, lu_d) = out

        def _unpack(packed_np):
            nz = (N + 1) * nvar
            Zb = packed_np[:nz].reshape(N + 1, nvar)
            codes = packed_np[nz:nz + B].astype(_np.int32)
            po = packed_np[nz + B:nz + 2 * B].astype(float)
            mu = packed_np[nz + 2 * B:nz + 3 * B].astype(float)
            return (Zb, int(packed_np[-2]), bool(packed_np[-1] > 0.5),
                    codes, po, mu)

        # THE one blocking pull of the cycle.
        with PROFILER.scope("tmpc_dispatch_solve_pull"):
            Z_best, best, found, exit_codes, pobj, qp_mu = _unpack(
                _np.asarray(_jax.device_get(packed_d)))
        if ll_d is not None:
            # Stays on device — consumed by next cycle's solve only.
            self._prev_duals = (ll_d, lu_d, _jax.numpy.asarray(exit_codes == 1))

        # In-cycle escalation of hard warm-dual failures AND soft stalls
        # (feasible but barrier mu above qp_mu_stall — not actually
        # converged at the short warm budget; same semantics solve_batch
        # applies): one extra fused dispatch on flagged cycles only.
        # (`warm[2]` is a device array — only pull it once a flag is
        # actually present.)
        retry = getattr(planner.solver, "qp_retry_cold", True)
        mu_stall = getattr(planner.solver, "qp_mu_stall", 1e-3)
        stalled_f = (exit_codes == 1) & (qp_mu > mu_stall)
        if retry and ((exit_codes == -1) | stalled_f).any():
            # Cold cycles escalate every flagged element; warm cycles only
            # those whose carried duals were actually applied (ok=False
            # elements already solved cold inside the warm program).
            applied = (_np.ones(B, bool) if warm is None
                       else _np.asarray(warm[2]))
            failed = (exit_codes == -1) & applied
            stalled = stalled_f & applied
            if (failed | stalled).any():
                step_c = self._get_fused_step(
                    B, base_P.shape, blk.pred_position.shape[0], n_iter,
                    module_data.pblock.registry, False, escalated=True)
                out_c = step_c(
                    _jax.numpy.asarray(_np.asarray(base_P, _np.float32)),
                    _jax.numpy.asarray(pos_all),
                    _jax.numpy.asarray(
                        _np.asarray(blk.pred_position[:, : N - 1], _np.float32)),
                    _jax.numpy.asarray(guided),
                    _jax.numpy.float32(robot_radius),
                    _jax.numpy.asarray(Z0),
                    _jax.numpy.asarray(xinit),
                    _jax.numpy.asarray(consistency),
                    _jax.numpy.asarray(braking_mask),
                )
                (packed_c, Zall_c, ll_c, lu_c) = out_c
                _, _, _, codes_cold, pobj_cold, _ = _unpack(
                    _np.asarray(_jax.device_get(packed_c)))
                adopt = (failed & (codes_cold > exit_codes)) | (
                    stalled & (codes_cold == 1))
                if adopt.any():
                    import jax.numpy as _jnp

                    m = _jnp.asarray(adopt)
                    exit_codes = _np.where(adopt, codes_cold, exit_codes)
                    pobj = _np.where(adopt, pobj_cold, pobj)
                    mm = m[:, None, None]
                    Zall_d = _jnp.where(mm, Zall_c, Zall_d)
                    self._prev_duals = (
                        _jnp.where(mm, ll_c, ll_d),
                        _jnp.where(mm, lu_c, lu_d),
                        _jnp.asarray(exit_codes == 1),
                    )
                    # Re-select on the merged result (host, tiny arrays)
                    feas = exit_codes == 1
                    if (feas & ~braking_mask).any():
                        feas = feas & ~braking_mask
                    masked = _np.where(feas, pobj * consistency, _np.inf)
                    best = int(_np.argmin(masked))
                    found = bool(_np.isfinite(masked[best]))
                    Z_best = _np.asarray(Zall_d[best])

        best = int(best)
        if not bool(found):
            self.guidance.override_selected(None)
            return {"Z": Z_main, "exit_code": int(exit_codes[0]),
                    "pobj": float("inf")}

        self._selected_planner = best
        feas_eff = exit_codes == 1
        if (feas_eff & ~braking_mask).any():
            feas_eff = feas_eff & ~braking_mask
        self._last_n_feasible = int(feas_eff.sum())
        self._last_pobj_best = float(pobj[best] * consistency[best])
        # Kept as a device array; visualization pulls it on demand (the
        # full batch is ~300 KB at B=514 — not per-cycle traffic).
        self._last_batch_Z = Zall_d
        if best < len(trajs):
            self.guidance.override_selected(trajs[best])
        else:
            self.guidance.override_selected(None)

        return {
            "Z": _np.asarray(Z_best),
            "exit_code": 1,
            "pobj": float(pobj[best]),
            "batch": True,
            "selected": best,
        }

    def _get_fused_step(self, B, baseP_shape, n_obs, n_iter, reg,
                        warm: bool, escalated: bool = False):
        """One jitted device program for a whole control cycle:

        1. per-planner parameter assembly — broadcast the shared base
           fill and linearize the separating halfspaces w.r.t. each
           guidance trajectory ON DEVICE (LinearizedConstraints topology
           mode, linearized_constraints.cpp:43-47, 85-105: radius 1e-3,
           robot point); non-guided rows (braking / T-MPC++ unguided
           planner) get the inactive fill (a=0, b=100);
        2. the batched SQP-RTI solve (warm-dual variant when `warm`);
        3. the T-MPC selection argmin (consistency-weighted, braking
           classes competing only when nothing else is feasible).

        Cached per shape/iteration key. Returns
        (Z_winner, best, found, exit_code, pobj, Z_all, lam_l, lam_u).
        """
        import jax
        import jax.numpy as jnp

        N = self.cfg.N
        if self._assemble is None:
            self._assemble = {}
        key = (B, baseP_shape, n_obs, n_iter, warm, escalated)
        if key in self._assemble:
            return self._assemble[key]

        a1_idx = jnp.asarray(reg.bundle_indices("lin_constraint_a1")[:n_obs])
        a2_idx = jnp.asarray(reg.bundle_indices("lin_constraint_a2")[:n_obs])
        b_idx = jnp.asarray(reg.bundle_indices("lin_constraint_b")[:n_obs])
        solver = self._planner.solver

        def step(baseP, pos, obst, g, rr, Z0, xinit, consistency,
                 braking, *warm_args):
            p = pos[:, 1:N]  # [B, N-1, 2] stages 1..N-1
            diff = obst[None] - p[:, None, :, :]  # [B, M, N-1, 2]
            dist = jnp.maximum(jnp.linalg.norm(diff, axis=-1), 1e-9)
            a1 = jnp.swapaxes(diff[..., 0] / dist, 1, 2)  # [B, N-1, M]
            a2 = jnp.swapaxes(diff[..., 1] / dist, 1, 2)
            ox = jnp.swapaxes(obst[..., 0], 0, 1)[None]
            oy = jnp.swapaxes(obst[..., 1], 0, 1)[None]
            b = a1 * ox + a2 * oy - (1e-3 + rr)
            gm = g[:, None, None]
            a1 = jnp.where(gm, a1, 0.0)
            a2 = jnp.where(gm, a2, 0.0)
            b = jnp.where(gm, b, 100.0)
            P = jnp.broadcast_to(baseP[None], (B,) + baseP.shape)
            P = P.at[:, 1:N, a1_idx].set(a1)
            P = P.at[:, 1:N, a2_idx].set(a2)
            P = P.at[:, 1:N, b_idx].set(b)
            P = P.at[:, N].set(P[:, N - 1])

            warm0 = tuple(warm_args) if warm_args else None
            res = solver.batch_impl(Z0, P, xinit, n_iter, warm0=warm0,
                                    escalated=escalated)

            feasible = res.exit_code == 1
            nb = feasible & ~braking
            feas_eff = jnp.where(jnp.any(nb), nb, feasible)
            masked = jnp.where(feas_eff, res.pobj * consistency, jnp.inf)
            best = jnp.argmin(masked)
            found = jnp.isfinite(masked[best])
            # ALL host-bound scalars in ONE f32 vector: device_get pulls
            # each pytree leaf in a separate blocking round trip, and
            # through a remote-device link every round trip costs
            # ~15-20 ms (measured: 6 pulls = 104 of a 154 ms cycle).
            packed = jnp.concatenate([
                res.Z[best].reshape(-1),
                res.exit_code.astype(jnp.float32),
                res.pobj,
                res.qp_mu.astype(jnp.float32),  # stall-escalation signal
                jnp.stack([best.astype(jnp.float32),
                           found.astype(jnp.float32)]),
            ])
            return (packed, res.Z, res.lam_l, res.lam_u)

        fn = jax.jit(step)
        self._assemble[key] = fn
        return fn

    def _warmstarts_from_guidance(self, model, trajs, Z_main) -> "np.ndarray":
        """initializeSolverWithGuidance (ref :390-414), vectorized over the
        whole trajectory batch: x, y from the guidance splines, psi from
        their direction, v from spacing; inputs reconstructed by finite
        differences so every warmstart is close to dynamically consistent
        (the reference inherits the copied solver's inputs instead — a
        worse interior-point start)."""
        import numpy as _np

        from mpc_planner_tpu.solver.warmstart import clip_to_bounds

        N = self.cfg.N
        dt = self.cfg.dt
        B = len(trajs)
        Z = _np.broadcast_to(
            _np.asarray(Z_main, dtype=float), (B,) + Z_main.shape
        ).copy()
        pos = _np.stack([t.positions for t in trajs], axis=0)  # [B, N+1, 2]
        d = _np.diff(pos, axis=1)  # [B, N, 2]
        step = _np.linalg.norm(d, axis=-1)  # [B, N]
        ang = _np.arctan2(d[..., 1], d[..., 0])
        # psi from direction; carry the previous value through ~zero steps
        psi = _np.empty((B, N + 1))
        psi[:, 0] = Z_main[0, model.index("psi")] if "psi" in model.states else 0.0
        for k in range(1, N + 1):
            psi[:, k] = _np.where(step[:, k - 1] > 1e-3, ang[:, k - 1], psi[:, k - 1])
        speed = _np.concatenate([step / dt, step[:, -1:] / dt], axis=1)

        Z[:, :, model.index("x")] = pos[..., 0]
        Z[:, :, model.index("y")] = pos[..., 1]
        try:
            Z[:, :, model.index("psi")] = psi
            Z[:, :, model.index("v")] = speed
        except KeyError:
            pass
        try:
            Z[:, :, model.index("spline")] = _np.stack([t.s for t in trajs], axis=0)
        except KeyError:
            pass
        # Inputs by finite differences
        try:
            Z[:, :-1, model.index("a")] = _np.diff(speed, axis=1) / dt
            Z[:, -1, model.index("a")] = 0.0
        except KeyError:
            pass
        try:
            dpsi = _np.mod(_np.diff(psi, axis=1) + _np.pi, 2 * _np.pi) - _np.pi
            Z[:, :-1, model.index("w")] = dpsi / dt
            Z[:, -1, model.index("w")] = 0.0
        except KeyError:
            pass
        # Holonomic (point-mass) models: velocity/acceleration components
        if "vx" in model.states:
            vel = _np.concatenate([d / dt, d[:, -1:] / dt], axis=1)  # [B, N+1, 2]
            Z[:, :, model.index("vx")] = vel[..., 0]
            Z[:, :, model.index("vy")] = vel[..., 1]
            acc = _np.diff(vel, axis=1) / dt
            Z[:, :-1, model.index("ax")] = acc[..., 0]
            Z[:, :-1, model.index("ay")] = acc[..., 1]
            Z[:, -1, model.index("ax")] = 0.0
            Z[:, -1, model.index("ay")] = 0.0
        return clip_to_bounds(model, Z)

    def save_data(self, record: dict) -> None:
        """Selection metrics per cycle (ref guidance_constraints.cpp
        saveData: best planner id, objective)."""
        record["guidance_selected_planner"] = self._selected_planner
        record["guidance_n_planners"] = self.n_planners
        record["guidance_n_feasible"] = getattr(self, "_last_n_feasible", 0)
        record["guidance_best_objective"] = getattr(
            self, "_last_pobj_best", float("inf"))
        self.submodule.save_data(record)

    def is_objective_reached(self, state, data) -> bool:
        return self.submodule.is_objective_reached(state, data)

    def reset(self) -> None:
        self._trajectories = []
        self._prev_duals = None
        if self.guidance is not None:
            self.guidance.reset()
        self.submodule.reset()

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
