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


def _device_scenario_halfspaces(key, pred_position, pred_angle, pred_major,
                                pred_minor, radius, p_ws, robot_r,
                                n_samples: int):
    """Device-side scenario sampling for one solver.

    pred_* [M, N-1(,2)]; p_ws [N-1, 2]. Returns (a1, a2, b, margin), each
    [S*M, N-1]: a separating halfspace per (sample, obstacle) pair, with
    `margin` = signed clearance of the warmstart position against it
    (used for tightest-support selection). Joint-scenario indexing: flat
    row s*M + m is obstacle m's constraint in joint scenario s — the
    scenario_module capability as one jittable function (vmapped over
    parallel solvers)."""
    import jax
    import jax.numpy as jnp

    S = n_samples
    M, Nm1 = pred_major.shape
    noise = jax.random.normal(key, (S, M, Nm1, 2))
    cos_a, sin_a = jnp.cos(pred_angle), jnp.sin(pred_angle)
    ex = noise[..., 0] * pred_major[None]
    ey = noise[..., 1] * pred_minor[None]
    dx = cos_a[None] * ex - sin_a[None] * ey
    dy = sin_a[None] * ex + cos_a[None] * ey
    samples = pred_position[None] + jnp.stack([dx, dy], axis=-1)  # [S, M, N-1, 2]

    flat = samples.reshape(S * M, Nm1, 2)
    diff = flat - p_ws[None]
    dist = jnp.maximum(jnp.linalg.norm(diff, axis=-1), 1e-9)
    a1 = diff[..., 0] / dist
    a2 = diff[..., 1] / dist
    rad = jnp.tile(radius, S)[:, None] + robot_r
    b = a1 * flat[..., 0] + a2 * flat[..., 1] - rad
    margin = a1 * p_ws[None, :, 0] + a2 * p_ws[None, :, 1] - b  # [S*M, N-1]
    return a1, a2, b, margin


def _device_scenario_halfspaces_mm(key, modes_position, modes_angle, modes_major,
                                   modes_minor, modes_logprob, radius, p_ws, robot_r,
                                   n_samples: int):
    """Multi-modal (GMM / non-Gaussian) variant: draw a mode per sample by
    probability, then Gaussian noise around that mode (the reference's
    scenario_module samples non-Gaussian predictions the same way;
    ref data_types.h Prediction{modes, probabilities}). The noise is
    rotated into the selected mode's frame (`modes_angle`) so anisotropic
    major/minor uncertainty keeps its orientation per mode, matching the
    single-mode variant."""
    import jax
    import jax.numpy as jnp

    S = n_samples
    M, K, Nm1 = modes_major.shape
    k_mode, k_noise = jax.random.split(key)
    mode_idx = jax.random.categorical(k_mode, modes_logprob, axis=-1, shape=(S, M))
    # Gather per-sample mode tracks: [S, M, N-1(,2)]
    pos = modes_position[jnp.arange(M)[None, :], mode_idx]
    ang = modes_angle[jnp.arange(M)[None, :], mode_idx]
    maj = modes_major[jnp.arange(M)[None, :], mode_idx]
    mino = modes_minor[jnp.arange(M)[None, :], mode_idx]

    noise = jax.random.normal(k_noise, (S, M, Nm1, 2))
    cos_a, sin_a = jnp.cos(ang), jnp.sin(ang)
    ex = noise[..., 0] * maj
    ey = noise[..., 1] * mino
    dx = cos_a * ex - sin_a * ey
    dy = sin_a * ex + cos_a * ey
    samples = pos + jnp.stack([dx, dy], axis=-1)

    flat = samples.reshape(S * M, Nm1, 2)
    diff = flat - p_ws[None]
    dist = jnp.maximum(jnp.linalg.norm(diff, axis=-1), 1e-9)
    a1 = diff[..., 0] / dist
    a2 = diff[..., 1] / dist
    rad = jnp.tile(radius, S)[:, None] + robot_r
    b = a1 * flat[..., 0] + a2 * flat[..., 1] - rad
    margin = a1 * p_ws[None, :, 0] + a2 * p_ws[None, :, 1] - b
    return a1, a2, b, margin


def _select_tightest(a1, a2, b, margin, n_constraints: int):
    """Top-k tightest-support selection for one solver: keep the
    `n_constraints` halfspaces with the smallest warmstart clearance per
    stage. Inputs [S*M, N-1]; returns (a1, a2, b, idx) each [N-1, nC]
    (idx = flat sample-obstacle row of each kept halfspace)."""
    import jax
    import jax.numpy as jnp

    _, idx = jax.lax.top_k(margin.T, n_constraints)  # [N-1, nC]
    kk = jnp.arange(margin.shape[1])[:, None]
    return a1.T[kk, idx], a2.T[kk, idx], b.T[kk, idx], idx


class ScenarioConstraintModule(ConstraintModule):
    module_name = "ScenarioConstraints"
    description = "Scenario-based obstacle avoidance under motion uncertainty"

    #: QP dual above this counts the halfspace as active (support member).
    ACTIVE_DUAL_TOL = 1e-6
    #: Discarded-sample constraint violation beyond this at the returned
    #: solution means top-k pruning was NOT exact -> certificate invalid.
    PRUNE_TOL = 1e-4

    def __init__(self, cfg):
        from mpc_planner_tpu.modules.scenario_theory import sample_size

        self.cfg = cfg
        self.n_discs = cfg.n_discs
        sc = cfg.scenario_constraints
        self.n_constraints = sc.n_constraints
        self.num_constraints = self.n_constraints * self.n_discs
        self.use_slack = True
        # Scenario-theory linkage (modules/scenario_theory.py): the
        # configured risk governs the draw unless n_samples is explicit.
        self._beta = sc.confidence
        n_cert = sc.parallel_solvers * max(cfg.N - 1, 1)
        self._beta_stage = self._beta / n_cert
        if sc.n_samples is None:
            self.n_samples = sample_size(
                cfg.probabilistic.risk, self._beta_stage, sc.support_bound)
        else:
            self.n_samples = int(sc.n_samples)
        self._planner = None
        self._sample_seed = 0
        # (lam_l, lam_u, ok) carried across cycles — DEVICE arrays (a
        # host round trip per cycle is tens of ms through a remote link)
        self._prev_duals = None
        self._fused = None  # {key: jitted fused sample+assemble+solve+select}

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
    def attach(self, planner) -> None:
        self._planner = planner

    def on_data_received(self, data, data_name: str) -> None:
        # Fresh sample draw when new obstacle data arrives (ref
        # scenario_constraints.cpp:114-129 draws per-solver samples)
        if data_name == "dynamic obstacles":
            self._sample_seed += 1

    def optimize(self, state, data, module_data):
        """SH-MPC batched parallel optimize (ref scenario_constraints.cpp:
        58-107): per-solver scenario draws -> tightest-halfspace selection
        -> parallel solves -> best-cost feasible winner."""
        planner = getattr(self, "_planner", None)
        blk = data.obstacle_block
        if planner is None or blk is None:
            return None

        import numpy as _np

        cfg = self.cfg
        model = planner.model
        N = cfg.N
        S = self.n_samples
        B = cfg.scenario_constraints.parallel_solvers
        M = blk.position.shape[0]
        nC = self.n_constraints

        Z_main = module_data.warmstart
        p_ws = module_data.warmstart_xy[1 : N]  # [N-1, 2] stages 1..N-1

        base_P = module_data.pblock.data
        Z0 = _np.tile(_np.asarray(Z_main, dtype=_np.float32)[None], (B, 1, 1))
        span = float(cfg.scenario_constraints.warmstart_span)
        if span > 0.0 and B > 1:
            # Lateral warmstart fan across the solver batch (multistart):
            # offset each solver's trajectory sideways (normal to its
            # heading), tapering in over the horizon so stage 0 stays at
            # xinit. Solver 0 keeps the unmodified warmstart.
            offs = _np.linspace(-span / 2.0, span / 2.0, B).astype(_np.float32)
            offs[_np.argmin(_np.abs(offs))] = 0.0
            taper = _np.clip(_np.arange(N + 1) / max(N // 2, 1), 0.0, 1.0)
            xy = module_data.warmstart_xy  # [N+1, 2]
            d = _np.diff(xy, axis=0, append=xy[-1:] + (xy[-1:] - xy[-2:-1]))
            nrm = _np.linalg.norm(d, axis=1, keepdims=True)
            normal = _np.stack([-d[:, 1], d[:, 0]], axis=1) / _np.maximum(nrm, 1e-6)
            shift = (offs[:, None, None] * (taper[:, None] * normal)[None])
            xi_, yi_ = model.index("x"), model.index("y")
            Z0[:, :, xi_] += shift[..., 0]
            Z0[:, :, yi_] += shift[..., 1]
        xinit = _np.tile(module_data.xinit[None], (B, 1)).astype(_np.float32)
        robot_r = cfg.robot_radius

        import jax as _jax
        import jax.numpy as jnp

        multi_modal = blk.n_modes > 1
        if multi_modal:
            modes_angle = (
                blk.modes_angle if blk.modes_angle is not None
                else _np.zeros_like(blk.modes_major)
            )
            data_args = (
                jnp.asarray(blk.modes_position[:, :, : N - 1], jnp.float32),
                jnp.asarray(modes_angle[:, :, : N - 1], jnp.float32),
                jnp.asarray(blk.modes_major[:, :, : N - 1], jnp.float32),
                jnp.asarray(blk.modes_minor[:, :, : N - 1], jnp.float32),
                jnp.asarray(_np.log(_np.maximum(blk.modes_prob, 1e-12)),
                            jnp.float32),
                jnp.asarray(blk.radius, jnp.float32),
                jnp.asarray(p_ws, jnp.float32),
                jnp.float32(robot_r),
            )
        else:
            data_args = (
                jnp.asarray(blk.pred_position[:, : N - 1], jnp.float32),
                jnp.asarray(blk.pred_angle[:, : N - 1], jnp.float32),
                jnp.asarray(blk.pred_major[:, : N - 1], jnp.float32),
                jnp.asarray(blk.pred_minor[:, : N - 1], jnp.float32),
                jnp.asarray(blk.radius, jnp.float32),
                jnp.asarray(p_ws, jnp.float32),
                jnp.float32(robot_r),
            )

        # Cross-cycle dual warm start (HPIPM warm_start=2 across cycles):
        # scenario solver s keeps its sampling stream between cycles, so
        # its duals stay aligned per element.
        warm = self._prev_duals
        if warm is not None and warm[0].shape[0] != B:
            warm = None

        # ONE fused device program per cycle (scenario draws + support
        # selection + per-solver parameter assembly + batched solve +
        # best-cost selection) and ONE bundled pull — the same
        # round-trip discipline as the T-MPC module; this is what lets
        # `parallel_solvers` scale to 100s-1000s of scenario solvers.
        n_iter = int(module_data.num_iterations)
        nvar = model.nvar
        keys = _jax.random.split(
            _jax.random.PRNGKey(self._sample_seed), B)
        step = self._get_fused_step(
            B, base_P.shape, multi_modal, n_iter,
            module_data.pblock.registry, warm is not None)
        out = step(
            keys, jnp.asarray(_np.asarray(base_P, _np.float32)),
            jnp.asarray(Z0), jnp.asarray(xinit),
            *data_args, *(warm if warm is not None else ()))
        packed_d, Zall_d, ll_d, lu_d = out

        def _unpack(packed_np):
            nz = (N + 1) * nvar
            Zb = packed_np[:nz].reshape(N + 1, nvar)
            codes = packed_np[nz:nz + B].astype(_np.int32)
            po = packed_np[nz + B:nz + 2 * B].astype(float)
            mu = packed_np[nz + 2 * B:nz + 3 * B].astype(float)
            support = packed_np[nz + 3 * B:nz + 4 * B].astype(float)
            cert = packed_np[nz + 4 * B:nz + 5 * B].astype(float)
            valid = packed_np[nz + 5 * B:nz + 6 * B] > 0.5
            return (Zb, int(packed_np[-2]), bool(packed_np[-1] > 0.5),
                    codes, po, mu, support, cert, valid)

        (Z_best, best, found, exit_codes, pobj, qp_mu,
         support, cert, cert_valid) = _unpack(
            _np.asarray(_jax.device_get(packed_d)))
        if ll_d is not None:
            self._prev_duals = (ll_d, lu_d, _jax.numpy.asarray(exit_codes == 1))

        # In-cycle escalation of hard warm-dual failures and soft stalls
        # (feasible but mu > qp_mu_stall; same semantics as solve_batch).
        retry = getattr(planner.solver, "qp_retry_cold", True)
        mu_stall = getattr(planner.solver, "qp_mu_stall", 1e-3)
        stalled_f = (exit_codes == 1) & (qp_mu > mu_stall)
        if retry and ((exit_codes == -1) | stalled_f).any():
            # Cold cycles escalate every flagged element; warm cycles only
            # those whose carried duals were actually applied.
            applied = (_np.ones(B, bool) if warm is None
                       else _np.asarray(warm[2]))
            failed = (exit_codes == -1) & applied
            stalled = stalled_f & applied
            if (failed | stalled).any():
                step_c = self._get_fused_step(
                    B, base_P.shape, multi_modal, n_iter,
                    module_data.pblock.registry, False, escalated=True)
                out_c = step_c(
                    keys, jnp.asarray(_np.asarray(base_P, _np.float32)),
                    jnp.asarray(Z0), jnp.asarray(xinit), *data_args)
                packed_c, Zall_c, ll_c, lu_c = out_c
                (_, _, _, codes_cold, pobj_cold, _,
                 support_cold, cert_cold, valid_cold) = _unpack(
                    _np.asarray(_jax.device_get(packed_c)))
                adopt = (failed & (codes_cold > exit_codes)) | (
                    stalled & (codes_cold == 1))
                if adopt.any():
                    m = jnp.asarray(adopt)[:, None, None]
                    exit_codes = _np.where(adopt, codes_cold, exit_codes)
                    pobj = _np.where(adopt, pobj_cold, pobj)
                    support = _np.where(adopt, support_cold, support)
                    cert = _np.where(adopt, cert_cold, cert)
                    cert_valid = _np.where(adopt, valid_cold, cert_valid)
                    Zall_d = jnp.where(m, Zall_c, Zall_d)
                    self._prev_duals = (
                        jnp.where(m, ll_c, ll_d),
                        jnp.where(m, lu_c, lu_d),
                        jnp.asarray(exit_codes == 1),
                    )
                    feas = exit_codes == 1
                    masked = _np.where(feas, pobj, _np.inf)
                    best = int(_np.argmin(masked))
                    found = bool(_np.isfinite(masked[best]))
                    Z_best = _np.asarray(Zall_d[best])

        feasible = exit_codes == 1
        # Per-cycle scenario-theory record (all solvers, for saveData and
        # envelope diagnosis): observed max per-stage support, a-posteriori
        # risk certificate eps(s), and whether the top-k pruning was exact
        # (certificate validity).
        self._last_support_all = support
        self._last_cert_all = cert
        self._last_cert_valid_all = _np.asarray(cert_valid, bool)
        if not bool(found):
            self._last_certificate = 1.0
            return {"Z": _np.asarray(Z_main), "exit_code": -1, "pobj": float("inf")}
        best = int(best)
        self._last_selected = best
        self._last_n_feasible = int(feasible.sum())
        self._last_certificate = float(cert[best])
        self._last_support_max = int(support[best])
        self._last_cert_valid = bool(cert_valid[best])
        return {
            "Z": _np.asarray(Z_best),
            "exit_code": 1,
            "pobj": float(pobj[best]),
            "batch": True,
            "selected": best,
        }

    def _h_row_offset(self) -> int:
        """Row offset of this module's constraints within the stacked
        h-rows (module constraint order = module order, solver rows =
        [nu box, nx box, nh])."""
        off = 0
        for m in self._planner.modules:
            if m is self:
                return off
            off += m.nh
        raise RuntimeError("scenario module not found in planner modules")

    def _get_fused_step(self, B, baseP_shape, multi_modal, n_iter, reg,
                        warm: bool, escalated: bool = False):
        """One jitted device program for a whole SH-MPC cycle: per-solver
        scenario draws + tightest-support selection (ref scenario_module
        sampling + 24-support reduction), parameter assembly, the
        batched solve (warm-dual variant when `warm`), the best-cost
        argmin, AND the scenario-theory accounting (per-stage support
        counts from the QP duals, top-k pruning exactness check, and the
        a-posteriori risk certificate eps(s) per solver —
        modules/scenario_theory.py). Returns (packed scalars, Z_all,
        lam_l, lam_u); packed = [Z_winner.ravel(), exit_codes[B],
        pobj[B], support_max[B], certificate[B], cert_valid[B], best,
        found] — one pull."""
        import functools

        import jax
        import jax.numpy as jnp

        from mpc_planner_tpu.modules.scenario_theory import (
            epsilon_posterior_jax,
        )

        if self._fused is None:
            self._fused = {}
        key = (B, baseP_shape, multi_modal, n_iter, warm, escalated)
        if key in self._fused:
            return self._fused[key]

        cfg = self.cfg
        N = cfg.N
        nC = self.n_constraints
        S = self.n_samples
        beta_stage = self._beta_stage
        n_discs = self.n_discs
        a1_idx = jnp.asarray(reg.bundle_indices("scenario_a1"))
        a2_idx = jnp.asarray(reg.bundle_indices("scenario_a2"))
        b_idx = jnp.asarray(reg.bundle_indices("scenario_b"))
        off_idx = np.asarray(reg.bundle_indices("ego_disc_offset"))
        sampler = functools.partial(
            _device_scenario_halfspaces_mm if multi_modal
            else _device_scenario_halfspaces,
            n_samples=S,
        )
        n_data = 8 if multi_modal else 7
        planner = self._planner
        solver = planner.solver
        model = planner.model
        ocp = planner.ocp
        xi, yi = model.index("x"), model.index("y")
        psi_i = model.index("psi") if "psi" in model.states else None
        slack_i = (model.index("slack")
                   if ("slack" in model.states or "slack" in model.inputs)
                   else None)
        # This module's dual rows: [nu box | nx box | nh], scenario block
        # at its module offset, disc-major (see constraints()).
        row0 = ocp.nu + ocp.nx + self._h_row_offset()
        active_tol = self.ACTIVE_DUAL_TOL
        prune_tol = self.PRUNE_TOL

        def step(keys, baseP, Z0, xinit, *rest):
            data_args = rest[:n_data]
            warm_args = rest[n_data:]
            n_obs = data_args[0].shape[0]
            a1f, a2f, bf, marginf = jax.vmap(
                sampler, in_axes=(0,) + (None,) * n_data
            )(keys, *data_args)  # each [B, S*M, N-1]
            # Tightest-nC support selection per stage (scenario_module's
            # 24-halfspace reduction), exactness-checked post-solve.
            _, idx = jax.lax.top_k(
                marginf.transpose(0, 2, 1), nC)  # [B, N-1, nC]
            take = jnp.take_along_axis
            a1 = take(a1f.transpose(0, 2, 1), idx, axis=-1)
            a2 = take(a2f.transpose(0, 2, 1), idx, axis=-1)
            b = take(bf.transpose(0, 2, 1), idx, axis=-1)
            sample_idx = idx // n_obs  # joint-scenario index per kept row

            P = jnp.broadcast_to(baseP[None], (B,) + baseP.shape)
            P = P.at[:, 1:N, a1_idx].set(jnp.tile(a1, (1, 1, n_discs)))
            P = P.at[:, 1:N, a2_idx].set(jnp.tile(a2, (1, 1, n_discs)))
            P = P.at[:, 1:N, b_idx].set(jnp.tile(b, (1, 1, n_discs)))
            P = P.at[:, N].set(P[:, N - 1])

            warm0 = tuple(warm_args) if warm_args else None
            res = solver.batch_impl(Z0, P, xinit, n_iter, warm0=warm0,
                                    escalated=escalated)
            feasible = res.exit_code == 1
            masked = jnp.where(feasible, res.pobj, jnp.inf)
            best = jnp.argmin(masked)
            found = jnp.isfinite(masked[best])

            # -- scenario-theory accounting --------------------------------
            # Support count per stage: DISTINCT joint scenarios among the
            # active kept halfspaces (dual > tol on any disc row).
            lam = res.lam_u[:, 1:N, row0:row0 + n_discs * nC]
            lam = lam.reshape(B, N - 1, n_discs, nC).max(axis=2)
            active = lam > active_tol  # [B, N-1, nC]

            def stage_support(sidx_k, act_k):
                buf = jnp.zeros((S,), jnp.float32)
                return buf.at[sidx_k].max(act_k.astype(jnp.float32)).sum()

            support = jax.vmap(jax.vmap(stage_support))(sample_idx, active)

            # Pruning exactness: every DISCARDED sample's halfspace must be
            # satisfied at the returned solution (for every disc), else the
            # solved program is not the full scenario program.
            px = res.Z[:, 1:N, xi]
            py = res.Z[:, 1:N, yi]
            cpsi = (jnp.cos(res.Z[:, 1:N, psi_i]) if psi_i is not None
                    else jnp.ones_like(px))
            spsi = (jnp.sin(res.Z[:, 1:N, psi_i]) if psi_i is not None
                    else jnp.zeros_like(px))
            offsets = baseP[1, off_idx]  # [n_discs], constant across stages
            pdx = px[..., None] + offsets * cpsi[..., None]  # [B, N-1, D]
            pdy = py[..., None] + offsets * spsi[..., None]
            slack = (res.Z[:, 1:N, slack_i] if slack_i is not None
                     else jnp.zeros_like(px))
            a1s = a1f.transpose(0, 2, 1)  # [B, N-1, S*M]
            a2s = a2f.transpose(0, 2, 1)
            bs = bf.transpose(0, 2, 1)
            viol = (a1s[:, :, None, :] * pdx[..., None]
                    + a2s[:, :, None, :] * pdy[..., None]
                    - bs[:, :, None, :]
                    - slack[:, :, None, None]).max(axis=2)  # [B, N-1, S*M]

            def kept_mask(idx_k):
                return jnp.zeros((viol.shape[-1],), jnp.bool_).at[idx_k].set(True)

            kept = jax.vmap(jax.vmap(kept_mask))(idx)  # [B, N-1, S*M]
            disc_viol = jnp.where(kept, -jnp.inf, viol).max(axis=-1)
            prune_ok = jnp.all(disc_viol <= prune_tol, axis=-1)  # [B]

            eps_k = epsilon_posterior_jax(support, S, beta_stage)
            cert = jnp.where(prune_ok, eps_k.max(axis=-1), 1.0)  # [B]
            support_max = support.max(axis=-1)  # [B]

            packed = jnp.concatenate([
                res.Z[best].reshape(-1),
                res.exit_code.astype(jnp.float32),
                res.pobj,
                res.qp_mu.astype(jnp.float32),  # stall-escalation signal
                support_max,
                cert,
                prune_ok.astype(jnp.float32),
                jnp.stack([best.astype(jnp.float32),
                           found.astype(jnp.float32)]),
            ])
            return packed, res.Z, res.lam_l, res.lam_u

        fn = jax.jit(step)
        self._fused[key] = fn
        return fn

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

    def save_data(self, record: dict) -> None:
        """Per-cycle scenario solver metrics (ref scenario_constraints.cpp
        saveData via the module saveData chain), incl. the per-cycle risk
        certificate from the scenario-theory layer."""
        record["scenario_selected_solver"] = getattr(self, "_last_selected", -1)
        record["scenario_n_solvers"] = self.cfg.scenario_constraints.parallel_solvers
        record["scenario_n_feasible"] = getattr(self, "_last_n_feasible", 0)
        record["scenario_n_samples"] = self.n_samples
        # a-posteriori violation-probability bound eps(s) for the selected
        # solver at confidence 1 - scenario_constraints.confidence
        # (1.0 = no guarantee this cycle: infeasible or pruning inexact)
        record["scenario_risk_certificate"] = getattr(
            self, "_last_certificate", 1.0)
        record["scenario_support_max"] = getattr(self, "_last_support_max", -1)
        record["scenario_cert_valid"] = getattr(self, "_last_cert_valid", False)
        record["scenario_support_bound_exceeded"] = (
            getattr(self, "_last_support_max", -1)
            > self.cfg.scenario_constraints.support_bound)

    def reset(self) -> None:
        self._prev_duals = None
        self._sample_seed = 0

    def is_data_ready(self, data):
        if getattr(data, "obstacle_block", None) is None:
            return False, "Obstacles"
        return True, ""
