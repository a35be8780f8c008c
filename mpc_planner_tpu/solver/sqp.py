"""SQP-RTI solver: linearize -> IP-Riccati QP -> full step, iterated.

TPU-native equivalent of the reference's generated acados SQP_RTI solver
plus its iteration wrapper (acados_solver_interface.cpp:86-204: `_num_
iterations` RTI iterations, EXACT Hessian with MIRROR regularization and
FIXED_STEP globalization per generate_acados_solver.py:155-162).

Differences by design:
  * Linearization (dynamics Jacobians, cost gradients/Hessians, constraint
    Jacobians) is `jax.jacfwd`/`jax.hessian` of the traced module
    expressions — no code generation.
  * MIRROR regularization = eigendecompose the stage Hessian and take
    max(|eig|, lm) (acados' MIRROR projects negative curvature the same
    way).
  * The per-cycle wall-clock timeout (acados_solver_interface.cpp:108-116)
    becomes a host-chosen iteration count: the planner picks how many RTI
    iterations fit the remaining budget (iteration time is deterministic
    on TPU, so budget -> count is a host-side division, planner.py).
  * The whole solve vmaps over a leading batch axis; `solve_batch` is the
    T-MPC++/scenario fan-out surface.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpc_planner_tpu.solver.ocp import OCP
from mpc_planner_tpu.solver.qp import QPData, solve_qp

# Exit codes follow the reference's Forces-style convention
# (acados_solver_interface.cpp:198-203 remaps acados codes to these).
EXIT_SUCCESS = 1
EXIT_FAILURE = -1
EXIT_NOT_OPTIMIZED_YET = -999  # ref controller_module.h:13


def explain_exit_flag(code: int) -> str:
    """Human-readable exit explanation (ref acados_solver_interface.cpp:
    391-424 explainExitFlag)."""
    return {
        EXIT_SUCCESS: "Success",
        0: "Maximum number of iterations reached",
        EXIT_FAILURE: "Solver failed (QP infeasible, NaN, or residual above tolerance)",
        EXIT_NOT_OPTIMIZED_YET: "Not optimized yet",
    }.get(int(code), f"Unknown exit code {code}")


class SolveResult(NamedTuple):
    Z: jnp.ndarray  # [.., N+1, nvar] solution trajectory (u, x per stage)
    exit_code: jnp.ndarray  # int32: 1 success / 0 max-iter (SQP) / -1 failure
    pobj: jnp.ndarray  # nonlinear objective at the solution
    res_eq: jnp.ndarray  # max dynamics defect
    qp_mu: jnp.ndarray  # final interior-point complementarity
    iters: jnp.ndarray = None  # SQP iterations actually applied per element
    lam_l: jnp.ndarray = None  # [.., N+1, nrows] final QP duals — feed back
    lam_u: jnp.ndarray = None  # as `warm_duals` next cycle (HPIPM warm_start=2
    #                            carried ACROSS control cycles, not just RTI
    #                            iterations; cuts first-QP IP iterations)


def _mirror(H, lm: float):
    """MIRROR regularization: eigenvalues -> max(|eig|, lm).

    On TPU uses the batched Jacobi eigensolver (ops/jacobi_eigh.py) —
    XLA's TPU eigh costs ~3us per tiny matrix and dominated the
    linearization; on CPU LAPACK eigh is faster than unrolled Jacobi."""
    if jax.default_backend() == "cpu":
        w, V = jnp.linalg.eigh(H)
        w = jnp.maximum(jnp.abs(w), lm)
        return (V * w[..., None, :]) @ jnp.swapaxes(V, -1, -2)
    from mpc_planner_tpu.ops.jacobi_eigh import mirror_unpacked

    return mirror_unpacked(H, lm)


class SQPSolver:
    """Compiled SQP-RTI solver for one OCP specification."""

    def __init__(self, ocp: OCP, iterations: Optional[int] = None,
                 qp_iterations: Optional[int] = None):
        self.ocp = ocp
        cfg = ocp.cfg
        self.iterations = cfg.solver.iterations if iterations is None else iterations
        self.qp_iterations = (
            cfg.solver.qp_iterations if qp_iterations is None else qp_iterations
        )
        # Warm-QP IP iteration count (RTI iterations >= 2 / dual-carried
        # first QPs): explicit config override, else 4 — the gated-fast
        # setting made safe-by-default by per-element stall escalation
        # (any element whose final barrier mu exceeds qp_mu_stall, or
        # that fails res_eq, is re-solved at the full cold budget through
        # the in-cycle retry dispatch; docs/PERF_NOTES.md).
        _wqi = int(getattr(cfg.solver, "qp_warm_iterations", 0) or 0)
        self.warm_qp_iters = _wqi if _wqi > 0 else 4
        self.qp_mu_stall = float(getattr(cfg.solver, "qp_mu_stall", 1e-3))
        # Wide QP kernel dispatch: blocks per Pallas call (0 = auto).
        self.qp_wide = int(getattr(cfg.solver, "qp_wide_blocks", 0))
        self.lm = cfg.solver.levenberg_marquardt
        self.tol_eq = cfg.solver.tol_eq_residual
        self.mu0 = cfg.solver.qp_mu0
        self.mu_min = cfg.solver.qp_mu_min
        # SQP_RTI: fixed iteration count (one per call in acados; iterated
        # by the wrapper). SQP: same Newton loop but with a convergence
        # freeze — elements whose step norm falls below tol_stationarity
        # stop updating, and non-converged elements exit with code 0
        # ("maximum iterations"), matching acados' iterated-SQP semantics
        # (generate_acados_solver.py solver_type option; settings.yaml
        # tolstat). The loop stays a fixed-length scan: deterministic
        # cycle time on TPU, convergence only masks the update.
        self.solver_type = getattr(cfg.solver, "solver_type", "SQP_RTI")
        self.tol_stat = cfg.solver.tol_stationarity
        self.warm_corrector_only = bool(
            getattr(cfg.solver, "qp_warm_corrector_only", False))
        self.warm_sigma = float(getattr(cfg.solver, "qp_warm_sigma", 0.1))
        # In-cycle cold retry of failed warm-dual solves (see solve_batch)
        self.qp_retry_cold = bool(getattr(cfg.solver, "qp_retry_cold", True))
        # Parallel-in-horizon Riccati (associative scan) — XLA path only.
        # Measured (experiments/horizon_sweep.py, TPU, 2026-08-21): the
        # scan is 2.6-5.9x SLOWER than the sequential sweeps at every
        # N in 10..240 — no crossover; default off everywhere (see
        # solver/parallel_riccati.py for the table).
        self.horizon_parallel = bool(
            getattr(cfg.solver, "horizon_parallel", False))

        N, nu, nx, nvar, nh = ocp.N, ocp.nu, ocp.nx, ocp.nvar, ocp.nh
        self.nrows = nu + nx + nh

        # Static box-row templates
        D_box = np.zeros((nu + nx, nvar))
        D_box[:nu, :nu] = np.eye(nu)
        D_box[nu:, nu:] = np.eye(nx)
        self._D_box = jnp.asarray(D_box)

        lbz = np.asarray(ocp.lb_z, dtype=float)
        ubz = np.asarray(ocp.ub_z, dtype=float)
        self._box_l_finite = jnp.asarray(np.isfinite(lbz).astype(float))
        self._box_u_finite = jnp.asarray(np.isfinite(ubz).astype(float))
        self._lbz = jnp.asarray(np.where(np.isfinite(lbz), lbz, -1e15))
        self._ubz = jnp.asarray(np.where(np.isfinite(ubz), ubz, 1e15))
        if nh:
            lh = np.asarray(ocp.lh, dtype=float)
            uh = np.asarray(ocp.uh, dtype=float)
            self._h_l_finite = jnp.asarray(np.isfinite(lh).astype(float))
            self._h_u_finite = jnp.asarray(np.isfinite(uh).astype(float))
            self._lh = jnp.asarray(np.where(np.isfinite(lh), lh, -1e15))
            self._uh = jnp.asarray(np.where(np.isfinite(uh), uh, 1e15))

        # QP backend: the fused Pallas kernel carries the batched solves on
        # TPU (ops/pallas_qp.py); XLA scan path is the CPU/fallback.
        backend = cfg.solver.qp_backend
        if backend == "auto":
            try:
                platform = jax.devices()[0].platform
            except Exception:  # pragma: no cover
                platform = "cpu"
            # nvar <= 9 covers every stock model incl. the SH-MPC slack
            # variant (nvar=8) and the bicycle models (nvar=9, measured
            # r5: 32.6 vs 504 ms per warm cycle at B=1024 against the
            # XLA path, 1024/1024 feasible, Z agreement 1e-6).
            # History: on the r1/r2 kernel nvar=8 was
            # NONDETERMINISTICALLY faulty on hardware (flip-flopping
            # between chip faults, all-NaN and correct answers across
            # processes) and was gated to the XLA path. After the r3
            # refs-based VMEM refactor of _ip_solve the fault no longer
            # reproduces: 10/10 fresh-process PASS on the real slack
            # model (experiments/nvar8_stress.py) plus 10/10 on
            # synthetic kernel-only QPs (experiments/nvar8_repro.py),
            # measured 2026-08-21; the bicycle nvar=9 rung passes the
            # same fresh-process stress. nu <= 3 is the closed-form
            # _sym_inv limit.
            backend = (
                "pallas" if platform != "cpu" and nu <= 3 and ocp.nvar <= 9
                else "xla"
            )
        self.qp_backend = backend

        # Fused whole-RTI kernel (linearize + MIRROR + QPs in one Pallas
        # launch per lane block, ops/pallas_rti.py). SQP mode needs the
        # per-iteration convergence freeze, which stays on the unfused
        # path.
        fused = getattr(cfg.solver, "rti_fused", "auto")
        fused_ok = (
            self.qp_backend == "pallas"
            and self.solver_type == "SQP_RTI"
            # corrector-only warm QPs need a different mehrotra flag for
            # the cold first QP than for warm ones — the unified in-kernel
            # loop has one static flag, so that config stays unfused.
            and not self.warm_corrector_only
        )
        if fused == "auto":
            # auto resolves OFF: the fused kernel is SHELVED for native
            # TPU execution. Measured 2026-08-21 (experiments/
            # fused_rti_check.py + direct probes): the Mosaic compile of
            # the fused program is killed by the compile helper (SIGKILL,
            # out-of-memory) at the flagship shape even at B=8 / one
            # lane block after ~20 min, and the GOAL rung (nvar=6, nh=0)
            # did not finish compiling within a 40-minute timeout —
            # vs ~30 s for the whole unfused goal-rung solve. Kernel
            # semantics remain verified in interpret mode
            # (tests/test_pallas_rti.py); revisit on a newer
            # libtpu/Mosaic. See docs/PERF_NOTES.md "Fused RTI kernel".
            self.rti_fused = False
        else:
            self.rti_fused = (fused in ("on", True)) and fused_ok

        # Bound templates for the fused kernel: per-(stage, row) bound
        # values with +-1e15 sentinels where the row is inactive (u-box +
        # h rows off at the terminal node, x-box off at stage 0,
        # infinite bounds off everywhere) — the same masks _linearize
        # builds, folded into constants so the kernel derives masks from
        # a compare.
        stage = np.arange(N + 1)
        u_act = (stage < N)[:, None]
        x_act = (stage > 0)[:, None]
        box_act = np.concatenate(
            [np.repeat(u_act, nu, 1), np.repeat(x_act, nx, 1)], axis=1
        )
        lb_T = np.where(box_act & np.isfinite(lbz)[None], lbz[None], -1e15)
        ub_T = np.where(box_act & np.isfinite(ubz)[None], ubz[None], 1e15)
        if nh:
            h_act = (stage < N)[:, None]
            lh = np.asarray(ocp.lh, dtype=float)
            uh = np.asarray(ocp.uh, dtype=float)
            lb_T = np.concatenate(
                [lb_T, np.where(h_act & np.isfinite(lh)[None], lh[None], -1e15)],
                axis=1,
            )
            ub_T = np.concatenate(
                [ub_T, np.where(h_act & np.isfinite(uh)[None], uh[None], 1e15)],
                axis=1,
            )
        self._lb_template = lb_T.astype(np.float32)
        self._ub_template = ub_T.astype(np.float32)

        # Pallas interpret mode (CPU tests drive the fused kernel this way)
        self.interpret = False

        # MIRROR inside the QP kernel (ops/pallas_qp.py): ship the RAW
        # Hessian stack and run the Jacobi sweep in-kernel, dropping the
        # XLA Jacobi pass + one HBM round trip from every RTI iteration.
        mik = getattr(cfg.solver, "qp_mirror_in_kernel", "auto")
        self.mirror_in_qp_kernel = (
            self.qp_backend == "pallas"
            if mik == "auto" else mik in ("on", "force", True)
        )
        # "force" skips the B <= LANES gate at the call site (experiments
        # only: G>1 + in-kernel mirror has historically overflowed the
        # Mosaic scoped-VMEM budget — see _solve_batch_pallas).
        self.mirror_in_qp_kernel_force = mik == "force"

        # Compiled-function cache keyed by (num_iterations, batched): the
        # host-side timeout logic selects the iteration count per cycle and
        # every count it uses is compiled once (ref budget semantics,
        # planner.cpp:117-118).
        self._compiled = {}

        # MIRROR structure: when the running cost's u-block is diagonal and
        # decoupled from x (true for every stock module set — inputs only
        # appear as w*u^2 penalties), MIRROR factorizes block-wise:
        # mirror(blkdiag(D, Hxx)) = blkdiag(max(|D|, lm), mirror(Hxx)).
        # Eigendecomposing nx=5 instead of nvar=7 matrices roughly halves
        # the Jacobi cost per linearization. Detected by probing the exact
        # traced Hessian at random points; "full" forces the dense path.
        structure = getattr(cfg.solver, "mirror_structure", "auto")
        if structure == "auto":
            self._mirror_x_only = self._probe_u_separable()
        elif structure == "x_only":
            self._mirror_x_only = True
        else:
            self._mirror_x_only = False

    def _probe_u_separable(self, n_probes: int = 4) -> bool:
        """True iff the running-cost Hessian's u-block is diagonal and its
        u-x cross block is zero at random probe points. Module costs are
        polynomial/rational in (z, p); the cross terms are exact zeros in
        the traced Hessian whenever no cost term couples an input with a
        state, so random probing is decisive for the stock module sets."""
        ocp = self.ocp
        nu, nvar = ocp.nu, ocp.nvar
        rng = np.random.default_rng(0)
        # Probe on host CPU: a tiny one-off trace, not worth a TPU compile.
        # local_devices, not devices: in a multi-process job global CPU
        # device 0 belongs to process 0 and is non-addressable elsewhere.
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            hess = jax.jit(jax.hessian(ocp.running_cost))
            probes = [
                np.asarray(hess(
                    jnp.asarray(rng.normal(0.0, 1.0, nvar), jnp.float32),
                    jnp.asarray(rng.normal(0.0, 1.0, ocp.npar), jnp.float32),
                ))
                for _ in range(n_probes)
            ]
        for H in probes:
            if not np.all(np.isfinite(H)):
                return False
            if np.max(np.abs(H[:nu, nu:])) > 1e-12:
                return False
            off = H[:nu, :nu] - np.diag(np.diag(H[:nu, :nu]))
            if np.max(np.abs(off)) > 1e-12:
                return False
        return True

    def _mirror_nvar(self, H):
        """MIRROR a [..., nvar, nvar] stage-Hessian stack, exploiting the
        u-separable block structure when detected."""
        if not self._mirror_x_only:
            return _mirror(H, self.lm)
        nu, nx = self.ocp.nu, self.ocp.nx
        d = jnp.diagonal(H[..., :nu, :nu], axis1=-2, axis2=-1)
        d = jnp.maximum(jnp.abs(d), self.lm)
        Huu = d[..., None, :] * jnp.eye(nu, dtype=H.dtype)
        Hxx = _mirror(H[..., nu:, nu:], self.lm)
        zeros_ux = jnp.zeros(H.shape[:-2] + (nu, nx), H.dtype)
        zeros_xu = jnp.zeros(H.shape[:-2] + (nx, nu), H.dtype)
        top = jnp.concatenate([Huu, zeros_ux], axis=-1)
        bot = jnp.concatenate([zeros_xu, Hxx], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    # -- linearization ----------------------------------------------------
    def _linearize(self, Z, P, mirror: bool = True):
        """`mirror=False` defers the MIRROR regularization to the caller:
        XLA's eigh lowers catastrophically with two batch dims (a vmapped
        [B, N, 7, 7] costs ~15ms vs ~0.1ms flattened to 3D), so the fused
        batch path applies it once on a flattened stack."""
        ocp = self.ocp
        N, nu, nx, nvar, nh = ocp.N, ocp.nu, ocp.nx, ocp.nvar, ocp.nh
        dtype = Z.dtype

        Zr, Pr = Z[:N], P[:N]

        # Dynamics: value + Jacobian
        f_val = jax.vmap(ocp.dynamics_fn)(Zr, Pr)  # [N, nx]
        Jf = jax.vmap(jax.jacfwd(ocp.dynamics_fn))(Zr, Pr)  # [N, nx, nvar]
        A = Jf[:, :, nu:]
        B = Jf[:, :, :nu]
        c = f_val - Z[1:, nu:]

        # Cost: gradient + (mirrored) Hessian
        g_run = jax.vmap(jax.grad(ocp.running_cost))(Zr, Pr)
        H_run = jax.vmap(jax.hessian(ocp.running_cost))(Zr, Pr)
        if mirror:
            H_run = self._mirror_nvar(H_run)

        zN = Z[N].at[:nu].set(0.0)
        g_term_full = jax.grad(ocp.terminal_cost)(zN, P[N])
        H_term_full = jax.hessian(ocp.terminal_cost)(zN, P[N])
        H_term_x = H_term_full[nu:, nu:]
        if mirror:
            H_term_x = _mirror(H_term_x, self.lm)

        H = jnp.concatenate(
            [H_run, jnp.zeros((1, nvar, nvar), dtype).at[0, nu:, nu:].set(H_term_x)],
            axis=0,
        )
        g = jnp.concatenate(
            [g_run, jnp.zeros((1, nvar), dtype).at[0, nu:].set(g_term_full[nu:])],
            axis=0,
        )

        # Constraint rows
        if nh:
            h_val = jax.vmap(ocp.constraint_fn)(Zr, Pr)  # [N, nh]
            Jh = jax.vmap(jax.jacfwd(ocp.constraint_fn))(Zr, Pr)  # [N, nh, nvar]
        else:
            h_val = jnp.zeros((N, 0), dtype)
            Jh = jnp.zeros((N, 0, nvar), dtype)

        # Uniform row layout per stage: [u-box, x-box, h]
        D_box = jnp.broadcast_to(self._D_box, (N + 1, nu + nx, nvar))
        Jh_full = jnp.concatenate([Jh, jnp.zeros((1, nh, nvar), dtype)], axis=0)
        D = jnp.concatenate([D_box, Jh_full], axis=1)  # [N+1, nrows, nvar]

        # Shifted bounds: box rows relative to current z
        lb_box = self._lbz[None, :] - Z  # [N+1, nvar]
        ub_box = self._ubz[None, :] - Z
        if nh:
            h_pad = jnp.concatenate([h_val, jnp.zeros((1, nh), dtype)], axis=0)
            lb_h = self._lh[None, :] - h_pad
            ub_h = self._uh[None, :] - h_pad
            lb = jnp.concatenate([lb_box, lb_h], axis=1)
            ub = jnp.concatenate([ub_box, ub_h], axis=1)
        else:
            lb, ub = lb_box, ub_box

        # Masks: u-box + h inactive at terminal; x-box inactive at stage 0;
        # infinite bounds inactive everywhere.
        stage_idx = jnp.arange(N + 1)
        u_active = (stage_idx < N).astype(dtype)[:, None]  # [N+1, 1]
        x_active = (stage_idx > 0).astype(dtype)[:, None]
        h_active = (stage_idx < N).astype(dtype)[:, None]

        mask_l = jnp.concatenate(
            [
                u_active * self._box_l_finite[None, :nu],
                x_active * self._box_l_finite[None, nu:],
            ]
            + ([h_active * self._h_l_finite[None, :]] if nh else []),
            axis=1,
        )
        mask_u = jnp.concatenate(
            [
                u_active * self._box_u_finite[None, :nu],
                x_active * self._box_u_finite[None, nu:],
            ]
            + ([h_active * self._h_u_finite[None, :]] if nh else []),
            axis=1,
        )

        return QPData(H=H, g=g, A=A, B=B, c=c, D=D, lb=lb, ub=ub,
                      mask_l=mask_l, mask_u=mask_u)

    # -- SQP-RTI loop -----------------------------------------------------
    def _solve(self, Z0, P, xinit, num_iterations: int, warm0=None,
               warm_iters=None):
        # TPU matmuls default to bf16 passes; the Riccati recursion loses
        # positive-definiteness at bf16 and Cholesky NaNs. Force true-f32
        # matmuls for everything traced inside the solver (tiny matrices —
        # the cost is negligible, the solve is latency-bound).
        with jax.default_matmul_precision("highest"):
            return self._solve_inner(Z0, P, xinit, num_iterations, warm0,
                                     warm_iters)

    def _solve_inner(self, Z0, P, xinit, num_iterations: int, warm0=None,
                     warm_iters=None):
        ocp = self.ocp
        nu, nx = ocp.nu, ocp.nx

        # Pin x_0 = xinit (ref setXinit + lbx0/ubx0)
        Z0 = Z0.at[0, nu:].set(xinit)

        # First QP: cold IP start at full iteration count — unless the
        # caller carries duals from the PREVIOUS CONTROL CYCLE (warm0),
        # which warm-starts it like any later RTI iteration. Subsequent
        # RTI iterations warm-start from the previous QP (HPIPM
        # warm_start=2) and need far fewer IP iterations.
        sqp_mode = self.solver_type == "SQP"

        wi = self.warm_qp_iters if warm_iters is None else int(warm_iters)
        it0 = self.qp_iterations if warm0 is None else wi
        warm_mehrotra = not self.warm_corrector_only
        qp0 = self._linearize(Z0, P)
        sol0 = solve_qp(qp0, nu, nx, iterations=it0,
                        mu0=self.mu0, mu_min=self.mu_min, warm_duals=warm0,
                        mehrotra=(warm0 is None) or warm_mehrotra,
                        sigma_fixed=self.warm_sigma,
                        horizon_parallel=self.horizon_parallel)
        Z1 = Z0 + sol0.dz  # FIXED_STEP globalization
        done1 = jnp.max(jnp.abs(sol0.dz)) < self.tol_stat
        if num_iterations == 1:
            Z, mus, done, iters = Z1, sol0.mu[None], done1, jnp.int32(1)
            lam_l_fin, lam_u_fin = sol0.lam_l, sol0.lam_u
        else:
            warm_iters = wi

            def rti_iter(carry, _):
                Z, lam_l, lam_u, mu_prev, done, iters = carry
                qp = self._linearize(Z, P)
                sol = solve_qp(
                    qp, nu, nx,
                    iterations=warm_iters,
                    mu0=self.mu0,
                    mu_min=self.mu_min,
                    warm_duals=(lam_l, lam_u, mu_prev < 1e-2),
                    mehrotra=warm_mehrotra,
                    sigma_fixed=self.warm_sigma,
                    horizon_parallel=self.horizon_parallel,
                )
                if sqp_mode:
                    Z_new = jnp.where(done, Z, Z + sol.dz)
                    iters = iters + jnp.where(done, 0, 1).astype(jnp.int32)
                    done = done | (jnp.max(jnp.abs(sol.dz)) < self.tol_stat)
                else:
                    Z_new = Z + sol.dz
                    iters = iters + 1
                return (Z_new, sol.lam_l, sol.lam_u, sol.mu, done, iters), sol.mu

            (Z, lam_l_fin, lam_u_fin, _, done, iters), mus = jax.lax.scan(
                rti_iter, (Z1, sol0.lam_l, sol0.lam_u, sol0.mu, done1,
                           jnp.int32(1)), None,
                length=num_iterations - 1,
            )

        res_eq = ocp.eq_residual(Z, P)
        pobj = ocp.total_cost(Z, P)
        finite = jnp.isfinite(res_eq) & jnp.isfinite(pobj) & jnp.all(jnp.isfinite(Z))
        success = finite & (res_eq <= self.tol_eq)
        if sqp_mode:
            # acados SQP: converged -> success; ran out of iterations with
            # a finite iterate -> 0 ("maximum iterations"); else failure.
            success = success & done
            exit_code = jnp.where(
                success, EXIT_SUCCESS,
                jnp.where(finite & (res_eq <= self.tol_eq), 0, EXIT_FAILURE),
            ).astype(jnp.int32)
        else:
            exit_code = jnp.where(success, EXIT_SUCCESS, EXIT_FAILURE).astype(jnp.int32)
        return SolveResult(Z=Z, exit_code=exit_code, pobj=pobj,
                           res_eq=res_eq, qp_mu=jnp.atleast_1d(mus)[-1],
                           iters=iters, lam_l=lam_l_fin, lam_u=lam_u_fin)

    # -- fused batched solve (Pallas QP backend) --------------------------
    def _solve_batch_pallas(self, Z0, P, xinit, num_iterations: int, warm0=None,
                            warm_iters=None):
        """Batch-level SQP-RTI: XLA linearization (vmapped) + one fused
        Pallas kernel per QP. Z0 [B, N+1, nvar], P [B, N+1, npar],
        xinit [B, nx]. `warm0` = (lam_l, lam_u, ok[B]) duals carried from
        the previous control cycle."""
        from mpc_planner_tpu.ops.pallas_qp import LANES, solve_qp_pallas

        ocp = self.ocp
        nu, nx = ocp.nu, ocp.nx

        with jax.default_matmul_precision("highest"):
            Z0 = Z0.at[:, 0, nu:].set(xinit)

            # In-kernel MIRROR only for single-lane-block calls (B <= 128
            # — the closed-loop / per-robot latency path). At G > 1
            # unrolled blocks the extra in-kernel Jacobi state pushes the
            # program past the Mosaic scoped-VMEM budget at flagship
            # shapes (measured: G=8 + in-kernel mirror OOMs at 19.7 MB vs
            # a 19.28 MB limit, while G=1 + mirror and G=8 + XLA-mirror
            # both compile — the r2 bench crash, VERDICT r2 Weak #1/#3).
            mirror_in_kernel = self.mirror_in_qp_kernel and (
                Z0.shape[0] <= LANES or self.mirror_in_qp_kernel_force
            )

            def lin(Z, P_):
                # Linearize without mirror. With mirror_in_qp_kernel the
                # RAW Hessian stack ships to the kernel, which applies
                # the MIRROR Jacobi itself (saves the XLA Jacobi pass +
                # one HBM round trip per RTI iteration). Otherwise mirror
                # the whole [B*(N+1)] stack here with the element-
                # unpacked Jacobi (~10x the .at[].set() Jacobi at
                # B=1024). _mirror_nvar exploits the u-separable block
                # structure when detected (5x5 Jacobi instead of 7x7).
                # The terminal row's zero u-block mirrors to lm*I on the
                # u-diagonal, which the QP's terminal stage never reads.
                qp = jax.vmap(lambda z, p: self._linearize(z, p, mirror=False))(Z, P_)
                if mirror_in_kernel:
                    return qp
                Bb, Np1, nv, _ = qp.H.shape
                H_m = self._mirror_nvar(qp.H.reshape(Bb * Np1, nv, nv))
                return qp._replace(H=H_m.reshape(Bb, Np1, nv, nv))

            mirror_kw = dict(
                mirror_in_kernel=mirror_in_kernel, lm=self.lm,
                mirror_x_only=self._mirror_x_only,
                interpret=self.interpret,
            )
            sqp_mode = self.solver_type == "SQP"
            Bb = Z0.shape[0]

            wi = self.warm_qp_iters if warm_iters is None else int(warm_iters)
            it0 = self.qp_iterations if warm0 is None else wi
            warm_mehrotra = not self.warm_corrector_only
            qp0 = lin(Z0, P)
            sol0 = solve_qp_pallas(
                qp0, nu, nx, iterations=it0, mu0=self.mu0, warm_duals=warm0,
                mehrotra=(warm0 is None) or warm_mehrotra,
                sigma_fixed=self.warm_sigma, wide=self.qp_wide, **mirror_kw,
            )
            Z1 = Z0 + sol0.dz
            done1 = jnp.max(jnp.abs(sol0.dz), axis=(1, 2)) < self.tol_stat  # [B]
            if num_iterations == 1:
                Z, mu_last, done = Z1, sol0.mu, done1
                iters = jnp.ones((Bb,), jnp.int32)
                ll_fin, lu_fin = sol0.lam_l, sol0.lam_u
            else:
                warm_iters = wi

                def rti_iter(carry, _):
                    Z, ll, lu, mu, done, iters = carry
                    qp = lin(Z, P)
                    sol = solve_qp_pallas(
                        qp, nu, nx, iterations=warm_iters, mu0=self.mu0,
                        warm_duals=(ll, lu, mu < 1e-2),
                        mehrotra=warm_mehrotra,
                        sigma_fixed=self.warm_sigma, wide=self.qp_wide,
                        **mirror_kw,
                    )
                    if sqp_mode:
                        Z_new = jnp.where(done[:, None, None], Z, Z + sol.dz)
                        iters = iters + jnp.where(done, 0, 1).astype(jnp.int32)
                        done = done | (
                            jnp.max(jnp.abs(sol.dz), axis=(1, 2)) < self.tol_stat
                        )
                    else:
                        Z_new = Z + sol.dz
                        iters = iters + 1
                    return (Z_new, sol.lam_l, sol.lam_u, sol.mu, done, iters), None

                (Z, ll_fin, lu_fin, mu_last, done, iters), _ = jax.lax.scan(
                    rti_iter,
                    (Z1, sol0.lam_l, sol0.lam_u, sol0.mu, done1,
                     jnp.ones((Bb,), jnp.int32)),
                    None, length=num_iterations - 1,
                )

            res_eq = jax.vmap(ocp.eq_residual)(Z, P)
            pobj = jax.vmap(ocp.total_cost)(Z, P)
            finite = (
                jnp.isfinite(res_eq)
                & jnp.isfinite(pobj)
                & jnp.all(jnp.isfinite(Z), axis=(1, 2))
            )
            ok = finite & (res_eq <= self.tol_eq)
            if sqp_mode:
                exit_code = jnp.where(
                    ok & done, EXIT_SUCCESS, jnp.where(ok, 0, EXIT_FAILURE)
                ).astype(jnp.int32)
            else:
                exit_code = jnp.where(ok, EXIT_SUCCESS, EXIT_FAILURE).astype(jnp.int32)
            return SolveResult(Z=Z, exit_code=exit_code, pobj=pobj,
                               res_eq=res_eq, qp_mu=mu_last, iters=iters,
                               lam_l=ll_fin, lam_u=lu_fin)

    # -- fully fused batched solve (whole RTI loop in-kernel) -------------
    def _solve_batch_fused(self, Z0, P, xinit, num_iterations: int, warm0=None,
                           warm_iters=None):
        """Whole-solve fused path: ops/pallas_rti.py runs linearization,
        MIRROR and every QP inside one kernel launch per 128-lane block.
        Same warm-start ladder as `_solve_batch_pallas`."""
        from mpc_planner_tpu.ops.pallas_rti import solve_rti_pallas

        ocp = self.ocp
        nu, nx = ocp.nu, ocp.nx

        with jax.default_matmul_precision("highest"):
            Z0 = Z0.at[:, 0, nu:].set(xinit)
            wi = self.warm_qp_iters if warm_iters is None else int(warm_iters)
            it0 = self.qp_iterations if warm0 is None else wi
            warm_iters = wi
            res = solve_rti_pallas(
                Z0, P,
                dyn_fn=ocp.dynamics_fn, run_cost=ocp.running_cost,
                term_cost=ocp.terminal_cost,
                con_fn=ocp.constraint_fn if ocp.nh else None,
                nu=nu, nx=nx, nh=ocp.nh,
                lb_template=self._lb_template,
                ub_template=self._ub_template,
                num_iterations=num_iterations, it0=it0, warm_iters=warm_iters,
                mu0=self.mu0, warm_duals=warm0,
                mehrotra=True,
                sigma_fixed=self.warm_sigma,
                lm=self.lm, mirror_x_only=self._mirror_x_only,
                interpret=self.interpret,
            )
            Z = res.Z
            res_eq = jax.vmap(ocp.eq_residual)(Z, P)
            pobj = jax.vmap(ocp.total_cost)(Z, P)
            finite = (
                jnp.isfinite(res_eq)
                & jnp.isfinite(pobj)
                & jnp.all(jnp.isfinite(Z), axis=(1, 2))
            )
            ok = finite & (res_eq <= self.tol_eq)
            exit_code = jnp.where(ok, EXIT_SUCCESS, EXIT_FAILURE).astype(jnp.int32)
            Bb = Z.shape[0]
            return SolveResult(
                Z=Z, exit_code=exit_code, pobj=pobj, res_eq=res_eq,
                qp_mu=res.mu,
                iters=jnp.full((Bb,), num_iterations, jnp.int32),
                lam_l=res.lam_l, lam_u=res.lam_u,
            )

    def batch_impl(self, Z0, P, xinit, num_iterations: int, warm0=None,
                   escalated: bool = False):
        """Traceable batched solve on the configured backend (no jit —
        compose under your own jit/shardings, e.g. parallel/distributed
        step functions). `escalated` runs EVERY QP at the full cold
        iteration budget — the conservative program the stall-escalation
        retry dispatches flagged elements to."""
        wi = self.qp_iterations if escalated else None
        if self.qp_backend == "pallas":
            impl = (
                self._solve_batch_fused if self.rti_fused
                else self._solve_batch_pallas
            )
            return impl(Z0, P, xinit, num_iterations, warm0=warm0,
                        warm_iters=wi)
        if warm0 is None:
            return jax.vmap(
                lambda z, p, x: self._solve(z, p, x, num_iterations,
                                            warm_iters=wi)
            )(Z0, P, xinit)
        return jax.vmap(
            lambda z, p, x, wl, wu, ok: self._solve(
                z, p, x, num_iterations, warm0=(wl, wu, ok), warm_iters=wi)
        )(Z0, P, xinit, *warm0)

    # -- public API --------------------------------------------------------
    def _get_compiled(self, n: int, batched: bool, warm: bool = False,
                      escalated: bool = False):
        key = (n, batched, warm, escalated)
        fn = self._compiled.get(key)
        if fn is None:
            wi = self.qp_iterations if escalated else None
            if batched and self.qp_backend == "pallas":
                impl = (
                    self._solve_batch_fused if self.rti_fused
                    else self._solve_batch_pallas
                )
                if warm:
                    fn = jax.jit(lambda Z0, P, xinit, wl, wu, ok:
                                 impl(Z0, P, xinit, n, warm0=(wl, wu, ok),
                                      warm_iters=wi))
                else:
                    fn = jax.jit(
                        lambda Z0, P, xinit: impl(Z0, P, xinit, n,
                                                  warm_iters=wi)
                    )
            else:
                if warm:
                    base = lambda Z0, P, xinit, wl, wu, ok: self._solve(
                        Z0, P, xinit, n, warm0=(wl, wu, ok), warm_iters=wi)
                else:
                    base = lambda Z0, P, xinit: self._solve(
                        Z0, P, xinit, n, warm_iters=wi)
                fn = jax.jit(jax.vmap(base) if batched else base)
            self._compiled[key] = fn
        return fn

    @staticmethod
    def _as_warm(warm_duals):
        wl, wu, ok = warm_duals
        return (jnp.asarray(wl, jnp.float32), jnp.asarray(wu, jnp.float32),
                jnp.asarray(ok, bool))

    def bound_limited_vars(self, Z, tol: float = 1e-2):
        """Variables within `tol` of a box bound at the solution — the
        acados wrapper's printIfBoundLimited debug
        (acados_solver_interface.cpp:426-446). Z [N+1, nvar]; returns
        a list of (stage, name, "lower"|"upper"). Stage-0 states are
        skipped (pinned to xinit, like the reference's k==0 'x' skip)."""
        ocp = self.ocp
        Z = np.asarray(Z)
        lb = np.asarray(ocp.lb_z, dtype=float)
        ub = np.asarray(ocp.ub_z, dtype=float)
        names = list(ocp.model.inputs) + list(ocp.model.states)
        hits = []
        for k in range(Z.shape[0]):
            for j, name in enumerate(names):
                if k == 0 and j >= ocp.nu:
                    continue
                if np.isfinite(lb[j]) and abs(Z[k, j] - lb[j]) < tol:
                    hits.append((k, name, "lower"))
                if np.isfinite(ub[j]) and abs(Z[k, j] - ub[j]) < tol:
                    hits.append((k, name, "upper"))
        return hits

    def solve(self, Z0, P, xinit, num_iterations: Optional[int] = None,
              warm_duals=None) -> SolveResult:
        """Single solve. Z0 [N+1, nvar] warmstart, P [N+1, npar], xinit [nx].
        `warm_duals` = (lam_l [N+1, nrows], lam_u, ok scalar) from the
        previous control cycle's SolveResult.

        On the Pallas backend this runs as a batch of one (the kernel's
        lane block is fixed; a single solve costs the same as 128)."""
        n = self.iterations if num_iterations is None else max(int(num_iterations), 1)
        if self.qp_backend == "pallas":
            res = self.solve_batch(
                jnp.asarray(Z0, jnp.float32)[None],
                jnp.asarray(P, jnp.float32)[None],
                jnp.asarray(xinit, jnp.float32)[None],
                num_iterations=n,
                warm_duals=None if warm_duals is None else tuple(
                    jnp.asarray(w)[None] for w in warm_duals),
            )
            return SolveResult(Z=res.Z[0], exit_code=res.exit_code[0],
                               pobj=res.pobj[0], res_eq=res.res_eq[0],
                               qp_mu=res.qp_mu[0],
                               iters=None if res.iters is None else res.iters[0],
                               lam_l=res.lam_l[0], lam_u=res.lam_u[0])
        args = (jnp.asarray(Z0, jnp.float32), jnp.asarray(P, jnp.float32),
                jnp.asarray(xinit, jnp.float32))
        if warm_duals is not None:
            res = self._get_compiled(n, False, True)(*args, *self._as_warm(warm_duals))
        else:
            res = self._get_compiled(n, False)(*args)
        # Same stall escalation as solve_batch, scalar form.
        if (getattr(self, "qp_retry_cold", True)
                and self.warm_qp_iters < self.qp_iterations):
            code = int(res.exit_code)
            stalled = (code == EXIT_SUCCESS
                       and float(res.qp_mu) > self.qp_mu_stall)
            if code == EXIT_FAILURE or stalled:
                esc = self._get_compiled(n, False, escalated=True)(*args)
                if (int(esc.exit_code) > code
                        or (stalled and int(esc.exit_code) == EXIT_SUCCESS)):
                    return esc
        return res

    def solve_batch(self, Z0, P, xinit, num_iterations: Optional[int] = None,
                    warm_duals=None) -> SolveResult:
        """Batched solve over a leading axis (T-MPC planners / scenarios).
        `warm_duals` = (lam_l [B, N+1, nrows], lam_u, ok [B]) carried from
        the previous cycle.

        Warm-dual solves that FAIL are re-solved cold in the same cycle
        (`solver.qp_retry_cold`, on by default): carried duals go stale
        exactly when the constraint geometry shifts fast — pedestrians
        crossing at close range — and a warm-started QP then stalls at
        mu ~ mu0 while a cold solve of the same problem succeeds
        (measured in the 12-ped corridor: alternating all-warm-fail /
        all-cold-pass cycles locked the robot into a braking crawl).
        The reference's analog is the acados wrapper's QP-memory reset
        on failure (acados_solver_interface.cpp:186-191), which only
        helps the NEXT cycle; one extra batched dispatch is cheap
        enough on TPU to recover THIS cycle."""
        n = self.iterations if num_iterations is None else max(int(num_iterations), 1)
        args = (jnp.asarray(Z0, jnp.float32), jnp.asarray(P, jnp.float32),
                jnp.asarray(xinit, jnp.float32))
        if warm_duals is None:
            res = self._get_compiled(n, True)(*args)
            applied = None
        else:
            res = self._get_compiled(n, True, True)(
                *args, *self._as_warm(warm_duals))
            applied = np.asarray(warm_duals[2]).astype(bool)
        if not getattr(self, "qp_retry_cold", True):
            return res
        if self.warm_qp_iters >= self.qp_iterations and applied is None:
            return res  # escalated program would be identical
        # Escalate hard FAILURES and soft STALLS to the full-budget
        # program (every QP at qp_iterations IP iterations). A QP chain
        # at the short warm budget can end res_eq-feasible but with its
        # barrier mu still high (not actually converged) — exactly the
        # constraint-flipping tail the gated warm=4 setting cannot see.
        # SQP-mode exit_code 0 ("max iterations but feasible") is NOT
        # escalated — a re-solve could downgrade it (ADVICE r3).
        codes = np.asarray(res.exit_code)
        failed = codes == EXIT_FAILURE
        stalled = (codes == EXIT_SUCCESS) & (
            np.asarray(res.qp_mu) > self.qp_mu_stall)
        if applied is not None:
            # Warm path: only escalate elements whose warm duals were
            # actually applied — ok=False elements already solved cold.
            failed &= applied
            stalled &= applied
        if not (failed | stalled).any():
            return res
        cold = self._get_compiled(n, True, escalated=True)(*args)
        # Adopt the escalated result where it is strictly better than a
        # failed one, or where a stalled-feasible element's full-budget
        # solve also succeeded (the converged solve is the trustworthy
        # one).
        m = jnp.asarray(failed) & (cold.exit_code > res.exit_code)
        m = m | (jnp.asarray(stalled) & (cold.exit_code == EXIT_SUCCESS))

        def pick(w, c):
            if w is None or c is None:
                return w
            mm = m.reshape((m.shape[0],) + (1,) * (w.ndim - 1))
            return jnp.where(mm, c, w)

        return SolveResult(*(pick(w, c) for w, c in zip(res, cold)))
