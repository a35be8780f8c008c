"""Stagewise interior-point QP solved with Riccati sweeps — the numerical
hot loop.

TPU-native replacement for the reference's acados + PARTIAL_CONDENSING_
HPIPM QP step (SURVEY.md §2.4; options generate_acados_solver.py:143-176).
Same mathematical structure as HPIPM: a Mehrotra predictor-corrector
primal-dual interior point method over the stagewise QP whose Newton
systems are solved exactly by a backward/forward Riccati recursion. The
Riccati factorization is computed ONCE per IP iteration and reused for
the affine (predictor) and corrector solves. Primal and dual step sizes
are separate — essential for infeasible warmstarts (an obstacle
appearing on the previous trajectory), where a single coupled step size
collapses. Everything is fixed-iteration `lax.scan` so one jit covers
every control cycle, and the whole solver vmaps over a leading batch
axis (T-MPC++ planners x scenario draws — the reference's OpenMP
threads, guidance_constraints.cpp:279, become this batch dimension).

Per stage k = 0..N-1 the QP is
    min  1/2 dz_k' H_k dz_k + g_k' dz_k  (+ terminal x-term at N)
    s.t. dx_{k+1} = A_k dx_k + B_k du_k + r_k
         lb_k <= D_k dz_k <= ub_k          (box rows + h-constraint rows)
with dx_0 = 0 (x_0 pinned to xinit, acados_solver_interface.cpp:124-126).
Infinite bounds are masked rows (HPIPM masks them too).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPData(NamedTuple):
    """Linearized stagewise QP (shapes for one batch element)."""

    H: jnp.ndarray  # [N+1, nvar, nvar]; terminal: x-block only
    g: jnp.ndarray  # [N+1, nvar]
    A: jnp.ndarray  # [N, nx, nx]
    B: jnp.ndarray  # [N, nx, nu]
    c: jnp.ndarray  # [N, nx] dynamics defects f(z_k) - x_{k+1}
    D: jnp.ndarray  # [N+1, nrows, nvar]
    lb: jnp.ndarray  # [N+1, nrows] shifted lower bounds (on D dz)
    ub: jnp.ndarray  # [N+1, nrows]
    mask_l: jnp.ndarray  # [N+1, nrows] 1.0 where lower side active
    mask_u: jnp.ndarray  # [N+1, nrows]


class QPSolution(NamedTuple):
    dz: jnp.ndarray  # [N+1, nvar]
    mu: jnp.ndarray  # final complementarity measure
    alpha_last: jnp.ndarray
    lam_l: jnp.ndarray = None  # final duals for warm-starting the next QP
    lam_u: jnp.ndarray = None


_S_MIN = 1e-7
_W_MAX = 1e7
_MU_FREEZE = 1e-9  # stop updating once converged (f32 overflow guard)


def _riccati_factor(H_bar, A, B, nu: int, nx: int, reg: float):
    """Backward Riccati factorization.

    Returns per-stage (L, K, S_hat, P_next) with L = chol(R_hat) so that
    linear solves for different gradients reuse the factorization
    (predictor + corrector share it)."""
    N = A.shape[0]
    P_term = H_bar[N, nu:, nu:]

    def backward(P_next, inp):
        Hk, Ak, Bk = inp
        R = Hk[:nu, :nu]
        S = Hk[:nu, nu:]
        Q = Hk[nu:, nu:]
        PA = P_next @ Ak
        PB = P_next @ Bk
        R_hat = R + Bk.T @ PB + reg * jnp.eye(nu, dtype=Hk.dtype)
        S_hat = S + Bk.T @ PA
        L = jnp.linalg.cholesky(R_hat)
        K = -jax.scipy.linalg.cho_solve((L, True), S_hat)
        P = Q + Ak.T @ PA + S_hat.T @ K
        P = 0.5 * (P + P.T)
        return P, (L, K, S_hat, P_next)

    _, factors = jax.lax.scan(backward, P_term, (H_bar[:N], A, B), reverse=True)
    return factors


def _riccati_linear(factors, g_bar, r_eq, A, B, nu: int, nx: int):
    """Linear solve for a given gradient using a stored factorization."""
    Ls, Ks, S_hats, P_nexts = factors
    N = A.shape[0]
    p_term = g_bar[N, nu:]

    def backward(p_next, inp):
        gk, Ak, Bk, rk, L, K, S_hat, P_next = inp
        pc = p_next + P_next @ rk
        r_hat = gk[:nu] + Bk.T @ pc
        q_hat = gk[nu:] + Ak.T @ pc
        kff = -jax.scipy.linalg.cho_solve((L, True), r_hat)
        p = q_hat + S_hat.T @ kff
        return p, kff

    _, kffs = jax.lax.scan(
        backward, p_term, (g_bar[:N], A, B, r_eq, Ls, Ks, S_hats, P_nexts),
        reverse=True,
    )

    def forward(dx, inp):
        K, kff, Ak, Bk, rk = inp
        du = K @ dx + kff
        dx_next = Ak @ dx + Bk @ du + rk
        return dx_next, (du, dx)

    dx0 = jnp.zeros((nx,), dtype=g_bar.dtype)
    dxN, (dus, dxs) = jax.lax.scan(forward, dx0, (Ks, kffs, A, B, r_eq))
    dz_run = jnp.concatenate([dus, dxs], axis=-1)
    dz_term = jnp.concatenate([jnp.zeros((nu,), dtype=g_bar.dtype), dxN])
    return jnp.concatenate([dz_run, dz_term[None]], axis=0)


def solve_qp(
    data: QPData,
    nu: int,
    nx: int,
    iterations: int = 12,
    mu0: float = 1e1,
    mu_min: float = 1e-12,
    reg: float = 1e-7,
    tau: float = 0.995,
    warm_duals=None,
    horizon_parallel: bool = False,
    mehrotra: bool = True,
    sigma_fixed: float = 0.1,
) -> QPSolution:
    """Mehrotra predictor-corrector IP solve, fixed iteration count.

    `warm_duals` = (lam_l, lam_u) from the previous RTI iteration's QP
    (HPIPM qp_solver_warm_start=2, generate_acados_solver.py:172): carrying
    multipliers across relinearizations lets later QPs converge in a
    fraction of the iterations.

    `horizon_parallel` swaps the O(N)-depth sequential Riccati sweeps for
    the O(log N)-depth associative-scan LQR (solver/parallel_riccati.py) —
    same Newton systems, chosen for long horizons.

    `mehrotra=False` drops the affine predictor solve and uses plain
    path-following with fixed centering `sigma_fixed` — one Riccati
    linear solve per iteration instead of two. Intended for warm-started
    QPs (RTI iterations >= 2), whose iterates start near the central
    path and don't need Mehrotra's adaptive centering; the solve is
    latency-bound, so halving the substitution sweeps nearly halves the
    per-iteration cost.
    """
    Np1, nrows, nvar = data.D.shape
    dtype = data.H.dtype

    mask_l = data.mask_l
    mask_u = data.mask_u
    n_active = jnp.maximum(jnp.sum(mask_l) + jnp.sum(mask_u), 1.0)

    zeta = jnp.zeros((Np1, nvar), dtype=dtype)
    # e = D zeta = 0 at init; slacks from bound distances, floored.
    s_l = jnp.where(mask_l > 0, jnp.maximum(-data.lb, 1e-2), 1.0)
    s_u = jnp.where(mask_u > 0, jnp.maximum(data.ub, 1e-2), 1.0)
    lam_l_cold = jnp.where(mask_l > 0, mu0 / s_l, 0.0)
    lam_u_cold = jnp.where(mask_u > 0, mu0 / s_u, 0.0)
    if warm_duals is None:
        lam_l, lam_u = lam_l_cold, lam_u_cold
    else:
        # Use warm duals only if the previous QP actually converged
        # (a diverged/infeasible QP leaves garbage multipliers).
        wl, wu, ok = warm_duals
        lam_l = jnp.where(
            mask_l > 0, jnp.where(ok, jnp.clip(wl, 1e-8, _W_MAX), lam_l_cold), 0.0
        )
        lam_u = jnp.where(
            mask_u > 0, jnp.where(ok, jnp.clip(wu, 1e-8, _W_MAX), lam_u_cold), 0.0
        )

    def _ftb(v, dv, mask, t):
        """Fraction-to-boundary step bound: max alpha s.t. v + a*dv >= (1-t)v."""
        ratio = jnp.where((dv < 0) & (mask > 0), -t * v / (dv - 1e-30), 1.0)
        return jnp.clip(jnp.min(ratio), 0.0, 1.0)

    def ip_iter(carry, _):
        zeta, s_l, s_u, lam_l, lam_u = carry

        mu = (jnp.sum(s_l * lam_l * mask_l) + jnp.sum(s_u * lam_u * mask_u)) / n_active
        converged = mu < _MU_FREEZE

        e = jnp.einsum("krv,kv->kr", data.D, zeta)
        rho_l = (e - data.lb - s_l) * mask_l
        rho_u = (data.ub - e - s_u) * mask_u

        w = jnp.clip(mask_l * lam_l / s_l + mask_u * lam_u / s_u, 0.0, _W_MAX)
        H_bar = data.H + jnp.einsum("krv,kr,krw->kvw", data.D, w, data.D)
        if horizon_parallel:
            from mpc_planner_tpu.solver import parallel_riccati

            prep = parallel_riccati.prepare(H_bar, data.A, data.B, nu, nx, reg)
            solve_linear = lambda g_bar, r: parallel_riccati.solve(
                prep, g_bar, r, data.B, nu, nx
            )
        else:
            factors = _riccati_factor(H_bar, data.A, data.B, nu, nx, reg)
            solve_linear = lambda g_bar, r: _riccati_linear(
                factors, g_bar, r, data.A, data.B, nu, nx
            )

        r_eq = (
            jnp.einsum("kxy,ky->kx", data.A, zeta[:-1, nu:])
            + jnp.einsum("kxu,ku->kx", data.B, zeta[:-1, :nu])
            + data.c
            - zeta[1:, nu:]
        )

        g_stat = data.g + jnp.einsum("kvw,kw->kv", data.H, zeta)

        def directions(rc_l, rc_u):
            coef = (
                -mask_l * lam_l
                + mask_u * lam_u
                - mask_l * (rc_l - lam_l * rho_l) / s_l
                + mask_u * (rc_u - lam_u * rho_u) / s_u
            )
            g_bar = g_stat + jnp.einsum("krv,kr->kv", data.D, coef)
            dz = solve_linear(g_bar, r_eq)
            Ddz = jnp.einsum("krv,kv->kr", data.D, dz)
            ds_l = (Ddz + rho_l) * mask_l
            ds_u = (rho_u - Ddz) * mask_u
            dlam_l = ((rc_l - lam_l * ds_l) / s_l) * mask_l
            dlam_u = ((rc_u - lam_u * ds_u) / s_u) * mask_u
            return dz, ds_l, ds_u, dlam_l, dlam_u

        if mehrotra:
            # Predictor (affine, mu target = 0)
            rc_l_aff = (-s_l * lam_l) * mask_l
            rc_u_aff = (-s_u * lam_u) * mask_u
            dz_a, ds_l_a, ds_u_a, dl_l_a, dl_u_a = directions(rc_l_aff, rc_u_aff)

            a_p_aff = jnp.minimum(_ftb(s_l, ds_l_a, mask_l, 1.0), _ftb(s_u, ds_u_a, mask_u, 1.0))
            a_d_aff = jnp.minimum(_ftb(lam_l, dl_l_a, mask_l, 1.0), _ftb(lam_u, dl_u_a, mask_u, 1.0))
            mu_aff = (
                jnp.sum((s_l + a_p_aff * ds_l_a) * (lam_l + a_d_aff * dl_l_a) * mask_l)
                + jnp.sum((s_u + a_p_aff * ds_u_a) * (lam_u + a_d_aff * dl_u_a) * mask_u)
            ) / n_active
            sigma = jnp.clip((mu_aff / (mu + 1e-30)) ** 3, 0.0, 1.0)

            # Corrector (centering + second-order correction)
            rc_l_cor = (sigma * mu - s_l * lam_l - ds_l_a * dl_l_a) * mask_l
            rc_u_cor = (sigma * mu - s_u * lam_u - ds_u_a * dl_u_a) * mask_u
        else:
            # Plain path-following: single centered Newton step
            rc_l_cor = (sigma_fixed * mu - s_l * lam_l) * mask_l
            rc_u_cor = (sigma_fixed * mu - s_u * lam_u) * mask_u
        dz, ds_l, ds_u, dlam_l, dlam_u = directions(rc_l_cor, rc_u_cor)

        a_p = jnp.minimum(_ftb(s_l, ds_l, mask_l, tau), _ftb(s_u, ds_u, mask_u, tau))
        a_d = jnp.minimum(_ftb(lam_l, dlam_l, mask_l, tau), _ftb(lam_u, dlam_u, mask_u, tau))

        # Freeze the iterate once converged OR diverged. Converged: extra
        # fixed-count iterations on a solved QP drive lam/s ratios past f32
        # range and NaN the sweep. Diverged (infeasible QP — legitimate in
        # hard scenes; HPIPM fails with a status the same way): duals blow
        # up, mu climbs — stop before overflow and let the SQP's res_eq
        # check report failure (acados_solver_interface.cpp:176-181).
        bad = converged | (mu > 1e6) | ~jnp.isfinite(mu)
        finite_step = (
            jnp.all(jnp.isfinite(dz))
            & jnp.all(jnp.isfinite(dlam_l))
            & jnp.all(jnp.isfinite(dlam_u))
        )
        # Freeze by masking the UPDATE, not by zeroing the step size:
        # 0.0 * NaN = NaN, so `a_p = 0` would still poison the iterate
        # permanently when a non-finite direction appears.
        frozen = bad | ~finite_step
        a_p = jnp.where(frozen, 0.0, a_p)
        a_d = jnp.where(frozen, 0.0, a_d)

        zeta = jnp.where(frozen, zeta, zeta + a_p * dz)
        s_l = jnp.where(
            mask_l > 0,
            jnp.where(frozen, s_l, jnp.maximum(s_l + a_p * ds_l, _S_MIN)),
            1.0,
        )
        s_u = jnp.where(
            mask_u > 0,
            jnp.where(frozen, s_u, jnp.maximum(s_u + a_p * ds_u, _S_MIN)),
            1.0,
        )
        lam_l = jnp.where(
            mask_l > 0,
            jnp.where(frozen, lam_l, jnp.clip(lam_l + a_d * dlam_l, 0.0, _W_MAX)),
            0.0,
        )
        lam_u = jnp.where(
            mask_u > 0,
            jnp.where(frozen, lam_u, jnp.clip(lam_u + a_d * dlam_u, 0.0, _W_MAX)),
            0.0,
        )

        return (zeta, s_l, s_u, lam_l, lam_u), a_p

    (zeta, s_l, s_u, lam_l, lam_u), alphas = jax.lax.scan(
        ip_iter, (zeta, s_l, s_u, lam_l, lam_u), None, length=iterations
    )
    mu_final = (
        jnp.sum(s_l * lam_l * mask_l) + jnp.sum(s_u * lam_u * mask_u)
    ) / n_active
    return QPSolution(dz=zeta, mu=mu_final, alpha_last=alphas[-1],
                      lam_l=lam_l, lam_u=lam_u)
