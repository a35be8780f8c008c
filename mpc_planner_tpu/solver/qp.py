"""Stagewise interior-point QP solved with Riccati sweeps — the numerical
hot loop.

TPU-native replacement for the reference's acados + PARTIAL_CONDENSING_
HPIPM QP step (SURVEY.md §2.4; options generate_acados_solver.py:143-176).
Same mathematical structure as HPIPM: a primal-dual interior point method
over the stagewise QP whose Newton systems are solved exactly by a
backward/forward Riccati recursion (LQR factorization). Everything is
fixed-iteration `lax.scan` so one jit compilation covers every control
cycle, and the whole solver vmaps over a leading batch axis (T-MPC++
planners x scenario draws — the reference's OpenMP threads,
guidance_constraints.cpp:279, become this batch dimension).

Per stage k = 0..N-1 the QP is
    min  1/2 dz_k' H_k dz_k + g_k' dz_k  (+ terminal x-term at N)
    s.t. dx_{k+1} = A_k dx_k + B_k du_k + r_k
         lb_k <= D_k dz_k <= ub_k          (box rows + h-constraint rows)
with dx_0 = 0 (x_0 pinned to xinit before linearization, mirroring
acados' lbx_0 = ubx_0 = xinit, acados_solver_interface.cpp:124-126).

Inequalities are two-sided with slacks (s_l, s_u) and multipliers
(lam_l, lam_u); infinite bounds are masked rows (HPIPM masks them too).
Eliminating (ds, dlam) yields a modified stage Hessian
H + D' diag(lam_l/s_l + lam_u/s_u) D fed to the Riccati sweep.
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


def _riccati_solve(H_bar, g_bar, A, B, r_eq, nu: int, nx: int, reg: float):
    """Backward/forward Riccati for the equality-constrained Newton step.

    H_bar [N+1, nvar, nvar], g_bar [N+1, nvar]; terminal uses x-block.
    Returns dz [N+1, nvar] with dz[0, nu:] = 0 and dz[N, :nu] = 0.
    """
    N = A.shape[0]

    P_term = H_bar[N, nu:, nu:]
    p_term = g_bar[N, nu:]

    def backward(carry, inp):
        P_next, p_next = carry
        Hk, gk, Ak, Bk, rk = inp
        R = Hk[:nu, :nu]
        S = Hk[:nu, nu:]
        Q = Hk[nu:, nu:]
        r = gk[:nu]
        q = gk[nu:]

        pc = p_next + P_next @ rk
        PA = P_next @ Ak
        PB = P_next @ Bk
        Q_hat = Q + Ak.T @ PA
        R_hat = R + Bk.T @ PB
        S_hat = S + Bk.T @ PA
        q_hat = q + Ak.T @ pc
        r_hat = r + Bk.T @ pc

        R_hat = R_hat + reg * jnp.eye(nu, dtype=R_hat.dtype)
        # Cholesky solve of the tiny [nu, nu] system
        L = jnp.linalg.cholesky(R_hat)
        K = -jax.scipy.linalg.cho_solve((L, True), S_hat)
        kff = -jax.scipy.linalg.cho_solve((L, True), r_hat)

        P = Q_hat + S_hat.T @ K
        P = 0.5 * (P + P.T)
        p = q_hat + S_hat.T @ kff
        return (P, p), (K, kff)

    (_, _), (Ks, kffs) = jax.lax.scan(
        backward,
        (P_term, p_term),
        (H_bar[:N], g_bar[:N], A, B, r_eq),
        reverse=True,
    )

    def forward(dx, inp):
        K, kff, Ak, Bk, rk = inp
        du = K @ dx + kff
        dx_next = Ak @ dx + Bk @ du + rk
        return dx_next, (du, dx)

    dx0 = jnp.zeros((A.shape[1],), dtype=H_bar.dtype)
    dxN, (dus, dxs) = jax.lax.scan(forward, dx0, (Ks, kffs, A, B, r_eq))

    dz_run = jnp.concatenate([dus, dxs], axis=-1)  # [N, nvar]
    dz_term = jnp.concatenate([jnp.zeros((nu,), dtype=H_bar.dtype), dxN])
    return jnp.concatenate([dz_run, dz_term[None]], axis=0)


def solve_qp(
    data: QPData,
    nu: int,
    nx: int,
    iterations: int = 18,
    mu0: float = 1e1,
    mu_min: float = 1e-9,
    reg: float = 1e-7,
    tau: float = 0.995,
) -> QPSolution:
    """Primal-dual IP solve with fixed iteration count (jit-stable)."""
    Np1, nrows, nvar = data.D.shape
    dtype = data.H.dtype

    mask_l = data.mask_l
    mask_u = data.mask_u
    n_active = jnp.maximum(jnp.sum(mask_l) + jnp.sum(mask_u), 1.0)

    zeta = jnp.zeros((Np1, nvar), dtype=dtype)
    # e = D zeta = 0 at init; slacks from bound distances, floored.
    s_l = jnp.where(mask_l > 0, jnp.maximum(-data.lb, 1e-2), 1.0)
    s_u = jnp.where(mask_u > 0, jnp.maximum(data.ub, 1e-2), 1.0)
    lam_l = jnp.where(mask_l > 0, mu0 / s_l, 0.0)
    lam_u = jnp.where(mask_u > 0, mu0 / s_u, 0.0)
    mu = jnp.asarray(mu0, dtype=dtype)

    def ip_iter(carry, _):
        zeta, s_l, s_u, lam_l, lam_u, mu = carry

        e = jnp.einsum("krv,kv->kr", data.D, zeta)
        rho_l = (e - data.lb - s_l) * mask_l
        rho_u = (data.ub - e - s_u) * mask_u
        rc_l = (mu - s_l * lam_l) * mask_l
        rc_u = (mu - s_u * lam_u) * mask_u

        w = mask_l * lam_l / s_l + mask_u * lam_u / s_u  # [N+1, nrows]
        H_bar = data.H + jnp.einsum("krv,kr,krw->kvw", data.D, w, data.D)

        # Stationarity + elimination terms
        coef = (
            -mask_l * lam_l
            + mask_u * lam_u
            - mask_l * (rc_l - lam_l * rho_l) / s_l
            + mask_u * (rc_u - lam_u * rho_u) / s_u
        )
        g_bar = (
            data.g
            + jnp.einsum("kvw,kw->kv", data.H, zeta)
            + jnp.einsum("krv,kr->kv", data.D, coef)
        )

        # Equality residual at current iterate
        r_eq = (
            jnp.einsum("kxy,ky->kx", data.A, zeta[:-1, nu:])
            + jnp.einsum("kxu,ku->kx", data.B, zeta[:-1, :nu])
            + data.c
            - zeta[1:, nu:]
        )

        dz = _riccati_solve(H_bar, g_bar, data.A, data.B, r_eq, nu, nx, reg)

        Ddz = jnp.einsum("krv,kv->kr", data.D, dz)
        ds_l = (Ddz + rho_l) * mask_l
        ds_u = (rho_u - Ddz) * mask_u
        dlam_l = ((rc_l - lam_l * ds_l) / s_l) * mask_l
        dlam_u = ((rc_u - lam_u * ds_u) / s_u) * mask_u

        # Fraction-to-boundary step size (single alpha, HPIPM-style)
        def ftb(v, dv, mask):
            ratio = jnp.where((dv < 0) & (mask > 0), -tau * v / (dv - 1e-30), 1.0)
            return jnp.min(ratio)

        alpha = jnp.minimum(
            jnp.minimum(ftb(s_l, ds_l, mask_l), ftb(s_u, ds_u, mask_u)),
            jnp.minimum(ftb(lam_l, dlam_l, mask_l), ftb(lam_u, dlam_u, mask_u)),
        )
        alpha = jnp.clip(alpha, 0.0, 1.0)

        zeta = zeta + alpha * dz
        s_l = jnp.where(mask_l > 0, jnp.maximum(s_l + alpha * ds_l, 1e-12), 1.0)
        s_u = jnp.where(mask_u > 0, jnp.maximum(s_u + alpha * ds_u, 1e-12), 1.0)
        lam_l = jnp.where(mask_l > 0, jnp.maximum(lam_l + alpha * dlam_l, 0.0), 0.0)
        lam_u = jnp.where(mask_u > 0, jnp.maximum(lam_u + alpha * dlam_u, 0.0), 0.0)

        mu_meas = (jnp.sum(s_l * lam_l * mask_l) + jnp.sum(s_u * lam_u * mask_u)) / n_active
        sigma = jnp.maximum(0.05, (1.0 - alpha) ** 3)
        mu = jnp.maximum(sigma * mu_meas, mu_min)

        return (zeta, s_l, s_u, lam_l, lam_u, mu), alpha

    (zeta, s_l, s_u, lam_l, lam_u, mu), alphas = jax.lax.scan(
        ip_iter, (zeta, s_l, s_u, lam_l, lam_u, mu), None, length=iterations
    )
    return QPSolution(dz=zeta, mu=mu, alpha_last=alphas[-1])
