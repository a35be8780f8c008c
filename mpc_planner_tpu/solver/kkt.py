"""Independent KKT-residual verification of solver output.

The reference validates its solver stack end-to-end by generating a real
acados solver in CI and checking the OCP dimensions
(reference solver_generator/test/test_acados.py:48-77); its numerical
trust comes from acados/HPIPM themselves. Our solver IS the numerical
core, so this module provides the independent optimality check the
BASELINE criterion asks for ("reproduce reference control sequences
within tolerance"): given a solution trajectory and the interior-point
duals, verify the first-order KKT conditions of the NONLINEAR problem

    min  sum_k cost_k(z_k) + cost_N(x_N)
    s.t. x_{k+1} = F(z_k)                       k = 0..N-1   (dynamics)
         lb <= rows(z_k) <= ub                                (box + h)

directly from autodiff of the traced module expressions — no part of the
IPM/Riccati machinery is reused, so agreement is evidence of correctness,
not self-consistency.

Method: the inequality duals (lam_l, lam_u) come from the last QP, which
at SQP convergence are the NLP multipliers. The dynamics (equality)
multipliers nu_k are reconstructed by the adjoint recursion — choosing
nu to satisfy the x-rows of stationarity exactly:

    nu_{N-1} = grad_x cost_N(x_N) + d_x-rows(N)
    nu_{k}   = grad_x cost_{k+1} + A_{k+1}' nu_{k+1} + d_x-rows(k+1)

(d = D'(lam_u - lam_l) restricted to the x entries). The remaining
u-rows of the Lagrangian gradient,

    r_u(k) = grad_u cost_k + B_k' nu_k + d_u-rows(k),

are then the true reduced-gradient stationarity residual. Primal
feasibility and complementarity are checked directly on the constraint
values. Row layout matches solver/sqp.py::_linearize: [u-box, x-box, h].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class KKTResiduals(NamedTuple):
    stationarity: float  # max |r_u| over the horizon (scaled)
    eq_residual: float  # max dynamics defect
    primal_box: float  # max box-bound violation
    primal_h: float  # max h-constraint violation
    complementarity: float  # max |lam * slack| over active rows
    dual_feasibility: float  # max negative multiplier (should be >= 0)


def kkt_residuals(solver, Z, P, lam_l, lam_u) -> KKTResiduals:
    """Compute KKT residuals for one solve. Z [N+1, nvar], P [N+1, npar],
    lam_l/lam_u [N+1, nrows] (row layout [u-box, x-box, h])."""
    ocp = solver.ocp
    N, nu, nx, nh = ocp.N, ocp.nu, ocp.nx, ocp.nh
    Z = jnp.asarray(Z, jnp.float64) if jax.config.jax_enable_x64 else jnp.asarray(Z, jnp.float32)
    P = jnp.asarray(P, Z.dtype)
    lam_l = jnp.asarray(lam_l, Z.dtype)
    lam_u = jnp.asarray(lam_u, Z.dtype)

    Zr, Pr = Z[:N], P[:N]

    # --- ingredients from autodiff (independent of the QP solve path) ----
    g_run = jax.vmap(jax.grad(ocp.running_cost))(Zr, Pr)  # [N, nvar]
    Jf = jax.vmap(jax.jacfwd(ocp.dynamics_fn))(Zr, Pr)  # [N, nx, nvar]
    A = Jf[:, :, nu:]
    B = Jf[:, :, :nu]
    zN = Z[N].at[:nu].set(0.0)
    g_term_x = jax.grad(ocp.terminal_cost)(zN, P[N])[nu:]

    if nh:
        h_val = jax.vmap(ocp.constraint_fn)(Zr, Pr)  # [N, nh]
        Jh = jax.vmap(jax.jacfwd(ocp.constraint_fn))(Zr, Pr)  # [N, nh, nvar]
    else:
        h_val = jnp.zeros((N, 0), Z.dtype)
        Jh = jnp.zeros((N, 0, ocp.nvar), Z.dtype)

    # Net inequality dual per row (lower rows push +, upper rows push -)
    lam_net = lam_u - lam_l  # [N+1, nrows]
    d_u = lam_net[:, :nu]  # u-box rows act on u directly
    d_x = lam_net[:, nu : nu + nx]  # x-box rows act on x directly
    lam_h = lam_net[:, nu + nx :]  # [N+1, nh]
    # h-rows' pull-back onto (u, x) at stage k (h active at 0..N-1 only)
    dh = jnp.einsum("khv,kh->kv", Jh, lam_h[:N])  # [N, nvar]

    # --- costate recursion (defines nu so x-rows are exactly satisfied) --
    # x-row of stage k+1 (k+1 in 1..N-1):
    #   grad_x cost_{k+1} + A_{k+1}' nu_{k+1} - nu_k + d_x(k+1) + dh_x(k+1) = 0
    # terminal: nu_{N-1} = grad_x cost_N + d_x(N)
    nu_term = g_term_x + d_x[N]

    def backward(nu_next, inp):
        g_k1, A_k1, dx_k1, dhx_k1 = inp
        nu_k = g_k1[nu:] + A_k1.T @ nu_next + dx_k1 + dhx_k1
        return nu_k, nu_k

    # stages k+1 = N-1 .. 1 provide nu_{N-2} .. nu_0
    _, nus_rev = jax.lax.scan(
        backward,
        nu_term,
        (g_run[1:], A[1:], d_x[1:N], dh[1:, nu:]),
        reverse=True,
    )
    nus = jnp.concatenate([nus_rev, nu_term[None]], axis=0)  # [N, nx] = nu_0..nu_{N-1}

    # --- u-rows: the true stationarity residual -------------------------
    r_u = g_run[:, :nu] + jnp.einsum("kxu,kx->ku", B, nus) + d_u[:N] + dh[:, :nu]
    # Scale by the size of the competing gradient terms so the residual is
    # relative (the absolute gradient scale varies 1e-2..1e3 across configs).
    scale = jnp.maximum(
        jnp.max(jnp.abs(g_run[:, :nu]))
        + jnp.max(jnp.abs(jnp.einsum("kxu,kx->ku", B, nus))),
        1.0,
    )
    stationarity = jnp.max(jnp.abs(r_u)) / scale

    # --- primal feasibility ---------------------------------------------
    eq_res = ocp.eq_residual(Z, P)

    lbz = jnp.asarray(np.where(np.isfinite(solver.ocp.lb_z), solver.ocp.lb_z, -1e15), Z.dtype)
    ubz = jnp.asarray(np.where(np.isfinite(solver.ocp.ub_z), solver.ocp.ub_z, 1e15), Z.dtype)
    # u-box at 0..N-1, x-box at 1..N
    viol_u = jnp.maximum(
        jnp.maximum(lbz[:nu] - Zr[:, :nu], Zr[:, :nu] - ubz[:nu]), 0.0
    )
    Zx = Z[1:, nu:]
    viol_x = jnp.maximum(
        jnp.maximum(lbz[nu:] - Zx, Zx - ubz[nu:]), 0.0
    )
    primal_box = jnp.maximum(jnp.max(viol_u), jnp.max(viol_x))

    if nh:
        lh = jnp.asarray(np.where(np.isfinite(ocp.lh), ocp.lh, -1e15), Z.dtype)
        uh = jnp.asarray(np.where(np.isfinite(ocp.uh), ocp.uh, 1e15), Z.dtype)
        primal_h = jnp.max(
            jnp.maximum(jnp.maximum(lh[None] - h_val, h_val - uh[None]), 0.0)
        )
    else:
        primal_h = jnp.asarray(0.0, Z.dtype)

    # --- complementarity: lam * distance-to-bound -----------------------
    # Row values at the solution, layout [u-box, x-box, h] per stage.
    rows_run = jnp.concatenate([Zr[:, :nu], Zr[:, nu:], h_val], axis=1)  # [N, nrows]
    lb_rows = jnp.concatenate(
        [lbz[:nu], lbz[nu:]] + ([lh] if nh else []), axis=0
    )
    ub_rows = jnp.concatenate(
        [ubz[:nu], ubz[nu:]] + ([uh] if nh else []), axis=0
    )
    # Active-row masks mirror _linearize: u/h rows at 0..N-1, x rows at 1..N.
    comp_l_run = lam_l[:N] * jnp.abs(rows_run - lb_rows[None])
    comp_u_run = lam_u[:N] * jnp.abs(ub_rows[None] - rows_run)
    # x rows at stage N
    comp_l_term = lam_l[N, nu : nu + nx] * jnp.abs(Z[N, nu:] - lbz[nu:])
    comp_u_term = lam_u[N, nu : nu + nx] * jnp.abs(ubz[nu:] - Z[N, nu:])
    # Mask off rows with infinite bounds (sentinel distance ~1e15)
    def _mask_big(c):
        return jnp.where(c > 1e10, 0.0, c)

    complementarity = jnp.maximum(
        jnp.max(_mask_big(jnp.concatenate([comp_l_run.ravel(), comp_l_term]))),
        jnp.max(_mask_big(jnp.concatenate([comp_u_run.ravel(), comp_u_term]))),
    )

    dual_feas = jnp.maximum(jnp.max(-lam_l), jnp.max(-lam_u))

    return KKTResiduals(
        stationarity=float(stationarity),
        eq_residual=float(eq_res),
        primal_box=float(primal_box),
        primal_h=float(primal_h),
        complementarity=float(complementarity),
        dual_feasibility=float(dual_feas),
    )


def dense_reference_solve(ocp, x0, P, U0, maxiter: int = 300):
    """Slow, independent dense solve of the same OCP via scipy
    trust-constr on the condensed (control-only) problem: states are
    eliminated by the exact rollout, box/h constraints become nonlinear
    inequality constraints of U. Used to cross-check the Riccati-IPM
    solver on small instances (tests/test_kkt.py).

    Returns (U [N, nu], objective, scipy result)."""
    from scipy.optimize import Bounds, NonlinearConstraint, minimize

    N, nu, nx = ocp.N, ocp.nu, ocp.nx
    P = jnp.asarray(P, jnp.float32)
    x0 = jnp.asarray(x0, jnp.float32)

    def to_Z(U_flat):
        U = U_flat.reshape(N, nu)
        X = ocp.rollout(x0, U, P)  # [N+1, nx]
        U_full = jnp.concatenate([U, jnp.zeros((1, nu))], axis=0)
        return jnp.concatenate([U_full, X], axis=1)  # [N+1, nvar]

    @jax.jit
    def obj(U_flat):
        return ocp.total_cost(to_Z(U_flat), P)

    obj_grad = jax.jit(jax.grad(obj))

    # Inequality rows: x-box (stages 1..N) + h (stages 0..N-1)
    lbz = np.asarray(ocp.lb_z, float)
    ubz = np.asarray(ocp.ub_z, float)

    @jax.jit
    def cons(U_flat):
        Z = to_Z(U_flat)
        parts = [Z[1:, nu:].ravel()]  # states
        if ocp.nh:
            h = jax.vmap(ocp.constraint_fn)(Z[:N], P[:N])
            parts.append(h.ravel())
        return jnp.concatenate(parts)

    cons_jac = jax.jit(jax.jacrev(cons))

    cl = [np.tile(lbz[nu:], N)]
    cu = [np.tile(ubz[nu:], N)]
    if ocp.nh:
        cl.append(np.tile(np.asarray(ocp.lh, float), N))
        cu.append(np.tile(np.asarray(ocp.uh, float), N))
    cl = np.concatenate(cl)
    cu = np.concatenate(cu)

    nlc = NonlinearConstraint(
        lambda u: np.asarray(cons(u), float),
        cl,
        cu,
        jac=lambda u: np.asarray(cons_jac(u), float),
    )
    bounds = Bounds(np.tile(lbz[:nu], N), np.tile(ubz[:nu], N))

    res = minimize(
        lambda u: float(obj(u)),
        np.asarray(U0, float).ravel(),
        jac=lambda u: np.asarray(obj_grad(u), float),
        method="trust-constr",
        constraints=[nlc],
        bounds=bounds,
        options={"maxiter": maxiter, "gtol": 1e-10, "xtol": 1e-12},
    )
    return res.x.reshape(N, nu), float(res.fun), res
