"""Parallel-in-horizon Riccati: associative-scan LQR over the stages.

The sequential Riccati sweeps in `solver/qp.py` walk the horizon one
stage at a time — O(N) dependent steps per IP iteration, the stagewise
structure HPIPM exploits on CPU (SURVEY.md §2.5(4)). This module solves
the SAME equality-constrained LQR subproblem with `jax.lax.
associative_scan` over the stages: O(log N) dependent combine rounds of
nx x nx work. MEASURED (experiments/horizon_sweep.py, TPU v5e, B=64,
8 IP iterations, data-pull-fenced, 2026-08-21): the scan LOSES at every
horizon tested — par/seq 2.6x at N=10, 3.6x at N=20, 4.3x at N=30,
5.6x at N=60, 5.9x at N=120-240; no crossover up to N=240. The
per-combine 5x5 inverses and 5-tuple element algebra cost more than
the sequential chain they remove at any batch that fills the VPU
lanes. Kept as a tested alternative (`solver.horizon_parallel`) for
genuinely long horizons (N >> 240) or future hardware; the sequential
sweeps stay the default everywhere.

Method (temporal parallelization of LQT, a la Sarkka & Garcia-Fernandez,
IEEE TAC 2021): each stage k contributes a *conditional value-function
element* e_k = (A, b, C, eta, J) representing

    V_{k->j}(x_k) = min over controls of [cost on [k, j)] + V_j(x_j),
    x_j = A x_k + b + (noise-free LQT: C captures the control channel),
    V(x) = 1/2 x' J x - eta' x,

and two elements covering [i, j) and [j, l) combine associatively into
one covering [i, l). An inclusive reverse scan therefore yields every
cost-to-go (J_k, eta_k) in ceil(log2(N+1)) rounds. Stage cross-terms
(u'Sx) and linear costs are removed up front by completing the square,
and the forward rollout is a second (affine-map composition) scan, so
the full solve is two log-depth scans plus stage-parallel recovery.

Like `_riccati_factor`/`_riccati_linear`, this solves for a given
(H_bar, g_bar) from the interior-point outer loop; `solve_qp(...,
horizon_parallel=True)` swaps it in without touching the IP logic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class _Prep(NamedTuple):
    """Gradient-independent pieces (reused by predictor + corrector)."""

    L_R: jnp.ndarray  # [N, nu, nu] chol(R + reg I)
    Ks: jnp.ndarray  # [N, nu, nx] R^{-1} S
    A_t: jnp.ndarray  # [N, nx, nx] A - B R^{-1} S
    Q_t: jnp.ndarray  # [N, nx, nx] Q - S' R^{-1} S
    C: jnp.ndarray  # [N, nx, nx] B R^{-1} B'
    J_term: jnp.ndarray  # [nx, nx]


def _chol_solve(L, rhs):
    """Batched cho_solve for [.., n, n] lower factors against [.., n, m]."""
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )


def prepare(H_bar, A, B, nu: int, nx: int, reg: float) -> _Prep:
    """Complete the square in u: gradient-independent per-stage transform.

    Stage cost 1/2 u'Ru + u'Sx + 1/2 x'Qx with u = u_t - R^{-1}(Sx + r)
    becomes 1/2 u_t'R u_t + 1/2 x'(Q - S'R^{-1}S)x (+ linear terms handled
    per-gradient in `solve`), with dynamics matrix A - B R^{-1} S."""
    N = A.shape[0]
    R = H_bar[:N, :nu, :nu] + reg * jnp.eye(nu, dtype=H_bar.dtype)
    S = H_bar[:N, :nu, nu:]
    Q = H_bar[:N, nu:, nu:]
    L_R = jnp.linalg.cholesky(R)
    Ks = _chol_solve(L_R, S)
    A_t = A - B @ Ks
    Q_t = Q - jnp.swapaxes(S, -1, -2) @ Ks
    Q_t = 0.5 * (Q_t + jnp.swapaxes(Q_t, -1, -2))
    RinvBt = _chol_solve(L_R, jnp.swapaxes(B, -1, -2))
    C = B @ RinvBt
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    return _Prep(L_R=L_R, Ks=Ks, A_t=A_t, Q_t=Q_t, C=C,
                 J_term=H_bar[N, nu:, nu:])


def _combine(earlier, later):
    """Associative combination of value-function elements (earlier stage
    interval first). All operands carry a leading scan-block dim."""
    Ai, bi, Ci, etai, Ji = earlier
    Aj, bj, Cj, etaj, Jj = later
    nx = Ai.shape[-1]
    I = jnp.eye(nx, dtype=Ai.dtype)
    # Z = (I + Ci Jj)^{-1};  (I + Jj Ci)^{-1} = Z' for symmetric Ci, Jj.
    Z = jnp.linalg.inv(I + Ci @ Jj)
    Zt = jnp.swapaxes(Z, -1, -2)
    AjZ = Aj @ Z
    A = AjZ @ Ai
    b = (AjZ @ (bi + (Ci @ etaj[..., None])[..., 0])[..., None])[..., 0] + bj
    C = AjZ @ Ci @ jnp.swapaxes(Aj, -1, -2) + Cj
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))
    AiT = jnp.swapaxes(Ai, -1, -2)
    eta = (AiT @ (Zt @ (etaj - (Jj @ bi[..., None])[..., 0])[..., None]))[
        ..., 0
    ] + etai
    J = AiT @ Zt @ Jj @ Ai + Ji
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return (A, b, C, eta, J)


def solve(prep: _Prep, g_bar, r_eq, B, nu: int, nx: int):
    """Solve the LQR for one gradient; returns dz [N+1, nvar].

    Matches `_riccati_linear` on the factorization of the same
    (H_bar, A, B): min 1/2 dz'H_bar dz + g_bar'dz s.t.
    dx_{k+1} = A dx_k + B du_k + r_k, dx_0 = 0."""
    N = B.shape[0]
    dtype = g_bar.dtype

    r = g_bar[:N, :nu]
    q = g_bar[:N, nu:]
    kr = _chol_solve(prep.L_R, r[..., None])[..., 0]  # R^{-1} r
    c_t = r_eq - (B @ kr[..., None])[..., 0]
    q_t = q - (jnp.swapaxes(prep.Ks, -1, -2) @ r[..., None])[..., 0]

    # Elements: stages 0..N-1 then the terminal node.
    zeros_m = jnp.zeros((1, nx, nx), dtype)
    A_e = jnp.concatenate([prep.A_t, zeros_m], axis=0)
    b_e = jnp.concatenate([c_t, jnp.zeros((1, nx), dtype)], axis=0)
    C_e = jnp.concatenate([prep.C, zeros_m], axis=0)
    eta_e = jnp.concatenate([-q_t, -g_bar[None, N, nu:]], axis=0)
    J_e = jnp.concatenate([prep.Q_t, prep.J_term[None]], axis=0)

    # NOTE operand order: with reverse=True, associative_scan passes the
    # LATER interval as the FIRST argument (empirically: a reverse scan
    # with a@b yields M[n-1]@...@M[k], i.e. later elements on the left),
    # so the earlier-first _combine must be called flipped.
    A_s, b_s, C_s, eta_s, J_s = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), (A_e, b_e, C_e, eta_e, J_e), reverse=True
    )
    # Inclusive reverse scan: entry k = combine(e_k, ..., e_N) = cost-to-go
    # at node k. Recovery at stage k needs the value at k+1.
    J_next = J_s[1:]  # [N, nx, nx]
    eta_next = eta_s[1:]  # [N, nx]

    # du_t = -K x - d with M = R + B'J_{k+1}B (in completed-square coords):
    Bt = jnp.swapaxes(B, -1, -2)
    BtJ = Bt @ J_next
    M = prep.L_R @ jnp.swapaxes(prep.L_R, -1, -2) + BtJ @ B
    L_M = jnp.linalg.cholesky(0.5 * (M + jnp.swapaxes(M, -1, -2)))
    K_t = _chol_solve(L_M, BtJ @ prep.A_t)
    rhs = (BtJ @ c_t[..., None])[..., 0] - (Bt @ eta_next[..., None])[..., 0]
    d_t = -_chol_solve(L_M, rhs[..., None])[..., 0]

    K_tot = K_t + prep.Ks  # du = -K_tot x + d_tot (original coords)
    d_tot = d_t - kr
    F = prep.A_t - B @ K_t  # = A - B K_tot
    v = (B @ d_tot[..., None])[..., 0] + r_eq

    # Forward rollout x_{k+1} = F_k x_k + v_k, x_0 = 0 as an affine-map
    # composition scan: entry k = map from x_0 to x_{k+1}.
    def compose(earlier, later):
        F1, v1 = earlier
        F2, v2 = later
        return (F2 @ F1, (F2 @ v1[..., None])[..., 0] + v2)

    _, x_next = jax.lax.associative_scan(compose, (F, v))
    xs = jnp.concatenate([jnp.zeros((1, nx), dtype), x_next[:-1]], axis=0)
    us = -(K_tot @ xs[..., None])[..., 0] + d_tot

    dz_run = jnp.concatenate([us, xs], axis=-1)
    dz_term = jnp.concatenate(
        [jnp.zeros((1, nu), dtype), x_next[None, -1]], axis=-1
    )
    return jnp.concatenate([dz_run, dz_term], axis=0)
