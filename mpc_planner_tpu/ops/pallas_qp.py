"""Fused Pallas TPU kernel: the whole interior-point Riccati QP solve.

The speed-of-light core (SURVEY.md §7.5, BASELINE.md). The XLA version in
solver/qp.py runs ~1400 sequential tiny ops per solve (IP iterations x
Riccati stages), each paying dispatch/latency on [B, 7, 7]-sized tensors.
This kernel runs the ENTIRE Mehrotra predictor-corrector IPM — H-bar
assembly, Riccati factorization, predictor and corrector solves,
fraction-to-boundary steps — inside one Pallas program, with a block of
BB=128 batch elements living on the vector lanes. Stage/IP loops become
in-kernel `fori_loop`s at register latency instead of XLA op dispatches.

Layout: every tensor is [..., lanes]: e.g. the stage Hessians are
[N+1, nvar, nvar, 128]. Matrix algebra over the tiny nvar/nx/nu dims is
expressed as broadcast-multiply-reduce on the VPU (8x128 vector unit);
the MXU is deliberately NOT used — batched 7x7 contractions are far below
MXU granularity and the f32 VPU path also sidesteps the bf16-matmul
precision hazard.

Everything (lb/ub masks, freeze guards, warm duals) matches
solver/qp.py::solve_qp semantics — tests assert agreement.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128  # batch elements per kernel invocation (vector lanes)

_S_MIN = 1e-7
_W_MAX = 1e7
_MU_FREEZE = 1e-9


def _ed(x, axis):
    """expand_dims via reshape — Mosaic lowers mixed None+slice indexing to
    an (unsupported) gather, so all broadcasts go through explicit
    expand_dims on already-sliced values."""
    return jnp.expand_dims(x, axis)


def _mm(a, b):
    """[..., m, p, L] @ [..., p, n, L] -> [..., m, n, L] via
    broadcast-reduce (VPU). Negative axes: the same expression serves the
    classic per-block rank-3 operands and the wide multi-block rank-4
    operands ([G, m, p, L] — see solve_qp_pallas `wide`)."""
    return jnp.sum(_ed(a, -2) * _ed(b, -4), axis=-3)


def _mv(a, v):
    """[..., m, p, L] @ [..., p, L] -> [..., m, L]."""
    return jnp.sum(a * _ed(v, -3), axis=-2)


def _mtv(a, v):
    """[..., p, m, L]^T @ [..., p, L] -> [..., m, L]."""
    return jnp.sum(a * _ed(v, -2), axis=-3)


def _transpose(a):
    """[..., m, n, L] -> [..., n, m, L]."""
    return jnp.swapaxes(a, -3, -2)


def _eye_nd(n: int, lead, L: int):
    """Identity as a FULL [*lead, n, n, L] array via iota compares —
    Mosaic rejects implicit rank-promoting broadcasts / reshapes of
    small eye constants into 4-D operands."""
    shp = tuple(lead) + (n, n, L)
    i = jax.lax.broadcasted_iota(jnp.int32, shp, len(shp) - 3)
    j = jax.lax.broadcasted_iota(jnp.int32, shp, len(shp) - 2)
    return (i == j).astype(jnp.float32)


def _mirror_lanes(H, lm: float, sweeps: int = 6):
    """MIRROR (eigenvalues -> max(|w|, lm)) of H [..., n, n, L] via
    element-unpacked cyclic Jacobi — identical arithmetic to
    ops/jacobi_eigh.py::mirror_unpacked, with matrix elements as
    [..., L] lane vectors so each rotation is elementwise VPU work.

    The sweep loop is a `fori_loop` with the n*n elements of (A, V) as
    the carry pytree: one traced sweep keeps the kernel graph ~6x
    smaller than full unrolling (which OOM-killed the TPU compiler when
    embedded in a larger kernel). Carried elements must be >= 2-D
    ([stages, L]) — rank-1 loop carries trip a Mosaic layout assertion."""
    n = H.shape[-3]
    a0 = []
    for i in range(n):
        for j in range(n):
            a0.append(0.5 * (H[..., i, j, :] + H[..., j, i, :]))
    one = jnp.ones_like(a0[0])
    zero = jnp.zeros_like(a0[0])
    v0 = [one if i == j else zero for i in range(n) for j in range(n)]

    def sweep(_, carry):
        a, v = list(carry[0]), list(carry[1])
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq, app, aqq = a[p * n + q], a[p * n + p], a[q * n + q]
                denom = jnp.where(jnp.abs(apq) > 1e-30, apq, 1e-30)
                theta = (aqq - app) / (2.0 * denom)
                sign = jnp.where(theta >= 0, 1.0, -1.0)
                t = sign / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
                t = jnp.where(jnp.abs(apq) > 1e-30, t, 0.0)
                c = 1.0 / jnp.sqrt(t * t + 1.0)
                s = t * c
                for k in range(n):
                    akp, akq = a[p * n + k], a[q * n + k]
                    a[p * n + k] = c * akp - s * akq
                    a[q * n + k] = s * akp + c * akq
                for k in range(n):
                    akp, akq = a[k * n + p], a[k * n + q]
                    a[k * n + p] = c * akp - s * akq
                    a[k * n + q] = s * akp + c * akq
                a[p * n + q] = jnp.zeros_like(apq)
                a[q * n + p] = jnp.zeros_like(apq)
                for k in range(n):
                    vkp, vkq = v[k * n + p], v[k * n + q]
                    v[k * n + p] = c * vkp - s * vkq
                    v[k * n + q] = s * vkp + c * vkq
        return (tuple(a), tuple(v))

    a, v = jax.lax.fori_loop(0, sweeps, sweep, (tuple(a0), tuple(v0)))
    w = [jnp.maximum(jnp.abs(a[d * n + d]), lm) for d in range(n)]
    rows = []
    for i in range(n):
        row = []
        for k in range(n):
            acc = v[i * n] * w[0] * v[k * n]
            for j in range(1, n):
                acc = acc + v[i * n + j] * w[j] * v[k * n + j]
            row.append(acc)
        rows.append(jnp.stack(row, axis=-2))
    return jnp.stack(rows, axis=-3)


def _mirror_nvar_lanes(H, lm: float, nu: int, nx: int, x_only: bool):
    """MIRROR a [..., nvar, nvar, L] stage-Hessian stack, exploiting the
    u-separable block structure when detected (solver/sqp.py::
    _probe_u_separable): mirror(blkdiag(D, Hxx)) =
    blkdiag(max(|D|, lm), mirror(Hxx))."""
    if not x_only:
        return _mirror_lanes(H, lm)
    nvar = nu + nx
    Hxx = _mirror_lanes(H[..., nu:, nu:, :], lm)
    zero = jnp.zeros_like(H[..., 0, 0, :])
    rows = []
    for i in range(nvar):
        row = []
        for j in range(nvar):
            if i < nu or j < nu:
                if i == j:
                    row.append(jnp.maximum(jnp.abs(H[..., i, i, :]), lm))
                else:
                    row.append(zero)
            else:
                row.append(Hxx[..., i - nu, j - nu, :])
        rows.append(jnp.stack(row, axis=-2))
    return jnp.stack(rows, axis=-3)


def _sym_inv(M, n: int):
    """Closed-form inverse of a symmetric [..., n, n, L] matrix, n in 1..3."""
    if n == 1:
        return 1.0 / M
    idx = lambda i, j: M[..., i, j, :]
    if n == 2:
        a, b, d = idx(0, 0), idx(0, 1), idx(1, 1)
        det = a * d - b * b
        inv_det = 1.0 / det
        row0 = jnp.stack([d, -b], axis=-2)
        row1 = jnp.stack([-b, a], axis=-2)
        return jnp.stack([row0, row1], axis=-3) * _ed(_ed(inv_det, -2), -2)
    if n == 3:
        a, b, c = idx(0, 0), idx(0, 1), idx(0, 2)
        d, e, f = idx(1, 1), idx(1, 2), idx(2, 2)
        A = d * f - e * e
        B = c * e - b * f
        C = b * e - c * d
        det = a * A + b * B + c * C
        inv_det = 1.0 / det
        D = a * f - c * c
        E = b * c - a * e
        F = a * d - b * b
        row0 = jnp.stack([A, B, C], axis=-2)
        row1 = jnp.stack([B, D, E], axis=-2)
        row2 = jnp.stack([C, E, F], axis=-2)
        return jnp.stack([row0, row1, row2], axis=-3) * _ed(_ed(inv_det, -2), -2)
    raise NotImplementedError(f"sym_inv for n={n}")


def _ip_solve(
    # data refs (Mosaic: dynamic_slice is ref-only; and keeping the
    # loop-invariant data behind refs — read at each use site instead of
    # loaded once into SSA values held across the whole IP loop — is
    # what keeps the kernel's scoped-VMEM stack bounded. The round-2
    # values-based signature inflated the live set ~6 MB past the
    # scoped limit at flagship shapes: BENCH_r02, VERDICT r2 Weak #1.)
    H_ref, A_ref, B_ref, Dh_ref, g_ref, c_ref, lb_ref, ub_ref,
    # warm duals: None or (wl [N+1, nrows, L], wu, ok [L] bool)
    warm,
    # scratch refs (persist across calls within one kernel; re-initialized)
    s_l_ref, s_u_ref, zeta_ref, Rinv_ref, K_ref, Sh_ref, Pn_ref, kff_ref,
    dzt_ref, w_ref, gb_ref, req_ref, e_ref, coef_ref, gst_ref, ecar_ref,
    lam_l_ref, lam_u_ref,
    *, N: int, nu: int, nx: int, nvar: int, nrows: int, nh: int,
    iterations: int, mu0: float, reg: float, tau: float,
    mehrotra: bool, sigma_fixed: float,
):
    """Full Mehrotra predictor-corrector IPM on one lane block, in-kernel.

    Shared between the standalone QP kernel (`_qp_kernel`) and the fused
    SQP-RTI kernel (ops/pallas_rti.py), which calls it once per RTI
    iteration with freshly linearized data. On return, `zeta_ref` holds
    the primal step dz and `lam_l_ref`/`lam_u_ref` the final duals;
    returns the final complementarity mu [L].

    Row layout per stage: [u-box, x-box, h]. The box rows' Jacobian is
    the identity over z (nu + nx == nvar), so only the nh general rows
    carry a stored Jacobian (Dh_ref) — the box rows contribute
    analytically (diagonal adds / direct slices). The row masks are
    derived from the +-1e15 bound sentinels the caller folds in
    (saves two full [N+1, nrows, LANES] VMEM inputs).
    """
    f32 = jnp.float32
    # Leading block axes between the stage axis and the row/matrix dims:
    # () on the classic per-block path, (G,) on the wide path — all math
    # below is written with negative/ellipsis axes so both ranks share
    # this one implementation.
    lead = tuple(g_ref.shape[1:-2])
    red_ax = (0, -2)  # (stage, rows) reduction — keeps lead + lanes
    lb = lb_ref[...]
    ub = ub_ref[...]
    ml = (lb > -1e14).astype(f32)
    mu_mask = (ub < 1e14).astype(f32)
    n_active = jnp.maximum(jnp.sum(ml, axis=red_ax) + jnp.sum(mu_mask, axis=red_ax), 1.0)  # [*lead, L]

    # --- init ---------------------------------------------------------
    s_l0 = jnp.where(ml > 0, jnp.maximum(-lb, 1e-2), 1.0)
    s_u0 = jnp.where(mu_mask > 0, jnp.maximum(ub, 1e-2), 1.0)
    s_l_ref[...] = s_l0
    s_u_ref[...] = s_u0
    lam_l_cold = jnp.where(ml > 0, mu0 / s_l0, 0.0)
    lam_u_cold = jnp.where(mu_mask > 0, mu0 / s_u0, 0.0)
    if warm is not None:
        wl, wu, wok = warm
        ok = _ed(_ed(wok, -2), 0)  # [1, *lead, 1, L]
        lam_l_ref[...] = jnp.where(
            ml > 0,
            jnp.where(ok, jnp.clip(wl, 1e-8, _W_MAX), lam_l_cold),
            0.0,
        )
        lam_u_ref[...] = jnp.where(
            mu_mask > 0,
            jnp.where(ok, jnp.clip(wu, 1e-8, _W_MAX), lam_u_cold),
            0.0,
        )
    else:
        lam_l_ref[...] = lam_l_cold
        lam_u_ref[...] = lam_u_cold
    del lb, ub, s_l0, s_u0, lam_l_cold, lam_u_cold  # keep init values off the loop stack
    zeta_ref[...] = jnp.zeros((N + 1,) + lead + (nvar, LANES), f32)
    # e = D zeta carried incrementally across IP iterations (zeta starts
    # at 0, and each update is e += a_p * D dz with D dz already computed
    # by the corrector) — saves a per-stage D-multiply loop per iteration.
    ecar_ref[...] = jnp.zeros((N + 1,) + lead + (nrows, LANES), f32)

    eye_u = _eye_nd(nu, lead, LANES)
    eye_v = _eye_nd(nvar, lead, LANES)

    def hbar_stage(k):
        """H_k + D_k' diag(w_k) D_k -> [nvar, nvar, L]. Box rows are the
        identity over z, so their contribution is a diagonal add. Reads
        only refs so it can be indexed dynamically inside loops (Mosaic
        restriction: dynamic_slice is ref-only)."""
        wk = w_ref[k]  # [*lead, nrows, L]
        Hb = H_ref[k] + eye_v * _ed(wk[..., :nvar, :], -2)
        if nh:
            Dk = Dh_ref[k]  # [*lead, nh, nvar, L]
            Hb = Hb + jnp.sum(
                _ed(Dk, -2) * _ed(Dk, -3)
                * _ed(_ed(wk[..., nvar:, :], -2), -2), axis=-4
            )
        return Hb

    def ip_body(_, mu_prev_unused):
        # SCOPED-VMEM DISCIPLINE: every large operand is read from its
        # ref AT THE USE SITE (helpers below), never loaded once into a
        # body-wide local — a value held across the predictor/corrector
        # solves sits on the Mosaic scoped stack for the whole body.
        # This is what lets N=30 (the reference's jackalsimulator
        # horizon) compile: body-top loads of s/lam/masks alone were
        # ~2 MB of cross-phase liveness at N=30 (docs/PERF_NOTES.md).
        def _ml():
            return (lb_ref[...] > -1e14).astype(f32)

        def _mu_m():
            return (ub_ref[...] < 1e14).astype(f32)

        mu = (
            jnp.sum(s_l_ref[...] * lam_l_ref[...] * _ml(), axis=red_ax)
            + jnp.sum(s_u_ref[...] * lam_u_ref[...] * _mu_m(), axis=red_ax)
        ) / n_active  # [*lead, L]
        converged = mu < _MU_FREEZE

        # rho_l/rho_u (slack residuals vs the carried e = D zeta) are
        # recomputed from refs inside linear_solve rather than held here
        # across both predictor and corrector calls — two fewer
        # [N+1, nrows, LANES] buffers on the scoped stack.
        w_ref[...] = jnp.clip(
            _ml() * lam_l_ref[...] / s_l_ref[...]
            + _mu_m() * lam_u_ref[...] / s_u_ref[...],
            0.0, _W_MAX,
        )

        # --- Riccati factorization (backward) --------------------------
        P_term = hbar_stage(N)[..., nu:, nu:, :]

        def factor_body(i, P):
            k = N - 1 - i
            Hb = hbar_stage(k)
            Ak = A_ref[k]
            Bk = B_ref[k]
            PA = _mm(P, Ak)
            PB = _mm(P, Bk)
            R_hat = Hb[..., :nu, :nu, :] + _mm(_transpose(Bk), PB) + reg * eye_u
            S_hat = Hb[..., :nu, nu:, :] + _mm(_transpose(Bk), PA)
            Rinv = _sym_inv(R_hat, nu)
            K = -_mm(Rinv, S_hat)
            Pn_ref[k] = P
            Rinv_ref[k] = Rinv
            K_ref[k] = K
            Sh_ref[k] = S_hat
            P_new = (Hb[..., nu:, nu:, :] + _mm(_transpose(Ak), PA)
                     + _mm(_transpose(S_hat), K))
            return 0.5 * (P_new + _transpose(P_new))

        jax.lax.fori_loop(0, N, factor_body, P_term)

        # equality residual at current iterate
        # zeta read just for the residual/gradient refresh; dies after gst
        zeta = zeta_ref[...]
        zx = zeta[:-1, ..., nu:, :]
        zu = zeta[:-1, ..., :nu, :]
        req_ref[...] = (
            jnp.sum(A_ref[...] * _ed(zx, -3), axis=-2)
            + jnp.sum(B_ref[...] * _ed(zu, -3), axis=-2)
            + c_ref[...]
            - zeta[1:, ..., nu:, :]
        )  # [N, *lead, nx, L]

        gst_ref[...] = g_ref[...] + jnp.sum(
            H_ref[...] * _ed(zeta, -3), axis=-2
        )  # [N+1, *lead, nvar, L]

        def rho():
            """Slack residuals vs the carried e = D zeta — recomputed at
            each use site from refs (not held across the Riccati sweeps)
            to keep the scoped-VMEM stack small."""
            e = ecar_ref[...]
            return (
                (e - lb_ref[...] - s_l_ref[...]) * _ml(),
                (ub_ref[...] - e - s_u_ref[...]) * _mu_m(),
            )

        def linear_solve(rc_l, rc_u):
            """Newton direction for given complementarity targets."""
            rho_l, rho_u = rho()
            coef_ref[...] = (
                -_ml() * lam_l_ref[...]
                + _mu_m() * lam_u_ref[...]
                - _ml() * (rc_l - lam_l_ref[...] * rho_l) / s_l_ref[...]
                + _mu_m() * (rc_u - lam_u_ref[...] * rho_u) / s_u_ref[...]
            )  # [N+1, nrows, L]

            def gb_body(k, _):
                gb = gst_ref[k] + coef_ref[k][..., :nvar, :]
                if nh:
                    gb = gb + jnp.sum(
                        Dh_ref[k] * _ed(coef_ref[k][..., nvar:, :], -2),
                        axis=-3,
                    )
                gb_ref[k] = gb
                return 0

            jax.lax.fori_loop(0, N + 1, gb_body, 0)

            # backward substitution
            def back_body(i, p):
                k = N - 1 - i
                pc = p + _mv(Pn_ref[k], req_ref[k])
                gbk = gb_ref[k]
                r_hat = gbk[..., :nu, :] + _mtv(B_ref[k], pc)
                q_hat = gbk[..., nu:, :] + _mtv(A_ref[k], pc)
                kff = -_mv(Rinv_ref[k], r_hat)
                kff_ref[k] = kff
                return q_hat + _mtv(Sh_ref[k], kff)

            jax.lax.fori_loop(0, N, back_body, gb_ref[N][..., nu:, :])

            # forward rollout
            def fwd_body(k, dx):
                du = _mv(K_ref[k], dx) + kff_ref[k]
                dzt_ref[k] = jnp.concatenate([du, dx], axis=-2)
                return _mv(A_ref[k], dx) + _mv(B_ref[k], du) + req_ref[k]

            dxN = jax.lax.fori_loop(
                0, N, fwd_body, jnp.zeros(lead + (nx, LANES), f32)
            )
            dzt_ref[N] = jnp.concatenate(
                [jnp.zeros(lead + (nu, LANES), f32), dxN], axis=-2)

            def ddz_body(k, _):
                if nh:
                    e_ref[k] = jnp.concatenate(
                        [dzt_ref[k],
                         jnp.sum(Dh_ref[k] * _ed(dzt_ref[k], -3), axis=-2)],
                        axis=-2,
                    )
                else:
                    e_ref[k] = dzt_ref[k]
                return 0

            jax.lax.fori_loop(0, N + 1, ddz_body, 0)
            Ddz = e_ref[...]
            rho_l, rho_u = rho()  # recompute; not live across the sweeps
            ds_l = (Ddz + rho_l) * _ml()
            ds_u = (rho_u - Ddz) * _mu_m()
            dl_l = ((rc_l - lam_l_ref[...] * ds_l) / s_l_ref[...]) * _ml()
            dl_u = ((rc_u - lam_u_ref[...] * ds_u) / s_u_ref[...]) * _mu_m()
            # dz stays in dzt_ref — the caller reads it at its use site
            # (the predictor never needs it; materializing it there kept
            # a dead [N+1, nvar, L] value on the stack).
            return ds_l, ds_u, dl_l, dl_u

        def ftb(v, dv, mask, t):
            ratio = jnp.where((dv < 0) & (mask > 0), -t * v / (dv - 1e-30), 1.0)
            return jnp.clip(jnp.min(ratio, axis=red_ax), 0.0, 1.0)  # [*lead, L]

        if mehrotra:
            # predictor
            ds_l_a, ds_u_a, dl_l_a, dl_u_a = linear_solve(
                (-s_l_ref[...] * lam_l_ref[...]) * _ml(),
                (-s_u_ref[...] * lam_u_ref[...]) * _mu_m(),
            )
            apa = jnp.minimum(ftb(s_l_ref[...], ds_l_a, _ml(), 1.0),
                              ftb(s_u_ref[...], ds_u_a, _mu_m(), 1.0))
            ada = jnp.minimum(ftb(lam_l_ref[...], dl_l_a, _ml(), 1.0),
                              ftb(lam_u_ref[...], dl_u_a, _mu_m(), 1.0))
            apa = _ed(_ed(apa, -2), 0)
            ada = _ed(_ed(ada, -2), 0)
            mu_aff = (
                jnp.sum((s_l_ref[...] + apa * ds_l_a)
                        * (lam_l_ref[...] + ada * dl_l_a) * _ml(), axis=red_ax)
                + jnp.sum((s_u_ref[...] + apa * ds_u_a)
                          * (lam_u_ref[...] + ada * dl_u_a) * _mu_m(),
                          axis=red_ax)
            ) / n_active
            sigma = jnp.clip((mu_aff / (mu + 1e-30)) ** 3, 0.0, 1.0)

            # corrector
            smu = _ed(_ed(sigma * mu, -2), 0)
            ds_l, ds_u, dl_l, dl_u = linear_solve(
                (smu - s_l_ref[...] * lam_l_ref[...] - ds_l_a * dl_l_a) * _ml(),
                (smu - s_u_ref[...] * lam_u_ref[...] - ds_u_a * dl_u_a) * _mu_m(),
            )
        else:
            # plain path-following: single centered Newton step (warm QPs
            # start near the central path; the adaptive Mehrotra centering
            # isn't worth a second backward/forward substitution sweep)
            smu = _ed(_ed(sigma_fixed * mu, -2), 0)
            ds_l, ds_u, dl_l, dl_u = linear_solve(
                (smu - s_l_ref[...] * lam_l_ref[...]) * _ml(),
                (smu - s_u_ref[...] * lam_u_ref[...]) * _mu_m(),
            )
        a_p = jnp.minimum(ftb(s_l_ref[...], ds_l, _ml(), tau),
                          ftb(s_u_ref[...], ds_u, _mu_m(), tau))
        a_d = jnp.minimum(ftb(lam_l_ref[...], dl_l, _ml(), tau),
                          ftb(lam_u_ref[...], dl_u, _mu_m(), tau))

        dz = dzt_ref[...]  # the corrector's primal direction
        bad = converged | (mu > 1e6) | ~jnp.isfinite(mu)
        finite_step = (
            jnp.all(jnp.isfinite(dz), axis=red_ax)
            & jnp.all(jnp.isfinite(dl_l), axis=red_ax)
            & jnp.all(jnp.isfinite(dl_u), axis=red_ax)
        )
        # Freeze by selecting the OLD iterate on frozen lanes, not by
        # zeroing the step size: 0.0 * NaN = NaN, so `a_p = 0` alone
        # would still poison the iterate permanently on a non-finite
        # direction (same guard as solver/qp.py's XLA path). Selecting
        # on the RESULT (rather than sanitizing each direction into a
        # fresh buffer first, as round 2 did) keeps six full-size
        # temporaries off the scoped-VMEM stack — the r2 form OOMed the
        # Mosaic compile at flagship shapes (VERDICT r2 Weak #1).
        frz = _ed(_ed(bad | ~finite_step, -2), 0)  # [1, *lead, 1, L]
        a_p = _ed(_ed(a_p, -2), 0)
        a_d = _ed(_ed(a_d, -2), 0)

        # Every update reads its ref's OLD value at the use site and
        # writes the new one; refs are distinct so ordering is safe.
        zeta_up = zeta_ref[...]
        zeta_ref[...] = jnp.where(frz, zeta_up, zeta_up + a_p * dz)
        # e_ref holds the (final) corrector's D dz from ddz_body; the
        # e = D zeta carry is read back from its ref at the use site.
        e = ecar_ref[...]
        ecar_ref[...] = jnp.where(frz, e, e + a_p * e_ref[...])
        # Frozen lanes keep their current s/lam, which already satisfy
        # the mask invariants (s == 1, lam == 0 on inactive rows).
        s_l = s_l_ref[...]
        s_l_ref[...] = jnp.where(
            frz, s_l,
            jnp.where(_ml() > 0, jnp.maximum(s_l + a_p * ds_l, _S_MIN), 1.0),
        )
        s_u = s_u_ref[...]
        s_u_ref[...] = jnp.where(
            frz, s_u,
            jnp.where(_mu_m() > 0, jnp.maximum(s_u + a_p * ds_u, _S_MIN), 1.0),
        )
        lam_l = lam_l_ref[...]
        lam_l_ref[...] = jnp.where(
            frz, lam_l,
            jnp.where(_ml() > 0, jnp.clip(lam_l + a_d * dl_l, 0.0, _W_MAX), 0.0),
        )
        lam_u = lam_u_ref[...]
        lam_u_ref[...] = jnp.where(
            frz, lam_u,
            jnp.where(_mu_m() > 0, jnp.clip(lam_u + a_d * dl_u, 0.0, _W_MAX), 0.0),
        )
        return mu_prev_unused

    jax.lax.fori_loop(0, iterations, ip_body, jnp.float32(0.0))
    # Masks re-derived (not reused from the init section) so they are
    # not live across the IP loop.
    return (
        jnp.sum(
            s_l_ref[...] * lam_l_ref[...] * (lb_ref[...] > -1e14).astype(f32),
            axis=red_ax,
        )
        + jnp.sum(
            s_u_ref[...] * lam_u_ref[...] * (ub_ref[...] < 1e14).astype(f32),
            axis=red_ax,
        )
    ) / n_active


def _qp_kernel(
    # inputs (VMEM refs, one batch block on the lanes)
    H_ref, g_ref, A_ref, B_ref, c_ref, Dh_ref, lb_ref, ub_ref,
    wl_ref, wu_ref, wok_ref,
    # outputs
    dz_ref, lam_l_ref, lam_u_ref, mu_out_ref,
    # scratch
    s_l_ref, s_u_ref, zeta_ref, Rinv_ref, K_ref, Sh_ref, Pn_ref, kff_ref, dzt_ref,
    w_ref, gb_ref, req_ref, e_ref, coef_ref, gst_ref, ecar_ref, Hm_ref,
    *, N: int, nu: int, nx: int, nvar: int, nrows: int, nh: int,
    iterations: int, mu0: float, reg: float, tau: float, use_warm: bool,
    mehrotra: bool, sigma_fixed: float,
    mirror_in_kernel: bool, lm: float, mirror_x_only: bool,
):
    if mirror_in_kernel:
        # H arrives RAW (exact stage Hessians); apply the MIRROR
        # regularization here instead of in an XLA segment before the
        # kernel — saves the per-RTI-iteration Jacobi pass + its HBM
        # round trip (the in-kernel sweep is identical arithmetic to
        # ops/jacobi_eigh.py::mirror_unpacked). Two scoped-VMEM tricks
        # make this fit alongside G=8 unrolled block programs:
        # (1) the result is written back INTO the input ref (each
        # pallas_call owns a VMEM copy of H, so overwriting is safe) —
        # no full-size mirrored-H value or scratch;
        # (2) the Jacobi runs in STAGE CHUNKS, capping the sweep's
        # SSA live set (element-unpacked carries scale with the stage
        # count) at a fraction of the whole-horizon pass.
        ch = 7
        for c0 in range(0, N + 1, ch):
            c1 = min(c0 + ch, N + 1)
            H_ref[c0:c1] = _mirror_nvar_lanes(
                H_ref[c0:c1], lm, nu, nx, mirror_x_only
            )
    H_use = H_ref
    del Hm_ref  # retired scratch slot (kept 1-element for ABI stability)
    warm = (
        (wl_ref[...], wu_ref[...], wok_ref[..., 0, :] > 0) if use_warm else None
    )
    mu = _ip_solve(
        H_use, A_ref, B_ref, Dh_ref,
        g_ref, c_ref, lb_ref, ub_ref, warm,
        s_l_ref, s_u_ref, zeta_ref, Rinv_ref, K_ref, Sh_ref, Pn_ref, kff_ref,
        dzt_ref, w_ref, gb_ref, req_ref, e_ref, coef_ref, gst_ref, ecar_ref,
        lam_l_ref, lam_u_ref,
        N=N, nu=nu, nx=nx, nvar=nvar, nrows=nrows, nh=nh,
        iterations=iterations, mu0=mu0, reg=reg, tau=tau,
        mehrotra=mehrotra, sigma_fixed=sigma_fixed,
    )
    dz_ref[...] = zeta_ref[...]
    mu_out_ref[...] = _ed(mu, -2)


class PallasQPResult(NamedTuple):
    dz: jnp.ndarray  # [B, N+1, nvar]
    lam_l: jnp.ndarray  # [B, N+1, nrows]
    lam_u: jnp.ndarray
    mu: jnp.ndarray  # [B] final complementarity


def _to_lanes(x):
    """[B, ...dims] -> [...dims, B] (batch onto the lanes)."""
    return jnp.moveaxis(x, 0, -1)


def _from_lanes(x):
    return jnp.moveaxis(x, -1, 0)


def solve_qp_pallas(
    qp,  # QPData with leading batch axis [B, ...]
    nu: int,
    nx: int,
    iterations: int,
    mu0: float = 1e1,
    reg: float = 1e-7,
    tau: float = 0.995,
    warm_duals=None,  # (lam_l [B,N+1,nrows], lam_u, ok [B])
    interpret: bool = False,
    mehrotra: bool = True,
    sigma_fixed: float = 0.1,
    mirror_in_kernel: bool = False,  # H passed RAW; MIRROR applied in-kernel
    lm: float = 1e-4,
    mirror_x_only: bool = False,
    wide: int = 0,  # blocks per kernel call: 0 auto, 1 classic, w>1 wide
) -> PallasQPResult:
    """Batched QP solve via the fused kernel. B is padded to LANES."""
    B = qp.H.shape[0]
    Np1, nvar = qp.g.shape[1], qp.g.shape[2]
    N = Np1 - 1
    nrows = qp.D.shape[2]

    pad = (-B) % LANES
    Bp = B + pad

    def prep(x):
        if pad:
            # Padded elements: replicate element 0 (solves are independent)
            x = jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], 0)
        return _to_lanes(x.astype(jnp.float32))

    nb = nu + nx  # == nvar; box rows are identity and never stored
    nh = nrows - nb
    # Fold the row masks into the bounds as +-1e15 sentinels — the kernel
    # re-derives the masks with a compare, saving two full-size inputs.
    lb_fold = jnp.where(qp.mask_l > 0, qp.lb, -1e15)
    ub_fold = jnp.where(qp.mask_u > 0, qp.ub, 1e15)
    Dh_rows = qp.D[:, :, nb:, :] if nh else jnp.zeros(
        qp.D.shape[:2] + (1, nvar), qp.D.dtype
    )
    H, g, A, Bm, c, Dh, lb, ub = (
        prep(qp.H), prep(qp.g), prep(qp.A), prep(qp.B), prep(qp.c),
        prep(Dh_rows), prep(lb_fold), prep(ub_fold),
    )
    if warm_duals is not None:
        wl, wu, wok = warm_duals
        wl = prep(wl)
        wu = prep(wu)
        wok = prep(wok.astype(jnp.float32).reshape(B, 1))
        use_warm = True
    else:
        wl = jnp.zeros((1, 1, Bp), jnp.float32)
        wu = jnp.zeros((1, 1, Bp), jnp.float32)
        wok = jnp.zeros((1, Bp), jnp.float32)
        use_warm = False

    G = Bp // LANES

    kernel = functools.partial(
        _qp_kernel,
        N=N, nu=nu, nx=nx, nvar=nvar, nrows=nrows, nh=nh,
        iterations=iterations, mu0=mu0, reg=reg, tau=tau, use_warm=use_warm,
        mehrotra=mehrotra, sigma_fixed=sigma_fixed,
        mirror_in_kernel=mirror_in_kernel, lm=lm, mirror_x_only=mirror_x_only,
    )

    def make_call(lead):
        """Build the pallas_call for `lead` = () (classic one-block) or
        (w,) (wide: w blocks per call, every per-stage tensor carrying a
        [w] block axis between the stage axis and the row/matrix dims).
        The wide form exists because the VPU work on the tiny nvar-sized
        operands leaves most of each (sublane, lane) tile empty: stacking
        w blocks into one op raised the measured Riccati-recursion
        throughput ~4-7x per block at w=8
        (experiments/riccati_ilp_probe.py; VERDICT r4 #4)."""
        out_shapes = (
            jax.ShapeDtypeStruct((Np1,) + lead + (nvar, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Np1,) + lead + (nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((Np1,) + lead + (nrows, LANES), jnp.float32),
            jax.ShapeDtypeStruct(lead + (1, LANES), jnp.float32),
        )
        scratch = [
            pltpu.VMEM((Np1,) + lead + (nrows, LANES), jnp.float32),  # s_l
            pltpu.VMEM((Np1,) + lead + (nrows, LANES), jnp.float32),  # s_u
            pltpu.VMEM((Np1,) + lead + (nvar, LANES), jnp.float32),  # zeta
            pltpu.VMEM((N,) + lead + (nu, nu, LANES), jnp.float32),  # Rinv
            pltpu.VMEM((N,) + lead + (nu, nx, LANES), jnp.float32),  # K
            pltpu.VMEM((N,) + lead + (nu, nx, LANES), jnp.float32),  # S_hat
            pltpu.VMEM((N,) + lead + (nx, nx, LANES), jnp.float32),  # P_next
            pltpu.VMEM((N,) + lead + (nu, LANES), jnp.float32),  # kff
            pltpu.VMEM((Np1,) + lead + (nvar, LANES), jnp.float32),  # dz temp
            pltpu.VMEM((Np1,) + lead + (nrows, LANES), jnp.float32),  # w
            pltpu.VMEM((Np1,) + lead + (nvar, LANES), jnp.float32),  # g_bar
            pltpu.VMEM((N,) + lead + (nx, LANES), jnp.float32),  # r_eq
            pltpu.VMEM((Np1,) + lead + (nrows, LANES), jnp.float32),  # e / Ddz
            pltpu.VMEM((Np1,) + lead + (nrows, LANES), jnp.float32),  # coef
            pltpu.VMEM((Np1,) + lead + (nvar, LANES), jnp.float32),  # g_stat
            pltpu.VMEM((Np1,) + lead + (nrows, LANES), jnp.float32),  # e carry
            # retired: the in-kernel MIRROR now writes back into the H
            # input ref (its per-call VMEM copy) instead of a scratch
            pltpu.VMEM((1, 1, 1, LANES), jnp.float32),
        ]
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
            out_specs=tuple(
                pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
            ),
            out_shape=out_shapes,
            scratch_shapes=scratch,
            interpret=interpret,
            # The default 16 MB scoped-VMEM cap is conservative headroom
            # for DMA pipelining of *other* ops; this kernel is a
            # one-shot whole-VMEM program (all inputs resident, no grid
            # pipeline), so let it use most of the chip's 128 MB.
            # Required for the wide multi-block form (~8 MB per block).
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )

    # Split the lane axis into blocks: [..., G*LANES] -> [G, ..., LANES].
    def blocks(x):
        return jnp.moveaxis(x.reshape(x.shape[:-1] + (G, LANES)), -2, 0)

    inputs = tuple(
        blocks(x) for x in (H, g, A, Bm, c, Dh, lb, ub, wl, wu, wok)
    )

    # Blocks per kernel call. wide=0 -> auto: as many blocks as fit a
    # conservative VMEM budget (the whole-batch single call at B<=1024 /
    # N=20). wide=1 -> classic per-block calls.
    w_auto = wide if wide else _wide_blocks_auto(
        N, nu, nx, nvar, nrows, G)
    w_auto = max(1, min(int(w_auto), G))

    if w_auto == 1:
        # Statically unrolled block loop: `jax.lax.map` here miscompiles
        # (see docs/pallas_mirror_miscompile.md), and a grid=(G,)
        # single-call form was tried and rejected — correct but ~3 ms/
        # RTI-iteration slower in the full program (docs/PERF_NOTES.md).
        # G is small (batch/128).
        call = make_call(())
        per_block = [call(*(x[g] for x in inputs)) for g in range(G)]
        dz, lam_l, lam_u, mu_out = (
            jnp.stack([blk[i] for blk in per_block], axis=0) for i in range(4)
        )

        def unblocks(x):
            return jnp.moveaxis(x, 0, -2).reshape(x.shape[1:-1] + (Bp,))

        dz = unblocks(dz)
        lam_l = unblocks(lam_l)
        lam_u = unblocks(lam_u)
        mu_out = unblocks(mu_out)
    else:
        # Wide dispatch: chunks of w blocks ride ONE kernel call with a
        # [w] block axis on every per-stage tensor.
        outs = []
        g0 = 0
        while g0 < G:
            w = min(w_auto, G - g0)
            call = make_call((w,))
            chunk = [
                jnp.moveaxis(x[g0:g0 + w], 0, 1)  # [stage, w, ..., L]
                for x in inputs[:10]
            ]
            wok_c = inputs[10][g0:g0 + w]  # [w, 1, L] (no stage axis)
            outs.append(call(*chunk, wok_c))
            g0 += w

        def unwide(parts, has_stage):
            # [stage, w, ..., L] chunks -> [..., Bp] (lane order g*L+l)
            cat = []
            for x in parts:
                x = jnp.moveaxis(x, 1 if has_stage else 0, -2)
                cat.append(x.reshape(x.shape[:-2] + (-1,)))
            return jnp.concatenate(cat, axis=-1)

        dz = unwide([o[0] for o in outs], True)
        lam_l = unwide([o[1] for o in outs], True)
        lam_u = unwide([o[2] for o in outs], True)
        mu_out = unwide([o[3] for o in outs], False)

    dz = _from_lanes(dz)[:B]
    lam_l = _from_lanes(lam_l)[:B]
    lam_u = _from_lanes(lam_u)[:B]
    mu = _from_lanes(mu_out)[:B, 0]
    return PallasQPResult(dz=dz, lam_l=lam_l, lam_u=lam_u, mu=mu)


def _wide_blocks_auto(N, nu, nx, nvar, nrows, G) -> int:
    """Auto policy for blocks-per-call. Resolves to 1 (classic): the
    wide form was measured END-TO-END NEUTRAL on hardware at the
    flagship shape (B=1024 N=20 T-MPC++, 2026-08-21: warm cycle 25.9 ms
    wide-8 vs 25.2 ms classic, bit-identical results) — the isolated
    Riccati recursion packs 4-7x faster per block
    (experiments/riccati_ilp_probe.py), but the kernel's time is
    dominated by the full-size [N+1, nrows, L] elementwise IP phases,
    whose lane-tile count the wide form does not change. Kept available
    via `solver.qp_wide_blocks` for future libtpu revisions."""
    return 1


def _wide_blocks_fit(N, nu, nx, nvar, nrows, G) -> int:
    """Largest block count per wide kernel call under a conservative
    VMEM budget (inputs + scratch + outputs, f32, all resident)."""
    Np1 = N + 1
    elems = (
        # inputs: H, g, A, B, c, Dh(nh rows), lb, ub, wl, wu
        Np1 * nvar * nvar + Np1 * nvar + N * nx * nx + N * nx * nu
        + N * nx + Np1 * max(nrows - nvar, 1) * nvar + 2 * Np1 * nrows
        + 2 * Np1 * nrows + 1
        # outputs: dz, lam_l, lam_u, mu
        + Np1 * nvar + 2 * Np1 * nrows + 1
        # scratch (see make_call)
        + 7 * Np1 * nrows + 4 * Np1 * nvar
        + N * (nu * nu + 2 * nu * nx + nx * nx + nu + nx)
    )
    per_block = elems * LANES * 4  # bytes
    budget = 80 * 1024 * 1024
    w = max(1, budget // max(per_block, 1))
    # Powers-of-two-ish chunking keeps the number of distinct compiled
    # shapes small across batch sizes.
    for cand in (8, 4, 2, 1):
        if w >= cand:
            return min(cand, G)
    return 1
