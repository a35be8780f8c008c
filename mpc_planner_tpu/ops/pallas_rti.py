"""Fully fused SQP-RTI Pallas kernel: linearization + MIRROR + every QP
inside ONE kernel launch per 128-lane block.

Round-1 profiling (docs/PERF_NOTES.md) put ~7 ms of the 35 ms B=1024
solve in XLA-side linearize/MIRROR segments and their kernel<->XLA
round trips — 10 RTI iterations x (vmapped `jax.hessian` + Jacobi
mirror + QP-kernel dispatch). This kernel removes those boundaries: the
whole SQP-RTI loop (linearize -> MIRROR -> interior-point QP -> Z += dz,
iterated) runs in-kernel, with all intermediate data resident in VMEM.

How linearization works in-kernel: the OCP's traced per-element
functions (dynamics, running/terminal cost, constraints — plain jnp
compositions, see solver/ocp.py) are differentiated with the SAME
`jax.jacfwd`/`jax.grad`/`jax.hessian` transforms the XLA path uses, but
*inside* the kernel trace, double-vmapped over (stage, lane) with the
lane axis last so every primitive lowers to lane-aligned elementwise
VPU ops. MIRROR regularization is the element-unpacked cyclic Jacobi of
ops/jacobi_eigh.py::mirror_unpacked re-expressed on [stage, LANES]
element vectors.

A further win falls out for free: a batch-of-one solve now costs ONE
lane block for the whole solve (~1/G of the batched pipeline) instead
of paying the full 10-dispatch pipeline — the single-robot closed-loop
operating point of the reference (settings.yaml:6, 20 Hz).

Semantics match solver/sqp.py::_solve_batch_pallas (same IPM via
ops/pallas_qp.py::_ip_solve, same warm-start ladder: cold or
cross-cycle duals at `it0` iterations, then `warm_iters` with duals
carried across RTI iterations) — tests assert agreement. SQP mode
(convergence freeze) is not supported here; the solver gates it to the
unfused path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_planner_tpu.ops.pallas_qp import (
    LANES, _ed, _ip_solve, _mirror_lanes, _mirror_nvar_lanes,
)


def _lane(f):
    """vmap a per-element fn over the lane axis (kept LAST throughout)."""
    return jax.vmap(f, in_axes=(-1, -1), out_axes=-1)


def _stage_lane(f):
    """vmap over (leading stage axis, trailing lane axis)."""
    return jax.vmap(_lane(f), in_axes=(0, 0), out_axes=0)


def _rti_kernel(
    # inputs
    Z0_ref, P_ref, lbT_ref, ubT_ref, wl_ref, wu_ref, wok_ref,
    # outputs
    Zout_ref, lam_l_ref, lam_u_ref, mu_out_ref,
    # scratch: linearized data (dynamic-indexed by the IP solve)
    H_ref, A_ref, B_ref, Dh_ref, g_ref, c_ref, lbv_ref, ubv_ref,
    # scratch: RTI state
    Zc_ref, muc_ref, ok_ref,
    # scratch: IP solve workspace
    s_l_ref, s_u_ref, zeta_ref, Rinv_ref, K_ref, Sh_ref, Pn_ref, kff_ref,
    dzt_ref, w_ref, gb_ref, req_ref, e_ref, coef_ref, gst_ref, ecar_ref,
    *, N: int, nu: int, nx: int, nvar: int, nrows: int, nh: int,
    num_rti: int, it0: int, warm_iters: int,
    mu0: float, reg: float, tau: float, use_warm: bool,
    mehrotra: bool, sigma_fixed: float,
    lm: float, mirror_x_only: bool,
    dyn_fn, run_cost, term_cost, con_fn,
):
    f32 = jnp.float32

    def linearize(Z):
        """In-kernel linearization at iterate Z [N+1, nvar, L]: writes
        H/A/B/Dh and g/c/lb/ub into refs (the IP solve reads them at
        each use site — keeping them off the cross-loop SSA stack is
        the scoped-VMEM discipline that keeps flagship shapes
        compiling, see ops/pallas_qp.py::_ip_solve). Mirrors
        solver/sqp.py::SQPSolver._linearize stage for stage."""
        Zr = Z[:N]
        P_all = P_ref[...]
        Pr = P_all[:N]
        f_val = _stage_lane(dyn_fn)(Zr, Pr)  # [N, nx, L]
        Jf = _stage_lane(jax.jacfwd(dyn_fn))(Zr, Pr)  # [N, nx, nvar, L]
        g_run = _stage_lane(jax.grad(run_cost))(Zr, Pr)  # [N, nvar, L]
        H_run = _stage_lane(jax.hessian(run_cost))(Zr, Pr)  # [N, nvar, nvar, L]
        H_run = _mirror_nvar_lanes(H_run, lm, nu, nx, mirror_x_only)

        # Terminal node: keep a singleton stage axis so every traced op
        # stays >= 2-D ([1, ..., L]) — rank-1 [L] loop-carried values
        # trip a Mosaic layout-inference assertion (layout.h
        # `arr.size() >= layout_rank(implicit_dim)`).
        zN = jnp.concatenate(
            [jnp.zeros((nu, LANES), f32), Z[N, nu:]], axis=0
        )[None]  # [1, nvar, L]
        PN = P_all[N][None]
        gN = _stage_lane(jax.grad(term_cost))(zN, PN)[0]  # [nvar, L]
        HN = _stage_lane(jax.hessian(term_cost))(zN, PN)  # [1, nvar, nvar, L]
        HN_x = _mirror_lanes(HN[:, nu:, nu:, :], lm)[0]  # [nx, nx, L]
        HN_full = jnp.concatenate(
            [
                jnp.zeros((nu, nvar, LANES), f32),
                jnp.concatenate([jnp.zeros((nx, nu, LANES), f32), HN_x], axis=1),
            ],
            axis=0,
        )
        H_ref[...] = jnp.concatenate([H_run, HN_full[None]], axis=0)
        gN_full = jnp.concatenate([jnp.zeros((nu, LANES), f32), gN[nu:]], axis=0)
        g_ref[...] = jnp.concatenate([g_run, gN_full[None]], axis=0)

        A_ref[...] = Jf[:, :, nu:]
        B_ref[...] = Jf[:, :, :nu]
        c_ref[...] = f_val - Z[1:, nu:]

        if nh:
            h_val = _stage_lane(con_fn)(Zr, Pr)  # [N, nh, L]
            Jh = _stage_lane(jax.jacfwd(con_fn))(Zr, Pr)  # [N, nh, nvar, L]
            Dh_ref[...] = jnp.concatenate(
                [Jh, jnp.zeros((1, nh, nvar, LANES), f32)], axis=0
            )
            r_h = jnp.concatenate([h_val, jnp.zeros((1, nh, LANES), f32)], axis=0)
            r = jnp.concatenate([Z, r_h], axis=1)
        else:
            r = Z
        # +-1e15 sentinel templates survive the subtraction in f32
        # (|r| << 1e8 spacing at 1e15), so infinite/inactive rows keep
        # their sentinel and the IP solve's mask derivation sees them.
        lbv_ref[...] = lbT_ref[...] - r
        ubv_ref[...] = ubT_ref[...] - r

    def ip(warm, iterations):
        return _ip_solve(
            H_ref, A_ref, B_ref, Dh_ref, g_ref, c_ref, lbv_ref, ubv_ref, warm,
            s_l_ref, s_u_ref, zeta_ref, Rinv_ref, K_ref, Sh_ref, Pn_ref,
            kff_ref, dzt_ref, w_ref, gb_ref, req_ref, e_ref, coef_ref,
            gst_ref, ecar_ref, lam_l_ref, lam_u_ref,
            N=N, nu=nu, nx=nx, nvar=nvar, nrows=nrows, nh=nh,
            iterations=iterations, mu0=mu0, reg=reg, tau=tau,
            mehrotra=mehrotra, sigma_fixed=sigma_fixed,
        )

    # One unified RTI loop (a separately-peeled first QP doubled the
    # kernel graph and OOM-killed the TPU compiler). Iteration 0 uses
    # the caller's cross-cycle duals (or a cold start when ok=0) at
    # `it0` IP iterations; later iterations warm-start from the
    # previous QP's duals at `warm_iters` — the inner trip count is a
    # traced value selected per RTI iteration.
    Zc_ref[...] = Z0_ref[...]
    if use_warm:
        lam_l_ref[...] = wl_ref[...]
        lam_u_ref[...] = wu_ref[...]
        ok_ref[...] = wok_ref[...]
    else:
        lam_l_ref[...] = jnp.zeros((N + 1, nrows, LANES), f32)
        lam_u_ref[...] = jnp.zeros((N + 1, nrows, LANES), f32)
        ok_ref[...] = jnp.zeros((1, LANES), f32)

    def rti_body(i, carry):
        Z = Zc_ref[...]
        # Snapshot the previous QP's duals BEFORE the IP solve
        # re-initializes the refs (loads are SSA values).
        wl = lam_l_ref[...]
        wu = lam_u_ref[...]
        ok = ok_ref[0, :] > 0
        linearize(Z)
        if it0 == warm_iters:  # steady state (cross-cycle duals): static
            n_ip = it0
        else:
            n_ip = jnp.where(i == 0, jnp.int32(it0), jnp.int32(warm_iters))
        mu = ip((wl, wu, ok), n_ip)
        Zc_ref[...] = Z + zeta_ref[...]
        muc_ref[...] = _ed(mu, 0)
        ok_ref[...] = _ed((mu < 1e-2).astype(f32), 0)
        return carry

    jax.lax.fori_loop(0, num_rti, rti_body, jnp.int32(0))

    Zout_ref[...] = Zc_ref[...]
    mu_out_ref[...] = muc_ref[...]


class PallasRTIResult(NamedTuple):
    Z: jnp.ndarray  # [B, N+1, nvar] final iterate
    lam_l: jnp.ndarray  # [B, N+1, nrows] final QP duals
    lam_u: jnp.ndarray
    mu: jnp.ndarray  # [B] final complementarity


def _to_lanes(x):
    return jnp.moveaxis(x, 0, -1)


def _from_lanes(x):
    return jnp.moveaxis(x, -1, 0)


def solve_rti_pallas(
    Z0,  # [B, N+1, nvar] warmstart (x0 rows already pinned to xinit)
    P,  # [B, N+1, npar]
    *,
    dyn_fn,
    run_cost,
    term_cost,
    con_fn,
    nu: int,
    nx: int,
    nh: int,
    lb_template,  # np [N+1, nrows]: bound values, +-1e15 where inactive
    ub_template,
    num_iterations: int,
    it0: int,
    warm_iters: int,
    mu0: float = 1e1,
    reg: float = 1e-7,
    tau: float = 0.995,
    warm_duals=None,  # (lam_l [B, N+1, nrows], lam_u, ok [B])
    mehrotra: bool = True,
    sigma_fixed: float = 0.1,
    lm: float = 1e-4,
    mirror_x_only: bool = False,
    interpret: bool = False,
) -> PallasRTIResult:
    """Whole-SQP-RTI solve via the fused kernel. B is padded to LANES."""
    B, Np1, nvar = Z0.shape
    N = Np1 - 1
    nrows = lb_template.shape[1]
    npar = P.shape[2]

    pad = (-B) % LANES
    Bp = B + pad

    def prep(x):
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])], 0
            )
        return _to_lanes(x.astype(jnp.float32))

    Z0l = prep(Z0)
    Pl = prep(P)
    lbT = jnp.broadcast_to(
        jnp.asarray(lb_template, jnp.float32)[:, :, None], (Np1, nrows, LANES)
    )
    ubT = jnp.broadcast_to(
        jnp.asarray(ub_template, jnp.float32)[:, :, None], (Np1, nrows, LANES)
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
        _rti_kernel,
        N=N, nu=nu, nx=nx, nvar=nvar, nrows=nrows, nh=nh,
        num_rti=num_iterations, it0=it0, warm_iters=warm_iters,
        mu0=mu0, reg=reg, tau=tau, use_warm=use_warm,
        mehrotra=mehrotra,
        sigma_fixed=sigma_fixed, lm=lm, mirror_x_only=mirror_x_only,
        dyn_fn=dyn_fn, run_cost=run_cost, term_cost=term_cost, con_fn=con_fn,
    )

    out_shapes = (
        jax.ShapeDtypeStruct((Np1, nvar, LANES), jnp.float32),  # Z
        jax.ShapeDtypeStruct((Np1, nrows, LANES), jnp.float32),  # lam_l
        jax.ShapeDtypeStruct((Np1, nrows, LANES), jnp.float32),  # lam_u
        jax.ShapeDtypeStruct((1, LANES), jnp.float32),  # mu
    )

    nh_s = max(nh, 1)
    scratch = [
        # linearized data
        pltpu.VMEM((Np1, nvar, nvar, LANES), jnp.float32),  # H
        pltpu.VMEM((N, nx, nx, LANES), jnp.float32),  # A
        pltpu.VMEM((N, nx, nu, LANES), jnp.float32),  # B
        pltpu.VMEM((Np1, nh_s, nvar, LANES), jnp.float32),  # Dh
        pltpu.VMEM((Np1, nvar, LANES), jnp.float32),  # g
        pltpu.VMEM((N, nx, LANES), jnp.float32),  # c
        pltpu.VMEM((Np1, nrows, LANES), jnp.float32),  # lb (values)
        pltpu.VMEM((Np1, nrows, LANES), jnp.float32),  # ub (values)
        # RTI state
        pltpu.VMEM((Np1, nvar, LANES), jnp.float32),  # Zc
        pltpu.VMEM((1, LANES), jnp.float32),  # muc
        pltpu.VMEM((1, LANES), jnp.float32),  # ok (warm-dual validity)
        # IP workspace (same as ops/pallas_qp.py)
        pltpu.VMEM((Np1, nrows, LANES), jnp.float32),  # s_l
        pltpu.VMEM((Np1, nrows, LANES), jnp.float32),  # s_u
        pltpu.VMEM((Np1, nvar, LANES), jnp.float32),  # zeta
        pltpu.VMEM((N, nu, nu, LANES), jnp.float32),  # Rinv
        pltpu.VMEM((N, nu, nx, LANES), jnp.float32),  # K
        pltpu.VMEM((N, nu, nx, LANES), jnp.float32),  # S_hat
        pltpu.VMEM((N, nx, nx, LANES), jnp.float32),  # P_next
        pltpu.VMEM((N, nu, LANES), jnp.float32),  # kff
        pltpu.VMEM((Np1, nvar, LANES), jnp.float32),  # dz temp
        pltpu.VMEM((Np1, nrows, LANES), jnp.float32),  # w
        pltpu.VMEM((Np1, nvar, LANES), jnp.float32),  # g_bar
        pltpu.VMEM((N, nx, LANES), jnp.float32),  # r_eq
        pltpu.VMEM((Np1, nrows, LANES), jnp.float32),  # e / Ddz
        pltpu.VMEM((Np1, nrows, LANES), jnp.float32),  # coef
        pltpu.VMEM((Np1, nvar, LANES), jnp.float32),  # g_stat
        pltpu.VMEM((Np1, nrows, LANES), jnp.float32),  # e carry (D zeta)
    ]

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes
        ),
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )

    def blocks(x):
        return jnp.moveaxis(x.reshape(x.shape[:-1] + (G, LANES)), -2, 0)

    per_lane_inputs = tuple(blocks(x) for x in (Z0l, Pl, wl, wu, wok))
    # Statically unrolled block loop (lax.map over pallas_call miscompiles
    # — docs/pallas_mirror_miscompile.md); templates are block-invariant.
    per_block = [
        call(
            per_lane_inputs[0][g], per_lane_inputs[1][g], lbT, ubT,
            per_lane_inputs[2][g], per_lane_inputs[3][g], per_lane_inputs[4][g],
        )
        for g in range(G)
    ]
    Zl, lam_l, lam_u, mu_out = (
        jnp.stack([blk[i] for blk in per_block], axis=0) for i in range(4)
    )

    def unblocks(x):
        return jnp.moveaxis(x, 0, -2).reshape(x.shape[1:-1] + (Bp,))

    Zl = _from_lanes(unblocks(Zl))[:B]
    lam_l = _from_lanes(unblocks(lam_l))[:B]
    lam_u = _from_lanes(unblocks(lam_u))[:B]
    mu = _from_lanes(unblocks(mu_out))[:B, 0]
    return PallasRTIResult(Z=Zl, lam_l=lam_l, lam_u=lam_u, mu=mu)
