"""Stage-level ILP probe for the Riccati recursion (VERDICT r4 #4).

The QP kernel is latency-bound in its sequential stage-steps (~310 ns
per backward-Riccati stage, PERF_NOTES "Where the time goes"), and at
B=1024 its 8 independent 128-lane blocks run as sequential kernel
launches. The r4 LANES=256 experiment showed per-op time scales
linearly with lane-tiles (issue-bound per lane-tile, not
instruction-latency-bound). The one untried transform: interleave TWO
blocks' recursions as separate op streams in ONE kernel body, so block
B's independent ops could fill block A's dependent-op latency bubbles
(if any exist).

This probe isolates exactly that: the backward Riccati factorization
loop (the dominant dependency chain) in three kernel forms over
identical synthetic stage data:

  single  — one 128-lane block per kernel call (today's structure)
  wide    — two blocks stacked on a leading axis ([2, ..., 128] ops;
            the LANES=256 transform re-expressed)
  interlv — two blocks as SEPARATE tensors, their per-stage ops
            interleaved in the same fori_loop body (independent
            instruction streams, the VERDICT #4 hypothesis)

Plus leading-[G] "wide" variants at G=4/8 and a lanes-adjacent packed
layout ([m, p, G, 128]).

MEASURED (real chip, 2026-08-21; see docs/PERF_NOTES.md "Wide
multi-block kernel"): wide-8 runs the isolated factorization 4-7x
faster per block (packing blocks into the mostly-empty sublanes of the
tiny-matrix tiles); interleaving separate streams buys only 1.0-1.3x.
The production kernel gained a wide dispatch (`qp_wide_blocks`) from
this probe — but END-TO-END it is neutral (25.9 vs 25.2 ms warm cycle
at the B=1024 flagship): the full kernel is dominated by the
[N+1, nrows, 128] elementwise IP phases, not the recursions.

Usage: python -u experiments/riccati_ilp_probe.py [N] [REPS]
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_planner_tpu.ops.pallas_qp import LANES, _ed, _mm, _sym_inv, _transpose

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 30
NU, NX = 2, 5
SWEEPS = 8  # repeat the backward pass this many times per kernel call
#             (amortizes launch overhead like the real kernel's 8-12 IP
#             iterations do)



def _eye4(n, shape):
    """Identity as a full [n, n, *shape] array via iota compares (Mosaic
    rejects reshapes of small constants like eye[:, :, None, None])."""
    import jax.lax as lax
    i = lax.broadcasted_iota(jnp.int32, (n, n) + shape, 0)
    j = lax.broadcasted_iota(jnp.int32, (n, n) + shape, 1)
    return (i == j).astype(jnp.float32)

def _factor_chain(H_ref, A_ref, B_ref, P_out_ref, tag):
    """One backward Riccati factorization sweep reading stage data from
    refs; returns nothing (writes final P to P_out_ref)."""
    eye_u = _ed(jnp.eye(NU, dtype=jnp.float32), 2)

    def body(i, P):
        k = N - 1 - i
        Hb = H_ref[k]
        Ak = A_ref[k]
        Bk = B_ref[k]
        PA = _mm(P, Ak)
        PB = _mm(P, Bk)
        R_hat = Hb[:NU, :NU] + _mm(_transpose(Bk), PB) + 1e-7 * eye_u
        S_hat = Hb[:NU, NU:] + _mm(_transpose(Bk), PA)
        Rinv = _sym_inv(R_hat, NU)
        K = -_mm(Rinv, S_hat)
        P_new = Hb[NU:, NU:] + _mm(_transpose(Ak), PA) + _mm(_transpose(S_hat), K)
        return 0.5 * (P_new + _transpose(P_new))

    P = H_ref[N][NU:, NU:]
    for _ in range(SWEEPS):
        P = jax.lax.fori_loop(0, N, body, P)
    P_out_ref[...] = P


def _kernel_single(H_ref, A_ref, B_ref, P_ref):
    _factor_chain(H_ref, A_ref, B_ref, P_ref, 0)


def _kernel_wide(H_ref, A_ref, B_ref, P_ref):
    """[2, ...] leading block axis inside every op: each op covers both
    blocks (2 lane-tiles per op — the LANES=256 transform)."""
    def mm(a, b):  # [2, m, p, L] @ [2, p, n, L]
        return jnp.sum(_ed(a, 3) * _ed(b, 1), axis=2)

    def tr(a):
        return jnp.swapaxes(a, 1, 2)

    def syminv2(M):  # [2, 2, 2, L]
        a, b, d = M[:, 0, 0], M[:, 0, 1], M[:, 1, 1]
        inv_det = 1.0 / (a * d - b * b)
        row0 = jnp.stack([d, -b], axis=1)
        row1 = jnp.stack([-b, a], axis=1)
        return jnp.stack([row0, row1], axis=1) * _ed(_ed(inv_det, 1), 1)

    def body(i, P):
        k = N - 1 - i
        eye_u = jnp.moveaxis(_eye4(NU, (2, LANES)), 2, 0)
        Hb = H_ref[:, k]
        Ak = A_ref[:, k]
        Bk = B_ref[:, k]
        PA = mm(P, Ak)
        PB = mm(P, Bk)
        R_hat = Hb[:, :NU, :NU] + mm(tr(Bk), PB) + 1e-7 * eye_u
        S_hat = Hb[:, :NU, NU:] + mm(tr(Bk), PA)
        Rinv = syminv2(R_hat)
        K = -mm(Rinv, S_hat)
        P_new = Hb[:, NU:, NU:] + mm(tr(Ak), PA) + mm(tr(S_hat), K)
        return 0.5 * (P_new + tr(P_new))

    P = H_ref[:, N, NU:, NU:]
    for _ in range(SWEEPS):
        P = jax.lax.fori_loop(0, N, body, P)
    P_ref[...] = P


def make_kernel_wide_g(G):
    """Leading [G] block axis inside every op (generalized wide-pair)."""
    def kernel(H_ref, A_ref, B_ref, P_ref):
        def mm(a, b):
            return jnp.sum(_ed(a, 3) * _ed(b, 1), axis=2)

        def tr(a):
            return jnp.swapaxes(a, 1, 2)

        def syminv2(M):
            a, b, d = M[:, 0, 0], M[:, 0, 1], M[:, 1, 1]
            inv_det = 1.0 / (a * d - b * b)
            row0 = jnp.stack([d, -b], axis=1)
            row1 = jnp.stack([-b, a], axis=1)
            return jnp.stack([row0, row1], axis=1) * _ed(_ed(inv_det, 1), 1)

        def body(i, P):
            k = N - 1 - i
            eye_u = jnp.moveaxis(_eye4(NU, (G, LANES)), 2, 0)
            Hb = H_ref[:, k]
            Ak = A_ref[:, k]
            Bk = B_ref[:, k]
            PA = mm(P, Ak)
            PB = mm(P, Bk)
            R_hat = Hb[:, :NU, :NU] + mm(tr(Bk), PB) + 1e-7 * eye_u
            S_hat = Hb[:, :NU, NU:] + mm(tr(Bk), PA)
            Rinv = syminv2(R_hat)
            K = -mm(Rinv, S_hat)
            P_new = Hb[:, NU:, NU:] + mm(tr(Ak), PA) + mm(tr(S_hat), K)
            return 0.5 * (P_new + tr(P_new))

        P = H_ref[:, N, NU:, NU:]
        for _ in range(SWEEPS):
            P = jax.lax.fori_loop(0, N, body, P)
        P_ref[...] = P

    return kernel


def make_kernel_packed_g(G):
    """[stage, m, p, G, L] layout: the block axis sits BETWEEN the matrix
    dims and the lanes, so every op's trailing two dims are (G, 128) —
    at G=8 one exactly-full f32 vreg, eliminating the 5/8-sublane waste
    of today's (p, 128) tiles. Helpers are the SAME broadcast-reduce
    expressions as the production kernel (axis positions unchanged)."""
    def kernel(H_ref, A_ref, B_ref, P_ref):
        def mm(a, b):  # [m, p, G, L] @ [p, n, G, L]
            return jnp.sum(_ed(a, 2) * _ed(b, 0), axis=1)

        def tr(a):
            return jnp.swapaxes(a, 0, 1)

        def syminv2(M):
            a, b, d = M[0, 0], M[0, 1], M[1, 1]
            inv_det = 1.0 / (a * d - b * b)
            row0 = jnp.stack([d, -b], axis=0)
            row1 = jnp.stack([-b, a], axis=0)
            return jnp.stack([row0, row1], axis=0) * _ed(_ed(inv_det, 0), 0)

        eye_u = _eye4(NU, (G, LANES))

        def body(i, P):
            k = N - 1 - i
            Hb = H_ref[k]
            Ak = A_ref[k]
            Bk = B_ref[k]
            PA = mm(P, Ak)
            PB = mm(P, Bk)
            R_hat = Hb[:NU, :NU] + mm(tr(Bk), PB) + 1e-7 * eye_u
            S_hat = Hb[:NU, NU:] + mm(tr(Bk), PA)
            Rinv = syminv2(R_hat)
            K = -mm(Rinv, S_hat)
            P_new = Hb[NU:, NU:] + mm(tr(Ak), PA) + mm(tr(S_hat), K)
            return 0.5 * (P_new + tr(P_new))

        P = H_ref[N, NU:, NU:]
        for _ in range(SWEEPS):
            P = jax.lax.fori_loop(0, N, body, P)
        P_ref[...] = P

    return kernel


def _kernel_interleaved(Ha_ref, Aa_ref, Ba_ref, Hb_ref, Ab_ref, Bb_ref,
                        Pa_ref, Pb_ref):
    """Two blocks' recursions advanced stage-by-stage in ONE loop body —
    independent dependency chains in the same instruction stream."""
    eye_u = _ed(jnp.eye(NU, dtype=jnp.float32), 2)

    def one(H_ref, A_ref, B_ref, k, P):
        Hb = H_ref[k]
        Ak = A_ref[k]
        Bk = B_ref[k]
        PA = _mm(P, Ak)
        PB = _mm(P, Bk)
        R_hat = Hb[:NU, :NU] + _mm(_transpose(Bk), PB) + 1e-7 * eye_u
        S_hat = Hb[:NU, NU:] + _mm(_transpose(Bk), PA)
        Rinv = _sym_inv(R_hat, NU)
        K = -_mm(Rinv, S_hat)
        P_new = Hb[NU:, NU:] + _mm(_transpose(Ak), PA) + _mm(_transpose(S_hat), K)
        return 0.5 * (P_new + _transpose(P_new))

    def body(i, carry):
        Pa, Pb = carry
        k = N - 1 - i
        Pa2 = one(Ha_ref, Aa_ref, Ba_ref, k, Pa)
        Pb2 = one(Hb_ref, Ab_ref, Bb_ref, k, Pb)
        return (Pa2, Pb2)

    Pa = Ha_ref[N][NU:, NU:]
    Pb = Hb_ref[N][NU:, NU:]
    for _ in range(SWEEPS):
        Pa, Pb = jax.lax.fori_loop(0, N, body, (Pa, Pb))
    Pa_ref[...] = Pa
    Pb_ref[...] = Pb


def make_data(rng, lead=()):
    nvar = NU + NX
    M = rng.normal(0, 0.3, lead + (N + 1, nvar, nvar, LANES)).astype(np.float32)
    H = M + np.swapaxes(M, -3, -2) + 3.0 * np.eye(nvar, dtype=np.float32)[:, :, None]
    A = rng.normal(0, 0.2, lead + (N, NX, NX, LANES)).astype(np.float32)
    A += 0.9 * np.eye(NX, dtype=np.float32)[:, :, None]
    B = rng.normal(0, 0.3, lead + (N, NX, NU, LANES)).astype(np.float32)
    return jnp.asarray(H), jnp.asarray(A), jnp.asarray(B)


def bench(fn, args, label):
    out = jax.block_until_ready(fn(*args))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    print(f"{label:10s} {t * 1e6:9.1f} us/call "
          f"({t * 1e9 / (SWEEPS * N):7.1f} ns/stage-step/chain)", flush=True)
    return t, out


def main():
    print(f"platform={jax.devices()[0].platform} N={N} SWEEPS={SWEEPS} "
          f"LANES={LANES}", flush=True)
    rng = np.random.default_rng(0)
    Ha, Aa, Ba = make_data(rng)
    Hb, Ab, Bb = make_data(np.random.default_rng(1))

    vmem = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    p_shape = jax.ShapeDtypeStruct((NX, NX, LANES), jnp.float32)

    single = pl.pallas_call(
        _kernel_single,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=p_shape,
        compiler_params=vmem,
    )
    t_single, Pa_ref = bench(jax.jit(single), (Ha, Aa, Ba), "single")

    # two sequential single-block calls (today's G-loop structure)
    def two_calls(Ha, Aa, Ba, Hb, Ab, Bb):
        return single(Ha, Aa, Ba), single(Hb, Ab, Bb)

    t_two, (Pa2, Pb2) = bench(
        jax.jit(two_calls), (Ha, Aa, Ba, Hb, Ab, Bb), "2x single")

    wide = pl.pallas_call(
        _kernel_wide,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, NX, NX, LANES), jnp.float32),
        compiler_params=vmem,
    )
    Hw = jnp.stack([Ha, Hb])
    Aw = jnp.stack([Aa, Ab])
    Bw = jnp.stack([Ba, Bb])
    t_wide, Pw = bench(jax.jit(wide), (Hw, Aw, Bw), "wide-pair")

    inter = pl.pallas_call(
        _kernel_interleaved,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
        out_shape=(p_shape, p_shape),
        compiler_params=vmem,
    )
    t_inter, (Pia, Pib) = bench(
        jax.jit(inter), (Ha, Aa, Ba, Hb, Ab, Bb), "interleaved")

    # Wider leading axes: G blocks in one kernel, leading [G] per op.
    wide_g = {}
    for G in (4, 8):
        blocks = [make_data(np.random.default_rng(i)) for i in range(G)]
        blocks[0] = (Ha, Aa, Ba)
        Hg = jnp.stack([b[0] for b in blocks])
        Ag = jnp.stack([b[1] for b in blocks])
        Bg = jnp.stack([b[2] for b in blocks])
        kern = pl.pallas_call(
            make_kernel_wide_g(G),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, NX, NX, LANES), jnp.float32),
            compiler_params=vmem,
        )
        t_g, Pg = bench(jax.jit(kern), (Hg, Ag, Bg), f"wide-{G}")
        wide_g[G] = (t_g / G, Pg)

    # Packed layout: [stage, m, p, G, L] (block axis adjacent to lanes)
    packed_g = {}
    for G in (8,):
        blocks = [make_data(np.random.default_rng(i)) for i in range(G)]
        blocks[0] = (Ha, Aa, Ba)
        # [G, stage, m, p, L] -> [stage, m, p, G, L]
        Hg = jnp.moveaxis(jnp.stack([b[0] for b in blocks]), 0, 3)
        Ag = jnp.moveaxis(jnp.stack([b[1] for b in blocks]), 0, 3)
        Bg = jnp.moveaxis(jnp.stack([b[2] for b in blocks]), 0, 3)
        kern = pl.pallas_call(
            make_kernel_packed_g(G),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((NX, NX, G, LANES), jnp.float32),
            compiler_params=vmem,
        )
        t_g, Pg = bench(jax.jit(kern), (Hg, Ag, Bg), f"packed-{G}")
        packed_g[G] = (t_g / G, Pg)

    # numerical agreement across forms
    checks = [("wide", Pw[0]), ("interleaved", Pia)]
    checks += [(f"wide-{G}", P[1][0]) for G, P in wide_g.items()]
    checks += [(f"packed-{G}", P[1][..., 0, :]) for G, P in packed_g.items()]
    for name, got in checks:
        err = float(jnp.max(jnp.abs(got - Pa_ref)))
        assert err < 1e-3, f"{name} mismatch {err}"
    print("agreement ok", flush=True)

    per_block = {
        "single": t_single,
        "2x single (sequential calls)": t_two / 2,
        "wide-pair": t_wide / 2,
        "interleaved-pair": t_inter / 2,
    }
    for G, (t_pb, _) in wide_g.items():
        per_block[f"wide-{G}"] = t_pb
    for G, (t_pb, _) in packed_g.items():
        per_block[f"packed-{G}"] = t_pb
    print("\nper-block cost (lower = latency hidden):")
    for k, v in per_block.items():
        print(f"  {k:30s} {v * 1e6:8.1f} us")
    speedup = t_two / t_inter
    print(f"\ninterleaved speedup vs two sequential calls: {speedup:.2f}x "
          f"(2.0 = perfect hiding, 1.0 = none)")


if __name__ == "__main__":
    main()
