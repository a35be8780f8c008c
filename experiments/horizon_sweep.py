"""Horizon sweep: sequential vs parallel-in-horizon (associative-scan)
Riccati on the XLA QP path.

Measures the batched IP QP solve (the inner loop of the SQP) across
horizon lengths to locate the crossover where the O(log N)-depth scan
beats the O(N)-depth sequential sweeps. Run on TPU for the numbers that
matter; CPU runs give structure-only signal.

    python experiments/horizon_sweep.py [--batch 256] [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_planner_tpu.solver.qp import QPData, solve_qp


def make_qp(rng, B, N, nu=2, nx=5, nh=8):
    nvar = nu + nx
    nrows = nvar + nh

    def spd(n, scale=1.0):
        M = rng.normal(0, 1, (B, N + 1, n, n))
        return scale * (M @ M.transpose(0, 1, 3, 2) + 2.0 * np.eye(n))

    H = spd(nvar, 0.5)
    H[:, N, :nu, :] = 0.0
    H[:, N, :, :nu] = 0.0
    H[:, N, nu:, nu:] += np.eye(nx)
    g = rng.normal(0, 1, (B, N + 1, nvar))
    A = np.tile(np.eye(nx), (B, N, 1, 1)) + 0.05 * rng.normal(0, 1, (B, N, nx, nx))
    Bm = 0.3 * rng.normal(0, 1, (B, N, nx, nu))
    c = 0.05 * rng.normal(0, 1, (B, N, nx))
    D_h = rng.normal(0, 1, (B, N + 1, nh, nvar))
    D_box = np.broadcast_to(np.eye(nvar), (B, N + 1, nvar, nvar))
    D = np.concatenate([D_box, D_h], axis=2)
    lb = -2.0 - np.abs(rng.normal(0, 1, (B, N + 1, nrows)))
    ub = 2.0 + np.abs(rng.normal(0, 1, (B, N + 1, nrows)))
    mask = np.ones((B, N + 1, nrows))
    mask[:, 0, nu:nvar] = 0.0
    mask[:, N, :nu] = 0.0
    mask[:, N, nvar:] = 0.0
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return QPData(H=f32(H), g=f32(g), A=f32(A), B=f32(Bm), c=f32(c), D=f32(D),
                  lb=f32(lb), ub=f32(ub), mask_l=f32(mask), mask_u=f32(mask)), nu, nx


CHAIN = 4  # solves chained on device per timed dispatch


def bench(fn, *args, reps=3):
    """Time `fn` with CHAIN data-dependent repetitions inside one jit,
    and sync by PULLING a reduction of the result to the host.
    `jax.block_until_ready` is NOT a reliable fence for pure-XLA scan
    programs on the axon platform (measured: 0.3 ms "ready" vs 60 s of
    actual compute+pull) — only a data pull is."""
    _ = np.asarray(fn(*args)).sum()  # compile + flush
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args)).sum()
        times.append(time.perf_counter() - t0)
    return min(times) / CHAIN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--horizons", type=int, nargs="+",
                    default=[10, 20, 30, 60, 120, 240])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"# backend={jax.default_backend()} B={args.batch} ip_iters={args.iters}")
    print(f"{'N':>5} {'seq ms':>9} {'par ms':>9} {'par/seq':>8}")
    for N in args.horizons:
        qp, nu, nx = make_qp(rng, args.batch, N)

        def run(hp):
            def solve_all(d):
                return jax.vmap(lambda e: solve_qp(
                    e, nu, nx, iterations=args.iters, horizon_parallel=hp))(d)

            @jax.jit
            def chained(d):
                # Data-dependent chain: the previous solution perturbs the
                # next gradient, so XLA cannot elide or overlap solves.
                def body(carry, _):
                    dz = solve_all(d._replace(g=d.g + 1e-6 * carry)).dz
                    return dz, None

                dz0 = jnp.zeros_like(d.g)
                out, _ = jax.lax.scan(body, dz0, None, length=CHAIN)
                return out

            with jax.default_matmul_precision("highest"):
                return bench(chained, qp)

        t_seq = run(False)
        t_par = run(True)
        print(f"{N:>5} {t_seq*1e3:>9.2f} {t_par*1e3:>9.2f} {t_par/t_seq:>8.2f}")


if __name__ == "__main__":
    main()
