"""Minimal kernel-only repro for the nvar=8 Pallas fault (VERDICT r2 #4).

History: at nvar=8 (the SH-MPC slack model, ref solver_model.py:274-299)
the compiled QP kernel was NONDETERMINISTICALLY faulty on hardware —
flip-flopping across fresh processes between chip faults, all-NaN
results, and bit-correct answers — while nvar<=7 never faulted
(docs/PERF_NOTES.md). This script drops the whole solver stack and feeds
the kernel SYNTHETIC stagewise QPs directly, so the fault (or a
workaround) is attributable to the kernel alone.

Hypothesis being probed: nvar=8 is the first config where the row count
(nrows = nvar + nh = 32) and the variable count (8) are exact multiples
of the 8-sublane tile; an alignment-sensitive Mosaic bug would show
exactly this flakiness. `pad` mode appends one permanently-inactive
general row (sentinel bounds, zero Jacobian), making nrows=33 while
keeping nvar=8.

Usage: python experiments/nvar8_repro.py [plain|pad|nvar7] [seed]
Prints one line: PASS / NAN / MISMATCH. Run many fresh processes:
    for i in $(seq 10); do python experiments/nvar8_repro.py pad $i; done
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

MODE = sys.argv[1] if len(sys.argv) > 1 else "plain"
SEED = int(sys.argv[2]) if len(sys.argv) > 2 else 0
B = 256
N = 20
NH = 24
ITER = 10


def make_qp(rng, nvar, nu, nh, pad_rows=0):
    import jax.numpy as jnp

    from mpc_planner_tpu.solver.qp import QPData

    nx = nvar - nu
    nrows = nvar + nh + pad_rows
    Np1 = N + 1

    # Well-conditioned random stagewise QP: SPD Hessians, stable A,
    # box rows on every variable, nh general rows with random Jacobians.
    L = rng.normal(0, 0.3, (B, Np1, nvar, nvar))
    H = np.einsum("bkij,bklj->bkil", L, L) + 1.0 * np.eye(nvar)
    g = rng.normal(0, 1.0, (B, Np1, nvar))
    A = np.tile(np.eye(nx), (B, N, 1, 1)) + rng.normal(0, 0.05, (B, N, nx, nx))
    Bm = rng.normal(0, 0.2, (B, N, nx, nu))
    c = rng.normal(0, 0.1, (B, N, nx))

    D = np.zeros((B, Np1, nrows, nvar))
    D[:, :, :nvar, :] = np.eye(nvar)
    D[:, :, nvar : nvar + nh, :] = rng.normal(0, 0.5, (B, Np1, nh, nvar))
    # pad rows stay all-zero Jacobian

    lb = np.full((B, Np1, nrows), -2.5)
    ub = np.full((B, Np1, nrows), 2.5)
    mask = np.ones((B, Np1, nrows))
    if pad_rows:
        mask[:, :, nvar + nh :] = 0.0
        lb[:, :, nvar + nh :] = -1e15
        ub[:, :, nvar + nh :] = 1e15

    return QPData(
        H=jnp.asarray(H, jnp.float32), g=jnp.asarray(g, jnp.float32),
        A=jnp.asarray(A, jnp.float32), B=jnp.asarray(Bm, jnp.float32),
        c=jnp.asarray(c, jnp.float32), D=jnp.asarray(D, jnp.float32),
        lb=jnp.asarray(lb, jnp.float32), ub=jnp.asarray(ub, jnp.float32),
        mask_l=jnp.asarray(mask, jnp.float32),
        mask_u=jnp.asarray(mask, jnp.float32),
    ), nx


def main():
    import jax
    import jax.numpy as jnp

    from mpc_planner_tpu.ops.pallas_qp import solve_qp_pallas
    from mpc_planner_tpu.solver.qp import solve_qp

    rng = np.random.default_rng(SEED)
    nu = 2
    if MODE == "nvar7":
        nvar, pad = 7, 0
    elif MODE == "pad":
        nvar, pad = 8, 1
    else:
        nvar, pad = 8, 0
    qp, nx = make_qp(rng, nvar, nu, NH, pad_rows=pad)

    interpret = os.environ.get("NVAR8_INTERPRET") == "1"  # CPU logic check
    sol = solve_qp_pallas(qp, nu, nx, iterations=ITER, interpret=interpret)
    dz = np.asarray(sol.dz)

    if not np.all(np.isfinite(dz)):
        frac = float(np.mean(~np.isfinite(dz)))
        print(f"NAN mode={MODE} seed={SEED} frac={frac:.2f}")
        sys.exit(2)

    # CPU XLA reference on a small sample
    cpu = jax.local_devices(backend="cpu")[0]
    ns = 4
    with jax.default_device(cpu):
        ref = jax.vmap(
            lambda *a: solve_qp(
                type(qp)(*a), nu, nx, iterations=ITER
            )
        )(*(np.asarray(x[:ns]) for x in qp))
    dref = np.asarray(ref.dz)
    scale = np.abs(dref).max() + 1e-9
    err = np.abs(dz[:ns] - dref).max() / scale
    if err > 5e-2:
        print(f"MISMATCH mode={MODE} seed={SEED} err={err:.2e}")
        sys.exit(3)
    print(f"PASS mode={MODE} seed={SEED} err={err:.2e}")


if __name__ == "__main__":
    main()
