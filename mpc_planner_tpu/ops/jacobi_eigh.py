"""Batched cyclic-Jacobi symmetric eigendecomposition for tiny matrices.

XLA's `eigh` on TPU costs ~3us per 7x7 matrix (a QR-iteration custom
lowering) — at [B*N, 7, 7] stacks that is ~15ms per SQP linearization,
dominating the whole solve. The stage Hessians here are at most 9x9, so a
fixed-sweep cyclic Jacobi with trace-time-unrolled (i, j) rotations is
exact to f32 precision after ~6 sweeps and lowers to pure elementwise
VPU ops over the batch — about 100x faster at these shapes.

Used for the acados-equivalent MIRROR regularization
(generate_acados_solver.py:161): H -> V max(|diag|, lm) V'.
"""

from __future__ import annotations

import jax.numpy as jnp


def jacobi_eigh(H, sweeps: int = 6):
    """Eigendecomposition of symmetric H [..., n, n] (n static, small).

    Returns (w [..., n], V [..., n, n]) with H ~= V diag(w) V^T.
    """
    n = H.shape[-1]
    A = H
    V = jnp.broadcast_to(jnp.eye(n, dtype=H.dtype), H.shape)

    for _ in range(sweeps):
        for i in range(n - 1):
            for j in range(i + 1, n):
                A, V = _rotate(A, V, i, j)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    return w, V


def _rotate(A, V, i: int, j: int):
    """One Jacobi rotation zeroing A[..., i, j] (static i < j)."""
    aii = A[..., i, i]
    ajj = A[..., j, j]
    aij = A[..., i, j]

    # Stable rotation angle: t = sign(theta) / (|theta| + sqrt(theta^2+1))
    theta = (ajj - aii) / (2.0 * jnp.where(jnp.abs(aij) > 1e-30, aij, 1e-30))
    sign = jnp.where(theta >= 0, 1.0, -1.0)
    t = sign / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
    t = jnp.where(jnp.abs(aij) > 1e-30, t, 0.0)
    c = 1.0 / jnp.sqrt(t * t + 1.0)
    s = t * c

    # Apply the rotation to rows/cols i and j of A: A <- J^T A J
    rowi = A[..., i, :]
    rowj = A[..., j, :]
    new_i = c[..., None] * rowi - s[..., None] * rowj
    new_j = s[..., None] * rowi + c[..., None] * rowj
    A = A.at[..., i, :].set(new_i).at[..., j, :].set(new_j)
    coli = A[..., :, i]
    colj = A[..., :, j]
    new_ci = c[..., None] * coli - s[..., None] * colj
    new_cj = s[..., None] * coli + c[..., None] * colj
    A = A.at[..., :, i].set(new_ci).at[..., :, j].set(new_cj)
    # Exact zeros on the eliminated pair (symmetrize numerically)
    A = A.at[..., i, j].set(0.0).at[..., j, i].set(0.0)

    vcoli = V[..., :, i]
    vcolj = V[..., :, j]
    V = (
        V.at[..., :, i].set(c[..., None] * vcoli - s[..., None] * vcolj)
        .at[..., :, j].set(s[..., None] * vcoli + c[..., None] * vcolj)
    )
    return A, V


def mirror_jacobi(H, lm: float, sweeps: int = 6):
    """MIRROR regularization via Jacobi: eigenvalues -> max(|w|, lm)."""
    w, V = jacobi_eigh(H, sweeps=sweeps)
    w = jnp.maximum(jnp.abs(w), lm)
    return jnp.einsum("...ij,...j,...kj->...ik", V, w, V)


def mirror_unpacked(H, lm: float, sweeps: int = 6):
    """MIRROR via cyclic Jacobi with the matrix elements unpacked into
    n*n separate [...]-shaped arrays.

    Same math as `mirror_jacobi`, but every rotation is pure elementwise
    arithmetic on batch vectors — no `.at[].set()` row updates, which XLA
    lowers to ~10x slower dynamic-update-slice chains on TPU (15 ms ->
    1.5 ms at a [21504, 7, 7] stack). This is the production path for the
    batched SQP linearization; a fully fused Pallas version was ~30x
    faster still but triggered an XLA:TPU miscompile when composed with
    the linearization + QP kernel in one program (worker crashes /
    NaN flips dependent on unrelated epilogue outputs), so it was
    removed — see docs/pallas_mirror_miscompile.md.
    """
    n = H.shape[-1]
    a = [[H[..., i, j] for j in range(n)] for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            s = 0.5 * (a[i][j] + a[j][i])
            a[i][j] = s
            a[j][i] = s
    one = jnp.ones_like(a[0][0])
    zero = jnp.zeros_like(a[0][0])
    v = [[one if i == j else zero for j in range(n)] for i in range(n)]

    for _ in range(sweeps):
        for p in range(n - 1):
            for q in range(p + 1, n):
                apq, app, aqq = a[p][q], a[p][p], a[q][q]
                # Stable rotation: t = sign(th)/(|th| + sqrt(th^2 + 1))
                denom = jnp.where(jnp.abs(apq) > 1e-30, apq, 1e-30)
                theta = (aqq - app) / (2.0 * denom)
                sign = jnp.where(theta >= 0, 1.0, -1.0)
                t = sign / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
                t = jnp.where(jnp.abs(apq) > 1e-30, t, 0.0)
                c = 1.0 / jnp.sqrt(t * t + 1.0)
                s = t * c
                for k in range(n):  # rows p, q: A <- J^T A
                    akp, akq = a[p][k], a[q][k]
                    a[p][k] = c * akp - s * akq
                    a[q][k] = s * akp + c * akq
                for k in range(n):  # cols p, q: A <- A J
                    akp, akq = a[k][p], a[k][q]
                    a[k][p] = c * akp - s * akq
                    a[k][q] = s * akp + c * akq
                a[p][q] = zero
                a[q][p] = zero
                for k in range(n):  # eigenvector columns
                    vkp, vkq = v[k][p], v[k][q]
                    v[k][p] = c * vkp - s * vkq
                    v[k][q] = s * vkp + c * vkq

    w = [jnp.maximum(jnp.abs(a[d][d]), lm) for d in range(n)]
    rows = []
    for i in range(n):
        row = []
        for k in range(n):
            acc = v[i][0] * w[0] * v[k][0]
            for j in range(1, n):
                acc = acc + v[i][j] * w[j] * v[k][j]
            row.append(acc)
        rows.append(jnp.stack(row, axis=-1))
    return jnp.stack(rows, axis=-2)
