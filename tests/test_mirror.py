"""MIRROR regularization variants agree (see docs/pallas_mirror_miscompile.md)."""

import numpy as np
import jax.numpy as jnp

from mpc_planner_tpu.ops.jacobi_eigh import mirror_jacobi, mirror_unpacked


def _sym_stack(rng, M, n):
    A = rng.normal(size=(M, n, n)).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) * 0.5


def test_mirror_unpacked_matches_jacobi(rng):
    H = jnp.asarray(_sym_stack(rng, 40, 7))
    ref = np.asarray(mirror_jacobi(H, 1e-3))
    out = np.asarray(mirror_unpacked(H, 1e-3))
    assert np.abs(ref - out).max() / np.abs(ref).max() < 5e-3


def test_mirror_unpacked_eigenvalue_floor(rng):
    # Indefinite input -> SPD output with |eig| floored at lm.
    lm = 0.1
    H = _sym_stack(rng, 24, 5)
    out = np.asarray(mirror_unpacked(jnp.asarray(H), lm))
    w = np.linalg.eigvalsh(out)
    assert w.min() >= lm * 0.98
    expect = np.sort(np.maximum(np.abs(np.linalg.eigvalsh(H)), lm), axis=-1)
    np.testing.assert_allclose(np.sort(w, axis=-1), expect, rtol=1e-3, atol=1e-4)


def test_mirror_unpacked_batch_shapes(rng):
    # Works on arbitrary leading batch dims (the SQP path flattens, but
    # the function itself is shape-polymorphic).
    H = jnp.asarray(_sym_stack(rng, 12, 4)).reshape(3, 4, 4, 4)
    out = np.asarray(mirror_unpacked(H, 1e-4))
    assert out.shape == (3, 4, 4, 4)
    ref = np.asarray(mirror_jacobi(H, 1e-4))
    assert np.abs(ref - out).max() / np.abs(ref).max() < 5e-3
