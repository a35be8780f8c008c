"""Math helpers (ref solver_generator/util/math.py:5-11 + ros_tools math)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotation_matrix(angle):
    """2D rotation matrix; works on traced scalars -> [..., 2, 2]."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def haar_difference_without_abs(angle1, angle2):
    """Signed angle difference wrapped to (-pi, pi]
    (ref util/math.py:10-11). jnp.mod matches CasADi fmod for this use."""
    return jnp.mod(angle1 - angle2 + jnp.pi, 2.0 * jnp.pi) - jnp.pi


def exponential_quantile(lam: float, p: float) -> float:
    """Quantile of Exp(lam) — ros_tools ExponentialQuantile, used for the
    Gaussian->ellipsoid chi multiplier (ellipsoid_constraints.cpp:80)."""
    return float(-np.log(1.0 - p) / lam)


def erfinv_approx(x):
    """Inverse error function: rational approximation + 2 Newton steps.

    Matches the reference's hand-rolled CasADi erfinv
    (gaussian_constraints.py:104-114) so chance-constraint margins agree.
    """
    z = jnp.sqrt(-jnp.log((1.0 - x) / 2.0))
    y = (((1.641345311 * z + 3.429567803) * z - 1.624906493) * z - 1.970840454) / (
        (1.637067800 * z + 3.543889200) * z + 1.0
    )
    for _ in range(2):
        y = y - (jax_erf(y) - x) / (2.0 / jnp.sqrt(jnp.pi) * jnp.exp(-y * y))
    return y


def jax_erf(x):
    import jax.scipy.special as jsp

    return jsp.erf(x)


def douglas_rachford_projection(pos, obstacle_pos, anchor, radius, start_pos):
    """One Douglas-Rachford iteration projecting `pos` out of a disc
    (ros_tools math, used at linearized_constraints.cpp:142-145).

    Numpy host-side version operating on [..., 2] arrays.
    """
    # Reflect-project-reflect around halfway point between pos and anchor
    p = np.asarray(pos, dtype=float)
    o = np.asarray(obstacle_pos, dtype=float)
    diff = p - o
    dist = np.linalg.norm(diff, axis=-1, keepdims=True)
    dist = np.maximum(dist, 1e-9)
    proj = o + diff / dist * max(radius, 1e-9)
    inside = (dist < radius)[..., 0]
    out = p.copy()
    if np.ndim(inside) == 0:
        return proj if inside else p
    out[inside] = proj[inside]
    return out


def linspace(start: float, end: float, num: int) -> np.ndarray:
    return np.linspace(start, end, num)


def distance(a, b) -> float:
    return float(np.linalg.norm(np.asarray(a, dtype=float) - np.asarray(b, dtype=float)))
