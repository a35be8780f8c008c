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


def atan2(y, x):
    """Four-quadrant arctangent from primitives Mosaic can lower.

    `lax.atan2` has no Pallas TPU lowering rule, so traced module costs
    that run inside the fused RTI kernel (ops/pallas_rti.py) use this
    instead: Cephes atanf's degree-9 minimax polynomial with branchless
    range reduction (|t| <= tan 22.5deg core interval) and quadrant
    fixup. Max error ~1e-7 rad; gradients are the piecewise-correct
    d/dy = x/(x^2+y^2), d/dx = -y/(x^2+y^2) away from the origin,
    INCLUDING on the y == 0 ray: the sign of y is carried analytically
    (`sy * a` with sy a where-of-constants), never by selecting a
    constant output in a `where`, so autodiff at y == 0 yields
    d/dy = 1/x — the value jnp.arctan2 gives there. (An earlier version
    selected constants at y == 0 and silently zeroed that derivative,
    corrupting the first RTI linearization at cold start where vt == 0
    exactly — ADVICE r2.)
    """
    eps = 1e-30
    # Nonzero signs (+1 at 0) — where-of-constants, zero gradient.
    sy = jnp.where(y >= 0.0, 1.0, -1.0)
    sx = jnp.where(x >= 0.0, 1.0, -1.0)
    ax_ = jnp.maximum(sx * x, eps)  # |x|, d/dx = sx
    t = (sy * y) / ax_  # |y|/|x| with d/dy = sy/|x| (nonzero at y == 0)

    # Range reduction: t > tan(67.5) -> pi/2 - atan(1/t);
    # t > tan(22.5) -> pi/4 + atan((t-1)/(t+1)); else atan(t).
    hi = t > 2.414213562373095
    mid = (t > 0.4142135623730950) & ~hi
    t_hi = -1.0 / jnp.where(hi, t, 1.0)
    t_mid = (t - 1.0) / (t + 1.0)
    r = jnp.where(hi, t_hi, jnp.where(mid, t_mid, t))
    y0 = jnp.where(hi, jnp.pi / 2, jnp.where(mid, jnp.pi / 4, 0.0))
    z = r * r
    poly = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * r + r
    a = y0 + poly  # atan(|y|/|x|) in [0, pi/2]

    # Quadrants: reflection from x < 0, then the analytic sign of y.
    a = jnp.where(x < 0, jnp.pi - a, a)
    return sy * a


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
