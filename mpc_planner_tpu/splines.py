"""Sigmoid-blended cubic splines evaluated inside the traced OCP.

TPU-native equivalent of reference solver_generator/spline.py:4-87.
Cubic segments y_i(s) = a(s-s0)^3 + b(s-s0)^2 + c(s-s0) + d are blended
with sigmoids lambda_i(s) = 1/(1+exp((s - s_start_i + 0.02)/0.1)) so the
cost is smooth in s across segment boundaries (spline.py:37).

The reference glues segments with an iterative loop; here the telescoping
blend is evaluated in closed form with a cumulative product so the whole
evaluation is a handful of vector ops:

  value = sum_i w_i * y_i(s),  w_i = lambda_i * prod_{j<i} (1 - lambda_j)

with lambda for the *last* segment fixed to 1 (it is the fallback branch
of the telescoping recursion).
"""

from __future__ import annotations

import jax.numpy as jnp


def _blend_weights(s, s_starts):
    """Blend weights w_i(s) for segments with start offsets s_starts[1:].

    s_starts: [num_segments] (first entry unused — no lambda for segment 0,
    spline.py:35-37). Returns [..., num_segments].
    """
    num_segments = s_starts.shape[0]
    if num_segments == 1:
        return jnp.ones(jnp.shape(s) + (1,))
    # lambda_i for i = 0..n-2 gates segment i against everything after it;
    # it uses segment (i+1)'s start. jax.nn.sigmoid is the overflow-safe
    # form of the reference's 1/(1+exp(t)) (spline.py:37) — the naive
    # expression yields inf/inf = NaN under autodiff for |t| > ~88 in f32.
    import jax

    lam = jax.nn.sigmoid(-(s[..., None] - s_starts[1:] + 0.02) / 0.1)  # [..., n-1]
    # Telescoping product w_i = lambda_i * prod_{j<i}(1 - lambda_j),
    # unrolled over the (static, small) segment count. An equivalent
    # jnp.cumprod is rejected by Mosaic inside the fused RTI kernel (the
    # prefix-scan lowering emits zero-size slices).
    ws = []
    prod = jnp.ones(jnp.shape(s))
    for i in range(num_segments - 1):
        ws.append(lam[..., i] * prod)
        prod = prod * (1.0 - lam[..., i])
    ws.append(prod)  # last segment: lambda = 1 (fallback branch)
    return jnp.stack(ws, axis=-1)


class Spline:
    """1D blended cubic spline addressed by parameter-name bundles
    (ref spline.py Spline)."""

    def __init__(self, params, name: str, num_segments: int, s):
        # Gather per-segment coefficients from the bound parameter vector.
        self.a = jnp.stack([params.get(f"{name}{i}_a") for i in range(num_segments)])
        self.b = jnp.stack([params.get(f"{name}{i}_b") for i in range(num_segments)])
        self.c = jnp.stack([params.get(f"{name}{i}_c") for i in range(num_segments)])
        self.d = jnp.stack([params.get(f"{name}{i}_d") for i in range(num_segments)])
        self.s_start = jnp.stack(
            [params.get(f"spline{i}_start") for i in range(num_segments)]
        )
        self.num_segments = num_segments
        self._w = _blend_weights(jnp.asarray(s), self.s_start)

    def _ds(self, s):
        return jnp.asarray(s)[..., None] - self.s_start

    def at(self, s):
        ds = self._ds(s)
        vals = self.a * ds**3 + self.b * ds**2 + self.c * ds + self.d
        return jnp.sum(self._w * vals, axis=-1)

    def deriv(self, s):
        ds = self._ds(s)
        vals = 3.0 * self.a * ds**2 + 2.0 * self.b * ds + self.c
        return jnp.sum(self._w * vals, axis=-1)

    def deriv2(self, s):
        ds = self._ds(s)
        vals = 6.0 * self.a * ds + 2.0 * self.b
        return jnp.sum(self._w * vals, axis=-1)


class Spline2D:
    """2D path spline (ref spline.py Spline2D)."""

    def __init__(self, params, num_segments: int, s):
        self.spline_x = Spline(params, "spline_x", num_segments, s)
        self.spline_y = Spline(params, "spline_y", num_segments, s)

    def at(self, s):
        return self.spline_x.at(s), self.spline_y.at(s)

    def deriv(self, s):
        return self.spline_x.deriv(s), self.spline_y.deriv(s)

    def deriv_normalized(self, s):
        dx = self.spline_x.deriv(s)
        dy = self.spline_y.deriv(s)
        norm = jnp.sqrt(dx * dx + dy * dy) + 1e-12
        return dx / norm, dy / norm

    def deriv2(self, s):
        return self.spline_x.deriv2(s), self.spline_y.deriv2(s)

    def get_curvature(self, s):
        ddx = self.spline_x.deriv2(s)
        ddy = self.spline_y.deriv2(s)
        # Double-where: sqrt's gradient at exactly 0 is NaN, and a
        # perfectly straight reference path hits 0 exactly — which
        # poisoned the CA models' spline-update Jacobian (every solve
        # froze on the corridor's straight centerline; found r5).
        sq = ddx * ddx + ddy * ddy
        safe = jnp.where(sq > 1e-20, sq, 1e-20)
        return jnp.where(sq > 1e-20, jnp.sqrt(safe), 0.0)
