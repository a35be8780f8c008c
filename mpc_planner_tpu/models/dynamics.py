"""Dynamics models + RK4 discretization as pure jnp functions.

TPU-native equivalent of reference solver_generator/solver_model.py:49-437.
Where the reference builds CasADi expressions that acados code-generates
into C, these models are plain JAX functions: "code generation" is jit
tracing, and linearization (A_k, B_k) is `jax.jacfwd` of the discrete
step. All shapes static; models are hashable static metadata.

Conventions (identical to the reference):
  z = concat(u, x)          (inputs first, solver_model.py `get`)
  bounds: lower/upper over z (solver_model.py lower_bound/upper_bound)
  discretization: explicit RK4 with `num_steps` sub-steps over dt
  (acados ERK, sim_method_num_stages=4, num_steps=3 —
   generate_acados_solver.py:151-153)
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from mpc_planner_tpu.utils.math import atan2
import numpy as np


def rk4_step(f, x, u, dt: float, num_steps: int = 3):
    """Explicit RK4 over `dt` split into `num_steps` sub-intervals."""
    h = dt / num_steps
    for _ in range(num_steps):
        k1 = f(x, u)
        k2 = f(x + 0.5 * h * k1, u)
        k3 = f(x + 0.5 * h * k2, u)
        k4 = f(x + h * k3, u)
        x = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
    return x


class DynamicsModel:
    """Base dynamics model (ref solver_model.py:49-167).

    Subclasses define `states`, `inputs`, bounds, and `continuous_model`.
    Optionally `discrete_update(z, x_next, p, ocp)` post-processes
    integrated states (used by curvature-aware models for the spline
    state, ref solver_model.py:242-271).
    """

    states: Sequence[str] = ()
    inputs: Sequence[str] = ()
    lower_bound: Sequence[float] = ()
    upper_bound: Sequence[float] = ()
    nx_integrate: Optional[int] = None  # integrate only the first n states
    width: float = 0.65  # collision width [m], used by contouring constraints

    @property
    def nu(self) -> int:
        return len(self.inputs)

    @property
    def nx(self) -> int:
        return len(self.states)

    @property
    def nvar(self) -> int:
        return self.nu + self.nx

    # -- name addressing (ref solver_model.py get/save_map) -------------
    def index(self, name: str) -> int:
        """Index of a state or input within z = (u, x)."""
        if name in self.inputs:
            return list(self.inputs).index(name)
        if name in self.states:
            return self.nu + list(self.states).index(name)
        raise KeyError(f"'{name}' is neither a state nor an input of {type(self).__name__}")

    def state_index(self, name: str) -> int:
        return list(self.states).index(name)

    def get(self, z, name: str):
        return z[..., self.index(name)]

    def get_bounds(self, name: str) -> Tuple[float, float, float]:
        i = self.index(name)
        return (
            self.lower_bound[i],
            self.upper_bound[i],
            self.upper_bound[i] - self.lower_bound[i],
        )

    def save_map(self) -> dict:
        """model_map.yaml contract (ref solver_model.py:118-128)."""
        out = {}
        for idx, s in enumerate(self.states):
            out[s] = ["x", idx + self.nu, self.lower_bound[self.nu + idx], self.upper_bound[self.nu + idx]]
        for idx, u in enumerate(self.inputs):
            out[u] = ["u", idx, self.lower_bound[idx], self.upper_bound[idx]]
        return out

    # -- dynamics --------------------------------------------------------
    def continuous_model(self, x, u):
        raise NotImplementedError

    def discrete_dynamics(self, z, p, dt: float, num_steps: int = 3, ocp=None):
        """x_{k+1} = F(z_k). `p`/`ocp` feed parameter-dependent discrete
        updates (curvature-aware spline state)."""
        u = z[..., : self.nu]
        x = z[..., self.nu :]
        n_int = self.nx if self.nx_integrate is None else self.nx_integrate

        def f_int(x_int, u_):
            dx = self.continuous_model_integrated(x, x_int, u_)
            return dx

        x_int = rk4_step(f_int, x[..., :n_int], u, dt, num_steps)
        return self.discrete_update(z, x_int, p, ocp)

    def continuous_model_integrated(self, x_full, x_int, u):
        """Continuous model evaluated for the integrated sub-state. Default:
        all states integrated."""
        return jnp.asarray(self.continuous_model(x_int, u))

    def discrete_update(self, z, x_int, p, ocp):
        """Append/post-process non-integrated states (default: identity)."""
        return x_int

    # xinit indices within z (ref solver_model.py get_xinit; the slack
    # variant excludes the slack state from initialization)
    def xinit_indices(self) -> Sequence[int]:
        return list(range(self.nu, self.nvar))

    def __hash__(self):
        return hash((type(self).__name__, tuple(self.states), tuple(self.inputs)))

    def __eq__(self, other):
        return type(self) is type(other)


class SecondOrderUnicycleModel(DynamicsModel):
    """Ref solver_model.py:170-190."""

    states = ("x", "y", "psi", "v")
    inputs = ("a", "w")
    lower_bound = (-2.0, -2.0, -200.0, -200.0, -math.pi * 4, -2.0)
    upper_bound = (2.0, 2.0, 200.0, 200.0, math.pi * 4, 3.0)

    def continuous_model(self, x, u):
        a, w = u[..., 0], u[..., 1]
        psi, v = x[..., 2], x[..., 3]
        return jnp.stack([v * jnp.cos(psi), v * jnp.sin(psi), w, a], axis=-1)

    def continuous_model_integrated(self, x_full, x_int, u):
        return self.continuous_model(x_int, u)


class PointMassModel(DynamicsModel):
    """Holonomic double-integrator (omnidirectional base, e.g. Dingo).

    Ref mpc_planner_dingo/scripts/generate_dingo_solver.py:31-45
    (ContouringPointMassModel): states (x, y, vx, vy), inputs (ax, ay).
    """

    states = ("x", "y", "vx", "vy")
    inputs = ("ax", "ay")
    lower_bound = (-1.0, -1.0, -200.0, -200.0, -1.0, -1.0)
    upper_bound = (1.0, 1.0, 200.0, 200.0, 1.0, 1.0)

    def continuous_model(self, x, u):
        return jnp.stack([x[..., 2], x[..., 3], u[..., 0], u[..., 1]], axis=-1)

    def continuous_model_integrated(self, x_full, x_int, u):
        return self.continuous_model(x_int, u)


class ContouringSecondOrderUnicycleModel(DynamicsModel):
    """Unicycle + spline-progress state (ref solver_model.py:193-214)."""

    states = ("x", "y", "psi", "v", "spline")
    inputs = ("a", "w")
    lower_bound = (-2.0, -0.8, -2000.0, -2000.0, -math.pi * 4, -0.01, -1.0)
    upper_bound = (2.0, 0.8, 2000.0, 2000.0, math.pi * 4, 3.0, 10000.0)

    def continuous_model(self, x, u):
        a, w = u[..., 0], u[..., 1]
        psi, v = x[..., 2], x[..., 3]
        return jnp.stack([v * jnp.cos(psi), v * jnp.sin(psi), w, a, v], axis=-1)

    def continuous_model_integrated(self, x_full, x_int, u):
        return self.continuous_model(x_int, u)


class ContouringSecondOrderUnicycleModelWithSlack(ContouringSecondOrderUnicycleModel):
    """Adds a slack variable used by scenario constraints.

    The reference's unicycle scenario model carries slack as a STATE
    with zero dynamics and no stage-0 initialization
    (solver_model.py:274-299) — acados leaves non-initialized stage-0
    states free via lbx0/ubx0 index sets. This solver pins the whole
    stage-0 state by construction (the Riccati forward rollout starts
    at dx0 = 0), which would freeze a slack STATE at its initial value
    for the entire horizon and silently disable the relaxation (found
    r5: dense 12-ped scenes jammed the IP on genuinely infeasible hard
    programs, mu stuck at mu0 even in f64). Slack is therefore an
    INPUT here — per-stage slack freedom, the exact form the
    reference's OTHER slack models already use
    (solver_model.py:310 BicycleModel2ndOrder, :363 CA bicycle, and
    the rosnavigation T-MPC slack configuration)."""

    states = ("x", "y", "psi", "v", "spline")
    inputs = ("a", "w", "slack")
    lower_bound = (-2.0, -0.8, 0.0, -2000.0, -2000.0, -math.pi * 4, -0.01, -1.0)
    upper_bound = (2.0, 0.8, 5000.0, 2000.0, 2000.0, math.pi * 4, 3.0, 10000.0)

    def continuous_model(self, x, u):
        a, w = u[..., 0], u[..., 1]
        psi, v = x[..., 2], x[..., 3]
        return jnp.stack([v * jnp.cos(psi), v * jnp.sin(psi), w, a, v], axis=-1)


def _curvature_aware_spline_update(model, z, x_int, p, ocp):
    """Discrete spline-progress update for CA-MPC models
    (ref solver_model.py:242-271 / :398-437).

    Projects the integrated position advance onto the path to obtain the
    exact progress increment s+ = s + R * atan2(v_t, R - e_c - v_n).

    Outside an OCP context (ocp=None — e.g. the closed-loop simulator
    integrating the true robot state, which has no spline parameters)
    the projection is unavailable; advance progress by the traveled
    distance instead (the solver re-projects `spline` from the real
    path every cycle via the contouring module's closest-point search,
    so the simulator-side value is only a warm hint).
    """
    from mpc_planner_tpu.splines import Spline2D

    x = z[..., model.nu :]
    pos_x, pos_y, s = x[..., 0], x[..., 1], x[..., -1]

    if ocp is None:
        ds = jnp.hypot(x_int[..., 0] - pos_x, x_int[..., 1] - pos_y)
        return jnp.concatenate([x_int, (s + ds)[..., None]], axis=-1)

    path = Spline2D(ocp.params.bind(p), ocp.num_segments, s)
    path_x, path_y = path.at(s)
    dxn, dyn = path.deriv_normalized(s)

    contour_error = dyn * (pos_x - path_x) - dxn * (pos_y - path_y)

    dpx = x_int[..., 0] - pos_x
    dpy = x_int[..., 1] - pos_y
    vt = dpx * dxn + dpy * dyn
    vn = dpx * dyn - dpy * dxn

    R = 1.0 / jnp.maximum(path.get_curvature(s), 1e-10)
    R = jnp.maximum(R, 1e5)  # ref solver_model.py:266 (cd.fmax(R, 1e5))

    theta = atan2(vt, R - contour_error - vn)
    s_next = s + R * theta
    return jnp.concatenate([x_int, s_next[..., None]], axis=-1)


class ContouringSecondOrderUnicycleModelCurvatureAware(DynamicsModel):
    """CA-MPC unicycle: spline state via discrete projection update
    (ref solver_model.py:217-271)."""

    states = ("x", "y", "psi", "v", "spline")
    inputs = ("a", "w")
    lower_bound = (-4.0, -0.8, -2000.0, -2000.0, -math.pi * 4, -0.01, -1.0)
    upper_bound = (4.0, 0.8, 2000.0, 2000.0, math.pi * 4, 3.0, 10000.0)
    nx_integrate = 4

    def continuous_model(self, x, u):
        a, w = u[..., 0], u[..., 1]
        psi, v = x[..., 2], x[..., 3]
        return jnp.stack([v * jnp.cos(psi), v * jnp.sin(psi), w, a], axis=-1)

    def continuous_model_integrated(self, x_full, x_int, u):
        return self.continuous_model(x_int, u)

    def discrete_update(self, z, x_int, p, ocp):
        return _curvature_aware_spline_update(self, z, x_int, p, ocp)


class BicycleModel2ndOrder(DynamicsModel):
    """Bicycle with dynamic steering + slack input (ref solver_model.py:302-352)."""

    states = ("x", "y", "psi", "v", "delta", "spline")
    inputs = ("a", "w", "slack")
    lower_bound = (-3.0, -1.5, 0.0, -1.0e6, -1.0e6, -math.pi * 4, -0.01, -0.55, -1.0)
    upper_bound = (3.0, 1.5, 1.0e2, 1.0e6, 1.0e6, math.pi * 4, 5.0, 0.55, 5000.0)

    wheel_base = 2.79
    width = 2.25

    def continuous_model(self, x, u):
        a, w = u[..., 0], u[..., 1]
        psi, v, delta = x[..., 2], x[..., 3], x[..., 4]
        lr = self.wheel_base / 2.0
        lf = self.wheel_base / 2.0
        ratio = lr / (lr + lf)
        beta = jnp.arctan(ratio * jnp.tan(delta))
        return jnp.stack(
            [
                v * jnp.cos(psi + beta),
                v * jnp.sin(psi + beta),
                (v / lr) * jnp.sin(beta),
                a,
                w,
                v,
            ],
            axis=-1,
        )

    def continuous_model_integrated(self, x_full, x_int, u):
        return self.continuous_model(x_int, u)


class BicycleModel2ndOrderCurvatureAware(DynamicsModel):
    """CA bicycle (ref solver_model.py:355-437)."""

    states = ("x", "y", "psi", "v", "delta", "spline")
    inputs = ("a", "w", "slack")
    lower_bound = (-3.0, -1.5, 0.0, -1.0e6, -1.0e6, -math.pi * 4, -0.01, -0.55, -1.0)
    upper_bound = (3.0, 1.5, 1.0e2, 1.0e6, 1.0e6, math.pi * 4, 8.0, 0.55, 5000.0)
    nx_integrate = 5

    wheel_base = 2.79
    width = 2.25
    lr = 2.79 / 2.0
    lf = 2.79 / 2.0

    def continuous_model(self, x, u):
        a, w = u[..., 0], u[..., 1]
        psi, v, delta = x[..., 2], x[..., 3], x[..., 4]
        ratio = self.lr / (self.lr + self.lf)
        beta = jnp.arctan(ratio * jnp.tan(delta))
        return jnp.stack(
            [
                v * jnp.cos(psi + beta),
                v * jnp.sin(psi + beta),
                (v / self.lr) * jnp.sin(beta),
                a,
                w,
            ],
            axis=-1,
        )

    def continuous_model_integrated(self, x_full, x_int, u):
        return self.continuous_model(x_int, u)

    def discrete_update(self, z, x_int, p, ocp):
        return _curvature_aware_spline_update(self, z, x_int, p, ocp)
