"""Device-side sampled guidance: homotopy-class search at TPU scale.

Scale-out backend for the guidance layer (SURVEY.md §2.4 guidance_planner;
STATUS "batched device-side PRM" queue item). The host backends search a
~30-node PRM graph sequentially (guidance/prm.py, ~2 ms/cycle); this one
reformulates the search the TPU way: instead of growing a graph, it
evaluates THOUSANDS of candidate space-time paths in parallel in one jit
— sampling, collision checking against the moving obstacle predictions,
passing-side (homotopy) signatures, and costs are all fixed-shape batched
array ops. The host then just takes the cheapest feasible candidate per
distinct signature.

Why this is the right TPU design rather than porting the DP: the PRM's
label-correcting DP is a sequential sparse-graph algorithm with dynamic
label sets — the worst possible shape for XLA. What T-MPC actually
consumes is (a) distinct passing-side combinations and (b) one plausible
warmstart per class; a wide enough sampled sweep finds every reachable
class of the ~2^m combinatorial space directly, with cost O(S·M·N) of
pure vectorized work instead of a serial graph search, and its candidate
count scales with chip width, not host time.

Candidates are piecewise-linear space-time paths start → via₁ → via₂ →
goal (vias sampled in the corridor ROI, goals from the same lateral fan
the PRM uses), smoothed by a fixed endpoint-pinned kernel — the whole
pipeline from via-points to positions is one precomputed [N+1, 4] basis
matrix.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from mpc_planner_tpu.guidance.homotopy import GuidanceTrajectory, _speed
from mpc_planner_tpu.guidance.prm import VisibilityPRMPlanner


@functools.partial(jax.jit, static_argnames=("n_samples", "n_goals"))
def _sample_and_score(key, basis, start, goals, pred, clear, w_lat,
                      track_thresh, s_prof, goal_weight,
                      *, n_samples: int, n_goals: int):
    """One batched guidance sweep.

    basis [N+1, 4]: smoothing @ piecewise-linear interpolation weights for
    node sequence (start, via1, via2, goal).
    pred [M, N+1, 2] obstacle tracks, clear [M] required clearance.
    s_prof [N+1]: acceleration-limited cumulative arc-length budget —
    candidates are RETIMED so that at step k they have traveled at most
    s_prof[k] along their own geometry (a robot at v0~0 cannot be at
    cruise speed in step 1; uniform-timed candidates produced
    dynamically unreachable warmstarts, measured as the r3 closed-loop
    infeasibility spikes of this backend).
    Returns positions [S, N+1, 2], side [S, M] (+1 left/-1 right/0 not
    tracked), cost [S], feasible [S].
    """
    S = n_samples
    ku, kl, kg = jax.random.split(key, 3)
    gidx = jax.random.randint(kg, (S,), 0, n_goals)
    goal = goals[gidx]  # [S, 2]

    # Vias stratified along the start->goal chord with lateral offsets:
    # candidates progress forward by construction (a PRM edge is
    # time-monotone for the same reason), and the sample budget is spent
    # on useful paths instead of doubling-back ones.
    g = goal - start[None, :]
    g_unit = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    n_unit = jnp.stack([-g_unit[:, 1], g_unit[:, 0]], axis=-1)
    u = jax.random.uniform(ku, (S, 2))
    u1 = 0.15 + 0.30 * u[:, 0]
    u2 = 0.55 + 0.30 * u[:, 1]
    lat = jax.random.uniform(kl, (S, 2), minval=-w_lat, maxval=w_lat)
    v1 = start[None, :] + u1[:, None] * g + lat[:, :1] * n_unit
    v2 = start[None, :] + u2[:, None] * g + lat[:, 1:] * n_unit

    nodes = jnp.stack(
        [jnp.broadcast_to(start, (S, 2)), v1, v2, goal], axis=1
    )  # [S, 4, 2]
    geom = jnp.einsum("kn,snd->skd", basis, nodes)  # [S, N+1, 2]

    # Acceleration-limited retiming along each candidate's own arc length
    seg0 = jnp.linalg.norm(geom[:, 1:] - geom[:, :-1], axis=-1)  # [S, N]
    cum = jnp.concatenate(
        [jnp.zeros((S, 1)), jnp.cumsum(seg0, axis=1)], axis=1
    )  # [S, N+1]
    target = jnp.minimum(s_prof[None, :], cum[:, -1:])  # [S, N+1]

    def _retime(pos, c, t):
        return jnp.stack(
            [jnp.interp(t, c, pos[:, 0]), jnp.interp(t, c, pos[:, 1])],
            axis=-1,
        )

    positions = jax.vmap(_retime)(geom, cum, target)

    rel = positions[:, None, :, :] - pred[None, :, :, :]  # [S, M, N+1, 2]
    dist = jnp.linalg.norm(rel, axis=-1)  # [S, M, N+1]
    dmin = jnp.min(dist, axis=-1)  # [S, M]
    feasible = jnp.all(dmin > clear[None, :], axis=-1)  # [S]

    # Passing side at closest approach (same convention as the host
    # backends: obstacle on the robot's right => robot passes left => +1).
    d = positions[:, 1:] - positions[:, :-1]
    heading = jnp.concatenate([d, d[:, -1:]], axis=1)  # [S, N+1, 2]
    heading = heading / jnp.maximum(
        jnp.linalg.norm(heading, axis=-1, keepdims=True), 1e-9
    )
    kmin = jnp.argmin(dist, axis=-1)  # [S, M]
    h = jnp.take_along_axis(
        heading[:, None, :, :], kmin[..., None, None], axis=2
    )[:, :, 0, :]  # [S, M, 2]
    r = jnp.take_along_axis(rel, kmin[..., None, None], axis=2)[:, :, 0, :]
    cross = h[..., 0] * r[..., 1] - h[..., 1] * r[..., 0]
    tracked = dmin < clear + track_thresh
    side = jnp.where(tracked, jnp.where(cross < 0, 1, -1), 0).astype(jnp.int8)

    seglen = jnp.linalg.norm(d, axis=-1)  # [S, N]
    # Length + goal shortfall (retimed candidates may not reach their
    # goal within the horizon; the PRM's selection_weights length term)
    shortfall = jnp.linalg.norm(positions[:, -1] - goal, axis=-1)
    cost = jnp.sum(seglen, axis=-1) + goal_weight * shortfall
    return positions, side, cost, feasible


class DeviceSampledPlanner(VisibilityPRMPlanner):
    """Batched device-side guidance backend (`guidance_backend="sampled"`).

    Inherits the PRM backend's goal-fan construction, progress projection,
    class scale-out, and selection bookkeeping; replaces the sequential
    graph search with the jitted sampled sweep above.
    """

    def __init__(self, cfg):
        super().__init__(cfg)
        t = cfg.t_mpc
        self.n_samples = int(getattr(t, "sampled_n_samples", 512))
        self._basis_cache = {}

    def _basis(self, N: int) -> np.ndarray:
        """[N+1, 4] = smoothing @ piecewise-linear node interpolation."""
        b = self._basis_cache.get(N)
        if b is not None:
            return b
        ts = np.array([0.0, N / 3.0, 2.0 * N / 3.0, float(N)])
        ks = np.arange(N + 1, dtype=float)
        W = np.zeros((N + 1, 4))
        for j in range(3):
            inseg = (ks >= ts[j]) & (ks <= ts[j + 1])
            frac = (ks - ts[j]) / (ts[j + 1] - ts[j])
            W[inseg, j] = 1.0 - frac[inseg]
            W[inseg, j + 1] = frac[inseg]
        # Endpoint-pinned 121 smoothing, applied twice (same kernel the
        # host backends use on their resampled node chains).
        A = np.zeros((N + 1, N + 1))
        for k in range(N + 1):
            if k in (0, N):
                A[k, k] = 1.0
            else:
                A[k, k - 1 : k + 2] = (0.25, 0.5, 0.25)
        b = A @ A @ W
        self._basis_cache[N] = b
        return b

    def update(self, state, path, obstacle_block, s0: float, v_ref: float
               ) -> List[GuidanceTrajectory]:
        cfg = self.cfg
        N, dt = cfg.N, cfg.dt
        M = obstacle_block.position.shape[0]
        if M == 0:
            return super().update(state, path, obstacle_block, s0, v_ref)

        start = np.array([state.get("x"), state.get("y")], dtype=float)
        pred = np.concatenate(
            [obstacle_block.position[:, None, :], obstacle_block.pred_position],
            axis=1,
        )[:, : N + 1]
        radius = np.asarray(obstacle_block.radius, dtype=float)
        clear = radius + cfg.robot_radius + self.margin

        # Goal fan + ROI identical to the PRM backend.
        v0 = _speed(state)
        v_prof = np.minimum(v_ref, v0 + 1.5 * dt * np.arange(N + 1))
        s_goal = float(np.clip(
            s0 + np.sum(v_prof[:-1] * dt), 0.0, path.length))
        g_center = path.at(np.array([s_goal]))[0]
        tangent = path.deriv(np.array([s_goal]))[0]
        tangent = tangent / (np.linalg.norm(tangent) + 1e-12)
        normal = np.array([-tangent[1], tangent[0]])
        half_width = max(cfg.road.width / 2.0 - cfg.robot_radius, 0.5)
        # Same end-of-path lateral-fan taper as the PRM backend (edge
        # goal stations near the end leave the robot parked outside the
        # completion ball).
        lat_scale = float(np.clip((path.length - s0) / 8.0, 0.1, 1.0))
        lat_offsets = (
            lat_scale * np.linspace(-half_width, half_width, self.n_goals)
            if self.n_goals > 1 else np.zeros(1)
        )
        goals = g_center[None, :] + lat_offsets[:, None] * normal[None, :]

        s_prof = np.concatenate([[0.0], np.cumsum(v_prof[:-1] * dt)])
        positions_d, side_d, cost_d, feas_d = _sample_and_score(
            jax.random.PRNGKey(self.seed),
            jnp.asarray(self._basis(N), jnp.float32),
            jnp.asarray(start, jnp.float32),
            jnp.asarray(goals, jnp.float32),
            jnp.asarray(pred, jnp.float32),
            jnp.asarray(clear, jnp.float32),
            jnp.float32(half_width + 1.0),
            jnp.float32(self.clearance + 1.5),
            jnp.asarray(s_prof, jnp.float32),
            jnp.float32(getattr(cfg.t_mpc, "prm_goal_length_weight", 2.0)),
            n_samples=self.n_samples,
            n_goals=len(goals),
        )
        # One bundled device->host transfer: through a remote-device tunnel
        # each separate pull pays full round-trip latency.
        side, cost, feas = jax.device_get((side_d, cost_d, feas_d))

        spc = max(1, int(getattr(cfg.t_mpc, "samples_per_class", 1)))
        order = np.argsort(cost, kind="stable")
        per_class: dict = {}
        chosen: List[int] = []
        for i in order:
            if not feas[i]:
                continue
            key = tuple(int(x) for x in side[i])
            n_in_class = per_class.get(key, 0)
            if n_in_class >= spc:
                continue
            if n_in_class == 0 and len(per_class) >= self.n_paths:
                continue
            per_class[key] = n_in_class + 1
            chosen.append(int(i))
            if len(chosen) >= self.n_paths * spc:
                break

        if not chosen:
            # Fully blocked sweep: the PRM/lateral fallbacks still produce
            # in-lane and braking classes.
            return super().update(state, path, obstacle_block, s0, v_ref)

        trajectories: List[GuidanceTrajectory] = []
        pos_np = np.asarray(positions_d[np.array(chosen)])
        for row, i in enumerate(chosen):
            tracked = tuple(int(m) for m in np.nonzero(side[i])[0])
            # Monotonize progress: lateral swerves can project to briefly
            # decreasing s; the spline state must not run backwards.
            traj = GuidanceTrajectory(
                positions=pos_np[row],
                s=np.maximum.accumulate(self._project(path, pos_np[row], s0)),
                signature=tuple(int(side[i][m]) for m in tracked),
                obstacle_ids=tuple(
                    int(obstacle_block.index[m]) for m in tracked),
            )
            traj.previously_selected = self._matches_selected(traj)
            trajectories.append(traj)

        if getattr(cfg.t_mpc, "braking_class", False):
            trajectories.append(self._braking_trajectory(state, path, s0))
        return trajectories
