"""Pure-pursuit waypoint follower, vmappable over thousands of cars.

Behavioral parity targets (reference examples/waypoint_follow.py):
  * ``nearest_point_on_trajectory``                         — :15-47
  * ``first_point_on_trajectory_intersecting_circle``       — :49-131
  * ``get_actuation``                                       — :133-144
  * ``PurePursuitPlanner._get_current_waypoint`` / ``plan`` — :183-217

The reference scans trajectory segments sequentially and breaks at the first
circle intersection; here every segment is tested at once and "first" is the
argmin of the cyclic segment order starting at the nearest segment — same
result, no data-dependent loop, so the whole planner vmaps over an env batch
and fuses into the rollout program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def nearest_point_on_trajectory(point, trajectory):
    """Nearest point on a piecewise-linear trajectory.

    point: (2,); trajectory: (N, 2) -> (projection (2,), dist, t, seg_idx).
    """
    diffs = trajectory[1:] - trajectory[:-1]  # (N-1, 2)
    l2s = diffs[:, 0] ** 2 + diffs[:, 1] ** 2
    dots = jnp.sum((point[None, :] - trajectory[:-1]) * diffs, axis=1)
    t = jnp.clip(dots / l2s, 0.0, 1.0)
    projections = trajectory[:-1] + t[:, None] * diffs
    dists = jnp.linalg.norm(point[None, :] - projections, axis=1)
    i = jnp.argmin(dists)
    return projections[i], dists[i], t[i], i


def first_point_on_trajectory_intersecting_circle(
    point, radius, trajectory, t0
):
    """First circle/trajectory intersection in cyclic segment order.

    Replicates the reference's sequential scan (waypoint_follow.py:49-131)
    with wrap=True: segments are visited start_i, start_i+1, ..., N-1 (the
    closing segment N-1 -> 0), 0, ..., start_i-1; within a segment t1 is
    preferred over t2; on the first segment the intersection parameter must
    be >= frac(t0).

    Returns (point (2,), seg_idx, t, found).
    """
    N = trajectory.shape[0]
    start_i = jnp.asarray(t0, dtype=jnp.int32)
    start_t = jnp.asarray(t0) % 1.0

    starts = trajectory  # segment i: trajectory[i] -> trajectory[(i+1) % N]
    ends = jnp.roll(trajectory, -1, axis=0) + 1e-6
    V = ends - starts

    a = jnp.sum(V * V, axis=1)
    b = 2.0 * jnp.sum(V * (starts - point[None, :]), axis=1)
    c = (
        jnp.sum(starts * starts, axis=1)
        + jnp.sum(point * point)
        - 2.0 * jnp.sum(starts * point[None, :], axis=1)
        - radius * radius
    )
    disc = b * b - 4 * a * c
    has_root = disc >= 0.0
    sq = jnp.sqrt(jnp.where(has_root, disc, 0.0))
    t1 = (-b - sq) / (2.0 * a)
    t2 = (-b + sq) / (2.0 * a)

    seg_ids = jnp.arange(N)
    is_first = seg_ids == start_i
    t1_ok = has_root & (t1 >= 0.0) & (t1 <= 1.0) & (~is_first | (t1 >= start_t))
    t2_ok = has_root & (t2 >= 0.0) & (t2 <= 1.0) & (~is_first | (t2 >= start_t))
    t_sel = jnp.where(t1_ok, t1, t2)
    valid = t1_ok | t2_ok

    order = jnp.mod(seg_ids - start_i, N)
    score = jnp.where(valid, order, N + 1)
    j = jnp.argmin(score)
    found = valid[j]
    p = starts[j] + t_sel[j] * V[j]
    return p, j, t_sel[j], found


def get_actuation(pose_theta, lookahead_point, position, lookahead_distance,
                  wheelbase):
    """Curvature actuation (waypoint_follow.py:133-144).

    lookahead_point: (3,) [x, y, speed]. Returns (speed, steering_angle).
    """
    waypoint_y = jnp.dot(
        jnp.array([jnp.sin(-pose_theta), jnp.cos(-pose_theta)]),
        lookahead_point[0:2] - position,
    )
    speed = lookahead_point[2]
    radius = 1.0 / (2.0 * waypoint_y / lookahead_distance ** 2)
    steering_angle = jnp.arctan(wheelbase / radius)
    small = jnp.abs(waypoint_y) < 1e-6
    return speed, jnp.where(small, 0.0, steering_angle)


def pure_pursuit_plan(
    pose_x,
    pose_y,
    pose_theta,
    waypoints_xyv,       # (N, 3): x, y, target speed
    lookahead_distance,
    vgain,
    wheelbase,
    max_reacquire: float = 20.0,
):
    """Full planner step (waypoint_follow.py:183-217). Pure; vmap over cars.

    Returns (speed, steer). Off-trajectory fallback returns (4.0 * vgain? no —
    the reference returns speed=4.0 un-gained, steer=0; replicated).
    """
    position = jnp.stack([pose_x, pose_y])
    wpts = waypoints_xyv[:, 0:2]

    _, nearest_dist, t, i = nearest_point_on_trajectory(position, wpts)

    p, i2, t2, found = first_point_on_trajectory_intersecting_circle(
        position, lookahead_distance, wpts, i.astype(jnp.float64 if
            position.dtype == jnp.float64 else jnp.float32) + t
    )
    # reference takes the lookahead position from the *segment start* wpts[i2]
    # (waypoint_follow.py:195-196), not the intersection point itself
    current_wp_near = jnp.concatenate([wpts[i2], waypoints_xyv[i, 2:3]])
    current_wp_far = jnp.concatenate([wpts[i], waypoints_xyv[i, 2:3]])

    within = nearest_dist < lookahead_distance
    reacquire = nearest_dist < max_reacquire

    lookahead_point = jnp.where(within, current_wp_near, current_wp_far)
    have_point = jnp.where(within, found, reacquire)

    speed, steer = get_actuation(
        pose_theta, lookahead_point, position, lookahead_distance, wheelbase
    )
    speed = vgain * speed
    speed = jnp.where(have_point, speed, 4.0)
    steer = jnp.where(have_point, steer, 0.0)
    return speed, steer


class PurePursuitPlanner:
    """Stateful convenience wrapper mirroring the reference class
    (waypoint_follow.py:146-217), plus a batched policy factory."""

    def __init__(self, waypoints_xyv: np.ndarray, wheelbase: float = 0.33020,
                 max_reacquire: float = 20.0):
        self.waypoints = jnp.asarray(waypoints_xyv)
        self.wheelbase = wheelbase
        self.max_reacquire = max_reacquire
        self._plan = jax.jit(
            lambda x, y, th, lad, vg: pure_pursuit_plan(
                x, y, th, self.waypoints, lad, vg, self.wheelbase,
                self.max_reacquire,
            )
        )

    def plan(self, pose_x, pose_y, pose_theta, lookahead_distance, vgain):
        speed, steer = self._plan(pose_x, pose_y, pose_theta,
                                  lookahead_distance, vgain)
        return float(speed), float(steer)

    def fused_plan_step(self, step_fn, lookahead_distance: float,
                        vgain: float):
        """Fuse planning INTO the env step: one jitted device call per
        frame for interactive use.

        The two-call loop (``plan`` -> host floats -> ``step``) pays two
        host<->device round trips per frame — painful on a remote/tunneled
        TPU. The returned ``plan_step(state) -> (state, obs, reward, done,
        info)`` plans every agent's pure-pursuit action from the CURRENT
        device-resident state pose and steps, so the host only dispatches
        one call (and only reads obs back when it actually renders).
        step_fn is the jitted functional step from ``make_env_fns``.
        """
        from f1tenth_gym_tpu.state import IX_X, IX_Y, IX_YAW

        wpts = self.waypoints
        wb = self.wheelbase
        mr = self.max_reacquire

        @jax.jit
        def plan_step(state):
            f = lambda x, y, t: pure_pursuit_plan(  # noqa: E731
                x, y, t, wpts, lookahead_distance, vgain, wb, mr)
            for _ in range(state.x.ndim - 1):
                f = jax.vmap(f)
            speed, steer = f(state.x[..., IX_X], state.x[..., IX_Y],
                             state.x[..., IX_YAW])
            return step_fn(state, jnp.stack([steer, speed], axis=-1))

        return plan_step

    def batched_policy(self, lookahead_distance: float, vgain: float):
        """(key, obs) -> (E, A, 2) actions policy for the vector env."""
        wpts = self.waypoints
        wb = self.wheelbase
        mr = self.max_reacquire

        def one(px, py, pth):
            speed, steer = pure_pursuit_plan(
                px, py, pth, wpts, lookahead_distance, vgain, wb, mr
            )
            return jnp.stack([steer, speed])

        def policy(key, obs):
            f = one
            for _ in range(obs["poses_x"].ndim):
                f = jax.vmap(f)
            return f(obs["poses_x"], obs["poses_y"], obs["poses_theta"])

        return policy
