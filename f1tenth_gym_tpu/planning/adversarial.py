"""Adversarial planners for integrator / dynamics stress testing.

The reference ships ``FlippyPlanner`` ("a planner that minimizes the car's
steering effort... designed to exploit integration methods",
examples/waypoint_follow.py:220-238): a probe that commands extreme,
rapidly-flipping steering to expose integrator instability (Euler blows up
where RK4 stays bounded). This module provides the same capability as a
pure function usable inside jitted rollouts and as a stateful wrapper.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def flippy_action(step_idx, speed: float = 0.2, flip_every: int = 2,
                  steer_mag: float = 0.4189):
    """Action for a step counter: steering flips sign every ``flip_every``
    steps at magnitude ``steer_mag`` (default = the vehicle's s_max).

    Pure function of the step index: usable under jit/vmap/lax.scan.
    """
    phase = (step_idx // flip_every) % 2
    steer = jnp.where(phase == 0, steer_mag, -steer_mag)
    return jnp.stack([steer, jnp.full_like(steer, speed)], axis=-1)


class FlippyPlanner:
    """Stateful adversarial planner with the reference's plan() surface.

    Commands maximal alternating steering to stress the integrator; with
    Euler at large dt the single-track model's slip/yaw-rate states diverge,
    with RK4 they stay bounded — use it to validate integrator choices
    (reference examples/waypoint_follow.py:220-238).
    """

    def __init__(self, speed: float = 0.2, flip_every: int = 2,
                 steer_mag: float = 0.4189):
        self.speed = float(speed)
        self.flip_every = int(flip_every)
        self.steer_mag = float(steer_mag)
        self._count = 0

    def reset(self):
        self._count = 0

    def plan(self, *args, **kwargs):
        a = flippy_action(self._count, self.speed, self.flip_every,
                          self.steer_mag)
        self._count += 1
        arr = np.asarray(a, dtype=np.float64)
        return float(arr[1]), float(arr[0])  # (speed, steer) like reference
