"""Batched vehicle dynamics: CommonRoad single-track + kinematic bicycle.

Behavioral parity targets (reference, all Numba scalar kernels):
  * ``accl_constraints``      — dynamic_models.py:29-60
  * ``steering_constraint``   — dynamic_models.py:62-87
  * ``vehicle_dynamics_ks``   — dynamic_models.py:90-121 (5-state)
  * ``vehicle_dynamics_st``   — dynamic_models.py:123-176 (7-state, with the
    |v| < 0.5 kinematic fallback at :152-160)
  * ``pid``                   — dynamic_models.py:178-221

TPU-first design notes:
  * every function is shape-polymorphic over arbitrary leading batch axes
    (agents, envs) — pure VPU elementwise work, no MXU needed;
  * Python ``if`` chains become nested ``jnp.where`` with the *same*
    precedence order as the reference so outputs match bit-for-branch;
  * divisions that the reference guards by control flow (``1/v``, ``1/v²``)
    use safe denominators so the untaken branch never produces NaN/Inf —
    this keeps the whole simulator differentiable (``jax.grad`` through a
    rollout works, something the reference cannot do at all).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from f1tenth_gym_tpu.state import (
    IX_SLIP,
    IX_STEER,
    IX_VEL,
    IX_X,
    IX_Y,
    IX_YAW,
    IX_YAW_RATE,
    VehicleParams,
)

G = 9.81  # gravity, m/s^2 (dynamic_models.py:146)


def accl_constraints(vel, accl, v_switch, a_max, v_min, v_max):
    """Longitudinal acceleration limits (dynamic_models.py:29-60).

    Above the switching velocity the positive limit decays as a_max*v_switch/v
    (traction limited); the limit chain order matches the reference exactly.
    """
    vel_safe = jnp.where(vel > v_switch, vel, jnp.ones_like(vel))
    pos_limit = jnp.where(vel > v_switch, a_max * v_switch / vel_safe, a_max)

    zero_cond = ((vel <= v_min) & (accl <= 0.0)) | ((vel >= v_max) & (accl >= 0.0))
    out = jnp.where(accl >= pos_limit, pos_limit, accl)
    out = jnp.where(accl <= -a_max, -a_max, out)
    out = jnp.where(zero_cond, jnp.zeros_like(out), out)
    return out


def steering_constraint(steering_angle, steering_velocity, s_min, s_max, sv_min, sv_max):
    """Steering velocity limits (dynamic_models.py:62-87)."""
    zero_cond = ((steering_angle <= s_min) & (steering_velocity <= 0.0)) | (
        (steering_angle >= s_max) & (steering_velocity >= 0.0)
    )
    out = jnp.where(steering_velocity >= sv_max, sv_max, steering_velocity)
    out = jnp.where(steering_velocity <= sv_min, sv_min, out)
    out = jnp.where(zero_cond, jnp.zeros_like(out), out)
    return out


def _constrain_inputs(x, u_init, p: VehicleParams):
    """Apply steering + acceleration constraints to raw inputs.

    u layout: u[...,0] = steering velocity, u[...,1] = longitudinal accel
    (dynamic_models.py:113,149).
    """
    sv = steering_constraint(
        x[..., IX_STEER], u_init[..., 0], p.s_min, p.s_max, p.sv_min, p.sv_max
    )
    accl = accl_constraints(
        x[..., IX_VEL], u_init[..., 1], p.v_switch, p.a_max, p.v_min, p.v_max
    )
    return jnp.stack([sv, accl], axis=-1)


def vehicle_dynamics_ks5(x, u_init, p: VehicleParams):
    """Kinematic single-track, native 5-state form (dynamic_models.py:90-121).

    x: (..., 5) = [x, y, steer_angle, vel, yaw]. Returns (..., 5) derivative.
    """
    u = _constrain_inputs(x, u_init, p)
    lwb = p.lf + p.lr
    f = jnp.stack(
        [
            x[..., 3] * jnp.cos(x[..., 4]),
            x[..., 3] * jnp.sin(x[..., 4]),
            u[..., 0],
            u[..., 1],
            x[..., 3] / lwb * jnp.tan(x[..., 2]),
        ],
        axis=-1,
    )
    return f


def _f_ks7(x, u, p: VehicleParams):
    """Kinematic branch embedded in the 7-state layout.

    Matches the ST model's low-speed fallback (dynamic_models.py:152-160):
    first 5 components are the KS derivative, the 6th is the differentiated
    yaw acceleration, the 7th (slip rate) is zero. ``u`` is already
    constrained; the reference constrains again inside vehicle_dynamics_ks,
    which is idempotent for these clamp-style constraints.
    """
    lwb = p.lf + p.lr
    delta = x[..., IX_STEER]
    v = x[..., IX_VEL]
    yaw = x[..., IX_YAW]
    sv = u[..., 0]
    a = u[..., 1]
    cos_d = jnp.cos(delta)
    f = jnp.stack(
        [
            v * jnp.cos(yaw),
            v * jnp.sin(yaw),
            sv,
            a,
            v / lwb * jnp.tan(delta),
            a / lwb * jnp.tan(delta) + v / (lwb * cos_d * cos_d) * sv,
            jnp.zeros_like(v),
        ],
        axis=-1,
    )
    return f


def _f_st7(x, u, p: VehicleParams):
    """Dynamic single-track branch (dynamic_models.py:162-174).

    Uses safe denominators for 1/v and 1/v^2; only selected when |v| >= 0.5
    so the guard never changes the taken branch's value.
    """
    delta = x[..., IX_STEER]
    v = x[..., IX_VEL]
    yaw = x[..., IX_YAW]
    wz = x[..., IX_YAW_RATE]
    beta = x[..., IX_SLIP]
    sv = u[..., 0]
    a = u[..., 1]

    # guard: |v| >= 0.5 in the taken branch, so clamp magnitude below that
    v_safe = jnp.where(jnp.abs(v) < 0.25, jnp.where(v < 0, -0.25, 0.25), v)

    lf, lr, h, m, I, mu, C_Sf, C_Sr = p.lf, p.lr, p.h, p.m, p.I, p.mu, p.C_Sf, p.C_Sr
    lwb = lf + lr

    glr_ah = G * lr - a * h
    glf_ah = G * lf + a * h

    f_wz = (
        -mu * m / (v_safe * I * lwb) * (lf ** 2 * C_Sf * glr_ah + lr ** 2 * C_Sr * glf_ah) * wz
        + mu * m / (I * lwb) * (lr * C_Sr * glf_ah - lf * C_Sf * glr_ah) * beta
        + mu * m / (I * lwb) * lf * C_Sf * glr_ah * delta
    )
    f_beta = (
        (mu / (v_safe ** 2 * lwb) * (C_Sr * glf_ah * lr - C_Sf * glr_ah * lf) - 1.0) * wz
        - mu / (v_safe * lwb) * (C_Sr * glf_ah + C_Sf * glr_ah) * beta
        + mu / (v_safe * lwb) * (C_Sf * glr_ah) * delta
    )

    f = jnp.stack(
        [
            v * jnp.cos(beta + yaw),
            v * jnp.sin(beta + yaw),
            sv,
            a,
            wz,
            f_wz,
            f_beta,
        ],
        axis=-1,
    )
    return f


def vehicle_dynamics_st(x, u_init, p: VehicleParams):
    """Single-track dynamics, 7-state (dynamic_models.py:123-176).

    x: (..., 7) = [x, y, steer, vel, yaw, yaw_rate, slip]. Computes both the
    kinematic (|v| < 0.5) and dynamic branches and selects elementwise — the
    standard XLA-friendly replacement for data-dependent branching.
    """
    u = _constrain_inputs(x, u_init, p)
    f_ks = _f_ks7(x, u, p)
    f_st = _f_st7(x, u, p)
    low_speed = (jnp.abs(x[..., IX_VEL]) < 0.5)[..., None]
    return jnp.where(low_speed, f_ks, f_st)


def vehicle_dynamics_ks7(x, u_init, p: VehicleParams):
    """Pure kinematic model family in the 7-state layout (no speed switch).

    Uses the same embedding as the ST model's low-speed branch for all
    speeds, so env plumbing is model-agnostic.
    """
    u = _constrain_inputs(x, u_init, p)
    return _f_ks7(x, u, p)


def pid(speed, steer, current_speed, current_steer, max_sv, max_a, max_v, min_v):
    """Speed/steer set-points -> (accel, steering velocity) (dynamic_models.py:178-221)."""
    # steering: bang-bang at max_sv with deadband 1e-4
    steer_diff = steer - current_steer
    sv = jnp.where(
        jnp.abs(steer_diff) > 1e-4,
        jnp.sign(steer_diff) * max_sv,
        jnp.zeros_like(steer_diff),
    )

    # acceleration: proportional with direction-dependent gains.
    # Gain factor 10 when currently moving forward, 2 when stopped/reversing;
    # normalizer max_v when the set-point is above current speed, -min_v below.
    vel_diff = speed - current_speed
    kp = jnp.where(current_speed > 0.0, 10.0, 2.0) * max_a / jnp.where(
        vel_diff > 0.0, max_v, -min_v
    )
    accl = kp * vel_diff
    return accl, sv


def euler_step(x, u, p: VehicleParams, dt, dyn_fn=vehicle_dynamics_st):
    """Explicit Euler (base_classes.py:375-395)."""
    return x + dt * dyn_fn(x, u, p)


def rk4_step(x, u, p: VehicleParams, dt, dyn_fn=vehicle_dynamics_st):
    """Classic RK4 with inputs held constant across stages (base_classes.py:284-373)."""
    k1 = dyn_fn(x, u, p)
    k2 = dyn_fn(x + dt * (k1 / 2.0), u, p)
    k3 = dyn_fn(x + dt * (k2 / 2.0), u, p)
    k4 = dyn_fn(x + dt * k3, u, p)
    return x + dt * (1.0 / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
