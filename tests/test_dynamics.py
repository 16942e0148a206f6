"""Dynamics parity vs CommonRoad golden vectors + ODE regression rollouts.

Mirrors the reference's DynamicsTest (dynamic_models.py:231-423): derivative
ground truths, zero-init singularity rollouts, plus batching/vmap checks the
reference cannot express.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f1tenth_gym_tpu.ops import dynamics as dyn
from f1tenth_gym_tpu.state import VehicleParams

G = 9.81


@pytest.fixture(scope="module")
def cr_params():
    # CommonRoad test vehicle (dynamic_models.py:232-253)
    return VehicleParams.create(
        {
            "mu": 1.0489,
            "C_Sf": 21.92 / 1.0489,
            "C_Sr": 21.92 / 1.0489,
            "lf": 0.3048 * 3.793293,
            "lr": 0.3048 * 4.667707,
            "h": 0.3048 * 2.01355,
            "m": 4.4482216152605 / 0.3048 * 74.91452,
            "I": 4.4482216152605 * 0.3048 * 1321.416,
            "s_min": -1.066,
            "s_max": 1.066,
            "sv_min": -0.4,
            "sv_max": 0.4,
            "v_min": -13.6,
            "v_max": 50.8,
            "v_switch": 7.319,
            "a_max": 11.5,
        },
        dtype=jnp.float64,
    )


def test_derivatives_golden(cr_params):
    """Golden derivative vectors (dynamic_models.py:255-279)."""
    f_ks_gt = jnp.array(
        [16.3475935934250209, 0.4819314886013121, 0.1500000000000000,
         5.1464424102339752, 0.2401426578627629]
    )
    f_st_gt = jnp.array(
        [15.7213512030862397, 0.0925527979719355, 0.1500000000000000,
         5.3536773276413925, 0.0529001056654038, 0.6435589397748606,
         0.0313297971641291]
    )
    x_ks = jnp.array(
        [3.9579422297936526, 0.0391650102771405, 0.0378491427211811,
         16.3546957860883566, 0.0294717351052816]
    )
    x_st = jnp.array(
        [2.0233348142065677, 0.0041907137716636, 0.0197545248559617,
         15.7216236334290116, 0.0025857914776859, 0.0529001056654038,
         0.0033012170610298]
    )
    u = jnp.array([0.15, 0.63 * G])

    f_ks = dyn.vehicle_dynamics_ks5(x_ks, u, cr_params)
    f_st = dyn.vehicle_dynamics_st(x_st, u, cr_params)

    np.testing.assert_allclose(np.asarray(f_ks), np.asarray(f_ks_gt), atol=1e-12)
    np.testing.assert_allclose(np.asarray(f_st), np.asarray(f_st_gt), atol=1e-12)


def _rollout_euler(x0, u, p, dyn_fn, t_final=1.0, dt=1e-4):
    """Fixed-step rollout standing in for scipy.odeint in the regressions."""
    n = int(t_final / dt)

    def body(x, _):
        return x + dt * dyn_fn(x, u, p), None

    xf, _ = jax.lax.scan(body, x0, None, length=n)
    return xf


@pytest.mark.parametrize(
    "u,st_gt,ks_gt",
    [
        # rolling: zero input keeps zero state (dynamic_models.py:281-311)
        (np.array([0.0, 0.0]), np.zeros(7), np.zeros(5)),
        # decelerating from rest (dynamic_models.py:313-348)
        (
            np.array([0.0, -0.7 * G]),
            np.array([-3.4335, 0.0, 0.0, -6.867, 0.0, 0.0, 0.0]),
            np.array([-3.4335, 0.0, 0.0, -6.867, 0.0]),
        ),
        # accelerating + left steer (dynamic_models.py:350-386)
        (
            np.array([0.15, 0.63 * G]),
            np.array([3.0731976046859715, 0.2869835398304389, 0.15,
                      6.1802999999999999, 0.1097747074946325,
                      0.3248268063223301, 0.0697547542798040]),
            np.array([3.0845676868494927, 0.1484249221523042, 0.15,
                      6.1803000000000017, 0.1203664469224163]),
        ),
        # rolling + left steer (dynamic_models.py:388-423)
        (
            np.array([0.15, 0.0]),
            np.array([0.0, 0.0, 0.15, 0.0, 0.0, 0.0, 0.0]),
            np.array([0.0, 0.0, 0.15, 0.0, 0.0]),
        ),
    ],
)
def test_zeroinit_rollouts(cr_params, u, st_gt, ks_gt):
    """1s rollouts from zero state vs reference golden finals (tol 1e-2)."""
    x0_st = jnp.zeros(7, dtype=jnp.float64)
    x0_ks = jnp.zeros(5, dtype=jnp.float64)
    u = jnp.asarray(u, dtype=jnp.float64)

    xf_st = _rollout_euler(x0_st, u, cr_params, dyn.vehicle_dynamics_st)
    xf_ks = _rollout_euler(x0_ks, u, cr_params, dyn.vehicle_dynamics_ks5)

    np.testing.assert_allclose(np.asarray(xf_st), st_gt, atol=1e-2)
    np.testing.assert_allclose(np.asarray(xf_ks), ks_gt, atol=1e-2)


def test_batched_matches_single(cr_params):
    """Leading batch axes give identical results to per-item evaluation."""
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(size=(16, 7)) * np.array([5, 5, 0.3, 8, 2, 1, 0.1]))
    us = jnp.asarray(rng.normal(size=(16, 2)))

    batched = dyn.vehicle_dynamics_st(xs, us, cr_params)
    single = jnp.stack(
        [dyn.vehicle_dynamics_st(xs[i], us[i], cr_params) for i in range(16)]
    )
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), rtol=1e-12)


def test_speed_switch_continuity(cr_params):
    """Both branches are evaluated and selected without NaN near |v|=0.5."""
    for v in [0.0, 0.49999, 0.5, 0.50001, -0.49999, -0.5]:
        x = jnp.array([0.0, 0.0, 0.1, v, 0.2, 0.05, 0.01], dtype=jnp.float64)
        u = jnp.array([0.1, 1.0], dtype=jnp.float64)
        f = dyn.vehicle_dynamics_st(x, u, cr_params)
        assert np.all(np.isfinite(np.asarray(f))), f"NaN/Inf at v={v}"


def test_grad_flows(cr_params):
    """The simulator is differentiable — no NaNs from guarded branches."""

    def loss(v):
        x = jnp.array([0.0, 0.0, 0.1, 0.0, 0.0, 0.0, 0.0], dtype=jnp.float64)
        x = x.at[3].set(v)
        u = jnp.array([0.1, 1.0], dtype=jnp.float64)
        xf = dyn.rk4_step(x, u, cr_params, 0.01)
        return jnp.sum(xf ** 2)

    for v in [0.0, 0.3, 0.5, 2.0]:
        g = jax.grad(loss)(jnp.float64(v))
        assert np.isfinite(float(g)), f"grad NaN at v={v}"


def test_pid_matches_reference_semantics():
    """Scalar PID cases across all four gain branches (dynamic_models.py:178-221)."""
    max_sv, max_a, max_v, min_v = 3.2, 9.51, 20.0, -5.0

    def ref_pid(speed, steer, cs, cst):
        steer_diff = steer - cst
        if abs(steer_diff) > 1e-4:
            sv = (steer_diff / abs(steer_diff)) * max_sv
        else:
            sv = 0.0
        vel_diff = speed - cs
        if cs > 0.0:
            kp = (10.0 * max_a / max_v) if vel_diff > 0 else (10.0 * max_a / (-min_v))
        else:
            kp = (2.0 * max_a / max_v) if vel_diff > 0 else (2.0 * max_a / (-min_v))
        return kp * vel_diff, sv

    cases = [
        (5.0, 0.2, 3.0, 0.0),
        (1.0, -0.3, 4.0, 0.1),
        (3.0, 0.0, -1.0, 0.0),
        (-2.0, 0.00005, -1.0, 0.0),
        (0.0, 0.0, 0.0, 0.0),
    ]
    for speed, steer, cs, cst in cases:
        accl, sv = dyn.pid(
            jnp.float64(speed), jnp.float64(steer), jnp.float64(cs),
            jnp.float64(cst), max_sv, max_a, max_v, min_v
        )
        ra, rs = ref_pid(speed, steer, cs, cst)
        assert abs(float(accl) - ra) < 1e-12, (speed, steer, cs, cst)
        assert abs(float(sv) - rs) < 1e-12, (speed, steer, cs, cst)
