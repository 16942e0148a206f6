"""Trajectory/kernel parity vs golden fixtures generated from the reference.

Fixtures come from tests/gen_fixtures.py, which runs the actual reference
simulator (Numba bodies executed as plain NumPy) — the direct analogue of the
reference's own cross-engine golden test (unittest/scan_sim.py:306-366,
legacy_scan.npz). All comparisons run in float64 on CPU.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f1tenth_gym_tpu import (
    INTEGRATOR_EULER,
    INTEGRATOR_RK4,
    SimConfig,
    VehicleParams,
    env_reset,
    env_step,
    load_map,
    make_scan_tables,
)
from f1tenth_gym_tpu.ops import collision as col
from f1tenth_gym_tpu.ops import dynamics as dyn
from f1tenth_gym_tpu.ops import lidar as lidar

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
F64 = jnp.float64


def _fix(name):
    path = os.path.join(FIX, name)
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing — run tests/gen_fixtures.py")
    return np.load(path)


@pytest.fixture(scope="module")
def params64():
    return VehicleParams.create(dtype=F64)


@pytest.fixture(scope="module")
def map64():
    from f1tenth_gym_tpu.maps import map_path

    return load_map(map_path("example_map"), ".png", dtype=F64)


@pytest.fixture(scope="module")
def tables64():
    return make_scan_tables(dtype=F64)


# ---------------------------------------------------------------- dynamics
def test_dynamics_st_parity(params64):
    d = _fix("dynamics.npz")
    f = dyn.vehicle_dynamics_st(jnp.asarray(d["xs"]), jnp.asarray(d["us"]), params64)
    np.testing.assert_allclose(np.asarray(f), d["f_st"], rtol=1e-12, atol=1e-12)


def test_dynamics_ks_parity(params64):
    d = _fix("dynamics.npz")
    f = dyn.vehicle_dynamics_ks5(
        jnp.asarray(d["xs"][:, :5]), jnp.asarray(d["us"]), params64
    )
    np.testing.assert_allclose(np.asarray(f), d["f_ks"], rtol=1e-12, atol=1e-12)


def test_pid_parity(params64):
    d = _fix("dynamics.npz")
    pin = d["pid_in"]
    accl, sv = dyn.pid(
        jnp.asarray(pin[:, 0]), jnp.asarray(pin[:, 1]),
        jnp.asarray(pin[:, 2]), jnp.asarray(pin[:, 3]),
        params64.sv_max, params64.a_max, params64.v_max, params64.v_min,
    )
    np.testing.assert_allclose(np.asarray(accl), d["pid_out"][:, 0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sv), d["pid_out"][:, 1], rtol=1e-12)


# ---------------------------------------------------------------- collision
def test_collision_pairwise_parity():
    d = _fix("collision.npz")
    got = col.collision_pairwise(jnp.asarray(d["pairs_a"]), jnp.asarray(d["pairs_b"]))
    np.testing.assert_array_equal(np.asarray(got), d["res"])


def test_collision_multiple_parity():
    d = _fix("collision.npz")
    cols, idx = col.collision_multiple(jnp.asarray(d["multi"]))
    np.testing.assert_array_equal(np.asarray(cols), d["mcol"])
    np.testing.assert_array_equal(np.asarray(idx), d["midx"])


def test_get_vertices_parity():
    d = _fix("collision.npz")
    verts = col.get_vertices(jnp.asarray(d["poses"]), 0.58, 0.31)
    np.testing.assert_allclose(np.asarray(verts), d["verts"], rtol=1e-12, atol=1e-12)


# ---------------------------------------------------------------- lidar
def test_scan_parity(map64, tables64):
    d = _fix("scans_example_map.npz")
    scans = lidar.get_scan(
        jnp.asarray(d["poses"]), map64, tables64, num_beams=1080, theta_dis=2000
    )
    got = np.asarray(scans)
    # exact marching parity: identical control flow in float64
    np.testing.assert_allclose(got, d["scans"], rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", ["berlin", "skirk"])
def test_scan_parity_reference_maps(name, tables64):
    """Golden scans on the reference's own venue maps — the analogue of its
    legacy_scan.npz cross-engine test (unittest/scan_sim.py:306-366).

    March engine: exact. Segment/Pallas engines: MSE far under the
    reference's own MSE < 2.0 cross-engine bar.
    """
    from f1tenth_gym_tpu.ops.pallas_scan import scan_pallas
    from f1tenth_gym_tpu.ops.segments import get_scan_segments
    from f1tenth_gym_tpu.utils.map_loader import load_map

    from f1tenth_gym_tpu.maps import map_path

    d = _fix(f"scans_{name}.npz")
    m = load_map(map_path(name), ".png", dtype=jnp.float64,
                 extract_segments=True)
    poses = jnp.asarray(d["poses"])

    march = np.asarray(lidar.get_scan(poses, m, tables64, num_beams=1080,
                                      theta_dis=2000))
    np.testing.assert_allclose(march, d["scans"], rtol=1e-9, atol=1e-9)

    seg = np.asarray(get_scan_segments(poses, m.segments, tables64,
                                       1080, 2000))
    assert np.mean((seg - d["scans"]) ** 2) < 2.0

    pal = np.asarray(scan_pallas(poses, m.seg_table, tables64, 1080, 2000,
                                 interpret=True))
    assert np.mean((pal - d["scans"]) ** 2) < 2.0


def test_ttc_parity(tables64):
    d = _fix("ttc.npz")
    hits = lidar.check_ttc(
        jnp.asarray(d["scans"]), jnp.asarray(d["vels"]), tables64
    )
    np.testing.assert_array_equal(np.asarray(hits), d["hits"])


def test_ray_cast_parity(tables64):
    d = _fix("ray_cast.npz")
    new = jax.vmap(
        lambda p, sc, ov: col.ray_cast_opponents(p, sc, ov[None], tables64)
    )(jnp.asarray(d["poses"]), jnp.asarray(d["scans"]), jnp.asarray(d["opp_verts"]))
    np.testing.assert_allclose(np.asarray(new), d["new_scans"], rtol=1e-9, atol=1e-12)


# ---------------------------------------------------------------- env rollout
@pytest.mark.parametrize("name,integrator", [
    ("rk4", INTEGRATOR_RK4),
    ("euler", INTEGRATOR_EULER),
])
def test_env_rollout_parity(params64, map64, tables64, name, integrator):
    """Full 120-step 2-agent env rollout matches the reference trajectory
    (poses, velocities, scans, collision flags, lap bookkeeping, rewards)."""
    d = _fix(f"env_rollout_{name}.npz")
    cfg = SimConfig(num_agents=2, integrator=integrator, scan_noise=False,
                    dtype="float64")

    key = jax.random.PRNGKey(12345)
    state, obs, *_ = env_reset(
        jnp.asarray(d["poses"]), key, params64, map64, tables64, cfg, 0.01
    )

    actions = jnp.asarray(d["actions"])  # (T, A, 2)

    step = jax.jit(
        lambda s, a: env_step(s, a, params64, map64, tables64, cfg, 0.01)
    )

    T = actions.shape[0]
    for t in range(T):
        state, obs, reward, done, info = step(state, actions[t])
        for k_ours, k_ref in [
            ("poses_x", "poses_x"), ("poses_y", "poses_y"),
            ("poses_theta", "poses_theta"), ("linear_vels_x", "linear_vels_x"),
            ("ang_vels_z", "ang_vels_z"),
        ]:
            np.testing.assert_allclose(
                np.asarray(obs[k_ours]), d[k_ref][t], rtol=1e-8, atol=1e-8,
                err_msg=f"step {t} field {k_ours}",
            )
        np.testing.assert_array_equal(
            np.asarray(obs["collisions"]), d["collisions"][t],
            err_msg=f"step {t} collisions",
        )
        np.testing.assert_allclose(
            np.asarray(obs["scans"][0]), d["scans0"][t], rtol=1e-6, atol=1e-6,
            err_msg=f"step {t} scan0",
        )
        np.testing.assert_allclose(
            np.asarray(obs["scans"][1]), d["scans1"][t], rtol=1e-6, atol=1e-6,
            err_msg=f"step {t} scan1",
        )
        assert bool(done) == bool(d["done"][t]), f"step {t} done"
        assert abs(float(reward) - d["reward"][t]) < 1e-12
        np.testing.assert_allclose(
            np.asarray(obs["lap_times"]), d["lap_times"][t], atol=1e-9,
            err_msg=f"step {t} lap_times",
        )
        np.testing.assert_array_equal(
            np.asarray(obs["lap_counts"]), d["lap_counts"][t],
            err_msg=f"step {t} lap_counts",
        )
