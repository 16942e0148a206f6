"""Component tests: ScanSimulator2D, bundled maps, checkpointing, RNG
determinism, collision property tests, throughput floors.

These mirror the reference's embedded test strategy (SURVEY.md §4):
- RNG determinism   ~ ScanTests.test_rng (laser_models.py:554-580)
- collision property ~ CollisionTests.test_random_collision
  (collision_models.py:306-311)
- throughput floors  ~ the in-test FPS assertions (laser_models.py:534-552)
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f1tenth_gym_tpu import (
    ScanSimulator2D,
    SimConfig,
    VehicleParams,
    load_map,
    load_pytree,
    make_scan_tables,
    save_pytree,
)
from f1tenth_gym_tpu.maps import available_maps, centerline_path, map_path
from f1tenth_gym_tpu.ops.collision import collision_pairwise, get_vertices
from f1tenth_gym_tpu.utils.waypoints import load_waypoints


# --------------------------------------------------------------------------
# bundled maps
# --------------------------------------------------------------------------


def test_bundled_maps_exist():
    names = available_maps()
    assert len(names) >= 4
    for n in names:
        assert os.path.exists(map_path(n))


@pytest.mark.parametrize("name", ["compact", "twisty"])
def test_bundled_map_loads_and_scans(name):
    m = load_map(map_path(name), ".png", dtype=jnp.float64,
                 extract_segments=True)
    assert m.dt.ndim == 2 and float(m.dt.max()) > 1.0
    # centerline points sit in free space with ~half-track clearance
    wpts = load_waypoints(centerline_path(name))  # (N, 3) [x, y, v]
    assert wpts.shape[0] > 100
    sim = ScanSimulator2D(num_beams=108, engine="march", dtype=jnp.float64)
    sim.set_map_data(m)
    mid = wpts[len(wpts) // 2]
    scan = sim.scan(np.array([mid[0], mid[1], 0.0]))
    assert scan.shape == (108,)
    # on a ~3m-wide track the nearest wall is within ~2m
    assert 0.1 < scan.min() < 2.5


# --------------------------------------------------------------------------
# ScanSimulator2D (C9 parity surface)
# --------------------------------------------------------------------------


def test_scan_simulator_2d_api(example_map_path):
    sim = ScanSimulator2D(num_beams=108, engine="march", dtype=jnp.float64)
    assert sim.set_map(example_map_path, ".png")
    pose = np.array([0.0, 0.0, 0.0])
    s0 = sim.scan(pose)
    assert s0.shape == (108,) and (s0 > 0).all() and (s0 <= 30.0 + 1e-6).all()
    assert abs(sim.get_increment() - 4.7 / 107) < 1e-12
    # noise: same seed -> identical, different draws -> different
    a = sim.scan(pose, np.random.default_rng(42))
    b = sim.scan(pose, np.random.default_rng(42))
    np.testing.assert_array_equal(a, b)
    rng = np.random.default_rng(42)
    c, d = sim.scan(pose, rng), sim.scan(pose, rng)
    assert not np.array_equal(c, d)
    # batched path agrees with single path
    batch = np.asarray(sim.scan_batch(np.stack([pose, pose + 0.1])))
    np.testing.assert_allclose(batch[0], s0, atol=1e-9)


def test_scan_simulator_engines_agree(example_map_path):
    march = ScanSimulator2D(num_beams=108, engine="march", dtype=jnp.float64)
    march.set_map(example_map_path, ".png")
    seg = ScanSimulator2D(num_beams=108, engine="segments", dtype=jnp.float64)
    seg.set_map(example_map_path, ".png")
    poses = np.array([[0.0, 0.0, 0.3], [1.0, -1.0, 2.0], [-2.0, 3.0, 4.4]])
    a = np.asarray(march.scan_batch(poses))
    b = np.asarray(seg.scan_batch(poses))
    err = np.abs(a - b)
    # polygon-vs-raster tolerance, far inside the reference's own
    # MSE < 2.0 cross-engine bar (unittest/scan_sim.py:342)
    assert np.mean(err ** 2) < 0.5
    assert np.median(err) < 0.1


# --------------------------------------------------------------------------
# env-level RNG determinism (~ ScanTests.test_rng)
# --------------------------------------------------------------------------


def test_env_scan_noise_determinism(ring_env):
    reset, step, poses = ring_env
    actions = jnp.zeros((2, 2), dtype=jnp.float64) + jnp.asarray([0.0, 2.0])
    s1, o1, *_ = reset(poses, jax.random.PRNGKey(99))
    s2, o2, *_ = reset(poses, jax.random.PRNGKey(99))
    seq1, seq2 = [], []
    for _ in range(4):
        s1, o1, *_ = step(s1, actions)
        s2, o2, *_ = step(s2, actions)
        seq1.append(np.asarray(o1["scans"]))
        seq2.append(np.asarray(o2["scans"]))
    np.testing.assert_array_equal(np.stack(seq1), np.stack(seq2))
    # different seed -> different noise
    s3, o3, *_ = reset(poses, jax.random.PRNGKey(100))
    s3, o3, *_ = step(s3, actions)
    assert not np.array_equal(seq1[0], np.asarray(o3["scans"]))


@pytest.fixture(scope="module")
def ring_env():
    from f1tenth_gym_tpu import make_env_fns
    from f1tenth_gym_tpu.tracks.synthetic import ring_map_data, ring_start_poses

    m = ring_map_data(size=256, radius=4.0, dtype=jnp.float64)
    params = VehicleParams.create(dtype=jnp.float64)
    tables = make_scan_tables(num_beams=108, dtype=jnp.float64)
    cfg = SimConfig(num_agents=2, num_beams=108, dtype="float64")
    reset, step = make_env_fns(params, m, tables, cfg, 0.01)
    poses = jnp.asarray(ring_start_poses(2, 4.0))
    return reset, step, poses


# --------------------------------------------------------------------------
# collision property test (~ test_random_collision, 1000 perturbed bodies)
# --------------------------------------------------------------------------


def test_random_collision_property():
    rng = np.random.default_rng(0)
    length, width = 0.32, 0.22
    # overlapping: two rectangles jittered around the same pose by < width/2
    base = rng.uniform(-5, 5, size=(1000, 3))
    j1 = base + rng.uniform(-0.05, 0.05, size=(1000, 3))
    j2 = base + rng.uniform(-0.05, 0.05, size=(1000, 3))
    v1 = get_vertices(jnp.asarray(j1), length, width)
    v2 = get_vertices(jnp.asarray(j2), length, width)
    hits = jax.vmap(collision_pairwise)(v1, v2)
    assert bool(jnp.all(hits)), f"{int((~hits).sum())} overlapping pairs missed"
    # separated: same poses translated by > diag
    far = base.copy()
    far[:, 0] += 2.0
    v3 = get_vertices(jnp.asarray(far), length, width)
    miss = jax.vmap(collision_pairwise)(v1, v3)
    assert not bool(jnp.any(miss)), f"{int(miss.sum())} separated pairs hit"


# --------------------------------------------------------------------------
# checkpoint / resume
# --------------------------------------------------------------------------


def test_checkpoint_roundtrip_simstate(ring_env, tmp_path):
    reset, step, poses = ring_env
    s, o, *_ = reset(poses, jax.random.PRNGKey(3))
    for _ in range(3):
        s, o, *_ = step(s, jnp.asarray([[0.1, 2.0], [0.0, 1.0]], jnp.float64))
    path = save_pytree(str(tmp_path / "ckpt"), s)
    s2 = load_pytree(path, target=s)  # safe form: no unpickling
    # the no-target form requires an explicit trusted-input opt-in
    with pytest.raises(ValueError):
        load_pytree(path)
    s3 = load_pytree(path, allow_pickle=True)
    np.testing.assert_array_equal(np.asarray(s3.x), np.asarray(s2.x))
    # resumed rollout is bit-identical to the uninterrupted one
    a = jnp.asarray([[0.05, 2.0], [0.0, 1.5]], jnp.float64)
    s_cont, o_cont, *_ = step(s, a)
    s_res, o_res, *_ = step(s2, a)
    np.testing.assert_array_equal(np.asarray(o_cont["scans"]),
                                  np.asarray(o_res["scans"]))
    np.testing.assert_array_equal(np.asarray(s_cont.x), np.asarray(s_res.x))


# --------------------------------------------------------------------------
# throughput floors (CPU; generous floors — catch order-of-magnitude
# regressions, not noise. The reference enforces >500 scans/s single-core.)
# --------------------------------------------------------------------------


def test_throughput_floor_batched_step(ring_env):
    import time

    from f1tenth_gym_tpu.parallel import batch_reset, batch_step
    from f1tenth_gym_tpu.tracks.synthetic import ring_map_data, ring_start_poses

    m = ring_map_data(size=256, radius=4.0, dtype=jnp.float32,
                      extract_segments=True)
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=108, dtype=jnp.float32)
    cfg = SimConfig(num_agents=2, num_beams=108, dtype="float32",
                    scan_engine="segments")
    E = 64
    poses = jnp.asarray(np.stack([ring_start_poses(2, 4.0)] * E), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    states, *_ = batch_reset(poses, keys, params, m, tables, cfg, 0.01)
    actions = jnp.zeros((E, 2, 2), jnp.float32)
    step = jax.jit(lambda s, a: batch_step(s, a, params, m, tables, cfg, 0.01))
    s, *_ = step(states, actions)
    jax.block_until_ready(s.x)
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        s, *_ = step(s, actions)
    jax.block_until_ready(s.x)
    rate = E * n / (time.perf_counter() - t0)
    # even on CPU the batched engine must beat the reference's single-core
    # full-step rate
    assert rate > 500.0, f"batched step rate {rate:.0f} env-steps/s"


def test_scan_noise_statistics(ring_env):
    """Statistical equivalence of the jax scan noise with the reference's
    rng.normal(0, 0.01, num_beams) (laser_models.py:450-452): zero mean,
    sigma = 0.01, independence across beams and steps — plus the
    shared-seed quirk (every agent gets the SAME noise vector each step,
    base_classes.py:118-120: one class-level rng seed for all cars)."""
    reset, step, poses = ring_env
    # noise = scans(noise on) - scans(noise off) at identical states: run
    # the same env twice from the same key with zero actions (stationary)
    from f1tenth_gym_tpu import make_env_fns
    from f1tenth_gym_tpu.tracks.synthetic import ring_map_data

    m = ring_map_data(size=256, radius=4.0, dtype=jnp.float64)
    params = VehicleParams.create(dtype=jnp.float64)
    tables = make_scan_tables(num_beams=108, dtype=jnp.float64)
    cfg_on = SimConfig(num_agents=2, num_beams=108, dtype="float64")
    cfg_off = SimConfig(num_agents=2, num_beams=108, dtype="float64",
                        scan_noise=False)
    reset_on, step_on = make_env_fns(params, m, tables, cfg_on, 0.01)
    reset_off, step_off = make_env_fns(params, m, tables, cfg_off, 0.01)

    # cars on OPPOSITE sides of the ring: the walls always occlude the
    # opponent, so the noisy-minus-clean difference is exactly the noise
    # (the opponent ray-cast would otherwise overwrite blocked beams)
    far_poses = jnp.asarray([[4.0, 0.0, 1.5708], [-4.0, 0.0, -1.5708]],
                            dtype=jnp.float64)
    key = jax.random.PRNGKey(7)
    s1, o1, *_ = reset_on(far_poses, key)
    s2, o2, *_ = reset_off(far_poses, key)
    actions = jnp.zeros((2, 2), dtype=jnp.float64)
    noises = []
    for _ in range(256):
        s1, o1, *_ = step_on(s1, actions)
        s2, o2, *_ = step_off(s2, actions)
        noises.append(np.asarray(o1["scans"]) - np.asarray(o2["scans"]))
    noise = np.stack(noises)  # (T, A, B)

    # shared-agent quirk: identical noise vector across agents each step
    # (recovered via (scan+noise)-scan, so allow 1-ulp rounding residue
    # from the different per-agent scan magnitudes)
    np.testing.assert_allclose(noise[:, 0], noise[:, 1], atol=1e-12, rtol=0)

    n = noise[:, 0, :]  # (T, B)
    flat = n.ravel()
    sigma = 0.01
    N = flat.size
    # mean: 0 within 5 standard errors; sigma: within 3% (chi 1-sigma ~0.4%)
    assert abs(flat.mean()) < 5 * sigma / np.sqrt(N), flat.mean()
    assert abs(flat.std() / sigma - 1.0) < 0.03, flat.std()
    # normality of tails: |noise| < 6 sigma everywhere at N~27k samples
    assert np.abs(flat).max() < 6 * sigma
    # independence across beams: neighboring-beam correlation ~ 0
    c_beam = np.corrcoef(n[:, :-1].ravel(), n[:, 1:].ravel())[0, 1]
    assert abs(c_beam) < 0.05, c_beam
    # independence across steps: step-lag-1 correlation ~ 0
    c_step = np.corrcoef(n[:-1].ravel(), n[1:].ravel())[0, 1]
    assert abs(c_step) < 0.05, c_step


def test_replace_params_per_agent():
    """VehicleParams.replace_params semantics (reference: per-agent updates
    of any param via each RaceCar's own dict copy, base_classes.py:514-534).

    Here params are pytree leaves: global updates work on scalar or (A,)
    leaves, per-agent updates require (A,) leaves and LOUDLY reject scalar
    leaves (the agent count is not inferable from a scalar)."""
    # global update of a scalar leaf
    p = VehicleParams.create()
    p2 = p.replace_params({"mu": 0.9})
    assert p2.mu.shape == p.mu.shape
    assert float(p2.mu) == pytest.approx(0.9)
    assert float(p2.m) == pytest.approx(float(p.m))  # others untouched

    # global update broadcast over an (A,)-leaf
    pa = VehicleParams.create({"mu": np.full(3, 1.0489)})
    pa_g = pa.replace_params({"mu": 0.7})
    np.testing.assert_allclose(np.asarray(pa_g.mu), 0.7)

    # per-agent update of an (A,) leaf touches ONLY that agent
    pa1 = pa.replace_params({"mu": 0.5}, agent_idx=1)
    np.testing.assert_allclose(
        np.asarray(pa1.mu), [1.0489, 0.5, 1.0489], rtol=0, atol=1e-6)

    # per-agent update of a scalar leaf raises (loud, not silent)
    with pytest.raises(ValueError, match="Per-agent"):
        p.replace_params({"mu": 0.5}, agent_idx=0)

    # gym wrapper end-to-end: F110Env broadcasts leaves to (A,) at
    # construction, so update_params(index=...) always works there
    # (f110_env.py:364-375 surface)
    from f1tenth_gym_tpu.envs import F110Env

    env = F110Env(map=os.path.splitext(map_path("example_map"))[0],
                  map_ext=".png", num_agents=2, num_beams=64,
                  scan_engine="march")
    env.update_params({"mu": 0.66, "v_max": 12.0}, index=1)
    np.testing.assert_allclose(
        np.asarray(env.params.mu), [1.0489, 0.66], rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(env.params.v_max), [20.0, 12.0], rtol=0, atol=1e-6)
    env.update_params({"mu": 0.75})  # global update still fine
    np.testing.assert_allclose(np.asarray(env.params.mu), 0.75)
