"""Env-layer behavior: wrapper API, determinism, vector env, auto-reset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f1tenth_gym_tpu import SimConfig, VehicleParams, make_scan_tables
from f1tenth_gym_tpu.parallel import (
    batch_reset,
    batch_step,
    make_autoreset_step,
    uniform_pose_sampler,
)
from f1tenth_gym_tpu.tracks.synthetic import ring_map_data, ring_start_poses

F64 = jnp.float64
RADIUS = 8.0


@pytest.fixture(scope="module")
def ring():
    return ring_map_data(size=512, radius=RADIUS, dtype=F64)


@pytest.fixture(scope="module")
def small():
    """Small scan config for fast compiles."""
    cfg = SimConfig(num_agents=2, num_beams=60, dtype="float64")
    params = VehicleParams.create(dtype=F64)
    tables = make_scan_tables(num_beams=60, dtype=F64)
    return cfg, params, tables


def test_wrapper_api(ring, small, tmp_path):
    """F110Env reset/step round-trip through numpy with the reference API."""
    from PIL import Image
    import yaml as _yaml

    from f1tenth_gym_tpu.envs import F110Env
    from f1tenth_gym_tpu.tracks.synthetic import ring_track_bitmap

    bitmap, res, origin = ring_track_bitmap(size=512, radius=RADIUS)
    Image.fromarray(np.flipud(bitmap).astype(np.uint8)).save(tmp_path / "ring.png")
    with open(tmp_path / "ring.yaml", "w") as f:
        _yaml.safe_dump(
            {"image": "ring.png", "resolution": res, "origin": list(origin)}, f
        )

    env = F110Env(
        map=str(tmp_path / "ring"),
        map_ext=".png",
        num_agents=2,
        num_beams=60,
        timestep=0.01,
        integrator="rk4",
        dtype="float64",
    )
    poses = ring_start_poses(2, RADIUS)
    obs, reward, done, info = env.reset(poses)
    assert isinstance(obs["scans"], np.ndarray) and obs["scans"].shape == (2, 60)
    assert obs["ego_idx"] == 0 and reward == 0.01 and not done
    for _ in range(10):
        obs, reward, done, info = env.step(np.array([[0.0, 2.0], [0.0, 2.0]]))
    assert obs["poses_x"].shape == (2,)
    assert not done
    assert "checkpoint_done" in info
    # update_params does not recompile and changes behavior-affecting values
    env.update_params({"v_max": 5.0})
    assert float(np.max(np.asarray(env.params.v_max))) == 5.0
    env.update_params({"v_max": 7.0}, index=1)
    assert float(np.asarray(env.params.v_max)[0]) == 5.0
    assert float(np.asarray(env.params.v_max)[1]) == 7.0


def test_batched_env_matches_loop(ring, small):
    """vmapped batch of E envs == E independent envs, bitwise."""
    cfg, params, tables = small
    E = 4
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, E)
    base = ring_start_poses(2, RADIUS)
    poses = jnp.asarray(
        np.stack([base + np.array([[0, 0, 0.02 * e]] * 2) for e in range(E)])
    )

    states, obs, *_ = batch_reset(poses, keys, params, ring, tables, cfg, 0.01)
    actions = jnp.tile(jnp.array([[0.02, 3.0], [0.0, 2.5]]), (E, 1, 1))
    for _ in range(5):
        states, obs, r, d, i = batch_step(
            states, actions, params, ring, tables, cfg, 0.01
        )

    # env 2 standalone
    from f1tenth_gym_tpu.core.env import env_reset, env_step

    s1, o1, *_ = env_reset(poses[2], keys[2], params, ring, tables, cfg, 0.01)
    for _ in range(5):
        s1, o1, r1, d1, i1 = env_step(
            s1, actions[2], params, ring, tables, cfg, 0.01
        )
    np.testing.assert_array_equal(np.asarray(obs["scans"][2]), np.asarray(o1["scans"]))
    np.testing.assert_array_equal(
        np.asarray(obs["poses_x"][2]), np.asarray(o1["poses_x"])
    )


def test_autoreset(ring, small):
    """Crashed envs re-initialize in-graph; alive envs are untouched."""
    cfg, params, tables = small
    E = 8
    keys = jax.random.split(jax.random.PRNGKey(1), E)
    base = ring_start_poses(2, RADIUS)
    poses = jnp.asarray(np.stack([base] * E))
    states, *_ = batch_reset(poses, keys, params, ring, tables, cfg, 0.01)

    sampler = uniform_pose_sampler(ring, clearance=0.8)
    step = jax.jit(
        make_autoreset_step(params, ring, tables, cfg, 0.01, pose_sampler=sampler)
    )

    # full throttle straight: everyone hits the wall eventually
    actions = jnp.tile(jnp.array([[0.0, 8.0], [0.0, 8.0]]), (E, 1, 1))
    total_dones = 0
    for _ in range(160):
        states, obs, r, d, i = step(states, actions)
        total_dones += int(jnp.sum(d))
    assert total_dones > 0, "no env ever crashed"
    # after autoreset, times of freshly reset envs restart near zero
    assert float(jnp.min(states.current_time)) < 160 * 0.01


def test_pose_sampler_in_free_space(ring):
    sampler = uniform_pose_sampler(ring, clearance=0.8)
    poses = sampler(jax.random.PRNGKey(2), (256,))
    from f1tenth_gym_tpu.ops.lidar import dt_lookup

    d = dt_lookup(poses[:, 0], poses[:, 1], ring)
    assert float(jnp.min(d)) > 0.5


def test_sharded_batch_step(ring, small):
    """E axis sharded over an 8-device CPU mesh executes and matches."""
    from f1tenth_gym_tpu.parallel import make_mesh, replicate, shard_states

    cfg, params, tables = small
    mesh = make_mesh()  # all 8 virtual devices on 'env'
    assert mesh.devices.size == 8

    E = 16
    keys = jax.random.split(jax.random.PRNGKey(3), E)
    poses = jnp.asarray(np.stack([ring_start_poses(2, RADIUS)] * E))
    states, *_ = batch_reset(poses, keys, params, ring, tables, cfg, 0.01)
    sharded = shard_states(states, mesh)
    params_r = replicate(params, mesh)
    ring_r = replicate(ring, mesh)
    tables_r = replicate(tables, mesh)

    step = jax.jit(
        lambda s, a: batch_step(s, a, params_r, ring_r, tables_r, cfg, 0.01)
    )
    actions = jnp.tile(jnp.array([[0.01, 3.0], [0.0, 2.0]]), (E, 1, 1))
    out_sharded, obs_sh, *_ = step(sharded, actions)
    out_local, obs_lo, *_ = step(states, actions)
    np.testing.assert_allclose(
        np.asarray(obs_sh["scans"]), np.asarray(obs_lo["scans"]), rtol=0, atol=0
    )
    # the result actually lives distributed over 8 devices
    assert len(out_sharded.x.sharding.device_set) == 8


def test_rollout_scan(ring, small):
    """lax.scan rollout runs fully on device and collects trajectories."""
    from f1tenth_gym_tpu.parallel import rollout

    cfg, params, tables = small
    E = 4
    keys = jax.random.split(jax.random.PRNGKey(4), E)
    poses = jnp.asarray(np.stack([ring_start_poses(2, RADIUS)] * E))
    states, *_ = batch_reset(poses, keys, params, ring, tables, cfg, 0.01)

    policy = lambda key, obs: jnp.tile(jnp.array([[0.0, 2.0], [0.0, 2.0]]), (E, 1, 1))
    final, traj = jax.jit(
        lambda s, k: rollout(
            s, policy, 20, params, ring, tables, cfg, 0.01, k
        )
    )(states, jax.random.PRNGKey(5))
    assert traj.reward.shape == (20, E)
    assert traj.obs["scans"].shape == (20, E, 2, 60)
    assert int(final.steps[0]) == 21  # 1 reset step + 20 rollout steps


def test_sort_envs_for_locality_is_permutation():
    """The locality sort must be a pure relabeling: same envs, new order,
    spatially monotone keys."""
    import numpy as np

    from f1tenth_gym_tpu import SimConfig, VehicleParams, make_scan_tables
    from f1tenth_gym_tpu.parallel import batch_reset, sort_envs_for_locality
    from f1tenth_gym_tpu.tracks.synthetic import ring_map_data

    m = ring_map_data(size=128, radius=2.0, dtype=jnp.float64)
    params = VehicleParams.create(dtype=jnp.float64)
    tables = make_scan_tables(num_beams=32, dtype=jnp.float64)
    cfg = SimConfig(num_agents=2, num_beams=32, dtype="float64",
                    scan_noise=False)
    E = 32
    rng = np.random.default_rng(0)
    ang = rng.uniform(0, 2 * np.pi, E)
    poses = np.stack([
        np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang), ang + np.pi / 2], 1),
        np.stack([2.0 * np.cos(ang), 2.0 * np.sin(ang), ang + np.pi / 2], 1),
    ], 1)
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    states, *_ = batch_reset(jnp.asarray(poses), keys, params, m, tables,
                             cfg, 0.01)
    s2 = sort_envs_for_locality(states)
    # permutation: the multiset of env states is unchanged
    a = np.asarray(states.x).reshape(E, -1)
    b = np.asarray(s2.x).reshape(E, -1)
    a_sorted = a[np.lexsort(a.T)]
    b_sorted = b[np.lexsort(b.T)]
    np.testing.assert_array_equal(a_sorted, b_sorted)
    # keys/lap state permute consistently with x (same order applied to
    # every leaf): check start poses still match their x rows
    np.testing.assert_array_equal(np.asarray(s2.x[:, :, 0]),
                                  np.asarray(s2.start_xs))


def test_pose_sampler_grouped_aligned_component():
    """grouped: agents land 0.8-2.0 m from agent 0 and share a heading;
    component_seed: every sample stays on the seeded free component."""
    import numpy as np
    from scipy import ndimage

    from f1tenth_gym_tpu import load_map
    from f1tenth_gym_tpu.maps import map_path
    from f1tenth_gym_tpu.parallel import uniform_pose_sampler

    m = load_map(map_path("example_map"), ".png", dtype=jnp.float64)
    s = uniform_pose_sampler(m, clearance=0.6, component_seed=(0.7, 0.0),
                             grouped=True, align_theta=True)
    p = np.asarray(s(jax.random.PRNGKey(3), (256, 2)))
    d = np.hypot(*(p[:, 0, :2] - p[:, 1, :2]).T)
    assert d.min() >= 0.79 and d.max() <= 2.01, (d.min(), d.max())
    # same racing direction within each pair
    assert (np.cos(p[:, 0, 2] - p[:, 1, 2]) > 0.0).all()
    # all samples on the component of (0.7, 0.0)
    dt = np.asarray(m.dt)
    res = float(m.resolution)
    lab, _ = ndimage.label(dt > 0.6)
    want = lab[int((0.0 - float(m.orig_y)) / res),
               int((0.7 - float(m.orig_x)) / res)]
    rows = ((p[..., 1].ravel() - float(m.orig_y)) / res).astype(int)
    cols = ((p[..., 0].ravel() - float(m.orig_x)) / res).astype(int)
    assert (lab[rows, cols] == want).all()
