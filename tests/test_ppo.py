"""PPO learner: one sharded train step on the 8-device CPU mesh.

The TPU learning run lives in examples/train_ppo.py (documented results in
docs/performance.md); this pins the mechanics — rollout, GAE, minibatch
updates, gradient all-reduce over the mesh — in CI.
"""

import numpy as np
import jax
import jax.numpy as jnp

from f1tenth_gym_tpu import SimConfig, VehicleParams, make_scan_tables
from f1tenth_gym_tpu.parallel import batch_reset, make_mesh, replicate, shard_states
from f1tenth_gym_tpu.parallel.ppo import PPO, PPOConfig
from f1tenth_gym_tpu.tracks.synthetic import ring_map_data, ring_start_poses


def test_ppo_train_step_sharded():
    n_dev = len(jax.devices())
    mesh = make_mesh(num_env_shards=n_dev, num_model_shards=1)
    # float64: the suite runs with JAX_ENABLE_X64, under which numpy-scalar
    # constants promote f32 state (same convention as the rest of the suite)
    cfg = SimConfig(num_agents=1, num_beams=64, dtype="float64",
                    scan_noise=False)
    params = VehicleParams.create(dtype=jnp.float64)
    tables = make_scan_tables(num_beams=64, dtype=jnp.float64)
    m = ring_map_data(size=128, radius=2.0, dtype=jnp.float64)

    E = 2 * n_dev
    poses = jnp.asarray(np.stack([ring_start_poses(1, 2.0)] * E),
                        jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    states, *_ = batch_reset(poses, keys, params, m, tables, cfg, 0.01)
    states = shard_states(states, mesh)

    ppo = PPO(replicate(params, mesh), replicate(m, mesh),
              replicate(tables, mesh), cfg, 0.01,
              PPOConfig(obs_beams=16, hidden=32, rollout_steps=3,
                        epochs=1, minibatches=2), mesh=mesh)
    ts = ppo.init(states, jax.random.PRNGKey(1))
    before = jax.tree.leaves(ts.net_params)[0].copy()
    step = jax.jit(ppo.train_step)
    ts, metrics = step(ts)
    ts, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["mean_reward"]))
    after = jax.tree.leaves(ts.net_params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after)), \
        "parameters did not update"
    # env batch stays sharded across the mesh through training
    assert len(ts.env_states.x.sharding.device_set) == n_dev


def test_ppo_learning_improves_reward():
    """The in-CI analogue of the docs' learning claim: on a fixed seed the
    mean shaped reward strictly improves over training, PER AGENT (2-agent
    env exercising the per-agent GAE path)."""
    from f1tenth_gym_tpu.parallel import make_autoreset_step

    cfg = SimConfig(num_agents=2, num_beams=64, dtype="float64",
                    scan_noise=False)
    params = VehicleParams.create(dtype=jnp.float64)
    tables = make_scan_tables(num_beams=64, dtype=jnp.float64)
    m = ring_map_data(size=128, radius=2.0, dtype=jnp.float64)

    E = 16
    poses = jnp.asarray(np.stack([ring_start_poses(2, 2.0)] * E), jnp.float64)
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    states, *_ = batch_reset(poses, keys, params, m, tables, cfg, 0.01)

    astep = make_autoreset_step(params, m, tables, cfg, 0.01,
                                reset_poses=poses)
    ppo = PPO(params, m, tables, cfg, 0.01,
              PPOConfig(obs_beams=16, hidden=32, rollout_steps=8,
                        epochs=2, minibatches=2, lr=1e-3),
              step_fn=astep)
    ts = ppo.init(states, jax.random.PRNGKey(1))
    step = jax.jit(ppo.train_step)
    rewards = []
    for _ in range(20):
        ts, metrics = step(ts)
        rewards.append(float(metrics["mean_reward"]))
    early = np.mean(rewards[:4])
    late = np.mean(rewards[-4:])
    assert late > early, f"no learning: early {early:.4f} late {late:.4f}"
