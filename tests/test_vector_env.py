"""Gymnasium ``VectorEnv`` adapter (envs/vector_env.py).

The round-2 verdict asked for the batched TPU env behind the standard
``gymnasium.vector`` API so off-the-shelf RL stacks consume thousands of
envs without writing JAX: these tests step 256 envs through that API and
check the NEXT_STEP autoreset semantics against the reference's
reset-is-a-zero-action-step convention (f110_env.py:337-338).
"""

import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from f1tenth_gym_tpu.envs.vector_env import F110VectorEnv  # noqa: E402
from f1tenth_gym_tpu.maps import map_path  # noqa: E402


@pytest.fixture(scope="module")
def venv256():
    env = F110VectorEnv(num_envs=256, map=map_path("compact"),
                        num_agents=2, num_beams=108, scan_engine="march",
                        dtype="float32", seed=5)
    yield env
    env.close()


def test_vector_spaces_and_reset(venv256):
    env = venv256
    assert env.num_envs == 256
    assert env.action_space.shape == (256, 2, 2)
    assert env.single_observation_space["scans"].shape == (2, 108)
    obs, info = env.reset()
    assert set(obs) >= {"scans", "poses_x", "collisions", "lap_counts"}
    assert obs["scans"].shape == (256, 2, 108)
    assert obs["scans"].dtype == np.float32
    assert obs in env.observation_space


def test_vector_step_256(venv256):
    env = venv256
    obs, _ = env.reset()
    for _ in range(8):
        actions = np.zeros((256, 2, 2), np.float32)
        actions[..., 1] = 2.0  # drive forward
        obs, rewards, terminations, truncations, infos = env.step(actions)
    assert obs["scans"].shape == (256, 2, 108)
    assert rewards.shape == (256,)
    assert terminations.shape == (256,) and truncations.shape == (256,)
    assert np.all(rewards[~terminations] > 0)  # timestep reward
    # envs actually accelerated (~0.07 m/s per step from standstill)
    assert np.abs(obs["linear_vels_x"]).max() > 0.3


def test_vector_next_step_autoreset():
    """A terminated env's next step ignores the action and returns its
    start-grid observation (NEXT_STEP convention; reference reset
    semantics)."""
    # spawns aimed across the corridor -> quick wall hits
    poses = np.tile(np.array([[[-0.5, -9.5, 1.5708],
                               [-0.5, -8.3, 1.5708]]], np.float32), (8, 1, 1))
    env = F110VectorEnv(num_envs=8, map=map_path("compact"), num_agents=2,
                        num_beams=108, scan_engine="march", dtype="float32",
                        poses=poses, seed=1)
    obs0, _ = env.reset()
    a = np.zeros((8, 2, 2), np.float32)
    a[..., 1] = 6.0
    terminated = np.zeros(8, bool)
    for _ in range(400):
        obs, rew, term, trunc, _ = env.step(a)
        if term.any():
            terminated = term
            break
    assert terminated.any(), "no env terminated driving into a wall"
    # the step AFTER termination: reset obs at the start grid, zero reward
    obs1, rew1, term1, _, _ = env.step(a)
    i = int(np.flatnonzero(terminated)[0])
    assert not term1[i]
    assert rew1[i] == 0.0
    assert np.allclose(obs1["poses_x"][i], obs0["poses_x"][i], atol=1e-5)
    assert np.allclose(obs1["poses_y"][i], obs0["poses_y"][i], atol=1e-5)
    assert np.all(obs1["collisions"][i] == 0)
    env.close()


def test_vector_entry_point_registration():
    import f1tenth_gym_tpu.envs  # noqa: F401  (registers the scalar id)
    from f1tenth_gym_tpu.envs.vector_env import register_gymnasium_vector

    assert register_gymnasium_vector()
    spec = gymnasium.registry.get("f1tenth_tpu/f110-v0")
    assert spec is not None and spec.vector_entry_point


def test_terminal_spawn_not_swallowed():
    """An env whose spawn state is itself terminal (overlapping start
    poses) must keep REPORTING terminations — alternating 1-step
    episodes — not fall silent after the first one (round-3 fix:
    _pending_reset tracks reported terminations, not raw done)."""
    import jax.numpy as jnp

    poses = np.tile(np.array([[[0.7, 0.0, 1.37], [0.75, 0.0, 1.37]]],
                             np.float32), (4, 1, 1))  # overlapping pair
    env = F110VectorEnv(num_envs=4, map=map_path("compact"), num_agents=2,
                        num_beams=108, scan_engine="march",
                        dtype="float32", poses=poses, seed=2)
    env.reset(seed=2)
    a = np.zeros((4, 2, 2), np.float32)
    reports = []
    for _ in range(6):
        _, _, term, _, _ = env.step(a)
        reports.append(bool(term.any()))
    assert sum(reports) >= 3, (
        f"terminal-spawn terminations were swallowed: {reports}")
    env.close()
