"""On-device rollouts: lax.scan over steps, envs stay in HBM.

The reference's step loop crosses the Python/Numba boundary ~10 times per
step per agent (SURVEY.md §3.2); a rollout here is ONE device program —
``lax.scan`` over T steps of the vmapped env — with nothing touching the
host until the final pytree (or nothing at all, for benchmarking).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from f1tenth_gym_tpu.config import SimConfig
from f1tenth_gym_tpu.parallel.vector import batch_step
from f1tenth_gym_tpu.state import MapData, ScanTables, SimState, VehicleParams


class Transition(NamedTuple):
    obs: dict
    action: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray


def rollout(
    states: SimState,
    policy_fn: Callable,       # (key, obs) -> (E, A, 2) actions
    n_steps: int,
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep,
    key: jax.Array,
    step_fn: Optional[Callable] = None,  # e.g. an autoreset step
    collect: bool = True,
):
    """Roll all envs n_steps forward.

    Returns (final_states, Transition stacked over T) when collect=True,
    else (final_states, (sum_reward, num_dones)) — the no-materialization
    path used for throughput benchmarking.
    """
    if step_fn is None:
        step_fn = lambda s, a: batch_step(
            s, a, params, map_data, tables, cfg, timestep
        )

    def body(carry, _):
        states, key, prev_obs = carry
        key, sub = jax.random.split(key)
        actions = policy_fn(sub, prev_obs)
        states, obs, reward, done, info = step_fn(states, actions)
        obs = dict(obs)
        obs.pop("ego_idx", None)  # static, not part of the carried pytree
        out = Transition(obs=prev_obs, action=actions, reward=reward, done=done) \
            if collect else (jnp.sum(reward), jnp.sum(done))
        return (states, key, obs), out

    # the initial observation comes from the scans already in the state
    obs0 = {
        "scans": states.scans,
        "poses_x": states.x[..., 0],
        "poses_y": states.x[..., 1],
        "poses_theta": states.x[..., 4],
        "linear_vels_x": states.x[..., 3],
        "linear_vels_y": jnp.zeros_like(states.x[..., 3]),
        "ang_vels_z": states.x[..., 5],
        "collisions": states.collisions,
        "lap_times": states.lap_times,
        "lap_counts": states.lap_counts,
    }
    (states, _, _), out = jax.lax.scan(
        body, (states, key, obs0), None, length=n_steps
    )
    if not collect:
        total_r, total_d = out
        return states, (jnp.sum(total_r), jnp.sum(total_d))
    return states, out
