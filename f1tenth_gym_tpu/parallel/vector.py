"""Vectorized batched environments: thousands of racing envs per chip.

The reference's parallelism story is "run many gym processes"
(docs/index.rst:12); here the env *is* a pure function, so the batch axis is
just ``jax.vmap`` — one compiled program steps E envs in lockstep on one
chip, and the same pytree shards over a device mesh (parallel/sharding.py).

Includes auto-reset (an RL-facing extension the reference lacks): done envs
are re-initialized in-graph from a pose sampler, so rollouts never leave the
device.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu.config import SimConfig
from f1tenth_gym_tpu.core.env import env_reset, env_step, init_state
from f1tenth_gym_tpu.state import MapData, ScanTables, SimState, VehicleParams


def batch_reset(
    poses: jnp.ndarray,  # (E, A, 3)
    keys: jax.Array,     # (E,) PRNG keys (e.g. jax.random.split(key, E))
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep,
):
    """Reset E envs. Returns (states, obs, reward, done, info), each with a
    leading E axis."""
    f = lambda p, k: env_reset(p, k, params, map_data, tables, cfg, timestep)
    return jax.vmap(f)(poses, keys)


def batch_step(
    states: SimState,     # E-stacked
    actions: jnp.ndarray,  # (E, A, 2)
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep,
):
    """Step E envs in lockstep."""
    f = lambda s, a: env_step(s, a, params, map_data, tables, cfg, timestep)
    return jax.vmap(f)(states, actions)


def uniform_pose_sampler(map_data: MapData, clearance: float = 0.6,
                         max_candidates: int = 65536):
    """Build an in-graph start-pose sampler from the map's free space.

    Host-side: collect cells whose obstacle distance exceeds ``clearance``;
    device-side: sample a candidate cell + uniform heading. Returns
    ``sample(key, shape) -> (*shape, 3)`` poses.
    """
    dt = np.asarray(map_data.dt)
    res = float(map_data.resolution)
    rows, cols = np.nonzero(dt > clearance)
    if len(rows) == 0:
        raise ValueError("no free space with requested clearance")
    if len(rows) > max_candidates:
        sel = np.random.default_rng(0).choice(len(rows), max_candidates, replace=False)
        rows, cols = rows[sel], cols[sel]
    # cell centers, map frame -> world frame (inverse of ops/lidar.dt_lookup)
    xs_m = (cols + 0.5) * res
    ys_m = (rows + 0.5) * res
    orig_c, orig_s = float(map_data.orig_c), float(map_data.orig_s)
    orig_x, orig_y = float(map_data.orig_x), float(map_data.orig_y)
    xs_w = xs_m * orig_c - ys_m * orig_s + orig_x
    ys_w = xs_m * orig_s + ys_m * orig_c + orig_y
    candidates = jnp.asarray(np.stack([xs_w, ys_w], axis=1), dtype=map_data.dt.dtype)

    def sample(key: jax.Array, shape: Tuple[int, ...]) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        n = int(np.prod(shape)) if shape else 1
        idx = jax.random.randint(k1, (n,), 0, candidates.shape[0])
        xy = candidates[idx]
        theta = jax.random.uniform(k2, (n, 1), dtype=xy.dtype,
                                   minval=0.0, maxval=2.0 * np.pi)
        return jnp.concatenate([xy, theta], axis=1).reshape(*shape, 3)

    return sample


def make_autoreset_step(
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep,
    pose_sampler: Optional[Callable] = None,
    reset_poses: Optional[jnp.ndarray] = None,
):
    """Build ``step(states, actions) -> (states', obs, reward, done, info)``
    where done envs are re-initialized in-graph.

    Exactly one of pose_sampler / reset_poses (E, A, 3) must be given.
    The returned obs is the pre-reset (terminal) obs, RL convention.
    """
    if (pose_sampler is None) == (reset_poses is None):
        raise ValueError("pass exactly one of pose_sampler / reset_poses")

    def step(states: SimState, actions: jnp.ndarray):
        states, obs, reward, done, info = batch_step(
            states, actions, params, map_data, tables, cfg, timestep
        )

        def reset_fn(state: SimState, fixed_poses) -> SimState:
            key, sub = jax.random.split(state.key)
            if pose_sampler is not None:
                poses = pose_sampler(sub, (cfg.num_agents,))
            else:
                poses = fixed_poses
            return init_state(poses, key, cfg)

        if reset_poses is not None:
            fresh = jax.vmap(reset_fn)(states, reset_poses)
        else:
            fresh = jax.vmap(lambda s: reset_fn(s, None))(states)

        def select(new, cur):
            d = done.reshape(done.shape + (1,) * (cur.ndim - 1))
            return jnp.where(d, new, cur)

        states = jax.tree.map(select, fresh, states)
        return states, obs, reward, done, info

    return step
