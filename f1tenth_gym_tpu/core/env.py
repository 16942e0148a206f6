"""Functional environment layer: reset / step / lap bookkeeping / done logic.

The TPU analogue of ``F110Env`` (f110_env.py:53-418) minus rendering: pure
functions over the ``SimState`` pytree. The stateful, reference-compatible
class wrapper lives in ``f1tenth_gym_tpu/envs/gym_api.py``; RL-style batched
envs in ``f1tenth_gym_tpu/parallel``.

Semantics preserved:
  * reward == timestep, time accumulates per step (f110_env.py:294-295)
  * finish-line crossing detection: poses rotated into the ego start frame,
    a +-2 m band around the start line, toggle counting, 2 laps == 4 toggles
    (f110_env.py:204-246)
  * ``reset`` performs a zero-action step and returns its observation
    (f110_env.py:337-338)
  * per-reset reseeding of the scan-noise stream (base_classes.py:204)
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from f1tenth_gym_tpu.config import SimConfig
from f1tenth_gym_tpu.core.simulator import sim_step
from f1tenth_gym_tpu.state import (
    IX_X,
    IX_Y,
    IX_YAW,
    MapData,
    ScanTables,
    SimState,
    VehicleParams,
)


def init_state(poses: jnp.ndarray, key: jax.Array, cfg: SimConfig) -> SimState:
    """Fresh SimState with agents placed at ``poses`` (A, 3).

    Mirrors RaceCar.reset (base_classes.py:183-204) + F110Env.reset counter
    zeroing (f110_env.py:320-331).
    """
    dtype = cfg.jnp_dtype
    A = cfg.num_agents
    poses = jnp.asarray(poses, dtype=dtype)

    x = jnp.zeros((A, 7), dtype=dtype)
    x = x.at[:, IX_X].set(poses[:, 0])
    x = x.at[:, IX_Y].set(poses[:, 1])
    x = x.at[:, IX_YAW].set(poses[:, 2])

    ego_theta = poses[cfg.ego_idx, 2]
    c, s = jnp.cos(-ego_theta), jnp.sin(-ego_theta)
    start_rot = jnp.stack(
        [jnp.stack([c, -s]), jnp.stack([s, c])]
    )  # R(-theta_ego), f110_env.py:331

    return SimState(
        x=x,
        steer_buf=jnp.zeros((A, 2), dtype=dtype),
        collisions=jnp.zeros((A,), dtype=dtype),
        collision_idx=-jnp.ones((A,), dtype=dtype),
        scans=jnp.zeros((A, cfg.num_beams), dtype=dtype),
        lap_times=jnp.zeros((A,), dtype=dtype),
        lap_counts=jnp.zeros((A,), dtype=dtype),
        toggle_list=jnp.zeros((A,), dtype=dtype),
        near_starts=jnp.ones((A,), dtype=bool),
        start_xs=poses[:, 0],
        start_ys=poses[:, 1],
        start_thetas=poses[:, 2],
        start_rot=start_rot,
        current_time=jnp.zeros((), dtype=dtype),
        key=key,
        steps=jnp.zeros((), dtype=jnp.int32),
    )


def _update_laps(state: SimState, cfg: SimConfig) -> SimState:
    """Finish-line toggle bookkeeping (f110_env.py:204-243), vectorized."""
    left_t = 2.0
    right_t = 2.0

    dx = state.x[:, IX_X] - state.start_xs
    dy = state.x[:, IX_Y] - state.start_ys
    delta_pt = state.start_rot @ jnp.stack([dx, dy], axis=0)  # (2, A)
    temp_y = delta_pt[1, :]
    idx1 = temp_y > left_t
    idx2 = temp_y < -right_t
    temp_y = jnp.where(idx1, temp_y - left_t,
                       jnp.where(idx2, -right_t - temp_y, jnp.zeros_like(temp_y)))

    dist2 = delta_pt[0, :] ** 2 + temp_y ** 2
    closes = dist2 <= 0.1

    crossed = closes != state.near_starts
    toggle_list = state.toggle_list + crossed.astype(state.toggle_list.dtype)
    near_starts = closes

    lap_counts = jnp.floor(toggle_list / 2.0)
    lap_times = jnp.where(toggle_list < 4, state.current_time, state.lap_times)

    return state.replace(
        toggle_list=toggle_list,
        near_starts=near_starts,
        lap_counts=lap_counts,
        lap_times=lap_times,
    )


def env_step(
    state: SimState,
    actions: jnp.ndarray,
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep,
) -> Tuple[SimState, Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray, Dict]:
    """One env step. Returns (state', obs, reward, done, info)."""
    timestep = jnp.asarray(timestep, dtype=state.current_time.dtype)
    state, obs = sim_step(state, actions, params, map_data, tables, cfg, timestep)

    reward = timestep
    state = state.replace(current_time=state.current_time + timestep)
    state = _update_laps(state, cfg)

    obs["lap_times"] = state.lap_times
    obs["lap_counts"] = state.lap_counts

    finished = state.toggle_list >= 4
    done = (state.collisions[cfg.ego_idx] > 0.0) | jnp.all(finished)
    info = {"checkpoint_done": finished}
    return state, obs, reward, done, info


def env_reset(
    poses: jnp.ndarray,
    key: jax.Array,
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep,
) -> Tuple[SimState, Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray, Dict]:
    """Reset to given poses; performs the reference's zero-action first step."""
    state = init_state(poses, key, cfg)
    actions = jnp.zeros((cfg.num_agents, 2), dtype=cfg.jnp_dtype)
    return env_step(state, actions, params, map_data, tables, cfg, timestep)


def make_env_fns(
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep: float,
):
    """Convenience factory: jitted (reset_fn(poses, key), step_fn(state, actions)).

    params/map_data/tables/timestep are closed over as (donatable) constants;
    pass new ones by rebuilding, or use the raw functions for full control.
    """
    step = jax.jit(
        partial(
            env_step,
            params=params,
            map_data=map_data,
            tables=tables,
            cfg=cfg,
            timestep=timestep,
        )
    )
    reset = jax.jit(
        partial(
            env_reset,
            params=params,
            map_data=map_data,
            tables=tables,
            cfg=cfg,
            timestep=timestep,
        )
    )
    return reset, step
