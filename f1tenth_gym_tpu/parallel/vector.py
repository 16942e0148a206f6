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
                         max_candidates: int = 65536,
                         component_seed: Optional[Tuple[float, float]] = None,
                         grouped: bool = False,
                         align_theta: bool = False):
    """Build an in-graph start-pose sampler from the map's free space.

    Host-side: collect cells whose obstacle distance exceeds ``clearance``;
    device-side: sample a candidate cell + uniform heading. Returns
    ``sample(key, shape) -> (*shape, 3)`` poses.

    component_seed: optional world-frame (x, y); restricts candidates to the
    connected free-space component containing it — e.g. the drivable track
    corridor rather than the unreachable field outside the outer wall
    (the reference only ever spawns on-track, f110_env.py:306).

    grouped=True samples all agents after the first 0.8-2.0 m from agent 0
    (the reference's start-grid convention — cars start adjacent but never
    overlapping, examples/waypoint_follow.py:281). Implemented with a
    precomputed KD-tree neighbor table over the candidate cells, so every
    agent lands on a valid free cell at a guaranteed non-colliding
    distance.

    align_theta=True points the spawn heading along the local corridor
    (perpendicular to the obstacle-distance gradient, random direction
    +-0.3 rad jitter) instead of uniform — cars start facing down the
    track like a real grid, not into the nearest wall.
    """
    dt = np.asarray(map_data.dt)
    res = float(map_data.resolution)
    free = dt > clearance
    orig_c, orig_s = float(map_data.orig_c), float(map_data.orig_s)
    orig_x, orig_y = float(map_data.orig_x), float(map_data.orig_y)
    if component_seed is not None:
        from scipy import ndimage

        sx, sy = component_seed
        # world -> map frame -> cell (inverse of the map origin transform)
        mx = (sx - orig_x) * orig_c + (sy - orig_y) * orig_s
        my = -(sx - orig_x) * orig_s + (sy - orig_y) * orig_c
        r0, c0 = int(my / res), int(mx / res)
        labels, _ = ndimage.label(free)
        if not (0 <= r0 < free.shape[0] and 0 <= c0 < free.shape[1]) or not free[r0, c0]:
            raise ValueError(f"component_seed {component_seed} is not free space")
        free = labels == labels[r0, c0]
    rows, cols = np.nonzero(free)
    if len(rows) == 0:
        raise ValueError("no free space with requested clearance")
    if len(rows) > max_candidates:
        sel = np.random.default_rng(0).choice(len(rows), max_candidates, replace=False)
        rows, cols = rows[sel], cols[sel]
    # cell centers, map frame -> world frame (inverse of ops/lidar.dt_lookup)
    xs_m = (cols + 0.5) * res
    ys_m = (rows + 0.5) * res
    xs_w = xs_m * orig_c - ys_m * orig_s + orig_x
    ys_w = xs_m * orig_s + ys_m * orig_c + orig_y
    tangents = None
    if align_theta:
        # corridor tangent: perpendicular to the EDT gradient, world frame
        gy, gx = np.gradient(dt)
        gxc, gyc = gx[rows, cols], gy[rows, cols]
        gxw = gxc * orig_c - gyc * orig_s
        gyw = gxc * orig_s + gyc * orig_c
        tangents = np.arctan2(gxw, -gyw)  # grad rotated by -90 deg
    neighbors = None
    if grouped:
        # ring neighbor table: for each candidate, up to 16 candidates at
        # 0.9-1.8 m — close enough to share a culling tile, far enough that
        # spawned rectangles (0.58 x 0.31 m) can never overlap. Probes 24
        # ring offsets against a cell -> candidate-index raster (vectorized;
        # in a corridor the along-track probes always land on free cells).
        index_raster = np.full(dt.shape, -1, np.int64)
        index_raster[rows, cols] = np.arange(len(rows))
        ang = np.linspace(0.0, 2.0 * np.pi, 24, endpoint=False)
        rad = (0.9 + 0.9 * (np.arange(24) % 3) / 2.0) / res  # 0.9/1.35/1.8 m
        dr = np.round(rad * np.sin(ang)).astype(np.int64)
        dc = np.round(rad * np.cos(ang)).astype(np.int64)
        rr = np.clip(rows[:, None] + dr[None], 0, dt.shape[0] - 1)
        cc = np.clip(cols[:, None] + dc[None], 0, dt.shape[1] - 1)
        cand = index_raster[rr, cc]  # (n, 24), -1 where not a candidate
        valid = cand >= 0
        counts = valid.sum(1)
        order = np.argsort(~valid, axis=1, kind="stable")  # valid first
        cand = np.take_along_axis(cand, order, 1)
        sel = np.arange(16)[None] % np.maximum(counts, 1)[:, None]
        nb = np.take_along_axis(cand, sel, 1)
        # isolated pocket (no free ring cell): spawn on the cell itself —
        # overlapping start, same as the reference would with a bad grid
        nb[counts == 0] = np.arange(len(rows))[counts == 0, None]
        neighbors = jnp.asarray(nb.astype(np.int32))
    candidates = jnp.asarray(np.stack([xs_w, ys_w], axis=1), dtype=map_data.dt.dtype)
    if tangents is not None:
        tangents = jnp.asarray(tangents, dtype=map_data.dt.dtype)

    def sample(key: jax.Array, shape: Tuple[int, ...]) -> jnp.ndarray:
        k1, k2, k3 = jax.random.split(key, 3)
        n = int(np.prod(shape)) if shape else 1
        idx = jax.random.randint(k1, (n,), 0, candidates.shape[0])
        if grouped and len(shape) >= 1 and shape[-1] > 1:
            # agents > 0 of each group spawn on a neighbor of agent 0's cell
            a = shape[-1]
            idx = idx.reshape(-1, a)
            pick = jax.random.randint(k3, idx.shape, 0, neighbors.shape[1])
            idx = idx.at[:, 1:].set(neighbors[idx[:, :1], pick[:, 1:]])
            idx = idx.reshape(-1)
        xy = candidates[idx]
        if align_theta:
            flip = jax.random.bernoulli(k2, 0.5, (n,))
            jit_k = jax.random.fold_in(k2, 1)
            jitter = jax.random.uniform(jit_k, (n,), dtype=xy.dtype,
                                        minval=-0.3, maxval=0.3)
            theta = tangents[idx] + jnp.where(flip, np.pi, 0.0) + jitter
            if grouped and len(shape) >= 1 and shape[-1] > 1:
                # one racing direction per group: agents copy agent 0's
                # heading (the tangent itself flips sign across the
                # corridor centerline, so per-agent tangents won't do)
                a = shape[-1]
                theta = theta.reshape(-1, a)
                theta = jnp.broadcast_to(theta[:, :1], theta.shape).reshape(-1)
            theta = jnp.mod(theta, 2.0 * np.pi)[:, None]
        else:
            theta = jax.random.uniform(k2, (n, 1), dtype=xy.dtype,
                                       minval=0.0, maxval=2.0 * np.pi)
        return jnp.concatenate([xy, theta], axis=1).reshape(*shape, 3)

    return sample


@jax.jit
def sort_envs_for_locality(states: SimState) -> SimState:
    """Reorder the env batch so spatially-near envs are batch-adjacent.

    Envs are independent, so this is a pure relabeling (no inverse needed).
    It keeps the Pallas scan engine's 16-scan programs tile-homogeneous so
    per-tile culled tables apply (ops/culling.py). Staleness is harmless —
    a drifted order only costs speed, never correctness — so call this
    every few dozen steps, not every step.
    """
    x = states.x[:, 0, 0]
    y = states.x[:, 0, 1]
    # SQUARE hierarchical blocks (6 m primary, 1.5 m secondary), not thin
    # y-bands: on sparse worlds (e.g. multi-track grids) a thin band spans
    # many far-apart regions and every kernel program straddles them
    by = jnp.floor(y / 6.0)
    bx = jnp.floor(x / 6.0)
    fy = jnp.mod(jnp.floor(y / 1.5), 4.0)
    fx = jnp.mod(jnp.floor(x / 1.5), 4.0)
    key = ((by * 4096.0 + bx) * 4.0 + fy) * 4.0 + fx
    order = jnp.argsort(key)
    return jax.tree.map(lambda l: jnp.take(l, order, axis=0), states)


def make_autoreset_step(
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep,
    pose_sampler: Optional[Callable] = None,
    reset_poses: Optional[jnp.ndarray] = None,
    reset_to_start: bool = False,
):
    """Build ``step(states, actions) -> (states', obs, reward, done, info)``
    where done envs are re-initialized in-graph.

    Exactly one of pose_sampler / reset_poses (E, A, 3) / reset_to_start
    must be given. reset_to_start returns each done env to its OWN start
    grid (carried in the state, so it survives batch reorderings) — the
    reference's reset semantics (f110_env.py:306 resets to given poses).
    The returned obs is the pre-reset (terminal) obs, RL convention.
    """
    n_modes = sum([pose_sampler is not None, reset_poses is not None,
                   bool(reset_to_start)])
    if n_modes != 1:
        raise ValueError(
            "pass exactly one of pose_sampler / reset_poses / reset_to_start")

    def step(states: SimState, actions: jnp.ndarray):
        states, obs, reward, done, info = batch_step(
            states, actions, params, map_data, tables, cfg, timestep
        )

        def reset_fn(state: SimState, fixed_poses) -> SimState:
            key, sub = jax.random.split(state.key)
            if reset_to_start:
                poses = jnp.stack(
                    [state.start_xs, state.start_ys, state.start_thetas], -1)
            elif pose_sampler is not None:
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
