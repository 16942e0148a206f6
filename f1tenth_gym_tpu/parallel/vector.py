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

    grouped=True spawns agents 1..A-1 on a start grid around agent 0 (the
    reference's convention — cars start adjacent but never overlapping,
    examples/waypoint_follow.py:281): an ORIENTED RING of 16 slots
    (4 corridor-aligned line rotations x offsets +-0.9 / +-1.8 m) whose
    geometry makes every pair of distinct slots >= 0.688 m apart, so any
    number of agents spawn mutually non-colliding (0.58 m cars). Agents
    take consecutive valid slots, so the guarantee degrades only in
    isolated pockets with fewer than num_agents-1 free slots: there the
    slot index wraps and agents can overlap (as the reference would with
    an infeasible grid).

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
    if align_theta or grouped:
        # corridor tangent: perpendicular to the EDT gradient, world frame
        gy, gx = np.gradient(dt)
        gxc, gyc = gx[rows, cols], gy[rows, cols]
        gxw = gxc * orig_c - gyc * orig_s
        gyw = gxc * orig_s + gyc * orig_c
        tangents = np.arctan2(gxw, -gyw)  # grad rotated by -90 deg
    slot_xy = None
    slot_counts = None
    if grouped:
        # start-grid slot table: an ORIENTED RING of 16 positions per
        # candidate cell — 4 line rotations (tangent + 0/45/90/135 deg),
        # each with offsets +-0.9 / +-1.8 m, ordered near-to-far with the
        # along-tangent slots first. Geometry guarantees every PAIR of
        # distinct slots is >= 2*0.9*sin(22.5 deg) = 0.688 m apart (same
        # line: >= 0.9 m), i.e. mutually non-colliding for 0.58 m cars at
        # ANY agent count — unlike the old 15-degree ring, whose adjacent
        # probes sat 0.23 m apart. Validity is checked against the FULL
        # free-space raster (clearance + component mask), not the
        # possibly-subsampled candidate set — probing the candidate raster
        # starved the counts whenever max_candidates kicked in. Slot
        # coordinates are the exact (unrounded) offsets, so the pairwise
        # bound is exact.
        k_off = np.array([1, -1] * 4 + [2, -2] * 4, np.float64)
        rot = np.array([0.0, 0.0, 0.25, 0.25, 0.5, 0.5, 0.75, 0.75] * 2,
                       np.float64) * np.pi
        ang = tangents[:, None] + rot[None, :]   # (n, 16) world-frame
        dxw = 0.9 * k_off[None, :] * np.cos(ang)
        dyw = 0.9 * k_off[None, :] * np.sin(ang)
        # probe cells in the map frame (rotate back by the origin rotation)
        dxm = dxw * orig_c + dyw * orig_s
        dym = -dxw * orig_s + dyw * orig_c
        pc = (cols + 0.5)[:, None] + dxm / res
        pr = (rows + 0.5)[:, None] + dym / res
        inb = ((pr >= 0) & (pr < dt.shape[0])
               & (pc >= 0) & (pc < dt.shape[1]))
        rr = np.clip(pr.astype(np.int64), 0, dt.shape[0] - 1)
        cc = np.clip(pc.astype(np.int64), 0, dt.shape[1] - 1)
        valid = inb & free[rr, cc]
        counts = valid.sum(1)
        order = np.argsort(~valid, axis=1, kind="stable")  # valid first
        sx = xs_w[:, None] + np.take_along_axis(dxw, order, 1)
        sy = ys_w[:, None] + np.take_along_axis(dyw, order, 1)
        # isolated pocket (no free slot at all): spawn on the cell itself —
        # overlapping start, same as the reference would with a bad grid
        none = counts == 0
        sx[none] = xs_w[none, None]
        sy[none] = ys_w[none, None]
        slot_xy = jnp.asarray(np.stack([sx, sy], -1),
                              dtype=map_data.dt.dtype)  # (n, 16, 2)
        slot_counts = jnp.asarray(counts.astype(np.int32))
    candidates = jnp.asarray(np.stack([xs_w, ys_w], axis=1), dtype=map_data.dt.dtype)
    if tangents is not None:
        tangents = jnp.asarray(tangents, dtype=map_data.dt.dtype)

    def sample(key: jax.Array, shape: Tuple[int, ...]) -> jnp.ndarray:
        k1, k2, k3 = jax.random.split(key, 3)
        n = int(np.prod(shape)) if shape else 1
        idx = jax.random.randint(k1, (n,), 0, candidates.shape[0])
        grp_xy = None
        if grouped and len(shape) >= 1 and shape[-1] > 1:
            # agents 1..a-1 take CONSECUTIVE slots of agent 0's start-grid
            # ring from a random in-bounds shift: distinct slots, hence
            # pairwise >= 0.688 m, whenever the cell has >= a-1 valid slots
            # (the modulo only wraps — and can overlap — in starved
            # pockets). The shift is bounded to the 8 nearest slots so
            # pairs keep the reference's adjacent-grid spacing (0.9-1.8 m)
            a = shape[-1]
            idx = idx.reshape(-1, a)
            cnt = slot_counts[idx[:, 0]]
            max_shift = jnp.maximum(jnp.minimum(cnt, 8) - (a - 2), 1)
            shift = jax.random.randint(k3, (idx.shape[0],), 0, 1 << 30)
            shift = shift % max_shift
            slots = (shift[:, None] + jnp.arange(a - 1)[None, :]) % jnp.maximum(
                cnt, 1)[:, None]
            grp_xy = slot_xy[idx[:, :1], slots]  # (groups, a-1, 2)
            idx = idx.reshape(-1)
        xy = candidates[idx]
        if grp_xy is not None:
            xy = xy.reshape(-1, a, 2).at[:, 1:].set(grp_xy).reshape(-1, 2)
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


def tile_snake_key(x, y, tile_size: float, origin=(0.0, 0.0)):
    """Boustrophedon (snake) tile-order sort key for env positions.

    The ONE definition of the locality key used by sort_envs_for_locality
    and the culling tools (tools/culling_stats.py, tools/kernel_phases.py)
    — keep them keyed identically or the tools measure a different
    workload distribution than the bench runs. Works on jnp and np arrays
    (pure jnp ops). Primary: snake order over culling tiles; secondary:
    snaked tile QUADRANT, so half-tile program fragments pack into one
    corner and spill into the adjacent quadrant.
    """
    tx = (x - origin[0]) / tile_size
    ty = (y - origin[1]) / tile_size
    ti = jnp.floor(tx)
    tj = jnp.floor(ty)
    snake = jnp.where(jnp.mod(tj, 2.0) == 0.0, ti, 4095.0 - ti)
    fx = jnp.floor((tx - ti) * 2.0)
    fy = jnp.floor((ty - tj) * 2.0)
    fxs = jnp.where(jnp.mod(fy, 2.0) == 0.0, fx, 1.0 - fx)
    return (tj * 4096.0 + snake) * 4.0 + fy * 2.0 + fxs


@partial(jax.jit, static_argnums=(1, 2))
def sort_envs_for_locality(states: SimState, tile_size: float = None,
                           origin: Tuple[float, float] = (0.0, 0.0)) -> SimState:
    """Reorder the env batch so spatially-near envs are batch-adjacent.

    Envs are independent, so this is a pure relabeling (no inverse needed).
    It keeps the Pallas scan engine's 16-scan programs tile-homogeneous so
    per-tile culled tables apply (ops/culling.py). Staleness is harmless —
    a drifted order only costs speed, never correctness — so call this
    every few dozen steps, not every step.

    CAUTION: relabeling is only safe when nothing outside the state is
    positionally tied to env order. In particular, do NOT combine it with
    ``make_autoreset_step(reset_poses=...)`` — those fixed poses stay in
    the ORIGINAL batch order, so a relabeled env would reset to another
    env's start pose. Use ``reset_to_start`` (start poses live inside the
    state and move with it) or a ``pose_sampler`` instead.

    With ``tile_size``/``origin`` (pass the map's culling grid: tile_size =
    1/tile_meta[2], origin = tile_meta[0:2]), envs are keyed DIRECTLY on
    their culling-tile index in boustrophedon (snake) tile order —
    consecutive envs share a tile, and envs spilling across a program
    boundary land in a grid-adjacent tile, which the multi-window tables
    still cover. The env position is the midpoint of its agents (minimizes
    a program's tile spread for grouped starts). Without tile_size, a
    map-agnostic 6 m / 1.5 m square-block key is used.
    """
    if tile_size is None:
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
    else:
        mx = states.x[:, :, 0].mean(axis=1)
        my = states.x[:, :, 1].mean(axis=1)
        key = tile_snake_key(mx, my, tile_size, origin)
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

    reset_poses is positional: env i always resets to reset_poses[i]. Do
    NOT combine it with ``sort_envs_for_locality`` (which relabels envs);
    use reset_to_start or a pose_sampler with sorted batches.

    The returned ``step`` is jitted with the MAP AS AN ARGUMENT, not a
    closure: closed-over arrays are embedded into the lowered program as
    constants, and a map's culling tables can run to hundreds of MB on
    multi-track worlds — bloating the executable (and, on remote-compile
    backends, the compile request) by that much. Callers composing their
    own jit AROUND this step must keep that property: close over
    ``step.impl`` and pass ``map_data`` through their jit's own arguments
    (see examples/domain_randomization.py), otherwise the outer trace
    re-embeds the map.
    """
    n_modes = sum([pose_sampler is not None, reset_poses is not None,
                   bool(reset_to_start)])
    if n_modes != 1:
        raise ValueError(
            "pass exactly one of pose_sampler / reset_poses / reset_to_start")

    def step_impl(states: SimState, actions: jnp.ndarray, map_data: MapData):
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

    jstep = jax.jit(step_impl)

    def step(states: SimState, actions: jnp.ndarray):
        return jstep(states, actions, map_data)

    step.impl = step_impl      # compose under an outer jit: map as an ARG
    step.map_data = map_data
    return step
