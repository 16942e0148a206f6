"""The fused, pure simulation step.

This is the TPU replacement for ``Simulator.step`` (base_classes.py:553-612)
plus ``RaceCar.update_pose``/``update_scan`` (base_classes.py:256-449): the
reference's per-agent Python loop with 3 hot Numba loops becomes ONE pure
function ``sim_step(state, actions, ...) -> (state', obs)`` traced once by
XLA, vmappable over an env axis and shardable over a device mesh.

Per-step semantics preserved exactly (SURVEY.md §3.2):
  1. steering-delay FIFO pop/push        (base_classes.py:270-278)
  2. PID speed/steer -> accel/steer-vel  (dynamic_models.py:178-221)
  3. RK4 or Euler integration of the single-track model
                                         (base_classes.py:284-395)
  4. yaw wrap into [0, 2pi) by a single +-2pi correction
                                         (base_classes.py:400-404)
  5. LiDAR scan at the new pose (+ lidar mount offset, + Gaussian noise)
                                         (base_classes.py:407-410)
  6. all-pairs agent-agent collision     (base_classes.py:536-550)
  7. per-agent iTTC vs environment, zeroing state[3:] on hit
                                         (base_classes.py:229-254)
  8. opponent rectangles ray-cast into each scan
                                         (base_classes.py:206-227)
  9. observation dict                    (base_classes.py:594-611)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu.config import (
    INTEGRATOR_EULER,
    INTEGRATOR_RK4,
    MODEL_KS,
    MODEL_ST,
    SimConfig,
)
from f1tenth_gym_tpu.ops import collision as col_ops
from f1tenth_gym_tpu.ops import dynamics as dyn_ops
from f1tenth_gym_tpu.ops import lidar as lidar_ops
from f1tenth_gym_tpu.state import (
    IX_VEL,
    IX_X,
    IX_Y,
    IX_YAW,
    MapData,
    ScanTables,
    SimState,
    VehicleParams,
)

TWO_PI = 2.0 * np.pi


def _dyn_fn(cfg: SimConfig):
    if cfg.model == MODEL_ST:
        return dyn_ops.vehicle_dynamics_st
    if cfg.model == MODEL_KS:
        return dyn_ops.vehicle_dynamics_ks7
    raise ValueError(f"unknown model '{cfg.model}'")


def physics_step(
    x: jnp.ndarray,
    steer_buf: jnp.ndarray,
    actions: jnp.ndarray,
    params: VehicleParams,
    timestep,
    cfg: SimConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Advance all agents' vehicle states one tick.

    x: (A, 7); steer_buf: (A, 2); actions: (A, 2) [steer, speed].
    Returns (x', steer_buf').
    """
    raw_steer = actions[..., 0]
    vel_cmd = actions[..., 1]

    # 2-deep steering delay FIFO. The reference starts with an *empty* buffer
    # and yields steer=0 for the first two steps; a zero-initialized (A, 2)
    # buffer where we always read slot 1 then shift reproduces that exactly.
    steer = steer_buf[..., 1]
    steer_buf = jnp.stack([raw_steer, steer_buf[..., 0]], axis=-1)

    accl, sv = dyn_ops.pid(
        vel_cmd,
        steer,
        x[..., IX_VEL],
        x[..., 2],
        params.sv_max,
        params.a_max,
        params.v_max,
        params.v_min,
    )
    u = jnp.stack([sv, accl], axis=-1)

    dyn = _dyn_fn(cfg)
    if cfg.integrator == INTEGRATOR_RK4:
        x_new = dyn_ops.rk4_step(x, u, params, timestep, dyn_fn=dyn)
    elif cfg.integrator == INTEGRATOR_EULER:
        x_new = dyn_ops.euler_step(x, u, params, timestep, dyn_fn=dyn)
    else:
        raise ValueError(f"unknown integrator '{cfg.integrator}'")

    # single +-2pi yaw correction (base_classes.py:400-404)
    yaw = x_new[..., IX_YAW]
    yaw = jnp.where(yaw > TWO_PI, yaw - TWO_PI, jnp.where(yaw < 0.0, yaw + TWO_PI, yaw))
    x_new = x_new.at[..., IX_YAW].set(yaw)
    return x_new, steer_buf




def _elig_kwargs(map_data: MapData) -> dict:
    """Runtime-eligibility kwargs for erosion-gated culling packs.

    The gather grid is the map raster itself (ops/culling.py stores the
    eligibility mask on the same (H, W) grid as the bitmap)."""
    if map_data.cull_eligible is None:
        return {}
    return dict(
        elig_raster=map_data.cull_eligible,
        elig_meta=jnp.stack([map_data.orig_x, map_data.orig_y,
                             map_data.resolution]).astype(jnp.float32),
    )


def sim_step(
    state: SimState,
    actions: jnp.ndarray,
    params: VehicleParams,
    map_data: MapData,
    tables: ScanTables,
    cfg: SimConfig,
    timestep,
) -> Tuple[SimState, Dict[str, jnp.ndarray]]:
    """One lockstep tick of all agents of one env. actions: (A, 2)."""
    # --- 1-4: physics
    x_new, steer_buf = physics_step(
        state.x, state.steer_buf, actions, params, timestep, cfg
    )

    # --- 5: scans at new poses (lidar mounted lidar_dist ahead of backshaft)
    yaw = x_new[..., IX_YAW]
    scan_pose = jnp.stack(
        [
            x_new[..., IX_X] + tables.lidar_dist * jnp.cos(yaw),
            x_new[..., IX_Y] + tables.lidar_dist * jnp.sin(yaw),
            yaw,
        ],
        axis=-1,
    )  # (A, 3)
    engine = cfg.scan_engine
    if engine == "auto":
        # resolved at trace time: the fast kernel on TPU when the map has a
        # segment table, else the bit-exact reference marching engine
        engine = (
            "pallas"
            if jax.default_backend() == "tpu" and map_data.seg_table is not None
            else "march"
        )
    # (A round-3 "fused extras" variant — noise + iTTC in the scan kernel's
    # out phase, opponents in a second kernel — was measured a net LOSS on
    # v5e and removed in round 5: the noise ARRAY operand re-added the HBM
    # traffic the fusion saved, and XLA runs the whole noise+iTTC+opponent
    # block faster than the overlay kernel once the closed-form windows and
    # angle-addition trig landed in ops/collision.py. The overlay kernel
    # survives in ops/pallas_scan.py as the tests' independent oracle for
    # that XLA path.)
    if engine == "pallas":
        if map_data.seg_table is None:
            raise ValueError(
                "scan_engine='pallas' needs MapData.seg_table — load the map "
                "with extract_segments=True"
            )
        from f1tenth_gym_tpu.ops.pallas_scan import scan_pallas_vmappable

        scans = scan_pallas_vmappable(
            scan_pose, map_data.seg_table, tables, cfg.num_beams,
            cfg.theta_dis, interpret=(jax.default_backend() != "tpu"),
            tile_tables=map_data.tile_tables,
            tile_ngroups=map_data.tile_ngroups,
            tile_meta=map_data.tile_meta,
            tile_blockmap=map_data.tile_blockmap,
            tile_ext=map_data.tile_ext,
            **_elig_kwargs(map_data),
        )  # (A, B)
    elif engine == "segments":
        if map_data.segments is None:
            raise ValueError(
                "scan_engine='segments' needs MapData.segments — load the map "
                "with extract_segments=True"
            )
        from f1tenth_gym_tpu.ops.segments import get_scan_segments

        scans = get_scan_segments(
            scan_pose, map_data.segments, tables, cfg.num_beams, cfg.theta_dis
        )  # (A, B)
    else:
        scans = lidar_ops.get_scan(
            scan_pose, map_data, tables, cfg.num_beams, cfg.theta_dis,
            max_iters=cfg.max_march_iters,
        )  # (A, B)

    key = state.key
    if cfg.scan_noise:
        noise_key = jax.random.fold_in(key, state.steps)
        if cfg.shared_agent_noise:
            # reference quirk: every car's rng has the same seed, so all
            # agents add the *same* noise vector each step
            noise = tables.scan_std * jax.random.normal(
                noise_key, (cfg.num_beams,), dtype=scans.dtype
            )
            scans = scans + noise[None, :]
        else:
            scans = lidar_ops.add_scan_noise(scans, noise_key, tables.scan_std)

    # --- 6: agent-agent collisions at new poses (pre-TTC-zeroing, matching
    # Simulator.step's ordering: check_collision runs before update_scan)
    poses_pre = jnp.stack([x_new[..., IX_X], x_new[..., IX_Y], yaw], axis=-1)
    vertices = col_ops.get_vertices(poses_pre, params.length, params.width)  # (A,4,2)
    collisions, collision_idx = col_ops.collision_multiple(vertices)

    # --- 7: iTTC vs environment on the pre-raycast scan; zero vel/yaw/
    # yaw-rate/slip on hit (the reference zeroes state[3:] wholesale,
    # base_classes.py:247 — including the yaw angle; preserved deliberately)
    ttc_hit = lidar_ops.check_ttc(scans, x_new[..., IX_VEL], tables)  # (A,)
    x_new = jnp.where(
        ttc_hit[..., None] & (jnp.arange(7) >= 3)[None, :],
        jnp.zeros_like(x_new),
        x_new,
    )
    collisions = jnp.maximum(collisions, ttc_hit.astype(collisions.dtype))

    # --- 8: ray cast opponents into each agent's scan. The reference's
    # update_scan runs AFTER check_ttc, so the *scanning* pose uses the
    # post-zeroing state (yaw=0 for a TTC-hit agent), while opponent poses
    # come from the cached pre-zeroing agent_poses array
    # (base_classes.py:574,579-585) — replicated exactly.
    A = cfg.num_agents
    if A > 1:
        poses_post = jnp.stack(
            [x_new[..., IX_X], x_new[..., IX_Y], x_new[..., IX_YAW]], axis=-1
        )
        # opponent indices for each agent: all j != i, ascending (matches
        # np.concatenate((poses[:i], poses[i+1:])))
        opp_idx = np.stack([np.delete(np.arange(A), i) for i in range(A)])  # (A, A-1)
        opp_vertices = vertices[opp_idx]  # (A, A-1, 4, 2)
        scans = jax.vmap(
            lambda p, sc, ov: col_ops.ray_cast_opponents(p, sc, ov, tables)
        )(poses_post, scans, opp_vertices)

    new_state = state.replace(
        x=x_new,
        steer_buf=steer_buf,
        collisions=collisions,
        collision_idx=collision_idx,
        scans=scans,
        steps=state.steps + 1,
    )

    obs = {
        "ego_idx": jnp.asarray(cfg.ego_idx, dtype=jnp.int32),
        "scans": scans,
        "poses_x": x_new[..., IX_X],
        "poses_y": x_new[..., IX_Y],
        "poses_theta": x_new[..., IX_YAW],
        "linear_vels_x": x_new[..., IX_VEL],
        "linear_vels_y": jnp.zeros_like(x_new[..., IX_VEL]),
        "ang_vels_z": x_new[..., 5],
        "collisions": collisions,
    }
    return new_state, obs
