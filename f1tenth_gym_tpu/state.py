"""Core pytree containers for the TPU-native simulator.

The reference's object graph (F110Env -> Simulator -> RaceCar -> singleton
ScanSimulator2D, see base_classes.py:45,451 and laser_models.py:348) collapses
into three kinds of data:

* static per-map arrays (``MapData``) — distance transform raster + origin,
* static per-config tables (``ScanTables``) — trig LUTs and beam geometry,
* the dynamic simulation state (``SimState``) — one pytree with a leading
  agent axis, trivially vmappable over an env axis and shardable over a
  device mesh.

Everything is a ``flax.struct`` dataclass, so states are first-class JAX
values: they flow through ``jit``/``vmap``/``lax.scan``, serialize with
orbax, and checkpoint/resume for free (the reference has no checkpointing at
all — SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from f1tenth_gym_tpu.config import DEFAULT_PARAMS

# State vector layout (reference: base_classes.py:97 comment)
#   [x, y, steer_angle, vel, yaw_angle, yaw_rate, slip_angle]
IX_X = 0
IX_Y = 1
IX_STEER = 2
IX_VEL = 3
IX_YAW = 4
IX_YAW_RATE = 5
IX_SLIP = 6
STATE_DIM = 7


@struct.dataclass
class VehicleParams:
    """Vehicle physical parameters.

    Mirrors the 18-key dict of the reference (f110_env.py:130). Each leaf is
    either a scalar or an ``(A,)`` array, so per-agent heterogeneous params
    (reference base_classes.py:514-534) are just array leaves. All leaves are
    dynamic: ``update_params`` never recompiles.
    """

    mu: jnp.ndarray
    C_Sf: jnp.ndarray
    C_Sr: jnp.ndarray
    lf: jnp.ndarray
    lr: jnp.ndarray
    h: jnp.ndarray
    m: jnp.ndarray
    I: jnp.ndarray
    s_min: jnp.ndarray
    s_max: jnp.ndarray
    sv_min: jnp.ndarray
    sv_max: jnp.ndarray
    v_switch: jnp.ndarray
    a_max: jnp.ndarray
    v_min: jnp.ndarray
    v_max: jnp.ndarray
    width: jnp.ndarray
    length: jnp.ndarray

    @classmethod
    def create(cls, params: Optional[Dict[str, Any]] = None, dtype=jnp.float32) -> "VehicleParams":
        d = dict(DEFAULT_PARAMS)
        if params:
            d.update(params)
        return cls(**{k: jnp.asarray(d[k], dtype=dtype) for k in DEFAULT_PARAMS})

    def replace_params(self, params: Dict[str, Any], agent_idx: int = -1) -> "VehicleParams":
        """Update params; if agent_idx >= 0 only that agent's entry.

        For per-agent updates, scalar leaves are broadcast to ``(A,)`` lazily
        by indexing semantics of the caller; here we only support updating
        leaves that are already ``(A,)`` or scalars updated globally.
        """
        updates = {}
        for k, v in params.items():
            cur = getattr(self, k)
            if agent_idx < 0:
                updates[k] = jnp.broadcast_to(
                    jnp.asarray(v, dtype=cur.dtype), cur.shape
                )
            else:
                if cur.ndim == 0:
                    raise ValueError(
                        f"Per-agent update of scalar param '{k}': create VehicleParams "
                        f"with (A,)-shaped leaves first (pass arrays to create())."
                    )
                updates[k] = cur.at[agent_idx].set(jnp.asarray(v, dtype=cur.dtype))
        return self.replace(**updates)


@struct.dataclass
class MapData:
    """Occupancy map + Euclidean distance transform, HBM resident.

    Produced once per map by host-side preprocessing (the analogue of
    ScanSimulator2D.set_map, laser_models.py:383-427).
    """

    dt: jnp.ndarray          # (H, W) distance-to-obstacle in meters
    orig_x: jnp.ndarray      # scalar
    orig_y: jnp.ndarray      # scalar
    orig_c: jnp.ndarray      # cos(origin theta)
    orig_s: jnp.ndarray      # sin(origin theta)
    resolution: jnp.ndarray  # scalar, m/cell
    # (K, 4) wall segments for the gather-free segment scan engine
    # (ops/segments.py); None when only the marching engine is used
    segments: Optional[jnp.ndarray] = None
    # (K, 8) precomputed kernel table for the Pallas scan engine
    # (ops/pallas_scan.py); built alongside `segments`
    seg_table: Optional[jnp.ndarray] = None
    # exact per-tile segment-visibility culling for the Pallas engine
    # (ops/culling.py multi-window pack, v9): tile_tables is
    # (n_blocks, Kmax, 8) deduped window blocks; tile_blockmap
    # (4*n_tiles,) i32 sends window (tier, lower-left tile) -> block
    # (tiers stacked [2x2 | 1x1 | 4x4 | 8x8]; -1 = full-table sentinel);
    # tile_ext (n_blocks, 64) i32 carries the v9 per-member-tile extras
    # ranges (packed start*256 + count, group units) of SPLIT blocks.
    # The FULL fallback table is NOT here (the kernel carries seg_table
    # as its own input). tile_ngroups is (n_blocks + 1,) with [0] =
    # full-set group count; tile_meta is (6,)
    # [x0, y0, 1/tile_size, nx, ny, max_covered_spread]
    tile_tables: Optional[jnp.ndarray] = None
    tile_ngroups: Optional[jnp.ndarray] = None
    tile_meta: Optional[jnp.ndarray] = None
    tile_blockmap: Optional[jnp.ndarray] = None
    tile_ext: Optional[jnp.ndarray] = None
    # (H, W) uint8 runtime-eligibility raster for EROSION-FUSED culling
    # packs (ops/culling.py erosion_refine): scans whose origin cell is 0
    # here (wrong free component / within ~2.5 cells of a wall / off-map)
    # fall back to the full segment table inside scan_pallas, which keeps
    # culled scans bit-identical to the full sweep for EVERY pose. Shares
    # the map raster grid (orig_x/orig_y/resolution). None for plain packs.
    cull_eligible: Optional[jnp.ndarray] = None

    @property
    def height(self) -> int:
        return self.dt.shape[0]

    @property
    def width(self) -> int:
        return self.dt.shape[1]


@struct.dataclass
class ScanTables:
    """Precomputed LiDAR geometry.

    Mirrors ScanSimulator2D's trig LUTs (laser_models.py:378-381) and
    RaceCar's class-level beam tables (base_classes.py:125-158).
    """

    sines: jnp.ndarray            # (theta_dis,)
    cosines: jnp.ndarray          # (theta_dis,)
    scan_angles: jnp.ndarray      # (num_beams,) beam angle in body frame
    beam_cosines: jnp.ndarray     # (num_beams,) cos(scan_angles) for iTTC
    side_distances: jnp.ndarray   # (num_beams,) lidar-to-body-edge distance
    fov: jnp.ndarray              # scalar
    theta_index_increment: jnp.ndarray  # scalar
    max_range: jnp.ndarray        # scalar
    eps: jnp.ndarray              # scalar marching termination
    scan_std: jnp.ndarray         # scalar noise std
    ttc_thresh: jnp.ndarray       # scalar iTTC threshold
    lidar_dist: jnp.ndarray       # scalar lidar mount offset (base_classes.py:407-410)


@struct.dataclass
class SimState:
    """Dynamic state of one environment instance (all agents).

    Leading axis A = num_agents on per-agent leaves. Batched envs are
    ``jax.vmap`` over a leading E axis of this same pytree.
    """

    # physics
    x: jnp.ndarray            # (A, 7) vehicle states
    steer_buf: jnp.ndarray    # (A, 2) steering delay FIFO (base_classes.py:270-278)
    collisions: jnp.ndarray   # (A,) float 0/1
    collision_idx: jnp.ndarray  # (A,) float, -1 when not colliding
    # scans of the *current* step (post agent-raycast), kept for obs
    scans: jnp.ndarray        # (A, num_beams)
    # lap / race bookkeeping (reference f110_env.py:173-189)
    lap_times: jnp.ndarray    # (A,)
    lap_counts: jnp.ndarray   # (A,)
    toggle_list: jnp.ndarray  # (A,)
    near_starts: jnp.ndarray  # (A,) bool
    start_xs: jnp.ndarray     # (A,)
    start_ys: jnp.ndarray     # (A,)
    start_thetas: jnp.ndarray  # (A,)
    start_rot: jnp.ndarray    # (2, 2)
    current_time: jnp.ndarray  # scalar
    # rng
    key: jnp.ndarray          # PRNGKey
    steps: jnp.ndarray        # scalar int32 step counter

    @property
    def num_agents(self) -> int:
        return self.x.shape[-2]

    @property
    def poses(self) -> jnp.ndarray:
        """(A, 3) [x, y, yaw] poses."""
        return jnp.stack(
            [self.x[..., IX_X], self.x[..., IX_Y], self.x[..., IX_YAW]], axis=-1
        )
