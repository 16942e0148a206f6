"""Standalone ScanSimulator2D: reference-compatible scan-simulator object.

The reference exposes ``ScanSimulator2D`` (laser_models.py:348-454) as a
user-facing class (see its unittest/scan_sim.py and docs); users switching
from the reference get the same surface here: construct with beam count and
fov, ``set_map(path, ext)``, then ``scan(pose, rng)`` one pose at a time —
plus batched extras the reference cannot do (``scan_batch`` over any pose
batch, engine selection, device-resident outputs).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu.config import (
    DEFAULT_EPS,
    DEFAULT_FOV,
    DEFAULT_MAX_RANGE,
    DEFAULT_SCAN_STD,
)
from f1tenth_gym_tpu.ops.lidar import get_scan, make_scan_tables
from f1tenth_gym_tpu.utils.map_loader import load_map


class ScanSimulator2D:
    """2D LiDAR simulator over a ROS-style occupancy map.

    Args (defaults mirror laser_models.py:360-381):
        num_beams, fov, eps, theta_dis, max_range, std_dev, engine
    engine: 'march' (distance-field marching, bit-compatible with the
    reference), 'segments' (XLA ray/polygon), or 'pallas' (Mosaic kernel,
    fastest on TPU). tile_culling=True builds the exact per-tile
    visibility tables for the pallas engine (ops/culling.py) — worthwhile
    for large scan batches of spatially-clustered poses.
    """

    def __init__(
        self,
        num_beams: int = 1080,
        fov: float = DEFAULT_FOV,
        eps: float = DEFAULT_EPS,
        theta_dis: int = 2000,
        max_range: float = DEFAULT_MAX_RANGE,
        std_dev: float = DEFAULT_SCAN_STD,
        engine: str = "march",
        dtype=jnp.float32,
        tile_culling: bool = False,
    ):
        self.num_beams = int(num_beams)
        self.fov = float(fov)
        self.eps = float(eps)
        self.theta_dis = int(theta_dis)
        self.max_range = float(max_range)
        self.std_dev = float(std_dev)
        self.engine = engine
        self.dtype = dtype
        self.tile_culling = bool(tile_culling)
        self.tables = make_scan_tables(
            num_beams=self.num_beams, fov=self.fov, theta_dis=self.theta_dis,
            max_range=self.max_range, eps=self.eps, scan_std=self.std_dev,
            dtype=dtype,
        )
        self.map_data = None
        self._scan_fn = None

    # -- reference API ------------------------------------------------------

    def set_map(self, map_path: str, map_ext: str = ".png") -> bool:
        """Load a map yaml/image pair (laser_models.py:383-427 semantics)."""
        return self.set_map_data(load_map(
            map_path, map_ext, dtype=self.dtype,
            extract_segments=(self.engine in ("segments", "pallas")),
            tile_culling=(self.tile_culling and self.engine == "pallas"),
            max_range=self.max_range,
        ))

    def set_map_data(self, map_data) -> bool:
        """Use an already-built MapData (e.g. from tracks.synthetic)."""
        self.map_data = map_data
        self._scan_fn = jax.jit(self._scan_batch_impl)
        return True

    def scan(self, pose, rng: Optional[np.random.Generator] = None):
        """Single pose (3,) -> (num_beams,) numpy ranges (+ optional noise).

        Noise uses a NumPy Generator exactly like the reference
        (laser_models.py:450-452) so fixed-seed sequences can be compared
        against it; for device-side noise use scan_batch with a PRNGKey.
        """
        if self.map_data is None:
            raise RuntimeError("call set_map() first")
        out = np.asarray(self._scan_fn(jnp.asarray(pose, self.dtype)[None]))[0]
        if rng is not None:
            out = out + rng.normal(0.0, self.std_dev, size=self.num_beams)
        return out

    def get_increment(self) -> float:
        return self.fov / (self.num_beams - 1)

    # -- batched extras -----------------------------------------------------

    def scan_batch(self, poses, key: Optional[jax.Array] = None):
        """(..., 3) poses -> (..., num_beams) device ranges; optional noisy
        via a JAX PRNGKey."""
        if self.map_data is None:
            raise RuntimeError("call set_map() first")
        out = self._scan_fn(jnp.asarray(poses, self.dtype))
        if key is not None:
            out = out + self.std_dev * jax.random.normal(
                key, out.shape, dtype=out.dtype)
        return out

    def _scan_batch_impl(self, poses):
        m = self.map_data
        if self.engine == "pallas":
            from f1tenth_gym_tpu.ops.pallas_scan import scan_pallas

            from f1tenth_gym_tpu.core.simulator import _elig_kwargs

            return scan_pallas(
                poses, m.seg_table, self.tables, self.num_beams,
                self.theta_dis,
                interpret=(jax.default_backend() != "tpu"),
                tile_tables=m.tile_tables, tile_ngroups=m.tile_ngroups,
                tile_meta=m.tile_meta,
                tile_blockmap=m.tile_blockmap,
                tile_ext=m.tile_ext, **_elig_kwargs(m))
        if self.engine == "segments":
            from f1tenth_gym_tpu.ops.segments import get_scan_segments

            return get_scan_segments(
                poses, m.segments, self.tables, self.num_beams, self.theta_dis)
        return get_scan(poses, m, self.tables, self.num_beams, self.theta_dis)
