"""Host-side map pipeline: ROS-style yaml + image -> device MapData.

Mirrors ScanSimulator2D.set_map (laser_models.py:383-427): open image, flip
top-bottom, binarize at 128, read resolution/origin from yaml, Euclidean
distance transform scaled by resolution. All of this is one-time host
preprocessing producing a single HBM-resident (H, W) raster + scalars.

The EDT uses the native C++ kernel when built (utils/edt.py), else scipy.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
import yaml
from PIL import Image

from f1tenth_gym_tpu.state import MapData
from f1tenth_gym_tpu.utils.edt import euclidean_distance_transform


def load_map_image(map_img_path: str) -> np.ndarray:
    """Image file -> binarized float64 occupancy bitmap (0 obstacle, 255 free)."""
    img = np.array(Image.open(map_img_path).transpose(Image.FLIP_TOP_BOTTOM))
    img = img.astype(np.float64)
    if img.ndim == 3:  # RGB(A) -> grayscale via first channel, matching PIL 'L' loads
        img = img[..., 0]
    bitmap = np.where(img <= 128.0, 0.0, 255.0)
    return bitmap


def load_map_yaml(map_path: str) -> Tuple[float, Tuple[float, float, float], str]:
    with open(map_path, "r") as f:
        meta = yaml.safe_load(f)
    resolution = float(meta["resolution"])
    origin = tuple(float(v) for v in meta["origin"])
    image = meta.get("image", None)
    return resolution, origin, image


def make_map_data(
    bitmap: np.ndarray,
    resolution: float,
    origin: Tuple[float, float, float],
    dtype=jnp.float32,
    extract_segments: bool = False,
    simplify_tol_cells: float = 1.5,
    tile_culling: bool = False,
    max_range: float = 30.0,
    culling_tile_size: float = 2.5,
    culling_neighborhood: int = 1,
    culling_split_cap: int = 0,
    culling_window_cap: int = None,
    culling_erosion: bool = True,
    culling_component_seed=None,
) -> MapData:
    """Occupancy bitmap (0 = obstacle) + metadata -> device MapData.

    extract_segments=True also traces the wall contours into (K, 4) line
    segments for the segment/Pallas scan engines (native C++ exact-boundary
    tracer when built, else cv2). The default 1.5-cell simplification
    tolerance collapses rasterization stair-steps (2621 -> 218 segments on
    the reference example map) at BETTER accuracy than the old cv2 path
    (measured MSE 0.057 vs 0.20 against marched scans).

    tile_culling=True additionally builds the exact per-tile
    segment-visibility tables (ops/culling.py, disk-cached) that let the
    Pallas engine sweep only segments provably visible from each scan's
    tile. max_range must match the ScanTables the engine runs with.
    """
    dt = resolution * euclidean_distance_transform(bitmap > 0)
    segments = None
    seg_table = None
    tile_tables = tile_ngroups = tile_meta = None
    tile_blockmap = tile_ext = cull_eligible = None
    if extract_segments:
        from f1tenth_gym_tpu.ops.pallas_scan import build_seg_table
        from f1tenth_gym_tpu.ops.segments import segments_from_map

        segments = segments_from_map(
            bitmap, resolution, origin, simplify_tol_cells, dtype=dtype
        )
        seg_table = jnp.asarray(build_seg_table(np.asarray(segments)))
        if tile_culling:
            from f1tenth_gym_tpu.ops.culling import build_tile_tables_cached

            tt = build_tile_tables_cached(
                np.asarray(segments), max_range,
                tile_size=culling_tile_size,
                neighborhood=culling_neighborhood,
                split_cap_groups=culling_split_cap,
                window_cap_groups=culling_window_cap,
                bitmap=(bitmap if culling_erosion else None),
                resolution=resolution,
                origin=origin,
                component_seed=culling_component_seed,
            )
            tile_tables = jnp.asarray(tt.tables)
            tile_ngroups = jnp.asarray(tt.ngroups)
            tile_blockmap = jnp.asarray(tt.blockmap)
            # ext rides only when the pack HAS split blocks — a None lets
            # the kernel skip tracing the per-scan extras loops entirely
            # (trip-0 dynamic loops measured ~0.5 ms/call, round 4)
            if (tt.ext % 256).any():
                tile_ext = jnp.asarray(tt.ext)
            if tt.eligible is not None:
                cull_eligible = jnp.asarray(tt.eligible)
            tile_meta = jnp.asarray(
                [tt.x0, tt.y0, 1.0 / tt.tile_size, tt.nx, tt.ny,
                 tt.neighborhood], dtype=jnp.float32)
    return MapData(
        dt=jnp.asarray(dt, dtype=dtype),
        orig_x=jnp.asarray(origin[0], dtype=dtype),
        orig_y=jnp.asarray(origin[1], dtype=dtype),
        orig_c=jnp.asarray(np.cos(origin[2]), dtype=dtype),
        orig_s=jnp.asarray(np.sin(origin[2]), dtype=dtype),
        resolution=jnp.asarray(resolution, dtype=dtype),
        segments=segments,
        seg_table=seg_table,
        tile_tables=tile_tables,
        tile_ngroups=tile_ngroups,
        tile_meta=tile_meta,
        tile_blockmap=tile_blockmap,
        tile_ext=tile_ext,
        cull_eligible=cull_eligible,
    )


def load_map(map_path: str, map_ext: str = ".png", dtype=jnp.float32,
             extract_segments: bool = False,
             simplify_tol_cells: float = 1.5,
             tile_culling: bool = False,
             max_range: float = 30.0,
             culling_tile_size: float = 2.5,
             culling_neighborhood: int = 1,
             culling_split_cap: int = 0,
             culling_window_cap: int = None,
             culling_erosion: bool = True,
             culling_component_seed=None) -> MapData:
    """Load a ROS-style map yaml + image pair into device arrays.

    map_path: path to the .yaml (with or without extension);
    map_ext: image extension, e.g. '.png' or '.pgm'.
    """
    if not map_path.endswith(".yaml"):
        map_path = map_path + ".yaml"
    resolution, origin, _ = load_map_yaml(map_path)
    map_img_path = os.path.splitext(map_path)[0] + map_ext
    bitmap = load_map_image(map_img_path)
    return make_map_data(bitmap, resolution, origin, dtype=dtype,
                         extract_segments=extract_segments,
                         simplify_tol_cells=simplify_tol_cells,
                         tile_culling=tile_culling, max_range=max_range,
                         culling_tile_size=culling_tile_size,
                         culling_neighborhood=culling_neighborhood,
                         culling_split_cap=culling_split_cap,
                         culling_window_cap=culling_window_cap,
                         culling_erosion=culling_erosion,
                         culling_component_seed=culling_component_seed)
