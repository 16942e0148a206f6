"""Segment-based LiDAR engine: ray casting as fused vector arithmetic.

TPU rationale: XLA's TPU gather tops out near 0.18 G-lookups/s (measured),
which caps the distance-field marching engine (ops/lidar.get_scan) at a few
thousand env-steps/s regardless of batching. This engine removes gathers
entirely: walls are extracted ONCE per map as line segments (host-side
contour trace + polygon simplification), and a scan is the min over segments
of branchless ray/segment intersection distances — a broadcast-reduce that
XLA fuses into pure VPU arithmetic streaming at compute speed.

Relationship to the reference: the reference's opponent ray-cast already IS
segment casting (laser_models.py:249-346); this applies the same math to the
map walls. Accuracy vs the marching engine is bounded by the contour
simplification tolerance (default half a map cell — the same order as the
reference's own marching overshoot and far below its MSE<2.0 legacy-parity
tolerance). The marching engine remains the bit-exact parity path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu.state import MapData, ScanTables
from f1tenth_gym_tpu.ops.lidar import beam_theta_indices


def _extract_segments_native(
    bitmap: np.ndarray,
    resolution: float,
    origin: Tuple[float, float, float],
    simplify_tol_cells: float,
) -> Optional[np.ndarray]:
    """Native C++ boundary tracer (native/contour.cpp): exact raster
    boundary (grid-corner vertices), no dilation needed. Returns None when
    the library is unavailable."""
    import ctypes

    from f1tenth_gym_tpu.utils.native import load as _load_native

    lib = _load_native()
    if lib is None or not hasattr(lib, "extract_wall_segments"):
        return None
    wall = np.ascontiguousarray((bitmap <= 0).astype(np.uint8))
    h, w = wall.shape
    # on overflow the library returns -(segments_written + 1024), NOT the
    # total needed — keep doubling the buffer until the trace fits
    max_segs = 4 * (h + w) + 65536
    while True:
        out = np.empty((max_segs, 4), np.float64)
        n = lib.extract_wall_segments(
            wall.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(h), ctypes.c_int(w),
            ctypes.c_double(simplify_tol_cells),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int(max_segs),
        )
        if n >= 0 or max_segs > 64 * (h * w + 1):
            break
        max_segs *= 4
    if n <= 0:
        return None
    segs = out[:n]
    # grid-corner pixel coords -> map frame -> world frame (corners need no
    # half-cell offset, unlike the cv2 center-trace path)
    cx = segs[:, [0, 2]] * resolution
    cy = segs[:, [1, 3]] * resolution
    c, s = np.cos(origin[2]), np.sin(origin[2])
    wx = cx * c - cy * s + origin[0]
    wy = cx * s + cy * c + origin[1]
    return np.stack([wx[:, 0], wy[:, 0], wx[:, 1], wy[:, 1]], axis=1)


def extract_wall_segments(
    bitmap: np.ndarray,
    resolution: float,
    origin: Tuple[float, float, float],
    simplify_tol_cells: float = 0.5,
    pad_to: Optional[int] = None,
) -> np.ndarray:
    """Occupancy bitmap (0 = wall) -> (K, 4) world-frame wall segments.

    Prefers the native C++ tracer (exact raster boundary); falls back to
    cv2 center-line contours + 1-px dilation. Simplified with
    Douglas-Peucker (tolerance in cells). Returns [ax, ay, bx, by] rows;
    padded rows (if pad_to > K) are degenerate far-away segments that never
    intersect a ray inside the map.
    """
    native = _extract_segments_native(bitmap, resolution, origin,
                                      simplify_tol_cells)
    if native is not None:
        return _pad_segments(native, pad_to)
    return _extract_segments_cv2(bitmap, resolution, origin,
                                 simplify_tol_cells, pad_to)


def _pad_segments(out: np.ndarray, pad_to: Optional[int]) -> np.ndarray:
    if pad_to is not None:
        if len(out) > pad_to:
            raise ValueError(f"{len(out)} segments exceed pad_to={pad_to}")
        pad = np.tile(np.array([[1e7, 1e7, 1e7 + 1.0, 1e7]]),
                      (pad_to - len(out), 1))
        out = np.concatenate([out, pad], axis=0)
    return out


def _extract_segments_cv2(
    bitmap: np.ndarray,
    resolution: float,
    origin: Tuple[float, float, float],
    simplify_tol_cells: float = 0.5,
    pad_to: Optional[int] = None,
) -> np.ndarray:
    import cv2

    wall = (bitmap <= 0).astype(np.uint8)
    # Dilate by one cell before tracing: findContours follows wall pixel
    # CENTERS (half a cell inside the true cell boundary) and simplification
    # cuts corners inward — both let grazing rays leak through walls the
    # raster says are solid. One cell of dilation moves the polygon just
    # outside the raster boundary: scans err slightly short (conservative,
    # bounded by ~1.5 cells) and never leak.
    wall = cv2.dilate(wall, np.ones((3, 3), np.uint8), iterations=1)
    contours, _ = cv2.findContours(wall, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    segs = []
    for cnt in contours:
        approx = cv2.approxPolyDP(cnt, simplify_tol_cells, closed=True)
        pts = approx[:, 0, :].astype(np.float64)  # (n, 2) as (col, row)
        if len(pts) < 2:
            continue
        closed = np.vstack([pts, pts[:1]])
        for i in range(len(pts)):
            a, b = closed[i], closed[i + 1]
            if np.all(a == b):
                continue
            segs.append([a[0], a[1], b[0], b[1]])
    if not segs:
        segs = [[0.0, 0.0, 0.0, 1.0]]
    segs = np.asarray(segs, dtype=np.float64)

    # pixel centers -> map frame -> world frame
    cx = (segs[:, [0, 2]] + 0.5) * resolution
    cy = (segs[:, [1, 3]] + 0.5) * resolution
    c, s = np.cos(origin[2]), np.sin(origin[2])
    wx = cx * c - cy * s + origin[0]
    wy = cx * s + cy * c + origin[1]
    out = np.stack([wx[:, 0], wy[:, 0], wx[:, 1], wy[:, 1]], axis=1)

    if pad_to is not None:
        if len(out) > pad_to:
            raise ValueError(f"{len(out)} segments exceed pad_to={pad_to}")
        pad = np.tile(np.array([[1e7, 1e7, 1e7 + 1.0, 1e7]]), (pad_to - len(out), 1))
        out = np.concatenate([out, pad], axis=0)
    return out


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def segments_from_map(
    bitmap: np.ndarray,
    resolution: float,
    origin,
    simplify_tol_cells: float = 0.5,
    pad_multiple: int = 128,
    dtype=jnp.float32,
) -> jnp.ndarray:
    segs = extract_wall_segments(bitmap, resolution, origin, simplify_tol_cells)
    segs = extract_wall_segments(
        bitmap, resolution, origin, simplify_tol_cells,
        pad_to=_round_up(len(segs), pad_multiple),
    )
    return jnp.asarray(segs, dtype=dtype)


def get_scan_segments(
    pose,
    segments: jnp.ndarray,  # (K, 4)
    tables: ScanTables,
    num_beams: int,
    theta_dis: int,
    chunk: int = 128,
):
    """Batched scan against wall segments. pose (..., 3) -> (..., B).

    Uses the SAME theta-LUT beam discretization as the marching engine
    (laser_models.py:164-184 semantics), so beam directions are identical;
    only the wall model differs (polygonal vs rasterized).

    For ray o + t*d and segment a + u*e:
        D = cross(d, e); t = cross(a - o, e) / D; u = cross(a - o, d) / D
    valid when D != 0, t >= 0, 0 <= u <= 1. scan = min valid t (clamped).
    The K loop is chunked with a carried running min so XLA keeps the
    (B, chunk) intermediates in registers/VMEM.
    """
    idx = beam_theta_indices(pose[..., 2], tables, num_beams, theta_dis)
    dx = jnp.take(tables.cosines, idx)  # (..., B)
    dy = jnp.take(tables.sines, idx)
    ox = pose[..., 0:1]
    oy = pose[..., 1:2]

    K = segments.shape[0]
    n_chunks = K // chunk
    assert n_chunks * chunk == K, "segments length must be a multiple of chunk"
    segs = segments.reshape(n_chunks, chunk, 4)

    inf = jnp.asarray(jnp.inf, dtype=dx.dtype)
    init = jnp.full(idx.shape, inf, dtype=dx.dtype)

    def body(carry, seg_chunk):
        best = carry
        ax = seg_chunk[:, 0]
        ay = seg_chunk[:, 1]
        ex = seg_chunk[:, 2] - ax
        ey = seg_chunk[:, 3] - ay
        # pose-level (broadcasts over beams)
        rx = ax - ox[..., None]  # (..., 1, Kc)
        ry = ay - oy[..., None]
        # beam-level
        D = dx[..., None] * ey - dy[..., None] * ex        # (..., B, Kc)
        A = rx * ey - ry * ex                               # (..., 1, Kc)
        Bc = rx * dy[..., None] - ry * dx[..., None]        # (..., B, Kc)
        # divisionless validity: t = A/D >= 0 iff A and D agree in sign;
        # u = B/D in [0, 1] iff B agrees with D and |B| <= |D|
        pos = D > 0.0
        valid = (
            ((A >= 0.0) == pos)
            & ((Bc >= 0.0) == pos)
            & (jnp.abs(Bc) <= jnp.abs(D))
            & (D != 0.0)
        )
        t = A / D  # the single remaining division
        t = jnp.where(valid, t, inf)
        best = jnp.minimum(best, jnp.min(t, axis=-1))
        return best, None

    best, _ = jax.lax.scan(body, init, segs)
    return jnp.minimum(best, tables.max_range)
