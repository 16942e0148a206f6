"""Exact conservative per-tile segment-visibility culling for the scan engines.

The Pallas LiDAR kernel (ops/pallas_scan.py) sweeps every wall segment for
every beam. On corridor maps most segments are occluded by nearer walls from
any given pose, so the sweep wastes most of its work. This module
precomputes, per map tile, a PROVABLY sufficient segment subset: scans from
any pose inside the tile are bit-identical against the subset and the full
set. The kernel then selects the subset for each 16-scan program via
scalar-prefetch block indexing (measured zero-overhead in round 1).

Two conservative-exact tests, computed once per map on the host:

* range: a segment whose distance from the tile exceeds max_range can never
  return a hit below the max-range clamp;
* umbra: segment S is occluded from tile T if some other wall segment W
  properly blocks the sightline p->q for EVERY tile corner p and BOTH
  endpoints q of S. Convexity makes the corner/endpoint test exact: the
  shadow of W from a point q ({p : pq crosses W}) is a convex cone, so
  containing all 4 corners of T means containing all of T; symmetrically
  the umbra of W w.r.t. T (the intersection of the corner shadows) is
  convex, so containing both endpoints of S means containing all of S.
  Every blocked sightline registers a valid kernel hit on W strictly
  before S, hence removing S never changes any beam's min distance.

Both tests only ever REMOVE provably invisible segments (strict float64
inequalities with margin; degenerate/tangent cases count as visible), so
the culled scan equals the full scan exactly — no sampling, unlike the
rejected round-1 variant (see ops/pallas_scan.py design notes).

There is no counterpart in the reference (its marching engine walks the
distance-transform raster, laser_models.py:106-146); this is TPU-native
work reduction for the segment formulation.
"""

from __future__ import annotations

import hashlib
import os
from typing import NamedTuple, Optional, Tuple

import numpy as np

# strict-crossing margin on f64 cross-product PRODUCTS (coords are O(100) m,
# cross products O(1e3), products O(1e6); f64 noise is ~1e-10 — margin 1e-6
# only ever misclassifies truly tangent sightlines as NOT blocked: safe)
_EPS = 1e-6


class TileTables(NamedTuple):
    """Packed per-tile segment tables for the Pallas kernel.

    tables[j*nx + i] serves programs whose scans all lie within the
    `neighborhood`-tile Chebyshev ball of tile (i, j); tables[n_tiles +
    j*nx + i] is the thinner r=0 table for programs entirely INSIDE tile
    (i, j). The full fallback table is NOT stored here (the kernel
    carries it as its own input); ngroups keeps the round-1 indexing
    convention: ngroups[0] is the FULL set's group count, ngroups[1 + b]
    block b's (-1 = sentinel: use the full table).
    """

    tables: np.ndarray     # (2*n_tiles, Kmax_tile, 8) f32 kernel rows
    ngroups: np.ndarray    # (2*n_tiles + 1,) i32 group counts (see above)
    x0: float              # grid origin (world frame)
    y0: float
    tile_size: float
    nx: int                # grid dims
    ny: int
    neighborhood: int      # Chebyshev radius each table provably covers


def _cross(ax, ay, bx, by):
    return ax * by - ay * bx


def _blocked_native(segs, occ, corners, max_range, tile_size):
    """C++ umbra sweep (native/visibility.cpp); None when unavailable."""
    import ctypes

    from f1tenth_gym_tpu.utils.native import load as _load_native

    lib = _load_native()
    if lib is None or not hasattr(lib, "tile_blocked_mask"):
        return None
    segs = np.ascontiguousarray(segs, np.float64)
    occ = np.ascontiguousarray(occ, np.float64)
    corners = np.ascontiguousarray(corners, np.float64)
    T, K, Kw = len(corners), len(segs), len(occ)
    out = np.zeros((T, K), np.uint8)
    lib.tile_blocked_mask(
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ctypes.c_int(K),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ctypes.c_int(Kw),
        corners.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(T), ctypes.c_double(max_range),
        ctypes.c_double(tile_size * np.sqrt(2.0)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out.astype(bool)


def tile_visibility(
    segs: np.ndarray,
    max_range: float,
    tile_size: float,
    bbox: Tuple[float, float, float, float],
    occluders: np.ndarray = None,
) -> Tuple[np.ndarray, int, int, float, float]:
    """Per-tile visible-segment masks.

    segs: (K, 4) [ax, ay, bx, by] world-frame wall segments (no padding).
    occluders: optional (Kw, 4) segment set to test blocking against
    (default: segs itself). Occluders may be any genuine wall geometry —
    e.g. the UNSPLIT originals when segs are split pieces — because a
    blocked sightline p->q implies a kernel hit strictly before q, and the
    strictly-decreasing-t descent through culled blockers always grounds
    out in an unculled table segment (each segment crosses a beam at most
    once, so the descent cannot revisit one).
    Returns (vis (n_tiles, K) bool in j-major tile order, nx, ny, x0, y0).
    """
    segs = np.asarray(segs, np.float64)
    occ = segs if occluders is None else np.asarray(occluders, np.float64)
    K = len(segs)
    xmin, ymin, xmax, ymax = bbox
    nx = max(1, int(np.ceil((xmax - xmin) / tile_size)))
    ny = max(1, int(np.ceil((ymax - ymin) / tile_size)))
    ti = np.arange(nx) * tile_size + xmin
    tj = np.arange(ny) * tile_size + ymin
    cx, cy = np.meshgrid(ti, tj)  # (ny, nx), j-major
    # (T, 4, 2) tile corners
    corners = np.stack(
        [
            np.stack([cx, cy], -1),
            np.stack([cx + tile_size, cy], -1),
            np.stack([cx + tile_size, cy + tile_size], -1),
            np.stack([cx, cy + tile_size], -1),
        ],
        axis=2,
    ).reshape(-1, 4, 2)
    T = len(corners)

    a = segs[:, 0:2]
    b = segs[:, 2:4]

    # --- range cull: dist(tile center, segment) - half-diagonal > max_range
    center = corners.mean(1)  # (T, 2)
    e = b - a  # (K, 2)
    len2 = np.maximum((e * e).sum(-1), 1e-30)
    ap = center[:, None, :] - a[None, :, :]  # (T, K, 2)
    u = np.clip((ap * e[None]).sum(-1) / len2[None], 0.0, 1.0)
    closest = a[None] + u[..., None] * e[None]
    d = np.hypot(*(center[:, None, :] - closest).transpose(2, 0, 1))
    half_diag = tile_size * np.sqrt(2.0) / 2.0
    vis = d - half_diag <= max_range  # (T, K)

    # --- umbra cull: blocked(T, S) = any W properly crossing all 8
    # corner->endpoint sightlines. Native C++ sweep when built (early-exit
    # + range-pruned + OpenMP over tiles; minutes -> seconds on the
    # K >= 700 venue maps), else the vectorized numpy loop over occluders.
    blocked = _blocked_native(segs, occ, corners, max_range, tile_size)
    if blocked is not None:
        return vis & ~blocked, nx, ny, float(xmin), float(ymin)
    q = np.stack([a, b], axis=1)  # (K, 2, 2) endpoints
    p = corners  # (T, 4, 2)
    qp = q[None, None, :, :, :] - p[:, :, None, None, :]  # (T, 4, K, 2, 2)
    blocked = np.zeros((T, K), bool)
    oa, ob = occ[:, 0:2], occ[:, 2:4]
    oe = ob - oa
    olen2 = (oe * oe).sum(-1)
    order = np.argsort(-olen2)  # long walls block the most: test them first
    for w in order:
        w1, w2 = oa[w], ob[w]
        ew = oe[w]
        if olen2[w] < 1e-12:
            continue
        # d3: which side of W each corner is on; d4: each endpoint
        d3 = _cross(ew[0], ew[1], p[..., 0] - w1[0], p[..., 1] - w1[1])  # (T,4)
        d4 = _cross(ew[0], ew[1], q[..., 0] - w1[0], q[..., 1] - w1[1])  # (K,2)
        straddle_w = d3[:, :, None, None] * d4[None, None, :, :] < -_EPS
        # d1/d2: W endpoints on opposite sides of each sightline p->q
        w1p = w1[None, None, :] - p  # (T, 4, 2)
        w2p = w2[None, None, :] - p
        d1 = _cross(
            qp[..., 0], qp[..., 1],
            w1p[:, :, None, None, 0], w1p[:, :, None, None, 1],
        )
        d2 = _cross(
            qp[..., 0], qp[..., 1],
            w2p[:, :, None, None, 0], w2p[:, :, None, None, 1],
        )
        crossing = (d1 * d2 < -_EPS) & straddle_w  # (T, 4, K, 2)
        # self-occlusion is impossible by strictness: an endpoint q lying ON
        # its own occluder gives d4 exactly 0, failing the straddle test
        blocked |= crossing.all(axis=(1, 3))  # (T, K)
    return vis & ~blocked, nx, ny, float(xmin), float(ymin)


def split_segments(segs: np.ndarray, max_len: float) -> np.ndarray:
    """Split (K, 4) segments into collinear pieces of length <= max_len.

    Exact: a hit on a piece is a hit on the original at the same distance
    (shared endpoints count for both pieces via the kernel's inclusive
    0 <= w <= 1 bounds). Splitting lets partially-occluded long walls be
    culled piecewise.
    """
    segs = np.asarray(segs, np.float64)
    out = []
    for ax, ay, bx, by in segs:
        n = max(1, int(np.ceil(np.hypot(bx - ax, by - ay) / max_len)))
        ts = np.linspace(0.0, 1.0, n + 1)
        xs = ax + (bx - ax) * ts
        ys = ay + (by - ay) * ts
        for i in range(n):
            out.append([xs[i], ys[i], xs[i + 1], ys[i + 1]])
    return np.asarray(out)


def build_tile_tables(
    segments: np.ndarray,
    max_range: float,
    tile_size: float = 2.5,
    neighborhood: int = 1,
    split_len: float = None,
    max_bytes: int = 256 << 20,
) -> TileTables:
    """Build the packed per-tile kernel tables.

    segments: (K, 4) wall segments (padding rows with coords >= 1e6 are
    dropped, matching build_seg_table). split_len (optional) splits targets
    into pieces of <= split_len so partially-occluded walls cull piecewise;
    occluders stay UNSPLIT (long walls block the most sightlines) —
    measured a net LOSS on the reference maps (visible walls inflate row
    counts more than occluded ones shrink), so default off. Each tile's
    table is
    the UNION of the visible sets over its (2r+1)x(2r+1) neighborhood, so
    one table serves a whole 16-scan kernel program whose scans have
    drifted up to r tiles apart. The full set is NOT stored here — the
    kernel keeps it as its own resident input (pallas_scan segf_ref), so
    the per-tile array pads only to the largest TILE's row count (on
    multi-map worlds ~6x less memory than embedding the full set as a
    block). ngroups[0] is the full set's group count; a tile whose culled
    set is no smaller than the full set stores the sentinel -1 and is
    served the full table. Grows tile_size if the packed tables would
    exceed max_bytes.
    """
    from f1tenth_gym_tpu.ops.pallas_scan import GROUP, build_seg_table

    orig = np.asarray(segments, np.float64)
    orig = orig[orig[:, 0] < 1e6]
    segs = split_segments(orig, split_len) if split_len else orig
    xs = np.concatenate([orig[:, 0], orig[:, 2]])
    ys = np.concatenate([orig[:, 1], orig[:, 3]])
    # walls enclose free space, so the segment bbox covers every free pose
    bbox = (xs.min() - 1e-6, ys.min() - 1e-6, xs.max() + 1e-6, ys.max() + 1e-6)

    full = build_seg_table(orig)  # (Kfull_pad, 8)
    while True:
        vis, nx, ny, x0, y0 = tile_visibility(segs, max_range, tile_size,
                                              bbox, occluders=orig)
        # union over the (2r+1)^2 neighborhood, j-major grid
        v = vis.reshape(ny, nx, -1)
        r = neighborhood
        vp = np.zeros((ny + 2 * r, nx + 2 * r, v.shape[-1]), bool)
        vp[r:r + ny, r:r + nx] = v
        u = np.zeros_like(v)
        for dj in range(2 * r + 1):
            for di in range(2 * r + 1):
                u |= vp[dj:dj + ny, di:di + nx]
        counts = np.minimum(u.sum(-1), len(full))  # no-gain tiles cap out
        kmax = int(counts.max())
        kmax_pad = max(GROUP, ((kmax + GROUP - 1) // GROUP) * GROUP)
        if 2 * nx * ny * kmax_pad * 32 <= max_bytes:
            break
        tile_size *= 1.5  # coarser grid: fewer tables, bigger each

    # DUAL-RADIUS pack: blocks [0, T) hold the r-neighborhood union tables,
    # blocks [T, 2T) the r=0 single-tile tables (~35% thinner on corridor
    # maps) — a program whose scans all sit in ONE tile sweeps the thin
    # table, one that fits the (2r+1)-window sweeps the union, anything
    # else falls back to the full set. Same kernel either way.
    T = nx * ny
    tables = np.zeros((2 * T, kmax_pad, 8), np.float32)
    # empty-group padding rows: never-valid (see build_seg_table)
    tables[:, :, 2] = 1.0
    tables[:, :, 5] = 10.0
    ngroups = np.zeros(2 * T + 1, np.int32)
    ngroups[0] = len(full) // GROUP
    flat_u = u.reshape(-1, u.shape[-1])
    flat_v = vis
    for base, flat in ((0, flat_u), (T, flat_v)):
        for t in range(T):
            sel = segs[flat[t]]
            if len(sel) == 0:
                # a tile with nothing visible (deep inside a wall): keep one
                # padding group so the kernel loop body stays non-degenerate
                ngroups[1 + base + t] = 1
                continue
            tab = build_seg_table(sel)
            if len(tab) >= len(full):
                # culling bought nothing here — the kernel serves the full
                # table for this tile (sentinel; no redundant copy stored)
                ngroups[1 + base + t] = -1
                continue
            tables[base + t, : len(tab)] = tab
            ngroups[1 + base + t] = len(tab) // GROUP
    return TileTables(
        tables=tables,
        ngroups=ngroups,
        x0=x0,
        y0=y0,
        tile_size=float(tile_size),
        nx=nx,
        ny=ny,
        neighborhood=neighborhood,
    )


def build_tile_tables_cached(
    segments: np.ndarray,
    max_range: float,
    tile_size: float = 2.5,
    neighborhood: int = 1,
    cache_dir: Optional[str] = None,
) -> TileTables:
    """build_tile_tables with an npz disk cache.

    The umbra sweep is O(tiles x K^2) host work (~6 s on the reference
    example map at tile_size=2.5); per-map results are immutable, so they are
    keyed by a hash of (segments, parameters) and reused across processes.
    Set cache_dir=None for $F1TENTH_TPU_CACHE or ~/.cache/f1tenth_gym_tpu.
    """
    segs = np.ascontiguousarray(np.asarray(segments, np.float64))
    h = hashlib.sha1(b"tile-tables-v4")  # bump on algorithm changes
    h.update(segs.tobytes())
    h.update(np.float64([max_range, tile_size, neighborhood]).tobytes())
    key = h.hexdigest()[:16]
    cache_dir = cache_dir or os.environ.get(
        "F1TENTH_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "f1tenth_gym_tpu"),
    )
    path = os.path.join(cache_dir, f"tiles_{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return TileTables(
            tables=z["tables"], ngroups=z["ngroups"], x0=float(z["x0"]),
            y0=float(z["y0"]), tile_size=float(z["tile_size"]),
            nx=int(z["nx"]), ny=int(z["ny"]),
            neighborhood=int(z["neighborhood"]),
        )
    tt = build_tile_tables(segs, max_range, tile_size=tile_size,
                           neighborhood=neighborhood)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}.npz"  # np.savez appends .npz itself
    np.savez(tmp[:-4], tables=tt.tables, ngroups=tt.ngroups, x0=tt.x0,
             y0=tt.y0, tile_size=tt.tile_size, nx=tt.nx, ny=tt.ny,
             neighborhood=tt.neighborhood)
    os.replace(tmp, path)
    return tt
