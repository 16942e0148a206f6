"""Multi-track worlds (tracks/multi.py): composition exactness + sampling.

The key claim: scans inside track k of a composed world EQUAL the scans on
track k's standalone map (the closed outer wall occludes every other
track), so domain randomization over tracks costs nothing in fidelity.
"""

import numpy as np
import jax
import jax.numpy as jnp

from f1tenth_gym_tpu import make_scan_tables
from f1tenth_gym_tpu.ops.lidar import dt_lookup, get_scan
from f1tenth_gym_tpu.tracks.multi import (
    multi_track_map_data,
    multi_track_pose_sampler,
)
from f1tenth_gym_tpu.tracks.trackgen import random_track_map_data

N_TRACKS = 4
SEED = 11


def _world():
    return multi_track_map_data(N_TRACKS, seed=SEED, tile_culling=False,
                                dtype=jnp.float64)


def test_composed_scans_match_standalone():
    md, infos = _world()
    tables = make_scan_tables(num_beams=108, dtype=jnp.float64)
    for k in (0, N_TRACKS - 1):
        solo_md, solo_wpts = random_track_map_data(seed=SEED + k,
                                                   dtype=jnp.float64)
        info = infos[k]
        # same racing line, shifted into the world frame
        shift = info.waypoints[0, :2] - solo_wpts[0, :2]
        np.testing.assert_allclose(info.waypoints[:, :2],
                                   solo_wpts[:, :2] + shift, atol=1e-9)
        # scan from a few points along the line, both frames
        n = len(solo_wpts)
        for frac in (0.2, 0.55, 0.8):
            i = int(n * frac)
            d = solo_wpts[(i + 1) % n, :2] - solo_wpts[i, :2]
            th = np.arctan2(d[1], d[0])
            pose_solo = jnp.asarray([solo_wpts[i, 0], solo_wpts[i, 1], th])
            pose_world = jnp.asarray([info.waypoints[i, 0],
                                      info.waypoints[i, 1], th])
            a = np.asarray(get_scan(pose_solo[None], solo_md, tables,
                                    num_beams=108, theta_dis=2000))[0]
            b = np.asarray(get_scan(pose_world[None], md, tables,
                                    num_beams=108, theta_dis=2000))[0]
            # identical geometry: only the raster pasting offset (exact
            # cell multiples) differs -> scans agree to marching tolerance
            assert np.abs(a - b).max() < 0.08, (k, frac, np.abs(a - b).max())


def test_sampler_spawns_on_track():
    md, infos = _world()
    sampler = multi_track_pose_sampler(infos)
    E, A = 16, 2
    p = np.asarray(sampler(jax.random.PRNGKey(0), (E, A)))
    assert p.shape == (E, A, 3)
    # on the drivable surface with real clearance
    d = np.asarray(dt_lookup(jnp.asarray(p[..., 0].ravel()),
                             jnp.asarray(p[..., 1].ravel()), md))
    assert d.min() > 0.5, d.min()
    # every env inside its own track's bbox (contiguous block assignment)
    for e in range(E):
        x0, y0, x1, y1 = infos[(e * N_TRACKS) // E].bbox
        assert (p[e, :, 0] >= x0 - 1e-6).all() and (p[e, :, 0] <= x1).all()
        assert (p[e, :, 1] >= y0 - 1e-6).all() and (p[e, :, 1] <= y1).all()
    # agents form a non-overlapping start grid
    gap = np.hypot(*(p[:, 0, :2] - p[:, 1, :2]).T)
    assert (gap > 0.7).all() and (gap < 3.0).all(), (gap.min(), gap.max())


def test_culling_stays_local():
    """With tile culling on, a tile inside one track must sweep far fewer
    segments than the composed world's total."""
    md, infos = multi_track_map_data(N_TRACKS, seed=SEED, tile_culling=True,
                                     dtype=jnp.float64)
    ng = np.asarray(md.tile_ngroups)
    blockmap = np.asarray(md.tile_blockmap)
    ext = None if md.tile_ext is None else np.asarray(md.tile_ext)
    total = int(ng[0])
    meta = np.asarray(md.tile_meta)
    nx = int(meta[3])
    # tiles at the four track centers: per-scan swept groups for a scan in
    # the lower-left member of the tile's 2x2 window (v9: common part +
    # that member's extras range)
    locals_ = []
    for info in infos:
        cx = (info.bbox[0] + info.bbox[2]) / 2
        cy = (info.bbox[1] + info.bbox[3]) / 2
        ti = int((cx - meta[0]) * meta[2])
        tj = int((cy - meta[1]) * meta[2])
        blk = int(blockmap[tj * nx + ti])   # 2x2 tier occupies slots [0, T)
        assert blk >= 0, "track-center window fell back to the full table"
        extra = 0 if ext is None else int(ext[blk, 0]) % 256
        locals_.append(int(ng[1 + blk]) + extra)
    assert max(locals_) < total / 2, (locals_, total)
