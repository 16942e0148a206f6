"""Per-tile segment-visibility culling (ops/culling.py).

The culling is conservative-EXACT: a culled table must yield bit-identical
scans to the full table for every pose inside the tile it serves. These
tests check the geometric predicates directly and the end-to-end kernel
equality (interpret mode) with programs that demonstrably use culled tables.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f1tenth_gym_tpu import load_map, make_scan_tables
from f1tenth_gym_tpu.core.simulator import _elig_kwargs
from f1tenth_gym_tpu.maps import map_path
from f1tenth_gym_tpu.ops.culling import build_tile_tables, tile_visibility
from f1tenth_gym_tpu.ops.pallas_scan import EA, GROUP, scan_pallas


def test_range_cull():
    # tile at origin, one near segment, one beyond max_range
    segs = np.array([
        [1.0, -1.0, 1.0, 1.0],      # 1 m away: visible
        [100.0, -1.0, 100.0, 1.0],  # 100 m away: range-culled at 30 m
    ])
    vis, nx, ny, x0, y0 = tile_visibility(
        segs, max_range=30.0, tile_size=2.0, bbox=(-1.0, -1.0, 1.0, 1.0))
    assert vis.shape == (1, 2)
    assert bool(vis[0, 0]) and not bool(vis[0, 1])


def test_umbra_cull():
    # a long wall at x=5 fully shadows a far segment behind it, but not one
    # poking out past the wall's end
    segs = np.array([
        [5.0, -50.0, 5.0, 50.0],   # the occluder
        [8.0, -2.0, 8.0, 2.0],     # fully in its umbra: culled
        [8.0, 40.0, 8.0, 400.0],   # reaches past the wall's shadow: visible
    ])
    vis, *_ = tile_visibility(
        segs, max_range=1000.0, tile_size=2.0, bbox=(-1.0, -1.0, 1.0, 1.0))
    assert bool(vis[0, 0])      # occluder itself visible
    assert not bool(vis[0, 1])  # shadowed
    assert bool(vis[0, 2])      # partially visible segment must be kept


def test_no_self_occlusion():
    segs = np.array([[5.0, -50.0, 5.0, 50.0]])
    vis, *_ = tile_visibility(
        segs, max_range=1000.0, tile_size=2.0, bbox=(-1.0, -1.0, 1.0, 1.0))
    assert bool(vis[0, 0])


@pytest.fixture(scope="module")
def culled_map():
    # split cap pinned ON so the v9 split-block kernel path stays covered
    # (production default is 0 = union-only: the split sweep measured a
    # net loss on v5e, see ops/culling.py)
    return load_map(map_path("compact"), ".png", extract_segments=True,
                    tile_culling=True, culling_tile_size=2.0,
                    culling_split_cap=96)


def test_tile_tables_shapes(culled_map):
    m = culled_map
    assert m.tile_tables is not None and m.tile_ngroups is not None
    assert m.tile_blockmap is not None and m.tile_ext is not None
    n_blocks, kmax, eight = m.tile_tables.shape
    assert eight == 8 and kmax % GROUP == 0
    meta = np.asarray(m.tile_meta)
    # v9 pack: deduped blocks addressed through blockmap, tiers stacked
    # [2x2 | 1x1 | 4x4 | 8x8] by lower-left tile
    T = int(meta[3]) * int(meta[4])
    bm = np.asarray(m.tile_blockmap)
    assert bm.shape == (4 * T,)
    ng = np.asarray(m.tile_ngroups)
    ext = np.asarray(m.tile_ext)
    assert len(ng) == n_blocks + 1 and ng[0] >= 1
    assert ext.shape == (n_blocks, 64)
    # blockmap entries: -1 = full-table sentinel, else a valid block
    assert bm.min() >= -1 and bm.max() < n_blocks
    real = ng[1:]
    assert real.min() >= 1 and real.max() * GROUP <= kmax
    # culling must actually bite somewhere
    assert real.min() < ng[0]
    # every extras range must stay inside its block and every per-scan
    # sweep (common + extras) inside kmax
    starts, cnts = ext // 256, ext % 256
    assert (starts + cnts).max() * GROUP <= kmax
    used = cnts > 0
    blk_ids = np.broadcast_to(np.arange(n_blocks)[:, None], ext.shape)
    assert np.all(starts[used] >= ng[1 + blk_ids[used]])
    # dedup must actually dedupe on a corridor map
    assert n_blocks < 4 * T
    # 1x1 windows never carry extras (their common IS the tile's set, and
    # split/union blocks live in disjoint dedup namespaces)
    blk1 = bm[T:2 * T]
    assert np.all(cnts[blk1[blk1 >= 0]] == 0)


def test_culled_scan_bitwise_equals_full(culled_map):
    """Clustered in-grid poses -> culled-table programs; scans must be
    bit-identical to the full sweep (floating max over a subset equals max
    over the superset when the removed elements provably never win)."""
    m = culled_map
    tables = make_scan_tables(num_beams=108)
    meta = np.asarray(m.tile_meta)
    nx, ny, r = int(meta[3]), int(meta[4]), int(meta[5])
    dt = np.asarray(m.dt)
    res = float(m.resolution)
    rng = np.random.default_rng(5)
    elig = np.asarray(m.cull_eligible) if m.cull_eligible is not None else None
    cells = np.argwhere((dt > 0.3) & (elig > 0)) if elig is not None \
        else np.argwhere(dt > 0.3)
    wx = cells[:, 1] * res + float(m.orig_x)
    wy = cells[:, 0] * res + float(m.orig_y)
    ing = ((wx > meta[0] + 2) & (wx < meta[0] + nx / meta[2] - 2)
           & (wy > meta[1] + 2) & (wy < meta[1] + ny / meta[2] - 2))
    cells = cells[ing]

    poses = []
    for _ in range(4):  # 4 programs of EA clustered scans
        ctr = cells[rng.integers(0, len(cells))]
        for _ in range(EA):
            off = rng.uniform(-0.5 / res, 0.5 / res, 2)
            cc = np.clip(ctr + off, 0, np.array(dt.shape) - 1)
            poses.append([cc[1] * res + float(m.orig_x),
                          cc[0] * res + float(m.orig_y),
                          rng.uniform(0, 2 * np.pi)])
    p = jnp.asarray(np.asarray(poses, np.float32))

    # at least half the programs must resolve to a culled (non-full) window,
    # otherwise this test exercises nothing
    ti = np.floor((np.asarray(p)[:, 0] - meta[0]) * meta[2]).astype(int)
    tj = np.floor((np.asarray(p)[:, 1] - meta[1]) * meta[2]).astype(int)
    ti, tj = ti.reshape(-1, EA), tj.reshape(-1, EA)
    sx, sy = ti.max(1) - ti.min(1), tj.max(1) - tj.min(1)
    ok = ((ti.min(1) >= 0) & (tj.min(1) >= 0) & (ti.max(1) < nx)
          & (tj.max(1) < ny) & (sx <= 3) & (sy <= 3))
    assert ok.sum() >= 2

    full = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True)
    cull = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True,
                       tile_tables=m.tile_tables,
                       tile_ngroups=m.tile_ngroups, tile_meta=m.tile_meta,
                       tile_blockmap=m.tile_blockmap,
                       tile_ext=m.tile_ext, **_elig_kwargs(m))
    assert np.array_equal(np.asarray(full), np.asarray(cull))


def test_out_of_grid_falls_back_exactly(culled_map):
    """Poses outside the tile grid (or scattered programs) must fall back to
    the full table and still be exact."""
    m = culled_map
    tables = make_scan_tables(num_beams=108)
    rng = np.random.default_rng(6)
    dt = np.asarray(m.dt)
    res = float(m.resolution)
    cells = np.argwhere(dt > 0.3)
    pick = cells[rng.integers(0, len(cells), EA)]
    poses = np.stack([pick[:, 1] * res + float(m.orig_x),
                      pick[:, 0] * res + float(m.orig_y),
                      rng.uniform(0, 2 * np.pi, EA)], 1).astype(np.float32)
    p = jnp.asarray(poses)
    full = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True)
    cull = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True,
                       tile_tables=m.tile_tables,
                       tile_ngroups=m.tile_ngroups, tile_meta=m.tile_meta,
                       tile_blockmap=m.tile_blockmap,
                       tile_ext=m.tile_ext, **_elig_kwargs(m))
    assert np.array_equal(np.asarray(full), np.asarray(cull))


def test_each_window_size_bitwise(culled_map):
    """Programs engineered to hit the 1x1, 2x2, and 4x4 windows each match
    the full sweep bitwise."""
    m = culled_map
    tables = make_scan_tables(num_beams=108)
    meta = np.asarray(m.tile_meta)
    nx, ny = int(meta[3]), int(meta[4])
    ts = 1.0 / meta[2]
    dt = np.asarray(m.dt)
    res = float(m.resolution)
    elig = np.asarray(m.cull_eligible) if m.cull_eligible is not None else None
    cells = np.argwhere((dt > 0.35) & (elig > 0)) if elig is not None \
        else np.argwhere(dt > 0.35)
    wx = cells[:, 1] * res + float(m.orig_x)
    wy = cells[:, 0] * res + float(m.orig_y)
    rng = np.random.default_rng(11)

    def program_with_spread(max_spread_m):
        # scans clustered within max_spread_m of a seed free cell
        i = rng.integers(0, len(cells))
        d = np.hypot(wx - wx[i], wy - wy[i])
        near = np.nonzero(d <= max_spread_m)[0]
        pick = rng.choice(near, EA)
        th = rng.uniform(0, 2 * np.pi, EA)
        return np.stack([wx[pick], wy[pick], th], 1)

    got = set()
    poses = []
    for _ in range(40):
        spread = rng.choice([0.2, 0.8, 2.5])
        prog = program_with_spread(spread)
        ti = np.floor((prog[:, 0] - meta[0]) * meta[2]).astype(int)
        tj = np.floor((prog[:, 1] - meta[1]) * meta[2]).astype(int)
        sx, sy = ti.max() - ti.min(), tj.max() - tj.min()
        if not (ti.min() >= 0 and tj.min() >= 0 and ti.max() < nx
                and tj.max() < ny):
            continue
        kind = ("w1" if sx == 0 and sy == 0 else
                "w2" if sx <= 1 and sy <= 1 else
                "w4" if sx <= 3 and sy <= 3 else "full")
        if kind not in got:
            got.add(kind)
            poses.append(prog)
        if {"w1", "w2", "w4"} <= got:
            break
    assert {"w1", "w2", "w4"} <= got, f"only engineered {got} at ts={ts}"
    p = jnp.asarray(np.concatenate(poses).astype(np.float32))
    full = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True)
    cull = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True,
                       tile_tables=m.tile_tables,
                       tile_ngroups=m.tile_ngroups, tile_meta=m.tile_meta,
                       tile_blockmap=m.tile_blockmap,
                       tile_ext=m.tile_ext, **_elig_kwargs(m))
    assert np.array_equal(np.asarray(full), np.asarray(cull))


def test_build_deterministic():
    segs = np.array([
        [0.0, 0.0, 4.0, 0.0], [4.0, 0.0, 4.0, 4.0],
        [4.0, 4.0, 0.0, 4.0], [0.0, 4.0, 0.0, 0.0],
        [1.5, 1.5, 2.5, 1.5],
    ])
    a = build_tile_tables(segs, 30.0, tile_size=1.0)
    b = build_tile_tables(segs, 30.0, tile_size=1.0)
    assert np.array_equal(a.tables, b.tables)
    assert np.array_equal(a.ngroups, b.ngroups)


def test_native_umbra_matches_numpy():
    """The C++ umbra sweep (native/visibility.cpp) and the numpy reference
    implement the same strict predicates — masks must agree exactly."""
    from f1tenth_gym_tpu.ops import culling

    rng = np.random.default_rng(9)
    segs = np.concatenate([
        np.array([[0.0, 0.0, 12.0, 0.0], [12.0, 0.0, 12.0, 12.0],
                  [12.0, 12.0, 0.0, 12.0], [0.0, 12.0, 0.0, 0.0]]),
        rng.uniform(1.0, 11.0, (30, 4)),  # random interior clutter
    ])
    bbox = (0.0, 0.0, 12.0, 12.0)
    vis_native, *_ = culling.tile_visibility(segs, 30.0, 2.0, bbox)
    orig = culling._blocked_native
    try:
        culling._blocked_native = lambda *a, **k: None
        vis_numpy, *_ = culling.tile_visibility(segs, 30.0, 2.0, bbox)
    finally:
        culling._blocked_native = orig
    if orig(segs, segs, np.zeros((1, 4, 2)), 30.0, 2.0) is None:
        pytest.skip("native library unavailable")
    assert np.array_equal(vis_native, vis_numpy)


def test_default_cap_has_no_split_blocks():
    """Production default (split cap 0) must yield union-only packs with
    tile_ext None, so the kernel never traces the per-scan extras loops
    (they measured ~0.5 ms/call of pipeline cost even at trip 0)."""
    m = load_map(map_path("compact"), ".png", extract_segments=True,
                 tile_culling=True, culling_tile_size=2.0)
    assert m.tile_ext is None
    assert m.tile_blockmap is not None


def test_window_cap_drops_oversized_windows():
    """window_cap_groups must sentinel windows whose table exceeds the cap
    (shrinking the pack's padded Kmax — every block is DMA'd at that
    height) while keeping the small ones intact."""
    rng = np.random.default_rng(3)
    segs = np.concatenate([
        np.array([[0.0, 0.0, 20.0, 0.0], [20.0, 0.0, 20.0, 20.0],
                  [20.0, 20.0, 0.0, 20.0], [0.0, 20.0, 0.0, 0.0]]),
        rng.uniform(1.0, 19.0, (60, 4)),  # open clutter: wide visibility
    ])
    un = build_tile_tables(segs, 30.0, tile_size=2.0)
    capped = build_tile_tables(segs, 30.0, tile_size=2.0,
                               window_cap_groups=4)
    assert un.tables.shape[1] > 4 * GROUP        # uncapped packs run wide
    assert capped.tables.shape[1] <= 4 * GROUP   # Kmax respects the cap
    kept = capped.ngroups[1:]
    assert kept.max() <= 4
    # oversized windows became sentinels, so strictly fewer blocks remain
    assert (capped.blockmap >= 0).sum() < (un.blockmap >= 0).sum()
    assert (capped.blockmap == -1).any()


# ---------------------------------------------------------------------------
# Erosion-fused multi-occluder culling (round 5, ops/culling.py)
# ---------------------------------------------------------------------------


def test_erosion_bites_beyond_umbra():
    """Erosion fusion must cull strictly more than the single-occluder
    umbra test on a corridor map, and produce an eligibility raster."""
    m_er = load_map(map_path("compact"), ".png", extract_segments=True,
                    tile_culling=True, culling_tile_size=2.0)
    m_um = load_map(map_path("compact"), ".png", extract_segments=True,
                    tile_culling=True, culling_tile_size=2.0,
                    culling_erosion=False)
    assert m_er.cull_eligible is not None
    assert m_um.cull_eligible is None
    assert float(np.asarray(m_er.tile_meta)[5]) == 8
    assert float(np.asarray(m_um.tile_meta)[5]) == 7
    # compare the 1x1 tiers' mean group counts over tiles both packs map
    T = int(np.asarray(m_er.tile_meta)[3]) * int(np.asarray(m_er.tile_meta)[4])
    def mean_1x1(m):
        bm = np.asarray(m.tile_blockmap)[T:2 * T]
        ng = np.asarray(m.tile_ngroups)
        got = bm[bm >= 0]
        return ng[1 + got].mean(), set(np.nonzero(bm >= 0)[0])
    g_er, t_er = mean_1x1(m_er)
    g_um, t_um = mean_1x1(m_um)
    common = np.array(sorted(t_er & t_um))
    assert len(common) > 10
    bm_e = np.asarray(m_er.tile_blockmap)[T:2 * T][common]
    bm_u = np.asarray(m_um.tile_blockmap)[T:2 * T][common]
    ng_e = np.asarray(m_er.tile_ngroups)[1 + bm_e].astype(float)
    ng_u = np.asarray(m_um.tile_ngroups)[1 + bm_u].astype(float)
    assert ng_e.mean() < ng_u.mean(), (ng_e.mean(), ng_u.mean())


def test_erosion_gate_near_wall_poses_exact():
    """Poses NEAR WALLS (ineligible: within ~2.5 cells of a segment) and in
    foreign free components must fall back to the full table and stay
    bit-exact."""
    m = load_map(map_path("compact"), ".png", extract_segments=True,
                 tile_culling=True, culling_tile_size=2.0)
    assert m.cull_eligible is not None
    tables = make_scan_tables(num_beams=108)
    dt = np.asarray(m.dt)
    elig = np.asarray(m.cull_eligible)
    res = float(m.resolution)
    rng = np.random.default_rng(13)
    # free cells that are NOT eligible (near-wall band + other components)
    cells = np.argwhere((dt > 0.05) & (elig == 0))
    pick = cells[rng.integers(0, len(cells), 2 * EA)]
    poses = np.stack([pick[:, 1] * res + float(m.orig_x),
                      pick[:, 0] * res + float(m.orig_y),
                      rng.uniform(0, 2 * np.pi, 2 * EA)], 1)
    p = jnp.asarray(poses, jnp.float32)
    full = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True)
    cull = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True,
                       tile_tables=m.tile_tables,
                       tile_ngroups=m.tile_ngroups, tile_meta=m.tile_meta,
                       tile_blockmap=m.tile_blockmap,
                       tile_ext=m.tile_ext, **_elig_kwargs(m))
    assert np.array_equal(np.asarray(full), np.asarray(cull))


def test_erosion_pack_requires_eligibility_raster():
    """Using an erosion-gated pack without its eligibility raster is a
    correctness bug; the public scan_pallas entry must refuse it."""
    m = load_map(map_path("compact"), ".png", extract_segments=True,
                 tile_culling=True, culling_tile_size=2.0)
    tables = make_scan_tables(num_beams=108)
    p = jnp.zeros((EA, 3), jnp.float32)
    with pytest.raises(ValueError, match="eligibility"):
        scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True,
                    tile_tables=m.tile_tables,
                    tile_ngroups=m.tile_ngroups, tile_meta=m.tile_meta,
                    tile_blockmap=m.tile_blockmap, tile_ext=m.tile_ext)


def test_erosion_mixed_eligibility_fuzz():
    """Random mixed batches (eligible corridor poses + near-wall poses +
    off-grid poses): culled scans equal full scans bitwise."""
    m = load_map(map_path("compact"), ".png", extract_segments=True,
                 tile_culling=True, culling_tile_size=2.0)
    tables = make_scan_tables(num_beams=108)
    dt = np.asarray(m.dt)
    res = float(m.resolution)
    rng = np.random.default_rng(21)
    cells = np.argwhere(dt > 0.05)   # anywhere free, any eligibility
    pick = cells[rng.integers(0, len(cells), 4 * EA)]
    poses = np.stack([pick[:, 1] * res + float(m.orig_x),
                      pick[:, 0] * res + float(m.orig_y),
                      rng.uniform(0, 2 * np.pi, 4 * EA)], 1)
    poses[::7] += 50.0   # a few way off-grid
    p = jnp.asarray(poses, jnp.float32)
    full = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True)
    cull = scan_pallas(p, m.seg_table, tables, 108, 2000, interpret=True,
                       tile_tables=m.tile_tables,
                       tile_ngroups=m.tile_ngroups, tile_meta=m.tile_meta,
                       tile_blockmap=m.tile_blockmap,
                       tile_ext=m.tile_ext, **_elig_kwargs(m))
    assert np.array_equal(np.asarray(full), np.asarray(cull))
