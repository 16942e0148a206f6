"""One-off estimate: would 2x1 / 1x2 rectangular window tiers beat 2x2?

For the bench workload's SUB-scan subgroups, computes the mean swept group
count under (a) the shipped square tiers (1x1/2x2/4x4/8x8) and (b) square
tiers + rectangular 2x1/1x2 tiers for single-axis straddles. Host-only.

  BENCH_CULL_TS=0.85 F1TENTH_PALLAS_SUB=2 python tools/rect_tier_estimate.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "F1TENTH_TPU_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".map_cache"))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from f1tenth_gym_tpu import load_map  # noqa: E402
from f1tenth_gym_tpu.maps import map_path as bundled_map  # noqa: E402
from f1tenth_gym_tpu.ops.culling import tile_visibility, _window_union  # noqa: E402
from f1tenth_gym_tpu.ops.pallas_scan import EA, GROUP, SUB  # noqa: E402
from f1tenth_gym_tpu.parallel import uniform_pose_sampler  # noqa: E402


def rect_union(v, wx, wy):
    ny, nx, K = v.shape
    vp = np.zeros((ny + wy - 1, nx + wx - 1, K), bool)
    vp[:ny, :nx] = v
    u = np.zeros_like(v)
    for dj in range(wy):
        for di in range(wx):
            u |= vp[dj:dj + ny, di:di + nx]
    return u


def main():
    ts = float(os.environ.get("BENCH_CULL_TS", 0.85))
    num_envs = int(os.environ.get("BENCH_ENVS", 4096))
    md = load_map(bundled_map("example_map"), ".png", dtype=jnp.float32,
                  extract_segments=True)
    segs = np.asarray(md.segments, np.float64)
    segs = segs[segs[:, 0] < 1e6]
    xs = np.concatenate([segs[:, 0], segs[:, 2]])
    ys = np.concatenate([segs[:, 1], segs[:, 3]])
    bbox = (xs.min() - 1e-6, ys.min() - 1e-6, xs.max() + 1e-6, ys.max() + 1e-6)
    vis, nx, ny, x0, y0 = tile_visibility(segs, 30.0, ts, bbox)
    v = vis.reshape(ny, nx, -1)

    def gcount(m):  # padded group count per flattened tile, sentinel->full
        c = m.reshape(-1, m.shape[-1]).sum(-1)
        return np.ceil(np.maximum(c, 1) / GROUP)

    full_ng = np.ceil(len(segs) / GROUP)
    g1 = gcount(v)
    g2 = gcount(_window_union(v, 2))
    g21 = gcount(rect_union(v, 2, 1))
    g12 = gcount(rect_union(v, 1, 2))
    g4 = gcount(_window_union(v, 4))
    g8 = gcount(_window_union(v, 8))

    sampler = uniform_pose_sampler(md, clearance=0.6, component_seed=(0.7, 0.0),
                                   grouped=True, align_theta=True)
    poses = np.asarray(sampler(jax.random.PRNGKey(7), (num_envs, 2)),
                       np.float32)
    tx = (poses[:, :, 0].mean(1) - x0) / ts
    ty = (poses[:, :, 1].mean(1) - y0) / ts
    ti_, tj_ = np.floor(tx), np.floor(ty)
    snake = np.where(tj_ % 2 == 0, ti_, 4095.0 - ti_)
    fx, fy = np.floor((tx - ti_) * 2), np.floor((ty - tj_) * 2)
    fxs = np.where(fy % 2 == 0, fx, 1.0 - fx)
    key = (tj_ * 4096.0 + snake) * 4.0 + fy * 2.0 + fxs
    poses = poses[np.argsort(key, kind="stable")].reshape(-1, 3)

    n = len(poses)
    n_pad = ((n + EA - 1) // EA) * EA
    p = np.concatenate([poses, np.zeros((n_pad - n, 3), np.float32)])
    ti = np.floor((p[:, 0] - x0) / ts).astype(int).reshape(-1, SUB)
    tj = np.floor((p[:, 1] - y0) / ts).astype(int).reshape(-1, SUB)
    lo_i, hi_i = ti.min(1), ti.max(1)
    lo_j, hi_j = tj.min(1), tj.max(1)
    sx, sy = hi_i - lo_i, hi_j - lo_j
    ok = (lo_i >= 0) & (lo_j >= 0) & (hi_i < nx) & (hi_j < ny)
    t = np.clip(lo_j * nx + lo_i, 0, nx * ny - 1)

    def pick(use_rect):
        ng = np.full(len(t), full_ng)
        sel8 = ok & (sx <= 7) & (sy <= 7)
        ng[sel8] = g8[t[sel8]]
        sel4 = ok & (sx <= 3) & (sy <= 3)
        ng[sel4] = g4[t[sel4]]
        sel2 = ok & (sx <= 1) & (sy <= 1)
        ng[sel2] = g2[t[sel2]]
        if use_rect:
            s21 = ok & (sx <= 1) & (sy == 0)
            ng[s21] = g21[t[s21]]
            s12 = ok & (sx == 0) & (sy <= 1)
            ng[s12] = g12[t[s12]]
        sel1 = ok & (sx == 0) & (sy == 0)
        ng[sel1] = g1[t[sel1]]
        return ng

    sq = pick(False)
    rc = pick(True)
    print(f"ts={ts} SUB={SUB} grid={nx}x{ny} subgroups={len(t)}")
    print(f"square tiers : mean ng = {sq.mean():.2f}")
    print(f"+2x1/1x2     : mean ng = {rc.mean():.2f}")


if __name__ == "__main__":
    main()
