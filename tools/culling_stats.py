"""Host-side culling effectiveness stats for the bench workload.

For the bench's racing workload (grouped corridor spawns, tile-snake
locality sort), reports — per culling tile size — how many 16-scan kernel
programs resolve to each window size (1x1 / 2x2 / 4x4 / full) and the mean
number of 8-segment groups actually swept. This is the number the kernel's
group loop scales with; compare against `tools/kernel_phases.py` for the
fixed-cost side.

  BENCH_CULL_TS=1.25 python tools/culling_stats.py
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
from f1tenth_gym_tpu.ops.pallas_scan import EA, GROUP, SUB, select_windows  # noqa: E402
from f1tenth_gym_tpu.parallel import uniform_pose_sampler
from f1tenth_gym_tpu.parallel.vector import tile_snake_key  # noqa: E402


def stats_for(md, poses):
    """poses (N, 3) already locality-sorted; returns per-SUBGROUP window
    tier usage and the PER-SCAN swept group count (v9: common part shared
    by the subgroup + each scan's own extras range)."""
    tm = np.asarray(md.tile_meta)
    x0, y0, inv_ts = tm[0], tm[1], tm[2]
    nx, ny = int(tm[3]), int(tm[4])
    T = nx * ny
    ng_all = np.asarray(md.tile_ngroups)
    blockmap = np.asarray(md.tile_blockmap)
    ext = None if md.tile_ext is None else np.asarray(md.tile_ext)
    full_ng = int(ng_all[0])

    p = np.asarray(poses, np.float32)
    n = len(p)
    n_pad = ((n + EA - 1) // EA) * EA
    p = np.concatenate([p, np.zeros((n_pad - n, 3), np.float32)])
    ti = np.floor((p[:, 0] - x0) * inv_ts).astype(int).reshape(-1, SUB)
    tj = np.floor((p[:, 1] - y0) * inv_ts).astype(int).reshape(-1, SUB)
    # the kernel's own selection cascade — shared, not re-implemented
    bid, ng, est, ecnt = select_windows(
        jnp.asarray(ti), jnp.asarray(tj), jnp.asarray(blockmap),
        jnp.asarray(ng_all), None if ext is None else jnp.asarray(ext),
        nx, ny, full_ng)
    bid = np.asarray(bid)
    ng = np.asarray(ng)
    ecnt = np.asarray(ecnt)
    # tier attribution (dedup makes it unrecoverable from bid; recompute
    # the cascade conditions the way select_windows does)
    ti_lo, ti_hi = ti.min(-1), ti.max(-1)
    tj_lo, tj_hi = tj.min(-1), tj.max(-1)
    in_grid = (ti_lo >= 0) & (tj_lo >= 0) & (ti_hi < nx) & (tj_hi < ny)
    sx, sy = ti_hi - ti_lo, tj_hi - tj_lo
    tidx = np.clip(tj_lo * nx + ti_lo, 0, T - 1)
    use1 = in_grid & (sx == 0) & (sy == 0) & (blockmap[T + tidx] >= 0)
    use2 = (in_grid & (sx <= 1) & (sy <= 1) & (blockmap[tidx] >= 0)
            & ~use1)
    use4 = (in_grid & (sx <= 3) & (sy <= 3) & (blockmap[2 * T + tidx] >= 0)
            & ~use1 & ~use2)
    use8 = (in_grid & (sx <= 7) & (sy <= 7) & (blockmap[3 * T + tidx] >= 0)
            & ~use1 & ~use2 & ~use4)
    per_scan = ng[:, None] + ecnt  # (nsub, SUB) groups each scan sweeps
    return {
        "programs": n_pad // EA,
        "subgroups": len(ng),
        "w1": int(use1.sum()), "w2": int(use2.sum()),
        "w4": int(use4.sum()), "w8": int(use8.sum()),
        "full": int((~(use1 | use2 | use4 | use8)).sum()),
        "mean_ng": float(per_scan.mean()),
        "mean_common": float(ng.mean()),
        "full_ng": full_ng,
        "mean_segs": float(per_scan.mean()) * GROUP,
        "speedup_vs_full": full_ng / float(per_scan.mean()),
    }


def main():
    ts = float(os.environ.get("BENCH_CULL_TS", 2.5))
    num_envs = int(os.environ.get("BENCH_ENVS", 4096))
    md = load_map(bundled_map("example_map"), ".png", dtype=jnp.float32,
                  extract_segments=True, tile_culling=True,
                  culling_tile_size=ts)
    sampler = uniform_pose_sampler(md, clearance=0.6, component_seed=(0.7, 0.0),
                                   grouped=True, align_theta=True)
    poses = np.asarray(sampler(jax.random.PRNGKey(7), (num_envs, 2)),
                       np.float32)
    # the bench's tile-snake sort on env (agent-midpoint) keys — the
    # SHARED key definition (parallel.vector.tile_snake_key)
    tm = np.asarray(md.tile_meta)
    key = np.asarray(tile_snake_key(
        poses[:, :, 0].mean(1), poses[:, :, 1].mean(1),
        1.0 / float(tm[2]), (float(tm[0]), float(tm[1]))))
    poses = poses[np.argsort(key, kind="stable")]

    s = stats_for(md, poses.reshape(-1, 3))
    kmax = md.tile_tables.shape[1] // GROUP
    print(f"ts={ts} grid={int(tm[3])}x{int(tm[4])} EA={EA} SUB={SUB} "
          f"kmax={kmax}g")
    print(f"programs={s['programs']} subgroups={s['subgroups']}  "
          f"1x1={s['w1']}  2x2={s['w2']}  4x4={s['w4']}  8x8={s['w8']}  "
          f"full={s['full']}")
    print(f"mean swept groups/SCAN = {s['mean_ng']:.2f} "
          f"(shared/common part {s['mean_common']:.2f}; full set: "
          f"{s['full_ng']}) -> {s['speedup_vs_full']:.2f}x row cull")


if __name__ == "__main__":
    main()
