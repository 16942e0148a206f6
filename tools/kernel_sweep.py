"""Hardware sweep of the Pallas scan kernel's tuning knobs in ONE process.

Times scan_pallas end-to-end (dirs+sweep+out, culled tables) on the bench
workload for a list of (EA, SUB, tile_size) configs, monkeypatching the
module knobs and clearing jit caches between configs. One remote compile
per config; map tables are disk-cached per tile size.

  SWEEP="32:8:1.25,32:1:1.25,32:1:0.85" python tools/kernel_sweep.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "F1TENTH_TPU_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".map_cache"))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu.core.simulator import _elig_kwargs
from f1tenth_gym_tpu import SimConfig, load_map, make_scan_tables
from f1tenth_gym_tpu.maps import map_path as bundled_map
from f1tenth_gym_tpu.ops import pallas_scan
from f1tenth_gym_tpu.parallel import uniform_pose_sampler
from f1tenth_gym_tpu.parallel.vector import tile_snake_key


def main():
    n_scans = int(os.environ.get("SWEEP_SCANS", 8192))
    num_beams = int(os.environ.get("BENCH_BEAMS", 1080))
    reps = int(os.environ.get("SWEEP_REPS", 30))
    specs = os.environ.get("SWEEP", "32:8:1.25,32:1:1.25").split(",")
    mapname = os.environ.get("SWEEP_MAP", "example_map")

    cfg = SimConfig(num_agents=2, num_beams=num_beams, dtype="float32")
    tables = make_scan_tables(num_beams=num_beams, dtype=jnp.float32)
    maps = {}
    rows = []
    for spec in specs:
        ea_s, sub_s, ts_s = spec.split(":")
        ea, sub, ts = int(ea_s), int(sub_s), float(ts_s)
        if ts not in maps:
            md = load_map(bundled_map(mapname), ".png",
                          dtype=jnp.float32, extract_segments=True,
                          tile_culling=True, culling_tile_size=ts,
                          culling_split_cap=int(
                              os.environ.get("SWEEP_CAP", 96)))
            # poses are deterministic given the map and PRNGKey(7): cache
            # the sorted array alongside the map so repeated tile sizes
            # don't redo the host-side sampling + snake sort
            sampler = uniform_pose_sampler(md, clearance=0.6,
                                           component_seed=(0.7, 0.0),
                                           grouped=True, align_theta=True)
            poses = np.asarray(
                sampler(jax.random.PRNGKey(7), (n_scans // 2, 2)),
                np.float32)
            tm = np.asarray(md.tile_meta)
            key = np.asarray(tile_snake_key(
                poses[:, :, 0].mean(1), poses[:, :, 1].mean(1),
                1.0 / float(tm[2]), (float(tm[0]), float(tm[1]))))
            poses = poses[np.argsort(key, kind="stable")]
            maps[ts] = (md, jnp.asarray(poses.reshape(-1, 3)))
        md, p = maps[ts]

        pallas_scan.EA, pallas_scan.SUB = ea, sub
        jax.clear_caches()

        # outer jit closing over the map: tables ride as CONSTANTS, the
        # configuration bench.py runs (argument-mode tables measured
        # ~1.1 ms/step slower on v5e, tools/step_variants.py)
        @jax.jit
        def f(pp):
            return pallas_scan.scan_pallas(
                pp, md.seg_table, tables, num_beams, cfg.theta_dis,
                tile_tables=md.tile_tables, tile_ngroups=md.tile_ngroups,
                tile_meta=md.tile_meta,
                tile_blockmap=md.tile_blockmap,
                tile_ext=md.tile_ext, **_elig_kwargs(md))
        t0 = time.time()
        r = f(p)
        chk = float(jnp.sum(r))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(reps):
            r = f(p)
        _ = float(jnp.sum(r))
        ms = (time.time() - t0) / reps * 1e3
        rows.append({"EA": ea, "SUB": sub, "ts": ts,
                     "kernel_ms": round(ms, 3),
                     "scans_per_s": round(n_scans / ms * 1e3),
                     "compile_s": round(compile_s, 1),
                     "checksum": chk})
        print(f"# EA={ea} SUB={sub} ts={ts}: {ms:.3f} ms "
              f"({n_scans/ms*1e3:,.0f} scans/s, compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
    # culling is exact: EA/SUB must not change results, so configs sharing
    # a tile size (same poses, same tables) must agree bit-for-bit on the
    # checksum — a divergence is a kernel correctness regression
    by_ts = {}
    for row in rows:
        by_ts.setdefault(row["ts"], set()).add(row["checksum"])
    for ts, chks in by_ts.items():
        if len(chks) > 1:
            print(f"# WARNING: checksum divergence at ts={ts}: {chks} — "
                  "EA/SUB changed kernel RESULTS (correctness regression)",
                  file=sys.stderr, flush=True)
            raise SystemExit(2)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
