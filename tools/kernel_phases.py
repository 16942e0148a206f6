"""Per-phase cost breakdown of the Pallas LiDAR kernel on real hardware.

Times scan_pallas on the headline workload (8192 racing scans, 1080 beams,
culled tables) with the kernel's static phase mask set to:

  dirs            — beam-direction generation only
  dirs,sweep      — + the segment-group sweep (the main loop)
  dirs,sweep,out  — + the out-phase reduction/clamp (production)

The deltas are the per-phase costs. Run on the TPU:

  python tools/kernel_phases.py            # example map, ts from BENCH_CULL_TS

Prints a markdown table for docs/performance.md.
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
from f1tenth_gym_tpu.ops.pallas_scan import scan_pallas
from f1tenth_gym_tpu.parallel import uniform_pose_sampler
from f1tenth_gym_tpu.parallel.vector import tile_snake_key


def main():
    n_scans = int(os.environ.get("PHASE_SCANS", 8192))
    num_beams = int(os.environ.get("BENCH_BEAMS", 1080))
    # default matches bench.py's culling grid (1.25 m) so the phase table
    # describes the shipped configuration
    ts = float(os.environ.get("BENCH_CULL_TS", 1.25))
    reps = int(os.environ.get("PHASE_REPS", 30))

    cfg = SimConfig(num_agents=2, num_beams=num_beams, dtype="float32")
    tables = make_scan_tables(num_beams=num_beams, dtype=jnp.float32)
    md = load_map(bundled_map("example_map"), ".png", dtype=jnp.float32,
                  extract_segments=True, tile_culling=True,
                  culling_tile_size=ts)

    sampler = uniform_pose_sampler(md, clearance=0.6, component_seed=(0.7, 0.0),
                                   grouped=True, align_theta=True)
    poses = np.asarray(sampler(jax.random.PRNGKey(7), (n_scans // 2, 2)),
                       np.float32)
    # tile-snake locality sort on the scan midpoints — the SHARED bench
    # key (parallel.vector.tile_snake_key, incl. the quadrant secondary)
    tm = np.asarray(md.tile_meta)
    key = np.asarray(tile_snake_key(
        poses[:, :, 0].mean(1), poses[:, :, 1].mean(1),
        1.0 / float(tm[2]), (float(tm[0]), float(tm[1]))))
    poses = poses[np.argsort(key, kind="stable")]
    p = jnp.asarray(poses.reshape(-1, 3))

    results = {}
    for phases in ("dirs", "dirs,sweep", "dirs,sweep,out"):
        # outer jit closing over the map (tables as CONSTANTS) — the
        # configuration bench.py runs; argument-mode tables measured
        # ~1.1 ms/step slower (tools/step_variants.py)
        @jax.jit
        def f(pp, _phases=phases):
            return scan_pallas(pp, md.seg_table, tables, num_beams,
                               cfg.theta_dis, tile_tables=md.tile_tables,
                               tile_ngroups=md.tile_ngroups,
                               tile_meta=md.tile_meta,
                               tile_blockmap=md.tile_blockmap,
                               tile_ext=md.tile_ext,
                               phases=_phases, **_elig_kwargs(md))
        r = f(p)
        _ = float(jnp.sum(r))
        t0 = time.time()
        for _ in range(reps):
            r = f(p)
        _ = float(jnp.sum(r))
        results[phases] = (time.time() - t0) / reps * 1e3
        print(f"# {phases}: {results[phases]:.3f} ms", file=sys.stderr)

    dirs = results["dirs"]
    sweep = results["dirs,sweep"] - dirs
    out = results["dirs,sweep,out"] - results["dirs,sweep"]
    total = results["dirs,sweep,out"]
    print("| phase | ms @ 8192 scans | share |")
    print("|---|---|---|")
    for name, v in (("dirs (+grid/DMA overhead)", dirs), ("group sweep", sweep),
                    ("out reduce + clamp", out)):
        print(f"| {name} | {v:.2f} | {100*v/total:.0f}% |")
    print(f"| **total kernel** | **{total:.2f}** | 100% |")
    print(json.dumps({"metric": "kernel_phase_ms", "value": round(total, 3),
                      "unit": "ms",
                      "phases": {k: round(v, 3) for k, v in
                                 (("dirs", dirs), ("sweep", sweep),
                                  ("out", out))}}))


if __name__ == "__main__":
    main()
