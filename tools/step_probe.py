"""On-hardware cost breakdown of the full env step vs its kernels.

Times, on the bench workload (4096 envs x 2 agents, 1080 beams, sorted):
  scan-only  — scan_pallas
  overlay    — the opponent ray-cast kernel alone
  step — the full autoreset step

Env knobs: F1TENTH_PALLAS_EA / _SUB (set before import), BENCH_CULL_TS,
PROBE_ENVS, PROBE_WHAT (comma list to restrict).
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
from f1tenth_gym_tpu import (SimConfig, VehicleParams, load_map,
                             make_scan_tables)
from f1tenth_gym_tpu.maps import map_path as bundled_map
from f1tenth_gym_tpu.ops import collision as col_ops
from f1tenth_gym_tpu.ops.pallas_scan import (overlay_opponents_pallas,
                                             scan_pallas)
from f1tenth_gym_tpu.parallel import (batch_reset, make_autoreset_step,
                                      sort_envs_for_locality,
                                      uniform_pose_sampler)
from f1tenth_gym_tpu.parallel.vector import tile_snake_key


def timeit(f, *args, reps=20):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / reps * 1e3


def main():
    num_envs = int(os.environ.get("PROBE_ENVS", 4096))
    num_beams = 1080
    ts = float(os.environ.get("BENCH_CULL_TS", 1.25))
    what = set(filter(None, os.environ.get(
        "PROBE_WHAT", "scan,overlay,step").split(",")))

    cfg = SimConfig(num_agents=2, num_beams=num_beams, dtype="float32",
                    scan_engine="pallas")
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=num_beams, dtype=jnp.float32)
    md = load_map(bundled_map("example_map"), ".png", dtype=jnp.float32,
                  extract_segments=True, tile_culling=True,
                  culling_tile_size=ts)
    sampler = uniform_pose_sampler(md, clearance=0.6, component_seed=(0.7, 0.0),
                                   grouped=True, align_theta=True)
    poses = np.asarray(sampler(jax.random.PRNGKey(7), (num_envs, 2)),
                       np.float32)
    tm = np.asarray(md.tile_meta)
    key = np.asarray(tile_snake_key(
        poses[:, :, 0].mean(1), poses[:, :, 1].mean(1),
        1.0 / float(tm[2]), (float(tm[0]), float(tm[1]))))
    poses = poses[np.argsort(key, kind="stable")]
    p = jnp.asarray(poses.reshape(-1, 3))
    n = p.shape[0]
    res = {}

    if "scan" in what:
        def f_scan(pp):
            return scan_pallas(pp, md.seg_table, tables, num_beams,
                               cfg.theta_dis, tile_tables=md.tile_tables,
                               tile_ngroups=md.tile_ngroups,
                               tile_meta=md.tile_meta,
                               tile_blockmap=md.tile_blockmap,
                               tile_ext=md.tile_ext, **_elig_kwargs(md))
        res["scan_ms"] = timeit(f_scan, p)

    if "overlay" in what:
        sc = jnp.full((num_envs, 2, num_beams), 10.0, jnp.float32)
        pp2 = p.reshape(num_envs, 2, 3)
        verts = col_ops.get_vertices(pp2.reshape(-1, 3), params.length,
                                     params.width).reshape(num_envs, 2, 4, 2)
        opp = verts[:, ::-1][:, :, None]  # (E, 2, 1, 4, 2)

        def f_ov(sc, pp2, opp):
            return overlay_opponents_pallas(
                sc.reshape(-1, num_beams), pp2.reshape(-1, 3),
                opp.reshape(-1, 1, 4, 2), tables, num_beams, cfg.theta_dis)
        res["overlay_ms"] = timeit(f_ov, sc, pp2, opp)

    for name in ("step",):
        if name not in what:
            continue
        c = cfg
        keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
        states, *_ = batch_reset(jnp.asarray(poses), keys, params, md,
                                 tables, c, 0.01)
        astep = make_autoreset_step(params, md, tables, c, 0.01,
                                    reset_to_start=True)

        @jax.jit
        def f_step(s, m):
            a = jnp.zeros((num_envs, 2, 2), jnp.float32).at[..., 1].set(2.0)
            s, *_ = astep.impl(s, a, m)
            return s

        s = sort_envs_for_locality(
            states, tile_size=1.0 / float(tm[2]),
            origin=(float(tm[0]), float(tm[1])))
        res[name + "_ms"] = timeit(f_step, s, md, reps=30)

    ea = os.environ.get("F1TENTH_PALLAS_EA", "32")
    sub = os.environ.get("F1TENTH_PALLAS_SUB", "8")
    res = {k: round(v, 3) for k, v in res.items()}
    print(json.dumps({"EA": ea, "SUB": sub, "ts": ts, "envs": num_envs,
                      **res}))


if __name__ == "__main__":
    main()
