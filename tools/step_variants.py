"""Timing harness for full-step variants and isolated kernels on TPU.

Measures, on the bench workload (4096 envs x 2 agents x 1080 beams,
example map, locality-sorted racing poses):

  step/unfused-arg    full autoreset step, map as jit arg
  step/unfused-const  same, map embedded as jit constants
  kern/scan-unfused   scan_pallas alone at 8192 scans
  kern/overlay        overlay_opponents_pallas alone at 8192 scans, O=1
  xla/extras          the XLA noise+iTTC+opponent block alone

Used to bisect the round-3 fused-extras regression (BENCH_r02 524k ->
BENCH_r03 413k). Usage: python tools/step_variants.py [keys...]
"""

import os
import sys
import time

os.environ.setdefault("F1TENTH_PALLAS_EA", "8")

import jax

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from f1tenth_gym_tpu.core.simulator import _elig_kwargs
from f1tenth_gym_tpu import SimConfig, VehicleParams, load_map, make_scan_tables
from f1tenth_gym_tpu.maps import map_path as bundled_map
from f1tenth_gym_tpu.parallel import (
    batch_reset, make_autoreset_step, sort_envs_for_locality,
    uniform_pose_sampler,
)

E = int(os.environ.get("SV_ENVS", 4096))
STEPS = int(os.environ.get("SV_STEPS", 64))
B = 1080


def fence(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.time()
    for _ in range(STEPS):
        out = fn(*args)
    fence(out)
    return (time.time() - t0) / STEPS


def main():
    keys = sys.argv[1:] or ["step/unfused-arg", "step/unfused-const",
                            "kern/scan-unfused", "kern/overlay",
                            "xla/extras"]
    os.environ.setdefault(
        "F1TENTH_TPU_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".map_cache"))
    md = load_map(bundled_map("example_map"), ".png", dtype=jnp.float32,
                  extract_segments=True, tile_culling=True,
                  culling_tile_size=1.25)
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=B, dtype=jnp.float32)
    sampler = uniform_pose_sampler(md, clearance=0.6, component_seed=(0.7, 0.0),
                                   grouped=True, align_theta=True)
    poses = sampler(jax.random.PRNGKey(7), (E, 2))
    ks = jax.random.split(jax.random.PRNGKey(0), E)
    tm = np.asarray(md.tile_meta)
    sort_kw = dict(tile_size=1.0 / float(tm[2]), origin=(float(tm[0]),
                                                         float(tm[1])))

    def build_step(const):
        cfg = SimConfig(num_agents=2, num_beams=B, dtype="float32",
                        scan_engine="pallas")
        states, *_ = batch_reset(poses, ks, params, md, tables, cfg, 0.01)
        states = sort_envs_for_locality(states, **sort_kw)
        astep = make_autoreset_step(params, md, tables, cfg, 0.01,
                                    reset_to_start=True)
        acts = jnp.zeros((E, 2, 2), jnp.float32).at[..., 1].set(2.0)
        if const:
            @jax.jit
            def f(s):
                s, *_ = astep.impl(s, acts, md)
                return s
        else:
            @jax.jit
            def f(s, m):
                s, *_ = astep.impl(s, acts, m)
                return s
            f = functools.partial(f, m=md)
        return f, states

    # flat scan workload for the isolated kernels
    flat = poses.reshape(-1, 3)
    key_flat = tile_snake_sorted(flat, sort_kw)

    for k in keys:
        if k == "step/unfused-arg":
            f, s = build_step(False)
            dt = timeit(f, s)
        elif k == "step/unfused-const":
            f, s = build_step(True)
            dt = timeit(f, s)
        elif k == "kern/scan-unfused":
            from f1tenth_gym_tpu.ops.pallas_scan import scan_pallas
            f = jax.jit(lambda p: scan_pallas(
                p, md.seg_table, tables, B, 2000,
                tile_tables=md.tile_tables, tile_ngroups=md.tile_ngroups,
                tile_meta=md.tile_meta,
                tile_blockmap=md.tile_blockmap,
                tile_ext=md.tile_ext, **_elig_kwargs(md)))
            dt = timeit(f, key_flat)
        elif k == "kern/overlay":
            from f1tenth_gym_tpu.ops import collision as col_ops
            from f1tenth_gym_tpu.ops.pallas_scan import (
                overlay_opponents_pallas)
            sc = jnp.full((key_flat.shape[0], B), 10.0, jnp.float32)
            opp = key_flat.at[:, 0].add(1.5)
            ov = col_ops.get_vertices(opp, params.length,
                                      params.width)[:, None]
            f = jax.jit(lambda s, p, o: overlay_opponents_pallas(
                s, p, o, tables, B, 2000))
            dt = timeit(f, sc, key_flat, ov)
        elif k == "xla/extras":
            from f1tenth_gym_tpu.ops import collision as col_ops
            from f1tenth_gym_tpu.ops import lidar as lidar_ops
            sc = jnp.full((E, 2, B), 10.0, jnp.float32)
            pp = poses
            vel = jnp.full((E, 2), 2.0, jnp.float32)
            kk = jax.random.split(jax.random.PRNGKey(3), E)

            @jax.jit
            def f(scans, pb, v, keyb):
                nz = jax.vmap(lambda kb: 0.01 * jax.random.normal(
                    jax.random.fold_in(kb, 0), (B,), jnp.float32))(keyb)
                scans = scans + nz[:, None, :]
                hit = jax.vmap(lambda s, vv: lidar_ops.check_ttc(
                    s, vv, tables))(scans, v)
                verts = jax.vmap(lambda p: col_ops.get_vertices(
                    p, params.length, params.width))(pb)
                opp_idx = np.stack([np.delete(np.arange(2), i)
                                    for i in range(2)])
                scans = jax.vmap(jax.vmap(
                    lambda p, s, ovv: col_ops.ray_cast_opponents(
                        p, s, ovv, tables)))(pb, scans, verts[:, opp_idx])
                return scans, hit
            dt = timeit(f, sc, pp, vel, kk)
        elif k == "step/scan16":
            # amortize per-dispatch overhead: 16 steps per jit call via
            # lax.scan (the bench's python loop dispatches one step/call)
            cfg = SimConfig(num_agents=2, num_beams=B, dtype="float32",
                            scan_engine="pallas")
            states, *_ = batch_reset(poses, ks, params, md, tables, cfg,
                                     0.01)
            states = sort_envs_for_locality(states, **sort_kw)
            astep = make_autoreset_step(params, md, tables, cfg, 0.01,
                                        reset_to_start=True)
            acts = jnp.zeros((E, 2, 2), jnp.float32).at[..., 1].set(2.0)

            @jax.jit
            def f16(s):
                def one(ss, _):
                    ss, *_ = astep.impl(ss, acts, md)
                    return ss, ()
                s, _ = jax.lax.scan(one, s, None, length=16)
                return s
            dt = timeit(f16, states) / 16.0
        elif k == "xla/noise-rbg":
            kk = jax.random.split(
                jax.random.key(3, impl="rbg"), E)
            sc = jnp.full((E, 2, B), 10.0, jnp.float32)

            @jax.jit
            def f(scans, keyb):
                nz = jax.vmap(lambda kb: 0.01 * jax.random.normal(
                    jax.random.fold_in(kb, 0), (B,), jnp.float32))(keyb)
                return scans + nz[:, None, :]
            dt = timeit(f, sc, kk)
        elif k == "xla/noise":
            kk = jax.random.split(jax.random.PRNGKey(3), E)
            sc = jnp.full((E, 2, B), 10.0, jnp.float32)

            @jax.jit
            def f(scans, keyb):
                nz = jax.vmap(lambda kb: 0.01 * jax.random.normal(
                    jax.random.fold_in(kb, 0), (B,), jnp.float32))(keyb)
                return scans + nz[:, None, :]
            dt = timeit(f, sc, kk)
        elif k == "xla/ttc":
            from f1tenth_gym_tpu.ops import lidar as lidar_ops
            sc = jnp.full((E, 2, B), 10.0, jnp.float32)
            vel = jnp.full((E, 2), 2.0, jnp.float32)
            f = jax.jit(lambda s, v: jax.vmap(
                lambda ss, vv: lidar_ops.check_ttc(ss, vv, tables))(s, v))
            dt = timeit(f, sc, vel)
        elif k == "xla/opponents":
            from f1tenth_gym_tpu.ops import collision as col_ops
            sc = jnp.full((E, 2, B), 10.0, jnp.float32)

            @jax.jit
            def f(scans, pb):
                verts = jax.vmap(lambda p: col_ops.get_vertices(
                    p, params.length, params.width))(pb)
                opp_idx = np.stack([np.delete(np.arange(2), i)
                                    for i in range(2)])
                return jax.vmap(jax.vmap(
                    lambda p, s, ovv: col_ops.ray_cast_opponents(
                        p, s, ovv, tables)))(pb, scans, verts[:, opp_idx])
            dt = timeit(f, sc, poses)
        elif k == "xla/collision":
            from f1tenth_gym_tpu.ops import collision as col_ops

            @jax.jit
            def f(pb):
                verts = jax.vmap(lambda p: col_ops.get_vertices(
                    p, params.length, params.width))(pb)
                return jax.vmap(col_ops.collision_multiple)(verts)
            dt = timeit(f, poses)
        else:
            raise SystemExit(f"unknown key {k}")
        n_scans = E * 2
        print(f"{k:20s} {dt*1e3:8.3f} ms/call  "
              f"({n_scans / dt / 1e3:7.0f}k scans/s)", flush=True)


def tile_snake_sorted(flat, sort_kw):
    from f1tenth_gym_tpu.parallel.vector import tile_snake_key
    key = tile_snake_key(flat[:, 0], flat[:, 1], sort_kw["tile_size"],
                         sort_kw["origin"])
    return flat[jnp.argsort(key)]


if __name__ == "__main__":
    main()
