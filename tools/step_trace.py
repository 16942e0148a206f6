"""Device-time breakdown of a workload step via jax.profiler + xplane.

Runs a few steps of the chosen workload on the current backend under
jax.profiler.trace and prints the top ops by device time (the Pallas scan
kernel shows up as a tpu_custom_call / fusion entry).

  python tools/step_trace.py single     # the bench single-track step
  python tools/step_trace.py multi      # the 16-track domain-rand step
"""
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("F1TENTH_PALLAS_EA",
                      "8" if (len(sys.argv) > 1 and sys.argv[1] == "single")
                      else "32")
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

from f1tenth_gym_tpu import SimConfig, VehicleParams, load_map, make_scan_tables
from f1tenth_gym_tpu.maps import map_path as bundled_map
from f1tenth_gym_tpu.parallel import (
    batch_reset, make_autoreset_step, sort_envs_for_locality,
    uniform_pose_sampler,
)

E = int(os.environ.get("TRACE_ENVS", 4096))
B = 1080
STEPS = int(os.environ.get("TRACE_STEPS", 8))


def build_single():
    md = load_map(bundled_map("example_map"), ".png", dtype=jnp.float32,
                  extract_segments=True, tile_culling=True,
                  culling_tile_size=1.25)
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=B, dtype=jnp.float32)
    cfg = SimConfig(num_agents=2, num_beams=B, dtype="float32",
                    scan_engine="pallas")
    sampler = uniform_pose_sampler(md, clearance=0.6, component_seed=(0.7, 0.0),
                                   grouped=True, align_theta=True)
    poses = sampler(jax.random.PRNGKey(7), (E, 2))
    ks = jax.random.split(jax.random.PRNGKey(0), E)
    states, *_ = batch_reset(poses, ks, params, md, tables, cfg, 0.01)
    tm = np.asarray(md.tile_meta)
    states = sort_envs_for_locality(
        states, tile_size=1.0 / float(tm[2]),
        origin=(float(tm[0]), float(tm[1])))
    astep = make_autoreset_step(params, md, tables, cfg, 0.01,
                                reset_to_start=True)
    acts = jnp.zeros((E, 2, 2), jnp.float32).at[..., 1].set(2.0)

    @jax.jit
    def f(s):
        s, *_ = astep.impl(s, acts, md)
        return s
    return f, states


def build_multi():
    from f1tenth_gym_tpu.tracks.multi import (
        multi_track_locality_sort, multi_track_map_data,
        multi_track_pose_sampler,
    )
    md, infos = multi_track_map_data(16, seed=0, tile_culling=True,
                                     culling_tile_size=2.5)
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=B, dtype=jnp.float32)
    cfg = SimConfig(num_agents=2, num_beams=B, dtype="float32",
                    scan_engine="pallas")
    sampler = multi_track_pose_sampler(infos)
    poses = sampler(jax.random.PRNGKey(7), (E, 2))
    ks = jax.random.split(jax.random.PRNGKey(1), E)
    states, *_ = batch_reset(poses, ks, params, md, tables, cfg, 0.01)
    states = multi_track_locality_sort(md, infos)(states)
    astep = make_autoreset_step(params, md, tables, cfg, 0.01,
                                reset_to_start=True)
    acts = jnp.zeros((E, 2, 2), jnp.float32).at[..., 1].set(2.0)

    @jax.jit
    def f(s, mm):
        s, *_ = astep.impl(s, acts, mm)
        return s
    import functools
    return functools.partial(f, mm=md), states


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "single"
    f, states = build_single() if kind == "single" else build_multi()
    s = f(states)
    _ = float(jnp.sum(s.x))
    tmp = tempfile.mkdtemp(prefix="step_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(STEPS):
            s = f(s)
        _ = float(jnp.sum(s.x))

    xplane = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    assert xplane, f"no xplane under {tmp}"
    from jax.profiler import ProfileData

    data = ProfileData.from_file(xplane[0])
    by_name = {}
    total = 0
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                total += dur
                key = ev.name.split(".")[0][:70]
                by_name[key] = by_name.get(key, 0) + dur
    print(f"# {kind}: {STEPS} steps, total device time "
          f"{total/1e6:.2f} ms ({total/1e6/STEPS:.3f} ms/step)")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v/1e6/STEPS:8.3f} ms/step  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
