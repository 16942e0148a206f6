"""All-reduce share of the sharded PPO train step (VERDICT r2 weak #6).

Runs the full sharded PPO train step (env rollout + GAE + minibatch
updates, parallel/ppo.py) on an 8-virtual-device ('env',) CPU mesh, traces
it with jax.profiler, and reports how much device time the XLA collectives
(the learner's gradient/metric all-reduces) take vs everything else. On a
real pod the collective rides ICI instead of shared host memory, so the
CPU number is an upper bound on the *op count* side of the claim
"pod efficiency is bounded by the learner all-reduce alone" — the printed
table is the measured backing for docs/performance.md.

  python tools/ppo_profile.py        # ~2 min on one CPU
"""
import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from f1tenth_gym_tpu import SimConfig, VehicleParams, load_map, make_scan_tables
from f1tenth_gym_tpu.maps import map_path as bundled_map
from f1tenth_gym_tpu.parallel import (
    batch_reset, make_mesh, replicate, shard_states, uniform_pose_sampler,
)
from f1tenth_gym_tpu.parallel.ppo import PPO, PPOConfig

COLLECTIVE_MARKERS = ("all-reduce", "allreduce", "all-gather", "allgather",
                      "reduce-scatter", "collective-permute", "all-to-all")


def build_train_step(num_envs=512):
    cfg = SimConfig(num_agents=2, num_beams=108, dtype="float32",
                    scan_engine="segments")
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=108, dtype=jnp.float32)
    md = load_map(bundled_map("example_map"), ".png", dtype=jnp.float32,
                  extract_segments=True)
    mesh = make_mesh(num_env_shards=8, num_model_shards=1)
    sampler = uniform_pose_sampler(md, clearance=0.6, component_seed=(0.7, 0.0),
                                   grouped=True, align_theta=True)
    poses = sampler(jax.random.PRNGKey(7), (num_envs, 2))
    keys = jax.random.split(jax.random.PRNGKey(0), num_envs)
    states, *_ = batch_reset(poses, keys, params, md, tables, cfg, 0.01)
    states = shard_states(states, mesh)
    ppo = PPO(replicate(params, mesh), replicate(md, mesh),
              replicate(tables, mesh), cfg, 0.01,
              PPOConfig(obs_beams=32, hidden=128, rollout_steps=16,
                        epochs=2, minibatches=4),
              mesh=mesh)
    ts = ppo.init(states, jax.random.PRNGKey(1))
    return jax.jit(ppo.train_step), ts


def main():
    train_step, ts = build_train_step()
    ts, metrics = train_step(ts)          # compile outside the trace
    jax.block_until_ready(ts.net_params)

    tmp = tempfile.mkdtemp(prefix="ppo_trace_")
    with jax.profiler.trace(tmp):
        for _ in range(3):
            ts, metrics = train_step(ts)
        jax.block_until_ready(ts.net_params)

    xplane = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                       recursive=True)
    assert xplane, f"no xplane trace written under {tmp}"
    from jax.profiler import ProfileData

    data = ProfileData.from_file(xplane[0])
    coll_ps, total_ps = 0, 0
    by_name = {}
    for plane in data.planes:
        # device planes hold the XLA op events; skip python/host threads
        if "TPU" not in plane.name and "CPU" not in plane.name \
                and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                name = ev.name.lower()
                dur = ev.duration_ns
                total_ps += dur
                if any(m in name for m in COLLECTIVE_MARKERS):
                    coll_ps += dur
                    key = ev.name.split(".")[0]
                    by_name[key] = by_name.get(key, 0) + dur
    assert total_ps > 0, "trace parsed to zero device time"
    share = coll_ps / total_ps
    print("| component | device time (3 sharded train steps) | share |")
    print("|---|---|---|")
    print(f"| XLA collectives (all-reduce family) | {coll_ps/1e6:.2f} ms "
          f"| {100*share:.2f}% |")
    print(f"| compute + local memory ops | {(total_ps-coll_ps)/1e6:.2f} ms "
          f"| {100*(1-share):.2f}% |")
    for k, v in sorted(by_name.items(), key=lambda kv: -kv[1])[:5]:
        print(f"#   {k}: {v/1e6:.3f} ms")
    print(json.dumps({
        "metric": "ppo_collective_share_8shard_cpu",
        "value": round(share, 5),
        "unit": "fraction_of_device_time",
        "collective_ms": round(coll_ps / 1e6, 3),
        "total_ms": round(total_ps / 1e6, 3),
    }))


if __name__ == "__main__":
    main()
