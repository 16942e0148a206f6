"""Massive vectorized rollout: thousands of racing envs on one chip.

The reference steps ONE env per process; this steps E envs in one compiled
program with full 1080-beam lidar and auto-reset.

    python examples/massive_rollout.py --envs 4096 --steps 512
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from f1tenth_gym_tpu import SimConfig, VehicleParams, load_map, make_scan_tables
from f1tenth_gym_tpu.maps import map_path
from f1tenth_gym_tpu.parallel import (
    batch_reset,
    make_autoreset_step,
    sort_envs_for_locality,
    uniform_pose_sampler,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="twisty")
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--agents", type=int, default=2)
    ap.add_argument("--engine", default="pallas")
    args = ap.parse_args()

    cfg = SimConfig(num_agents=args.agents, num_beams=1080, dtype="float32",
                    scan_engine=args.engine)
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=1080, dtype=jnp.float32)
    m = load_map(map_path(args.map), ".png", dtype=jnp.float32,
                 extract_segments=True,
                 tile_culling=(args.engine == "pallas"))

    # racing spawn: adjacent start-grid groups facing down the corridor
    sampler = uniform_pose_sampler(m, clearance=0.8, grouped=True,
                                   align_theta=True)
    poses = sampler(jax.random.PRNGKey(7), (args.envs, args.agents))
    keys = jax.random.split(jax.random.PRNGKey(0), args.envs)
    states, *_ = batch_reset(poses, keys, params, m, tables, cfg, 0.01)
    astep = make_autoreset_step(params, m, tables, cfg, 0.01,
                                reset_to_start=True)

    @jax.jit
    def policy_step(s, k, mm):  # map as jit ARG: tables stay out of the HLO
        k, sub = jax.random.split(k)
        scans = s.scans
        B = scans.shape[-1]
        left = scans[..., : B // 2].mean(-1)
        right = scans[..., B // 2:].mean(-1)
        steer = jnp.clip(0.25 * (right - left) / 30.0, -0.4, 0.4)
        actions = jnp.stack([steer, jnp.full_like(steer, 3.0)], axis=-1)
        s, _, r, done, _ = astep.impl(s, actions, mm)
        return s, k, jnp.sum(done)

    s, k, d = policy_step(states, jax.random.PRNGKey(1), m)
    s = sort_envs_for_locality(s)  # keep scan programs tile-homogeneous
    jax.block_until_ready(s.x)
    t0 = time.time()
    for i in range(args.steps):
        if i % 32 == 0:
            s = sort_envs_for_locality(s)
        s, k, d = policy_step(s, k, m)
    jax.block_until_ready(s.x)
    dt = time.time() - t0
    rate = args.envs * args.steps / dt
    print(f"{args.envs} envs x {args.steps} steps in {dt:.2f}s "
          f"-> {rate:,.0f} env-steps/s "
          f"({rate/100:,.0f}x realtime at the 100 Hz physics rate)")


if __name__ == "__main__":
    main()
