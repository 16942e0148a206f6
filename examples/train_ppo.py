"""Train a PPO driving policy on a bundled track, fully on-device.

The reference has no training code; this is the TPU-native equivalent of
"spawn many gym processes and train": E envs step in lockstep inside the
jitted train step, sharded over whatever devices are visible.

    python examples/train_ppo.py --envs 1024 --iters 50
"""

import argparse
import time

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu import SimConfig, VehicleParams, load_map, make_scan_tables
from f1tenth_gym_tpu.maps import map_path
from f1tenth_gym_tpu.parallel import batch_reset, make_mesh, replicate, shard_states
from f1tenth_gym_tpu.parallel.ppo import PPO, PPOConfig
from f1tenth_gym_tpu.parallel.vector import uniform_pose_sampler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--map", default="compact")
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--beams", type=int, default=1080)
    ap.add_argument("--engine", default="pallas")
    ap.add_argument("--save", default="", help="save policy params to this path")
    ap.add_argument("--restore", default="", help="resume policy params from this path")
    ap.add_argument("--metrics-out", default="",
                    help="append per-iteration metrics to this JSONL file")
    args = ap.parse_args()

    cfg = SimConfig(num_agents=1, num_beams=args.beams, dtype="float32",
                    scan_engine=args.engine)
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=args.beams, dtype=jnp.float32)
    m = load_map(map_path(args.map), ".png", dtype=jnp.float32,
                 extract_segments=(args.engine in ("segments", "pallas")),
                 tile_culling=(args.engine == "pallas"))

    n_dev = len(jax.devices())
    mesh = make_mesh(num_env_shards=n_dev, num_model_shards=1)
    sampler = uniform_pose_sampler(m, clearance=0.8)
    poses = sampler(jax.random.PRNGKey(1), (args.envs, 1))
    keys = jax.random.split(jax.random.PRNGKey(0), args.envs)
    states, *_ = batch_reset(poses, keys, params, m, tables, cfg, 0.01)
    states = shard_states(states, mesh)

    ppo = PPO(replicate(params, mesh), replicate(m, mesh),
              replicate(tables, mesh), cfg, 0.01,
              PPOConfig(rollout_steps=32, obs_beams=64), mesh=mesh)
    ts = ppo.init(states, jax.random.PRNGKey(2))
    if args.restore:
        from f1tenth_gym_tpu.utils.checkpoint import load_pytree

        ts = ts._replace(net_params=load_pytree(args.restore, target=ts.net_params))
        print(f"restored policy from {args.restore}")
    train_step = jax.jit(ppo.train_step)

    logger = None
    if args.metrics_out:
        from f1tenth_gym_tpu.utils.metrics import MetricsLogger

        logger = MetricsLogger(args.metrics_out)

    steps_per_iter = args.envs * ppo.pc.rollout_steps
    for it in range(args.iters):
        t0 = time.time()
        ts, metrics = train_step(ts)
        loss = float(metrics["loss"])
        dt = time.time() - t0
        print(f"iter {it:4d}  loss {loss:9.4f}  "
              f"reward {float(metrics['mean_reward']):8.4f}  "
              f"{steps_per_iter/dt:,.0f} env-steps/s", flush=True)
        if logger is not None:
            logger.log(iter=it, loss=loss,
                       mean_reward=float(metrics["mean_reward"]),
                       crash_rate=float(metrics["crash_rate"]),
                       env_steps_per_sec=steps_per_iter / dt)
    if logger is not None:
        logger.close()

    if args.save:
        from f1tenth_gym_tpu.utils.checkpoint import save_pytree

        path = save_pytree(args.save, ts.net_params)
        print(f"saved policy to {path}")


if __name__ == "__main__":
    main()
