"""Track domain randomization: one batch of envs racing MANY tracks.

The reference randomizes tracks by writing map files and restarting
(unittest/random_trackgen.py); here M generated tracks compose into ONE
world map (tracks/multi.py), envs are statically assigned in contiguous
blocks to tracks, and a single compiled program steps — or trains a policy on — all
tracks at once. The per-tile visibility culling keeps each env's LiDAR
sweep local to its own track, so the M-times-larger global segment set
costs almost nothing.

    python examples/domain_randomization.py                   # rollout
    python examples/domain_randomization.py --train --iters 40
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=16)
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--agents", type=int, default=2)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--beams", type=int, default=1080)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--train", action="store_true",
                    help="train PPO across all tracks instead of rolling out")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from f1tenth_gym_tpu import SimConfig, VehicleParams, make_scan_tables
    from f1tenth_gym_tpu.parallel import batch_reset, make_autoreset_step
    from f1tenth_gym_tpu.tracks.multi import (
        multi_track_locality_sort, multi_track_map_data,
        multi_track_pose_sampler,
    )

    t0 = time.time()
    m, infos = multi_track_map_data(
        args.tracks, seed=args.seed, tile_culling=True,
        culling_tile_size=float(os.environ.get("BENCH_CULL_TS", 2.5)))
    print(f"# composed {args.tracks} tracks into one "
          f"{m.dt.shape[0]}x{m.dt.shape[1]} world "
          f"({m.seg_table.shape[0]} wall segments) in {time.time()-t0:.1f}s")

    cfg = SimConfig(num_agents=args.agents, num_beams=args.beams,
                    dtype="float32", scan_engine="pallas")
    params = VehicleParams.create(dtype=jnp.float32)
    tables = make_scan_tables(num_beams=args.beams, dtype=jnp.float32)
    sampler = multi_track_pose_sampler(infos)
    poses = sampler(jax.random.PRNGKey(7), (args.envs, args.agents))
    keys = jax.random.split(jax.random.PRNGKey(1), args.envs)
    states, *_ = batch_reset(poses, keys, params, m, tables, cfg, 0.01)
    astep = make_autoreset_step(params, m, tables, cfg, 0.01,
                                reset_to_start=True)
    # arc-position locality sort: consecutive envs share a culling window
    sort_fn = multi_track_locality_sort(m, infos)

    if args.train:
        from f1tenth_gym_tpu.parallel.ppo import PPO, PPOConfig

        ppo = PPO(params, m, tables, cfg, 0.01,
                  PPOConfig(rollout_steps=32, obs_beams=64), step_fn=astep)
        ts = ppo.init(states, jax.random.PRNGKey(2))
        step = jax.jit(ppo.train_step)
        per = args.envs * ppo.pc.rollout_steps
        for it in range(args.iters):
            t0 = time.time()
            ts, metrics = step(ts, m)  # map as jit arg, not constant
            print(f"iter {it:3d}  loss {float(metrics['loss']):8.4f}  "
                  f"reward {float(metrics['mean_reward']):8.4f}  "
                  f"{per/(time.time()-t0):,.0f} env-steps/s "
                  f"(x{args.tracks} tracks)", flush=True)
        return

    # the 16-track world's culling tables used to run to hundreds of MB,
    # forcing the map through the OUTER jit as an argument (program
    # parameter, see make_autoreset_step). With the v9 dedup + window cap
    # they fit an embedded-constant compile again — and constants measured
    # ~1.1 ms/step faster on single maps — so DR_MAP=const is available;
    # the default stays argument mode (robust to any table size).
    map_const = os.environ.get("DR_MAP", "arg") == "const"

    def policy(s):
        scans = s.scans
        B = scans.shape[-1]
        lo, hi = 2 * B // 5, 3 * B // 5
        best = jnp.argmax(scans[..., lo:hi], -1) + lo
        ang = (best.astype(scans.dtype) / (B - 1) - 0.5) * 4.7
        steer = jnp.clip(0.6 * ang, -0.4, 0.4)
        speed = jnp.clip(0.8 * scans[..., lo:hi].min(-1), 1.0, 4.0)
        return jnp.stack([steer, speed], -1)

    map_hybrid = os.environ.get("DR_MAP", "arg") == "hybrid"
    if map_const:
        @jax.jit
        def fstep(s, mm):
            s, _, _, d, _ = astep.impl(s, policy(s), m)  # m: jit CONSTANT
            return s, jnp.sum(d)
    elif map_hybrid:
        # only the BIG leaf (the culling pack) rides as a jit argument;
        # the small leaves (full seg_table, raster, scalars) are closed
        # over as constants — jit decides const-vs-arg PER LEAF
        @jax.jit
        def fstep(s, tt):
            mm = m.replace(tile_tables=tt)
            s, _, _, d, _ = astep.impl(s, policy(s), mm)
            return s, jnp.sum(d)
    else:
        @jax.jit
        def fstep(s, mm):
            s, _, _, d, _ = astep.impl(s, policy(s), mm)
            return s, jnp.sum(d)

    marg = m.tile_tables if map_hybrid else m
    s, d = fstep(states, marg)
    s = sort_fn(s)  # scans of a program must share a culling window
    _ = float(jnp.sum(s.x))
    t0 = time.time()
    for i in range(args.steps):
        if i % 32 == 0:
            s = sort_fn(s)
        s, d = fstep(s, marg)
    _ = float(jnp.sum(s.x))
    dt = time.time() - t0
    rate = args.envs * args.steps / dt
    # progress per track: mean distance from start grid (track identity by
    # position — the locality sort relabels env order)
    px = np.asarray(s.x[:, 0, 0])
    py = np.asarray(s.x[:, 0, 1])
    sx = np.asarray(s.start_xs[:, 0])
    sy = np.asarray(s.start_ys[:, 0])
    dist = np.hypot(px - sx, py - sy)
    per_track = []
    for info in infos:
        x0, y0, x1, y1 = info.bbox
        sel = (sx >= x0) & (sx <= x1) & (sy >= y0) & (sy <= y1)
        per_track.append(dist[sel].mean() if sel.any() else float("nan"))
    print(f"{args.envs} envs x {args.steps} steps over {args.tracks} tracks "
          f"in {dt:.2f}s -> {rate:,.0f} env-steps/s; dones(last)={int(d)}")
    print("# mean displacement from start grid per track: "
          + " ".join(f"{v:.1f}" for v in per_track))


if __name__ == "__main__":
    main()
