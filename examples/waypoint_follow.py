"""Closed-loop pure-pursuit demo (reference: examples/waypoint_follow.py).

Drives one car around a track with the JAX pure-pursuit planner through the
reference-compatible F110Env API, optionally rendering to a window or PNG
frames.

  python examples/waypoint_follow.py                  # generated random track
  python examples/waypoint_follow.py --map /path/map --waypoints wp.csv
  python examples/waypoint_follow.py --render rgb --frames-out /tmp/frames
  python examples/waypoint_follow.py --config examples/config_example_map.yaml

With --config the whole experiment (map, start pose, raceline csv + column
indices, controller gains, seed) comes from one yaml in the reference's
schema (examples/config_example_map.yaml there; waypoint_follow.py:248-250).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, default="",
                   help="experiment yaml (reference config_example_map.yaml "
                        "schema); supplies map, start pose, raceline and "
                        "gains")
    p.add_argument("--map", type=str, default="",
                   help="map yaml path (default: generate a random track)")
    p.add_argument("--map-ext", type=str, default=".png")
    p.add_argument("--waypoints", type=str, default="",
                   help="raceline csv (reference schema)")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--render", choices=["none", "human", "rgb"], default="none")
    p.add_argument("--frames-out", type=str, default="/tmp/f1tenth_frames")
    p.add_argument("--tlad", type=float, default=0.82461887897713965)
    p.add_argument("--vgain", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--platform", type=str, default="",
                   help="force a jax platform (e.g. 'cpu' for interactive use "
                        "— single-env stepping over a remote TPU tunnel pays "
                        "a round trip per step)")
    p.add_argument("--fused", action="store_true",
                   help="fuse plan+step into ONE jitted device call per "
                        "frame (single round trip; obs pulled to host only "
                        "on render frames) — the fast path for interactive "
                        "use against a remote/tunneled TPU")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from f1tenth_gym_tpu.envs import F110Env
    from f1tenth_gym_tpu.planning import PurePursuitPlanner
    from f1tenth_gym_tpu.utils.waypoints import load_waypoints

    if args.config:
        from f1tenth_gym_tpu.utils.experiment import (
            load_config_waypoints,
            load_experiment_config,
            resolve_path,
            start_pose,
        )

        conf = load_experiment_config(args.config)
        map_path = resolve_path(conf, conf.map_path)
        args.map_ext = getattr(conf, "map_ext", args.map_ext)
        wpts = load_config_waypoints(conf)
        start = start_pose(conf)
        args.tlad = getattr(conf, "tlad", args.tlad)
        args.vgain = getattr(conf, "vgain", args.vgain)
    elif args.map:
        map_path = args.map
        wpts = load_waypoints(args.waypoints)
        start = np.array([[wpts[0, 0], wpts[0, 1], 0.0]])
        d = wpts[1, :2] - wpts[0, :2]
        start[0, 2] = np.arctan2(d[1], d[0])
    else:
        from f1tenth_gym_tpu.tracks.trackgen import generate_centerline, save_track

        out = "/tmp/f1tenth_generated_track"
        rng = np.random.default_rng(args.seed)
        center = generate_centerline(rng)
        csv = save_track(out, "demo", center, 3.2)
        map_path = os.path.join(out, "demo.yaml")
        wpts = load_waypoints(csv)
        start = np.array([[wpts[0, 0], wpts[0, 1], 0.0]])
        d = wpts[1, :2] - wpts[0, :2]
        start[0, 2] = np.arctan2(d[1], d[0])
        print(f"generated track -> {map_path}")

    env = F110Env(map=map_path, map_ext=args.map_ext, num_agents=1,
                  timestep=0.01, integrator="rk4")
    planner = PurePursuitPlanner(wpts)

    obs, _, done, _ = env.reset(start)
    if args.render == "rgb":
        os.makedirs(args.frames_out, exist_ok=True)

    lap_time = 0.0
    t0 = time.time()
    if args.fused:
        # one device dispatch per frame: plan from the device-resident
        # state pose + step, check `done` host-side only every few frames
        step_fn = lambda s, a: env._step_fn(  # noqa: E731
            s, a, env.params, env.map_data, env.timestep)
        plan_step = planner.fused_plan_step(step_fn, args.tlad, args.vgain)
        state = env.state
        done_dev = None
        for i in range(args.steps):
            state, obs_dev, r, done_dev, _ = plan_step(state)
            if args.render != "none" and i % 20 == 0:
                env.state = state  # renderer reads the env's state
                obs = env._host_obs(obs_dev)
                if args.render == "human":
                    env.render("human")
                else:
                    frame = env.render("rgb_array")
                    from PIL import Image

                    Image.fromarray(frame).save(
                        os.path.join(args.frames_out, f"f{i:05d}.png"))
            if i % 20 == 19 and bool(done_dev):
                break
        env.state = state
        obs = env._host_obs(obs_dev)
        lap_time = float(state.current_time)
    else:
        for i in range(args.steps):
            speed, steer = planner.plan(
                obs["poses_x"][0], obs["poses_y"][0], obs["poses_theta"][0],
                args.tlad, args.vgain,
            )
            obs, r, done, info = env.step(np.array([[steer, speed]]))
            lap_time += r
            if args.render == "human":
                env.render("human")
            elif args.render == "rgb" and i % 20 == 0:
                frame = env.render("rgb_array")
                from PIL import Image

                Image.fromarray(frame).save(
                    os.path.join(args.frames_out, f"f{i:05d}.png")
                )
            if done:
                break
    print(
        f"steps={i+1} sim_time={lap_time:.2f}s wall={time.time()-t0:.2f}s "
        f"laps={obs['lap_counts'].tolist()} collisions={obs['collisions'].tolist()} "
        f"final=({obs['poses_x'][0]:.2f},{obs['poses_y'][0]:.2f})"
    )
    env.close()


if __name__ == "__main__":
    main()
