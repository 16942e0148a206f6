"""Vectorized controller/vehicle parameter optimization — the reference's
experiment-yaml use case (config_example_map.yaml: mass/lf/tlad/vgain
bounds, popsize, budget) executed as ONE batched rollout.

The reference optimizes these four parameters with CMA over `budget`
SEQUENTIAL env rollouts (examples/config_example_map.yaml:24-40,
waypoint_follow.py:241-252 consume the same schema). Here every candidate
is an env in the batch: `budget` full 1080-beam simulations run
simultaneously on one chip, each with its OWN vehicle mass/lf (per-env
VehicleParams pytree axes) and its OWN pure-pursuit gains, and the fitness
is the simulated 2-lap race time straight from the env's lap bookkeeping.

    python examples/param_sweep.py                        # uses the yaml
    python examples/param_sweep.py --budget 2048 --steps 6000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "config_example_map.yaml"))
    ap.add_argument("--budget", type=int, default=0,
                    help="candidate count (default: the yaml's budget)")
    ap.add_argument("--steps", type=int, default=6000,
                    help="sim steps per candidate (60 s at 100 Hz)")
    ap.add_argument("--beams", type=int, default=1080)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp

    from f1tenth_gym_tpu import (
        SimConfig, VehicleParams, env_step, load_map, make_scan_tables,
    )
    from f1tenth_gym_tpu.core.env import init_state
    from f1tenth_gym_tpu.planning.pure_pursuit import pure_pursuit_plan
    from f1tenth_gym_tpu.utils.experiment import (
        load_config_waypoints, load_experiment_config, resolve_path, start_pose,
    )

    conf = load_experiment_config(args.config)
    E = args.budget or int(getattr(conf, "budget", 1000))
    wpts = jnp.asarray(load_config_waypoints(conf), jnp.float32)
    m = load_map(resolve_path(conf, conf.map_path),
                 getattr(conf, "map_ext", ".png"), dtype=jnp.float32,
                 extract_segments=True, tile_culling=True)
    cfg = SimConfig(num_agents=1, num_beams=args.beams, dtype="float32",
                    scan_engine="pallas")
    tables = make_scan_tables(num_beams=args.beams, dtype=jnp.float32)

    # candidate parameters, uniform in the yaml's bounds
    rng = np.random.default_rng(int(getattr(conf, "seed", 12345)))
    mass = rng.uniform(conf.mass_min, conf.mass_max, E)
    lf = rng.uniform(conf.lf_min, conf.lf_max, E)
    tlad = rng.uniform(conf.tlad_min, conf.tlad_max, E)
    vgain = rng.uniform(conf.vgain_min, conf.vgain_max, E)

    # per-env vehicle params: every leaf gains a leading (E,) axis
    base = VehicleParams.create(dtype=jnp.float32)
    params_e = jax.tree.map(
        lambda leaf: jnp.broadcast_to(leaf, (E,)).astype(jnp.float32), base)
    params_e = params_e.replace(
        m=jnp.asarray(mass, jnp.float32), lf=jnp.asarray(lf, jnp.float32))
    tlad_e = jnp.asarray(tlad, jnp.float32)
    vgain_e = jnp.asarray(vgain, jnp.float32)

    sp = np.repeat(start_pose(conf)[None], E, axis=0)  # (E, 1, 3)
    keys = jax.random.split(jax.random.PRNGKey(0), E)
    states = jax.vmap(lambda p, k: init_state(p, k, cfg))(
        jnp.asarray(sp, jnp.float32), keys)

    wheelbase = 0.17145 + 0.15875  # reference waypoint_follow.py:252

    def one_env_step(state, params, tl, vg):
        px = state.x[0, 0]
        py = state.x[0, 1]
        pth = state.x[0, 4]
        speed, steer = pure_pursuit_plan(px, py, pth, wpts, tl, vg, wheelbase)
        actions = jnp.stack([steer, speed])[None]
        return env_step(state, actions, params, m, tables, cfg, 0.01)

    @jax.jit
    def sweep_chunk(states, finish_t, crashed, t0):
        def body(carry, i):
            states, finish_t, crashed = carry
            states, obs, _, done, info = jax.vmap(one_env_step)(
                states, params_e, tlad_e, vgain_e)
            t = (t0 + i + 1).astype(jnp.float32) * 0.01
            crash_now = states.collisions[:, 0] > 0
            lap2 = states.toggle_list[:, 0] >= 4
            newly = lap2 & ~crashed & (finish_t == jnp.inf)
            finish_t = jnp.where(newly, t, finish_t)
            crashed = crashed | (crash_now & (finish_t == jnp.inf))
            return (states, finish_t, crashed), None

        (states, finish_t, crashed), _ = jax.lax.scan(
            body, (states, finish_t, crashed), jnp.arange(512))
        return states, finish_t, crashed

    finish_t = jnp.full((E,), jnp.inf, jnp.float32)
    crashed = jnp.zeros((E,), bool)
    t0 = time.time()
    for c in range(0, args.steps, 512):
        states, finish_t, crashed = sweep_chunk(
            states, finish_t, crashed, jnp.asarray(c, jnp.int32))
    finish = np.asarray(finish_t)
    crash = np.asarray(crashed)
    wall = time.time() - t0

    total_steps = E * args.steps
    ok = np.isfinite(finish) & ~crash
    print(f"# {E} candidates x {args.steps} steps "
          f"({total_steps:,} env-steps) in {wall:.1f}s wall "
          f"= {total_steps/wall:,.0f} env-steps/s; "
          f"{ok.sum()} finished 2 laps, {crash.sum()} crashed")
    order = np.argsort(np.where(ok, finish, np.inf))
    print("# best 5 (2-lap time | mass lf tlad vgain):")
    for i in order[:5]:
        print(f"  {finish[i]:6.2f}s | mass={mass[i]:.3f} lf={lf[i]:.4f} "
              f"tlad={tlad[i]:.3f} vgain={vgain[i]:.3f}")
    if ok.any():
        b = order[0]
        print(f"best: {finish[b]:.2f}s sim 2-lap time "
              f"(the reference runs these {E} evaluations sequentially)")


if __name__ == "__main__":
    main()
