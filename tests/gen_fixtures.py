"""Golden-fixture generator: runs the *reference* simulator, dumps npz.

The analogue of the reference's own legacy_scan_gen.py (which generated
golden data from the retired C++ engine to validate the Numba engine,
unittest/legacy_scan_gen.py:45): here the Numba engine itself is the golden
source for validating the TPU engine.

The reference depends on numba / gym / pyglet, which are not installed; all
three are shimmed (njit becomes a no-op decorator — the decorated code is
plain NumPy — and gym/pyglet provide just enough surface for f110_env.py to
import). The reference package is imported read-only from /root/reference.

Run:  python tests/gen_fixtures.py
Writes tests/fixtures/*.npz. Fixtures are committed so the test suite does
not depend on the reference being mounted.
"""

import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/gym"
OUT = os.path.join(HERE, "fixtures")


def install_shims():
    # ---- numba: @njit is identity (the decorated bodies are pure NumPy)
    numba = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(f):
            return f

        return deco

    numba.njit = njit
    sys.modules["numba"] = numba

    # ---- gym: enough for `class F110Env(gym.Env)` + imports in f110_env.py
    gym = types.ModuleType("gym")

    class Env:
        metadata = {}

    gym.Env = Env
    gym.error = types.ModuleType("gym.error")
    gym.spaces = types.ModuleType("gym.spaces")
    gym.utils = types.ModuleType("gym.utils")
    gym.utils.seeding = types.ModuleType("gym.utils.seeding")
    envs_mod = types.ModuleType("gym.envs")
    reg_mod = types.ModuleType("gym.envs.registration")
    reg_mod.register = lambda **kw: None
    envs_mod.registration = reg_mod
    gym.envs = envs_mod
    sys.modules["gym"] = gym
    sys.modules["gym.error"] = gym.error
    sys.modules["gym.spaces"] = gym.spaces
    sys.modules["gym.utils"] = gym.utils
    sys.modules["gym.utils.seeding"] = gym.utils.seeding
    sys.modules["gym.envs"] = envs_mod
    sys.modules["gym.envs.registration"] = reg_mod

    # ---- pyglet: f110_env.py does `import pyglet; from pyglet import gl`;
    # waypoint_follow.py does `from pyglet.gl import GL_POINTS`
    pyglet = types.ModuleType("pyglet")
    pyglet.options = {}
    pyglet.gl = types.ModuleType("pyglet.gl")
    pyglet.gl.GL_POINTS = 0
    sys.modules["pyglet"] = pyglet
    sys.modules["pyglet.gl"] = pyglet.gl

    sys.path.insert(0, REF)
    sys.path.insert(0, "/root/reference/examples")


class ZeroRng:
    """Stands in for np.random.default_rng to make scans noise-free."""

    def normal(self, loc=0.0, scale=1.0, size=None):
        return np.zeros(size)


def gen_dynamics(dm):
    rng = np.random.default_rng(42)
    # params as in the sim default (f110_env.py:130)
    P = dict(mu=1.0489, C_Sf=4.718, C_Sr=5.4562, lf=0.15875, lr=0.17145,
             h=0.074, m=3.74, I=0.04712, s_min=-0.4189, s_max=0.4189,
             sv_min=-3.2, sv_max=3.2, v_switch=7.319, a_max=9.51,
             v_min=-5.0, v_max=20.0)
    order = ["mu", "C_Sf", "C_Sr", "lf", "lr", "h", "m", "I", "s_min",
             "s_max", "sv_min", "sv_max", "v_switch", "a_max", "v_min", "v_max"]
    args = [P[k] for k in order]

    N = 256
    xs = rng.normal(size=(N, 7)) * np.array([5, 5, 0.3, 6, 2, 1.5, 0.2])
    # force coverage of both speed regimes and constraint edges
    xs[:64, 3] = rng.uniform(-0.6, 0.6, size=64)
    xs[64:96, 2] = rng.choice([-0.45, 0.45], size=32)
    us = rng.normal(size=(N, 2)) * np.array([4.0, 12.0])

    f_st = np.stack([dm.vehicle_dynamics_st(xs[i], us[i], *args) for i in range(N)])
    f_ks = np.stack([dm.vehicle_dynamics_ks(xs[i, :5], us[i], *args) for i in range(N)])
    pid_in = rng.normal(size=(N, 4)) * np.array([8, 0.5, 8, 0.4])
    pid_out = np.stack([
        dm.pid(pid_in[i, 0], pid_in[i, 1], pid_in[i, 2], pid_in[i, 3],
               P["sv_max"], P["a_max"], P["v_max"], P["v_min"])
        for i in range(N)
    ])
    np.savez(
        os.path.join(OUT, "dynamics.npz"),
        xs=xs, us=us, f_st=f_st, f_ks=f_ks, pid_in=pid_in, pid_out=pid_out,
    )
    print("dynamics.npz:", N, "cases")


def gen_collision(cm):
    rng = np.random.default_rng(7)
    base = np.asarray([[4, 11.0], [5, 5], [9, 9], [10, 10]])
    N = 512
    pairs_a = np.empty((N, 4, 2))
    pairs_b = np.empty((N, 4, 2))
    res = np.empty((N,), dtype=bool)
    for i in range(N):
        if i < 256:
            # near-overlapping perturbations (collision_models.py:306-311)
            a = base + rng.normal(size=(4, 2)) / 100.0
            b = base + rng.normal(size=(4, 2)) / 100.0
        else:
            # random rectangles scattered — mix of hits and misses
            pa = rng.uniform(-3, 3, size=3)
            pb = rng.uniform(-3, 3, size=3)
            a = cm.get_vertices(pa, 0.58, 0.31)
            b = cm.get_vertices(pb, 0.58, 0.31)
        pairs_a[i], pairs_b[i] = a, b
        res[i] = cm.collision(np.ascontiguousarray(a), np.ascontiguousarray(b))
    # multi-body case
    rng2 = np.random.default_rng(99)
    M = 8
    multi = np.stack([base + rng2.normal(size=(4, 2)) / 10.0 for _ in range(M - 1)]
                     + [base + 10.0])
    mcol, midx = cm.collision_multiple(multi)
    # vertices golden
    poses = rng.uniform(-5, 5, size=(64, 3))
    verts = np.stack([cm.get_vertices(p, 0.58, 0.31) for p in poses])
    np.savez(
        os.path.join(OUT, "collision.npz"),
        pairs_a=pairs_a, pairs_b=pairs_b, res=res,
        multi=multi, mcol=mcol, midx=midx,
        poses=poses, verts=verts,
    )
    print("collision.npz:", N, "pairs; multi", mcol, midx)


def gen_scans(lm):
    sim = lm.ScanSimulator2D(1080, 4.7)
    sim.set_map("/root/reference/examples/example_map.yaml", ".png")
    n = 20
    poses = np.zeros((n, 3))
    poses[:, 0] = np.linspace(-0.5, 1.5, n)
    poses[:, 1] = np.linspace(-1.0, 1.0, n)
    poses[:, 2] = np.linspace(-4.0, 7.0, n)  # cover wrap of theta
    scans = np.stack([sim.scan(poses[i], None) for i in range(n)])
    np.savez(os.path.join(OUT, "scans_example_map.npz"), poses=poses, scans=scans)
    print("scans_example_map.npz:", scans.shape)

    # berlin / skirk golden scans — the analogue of the reference's own
    # legacy_scan.npz cross-engine fixtures (unittest/scan_sim.py:306-366)
    rng = np.random.default_rng(123)
    for name in ("berlin", "skirk"):
        sim_m = lm.ScanSimulator2D(1080, 4.7)
        sim_m.set_map(
            f"/root/reference/gym/f110_gym/envs/maps/{name}.yaml", ".png")
        dt = sim_m.dt
        res = sim_m.map_resolution
        rows, cols = np.nonzero(dt > 1.0)  # >=1 m clearance
        sel = rng.choice(len(rows), 10, replace=False)
        px = (cols[sel] + 0.5) * res + sim_m.origin[0]
        py = (rows[sel] + 0.5) * res + sim_m.origin[1]
        pth = rng.uniform(0.0, 2 * np.pi, 10)
        mposes = np.stack([px, py, pth], axis=1)
        mscans = np.stack([sim_m.scan(mposes[i], None) for i in range(10)])
        np.savez(os.path.join(OUT, f"scans_{name}.npz"),
                 poses=mposes, scans=mscans)
        print(f"scans_{name}.npz:", mscans.shape)

    # check_ttc golden
    rng = np.random.default_rng(3)
    num_beams = 1080
    fov = 4.7
    inc = fov / (num_beams - 1)
    scan_angles = -fov / 2.0 + np.arange(num_beams) * inc
    cosines = np.cos(scan_angles)
    # side distances replicated from base_classes.py:129-158
    sd = np.empty(num_beams)
    dist_sides, dist_fr = 0.31 / 2.0, (0.15875 + 0.17145) / 2.0
    for i, a in enumerate(scan_angles):
        if a > 0:
            sd[i] = (min(dist_sides / np.sin(a), dist_fr / np.cos(a)) if a < np.pi / 2
                     else min(dist_sides / np.cos(a - np.pi / 2), dist_fr / np.sin(a - np.pi / 2)))
        else:
            sd[i] = (min(dist_sides / np.sin(-a), dist_fr / np.cos(-a)) if a > -np.pi / 2
                     else min(dist_sides / np.cos(-a - np.pi / 2), dist_fr / np.sin(-a - np.pi / 2)))
    T = 64
    ttc_scans = rng.uniform(0.0, 3.0, size=(T, num_beams)) + sd[None, :]
    ttc_scans[::3] = sd[None, :] + rng.uniform(0.0, 0.02, size=(T // 3 + 1, num_beams))[: len(ttc_scans[::3])]
    vels = rng.uniform(-8, 8, size=T)
    vels[::5] = 0.0
    hits = np.array([
        lm.check_ttc_jit(ttc_scans[i], vels[i], scan_angles, cosines, sd, 0.005)
        for i in range(T)
    ])
    np.savez(os.path.join(OUT, "ttc.npz"), scans=ttc_scans, vels=vels,
             scan_angles=scan_angles, cosines=cosines, side_distances=sd, hits=hits)
    print("ttc.npz: hits", hits.sum(), "/", T)

    # opponent ray_cast golden
    rng = np.random.default_rng(11)
    R = 32
    rc_poses = np.concatenate(
        [rng.uniform(-1, 1, size=(R, 2)), rng.uniform(-4, 7, size=(R, 1))], axis=1
    )
    rc_scans = rng.uniform(2.0, 25.0, size=(R, num_beams))
    opp_poses = rc_poses + np.concatenate(
        [rng.uniform(-2, 2, size=(R, 2)), rng.uniform(-1, 1, size=(R, 1))], axis=1
    )
    import f110_gym.envs.collision_models as cm
    new_scans = np.empty_like(rc_scans)
    opp_verts = np.empty((R, 4, 2))
    for i in range(R):
        overts = cm.get_vertices(opp_poses[i], 0.58, 0.31)
        opp_verts[i] = overts
        new_scans[i] = lm.ray_cast(rc_poses[i].copy(), rc_scans[i].copy(),
                                   scan_angles, overts)
    np.savez(os.path.join(OUT, "ray_cast.npz"), poses=rc_poses, scans=rc_scans,
             opp_verts=opp_verts, new_scans=new_scans, scan_angles=scan_angles)
    print("ray_cast.npz:", R, "cases; modified beams:",
          int((new_scans != rc_scans).sum()))


def gen_env_rollout(f110_env_mod, base_classes):
    """Full env-level rollout: 2 agents, RK4, no noise, scripted actions."""
    F110Env = f110_env_mod.F110Env
    Integrator = base_classes.Integrator

    for name, integrator, steps in [("rk4", Integrator.RK4, 120),
                                    ("euler", Integrator.Euler, 120)]:
        env = F110Env(
            map="/root/reference/examples/example_map",
            map_ext=".png",
            num_agents=2,
            timestep=0.01,
            integrator=integrator,
            seed=12345,
        )
        poses = np.array([[0.7, 0.0, 1.37079632679], [0.7, -1.0, 1.37079632679]])
        obs, _, _, _ = env.reset(poses)
        # kill noise AFTER reset (reset reseeds, base_classes.py:204)
        for agent in env.sim.agents:
            agent.scan_rng = ZeroRng()
        # reset() already did a zero-action step WITH noise; to keep the
        # whole trajectory noise-free regenerate: reset again w/ zero rng
        env.sim.reset(poses)
        for agent in env.sim.agents:
            agent.scan_rng = ZeroRng()
        env.current_time = 0.0
        env.collisions = np.zeros((2,))
        env.near_starts = np.array([True] * 2)
        env.toggle_list = np.zeros((2,))
        env.lap_times = np.zeros((2,))
        env.lap_counts = np.zeros((2,))
        env.start_xs = poses[:, 0]
        env.start_ys = poses[:, 1]
        env.start_thetas = poses[:, 2]
        theta = -poses[0, 2]
        env.start_rot = np.array([[np.cos(theta), -np.sin(theta)],
                                  [np.sin(theta), np.cos(theta)]])
        obs, _, done, _ = env.step(np.zeros((2, 2)))

        t = np.arange(steps)
        steer0 = 0.25 * np.sin(0.05 * t)
        steer1 = -0.2 * np.sin(0.04 * t + 0.5)
        speed0 = np.minimum(0.08 * t, 4.0)
        speed1 = np.minimum(0.06 * t, 3.0)

        rec = {k: [] for k in ["poses_x", "poses_y", "poses_theta",
                               "linear_vels_x", "ang_vels_z", "collisions",
                               "scans0", "scans1", "done", "reward",
                               "lap_times", "lap_counts"]}
        actions = np.stack([np.stack([steer0, speed0], axis=1),
                            np.stack([steer1, speed1], axis=1)], axis=1)
        for i in range(steps):
            obs, reward, done, info = env.step(actions[i])
            rec["poses_x"].append(obs["poses_x"])
            rec["poses_y"].append(obs["poses_y"])
            rec["poses_theta"].append(obs["poses_theta"])
            rec["linear_vels_x"].append(obs["linear_vels_x"])
            rec["ang_vels_z"].append(obs["ang_vels_z"])
            rec["collisions"].append(np.array(obs["collisions"]))
            rec["scans0"].append(obs["scans"][0])
            rec["scans1"].append(obs["scans"][1])
            rec["done"].append(done)
            rec["reward"].append(reward)
            rec["lap_times"].append(np.array(env.lap_times))
            rec["lap_counts"].append(np.array(env.lap_counts))
        np.savez(
            os.path.join(OUT, f"env_rollout_{name}.npz"),
            poses=poses, actions=actions,
            **{k: np.asarray(v) for k, v in rec.items()},
        )
        print(f"env_rollout_{name}.npz: {steps} steps, "
              f"final x={obs['poses_x']}, collisions={obs['collisions']}, done={done}")


def gen_planner(f110_env_mod, base_classes):
    """Pure-pursuit kernel goldens + a full closed-loop lap on example_map."""
    import waypoint_follow as wf

    wpts_raw = np.loadtxt("/root/reference/examples/example_waypoints.csv",
                          delimiter=";", skiprows=3)
    wpts = wpts_raw[:, [1, 2]].copy()
    wpts_xyv = wpts_raw[:, [1, 2, 5]].copy()

    # kernel goldens: nearest point + circle intersection at random poses
    rng = np.random.default_rng(21)
    K = 128
    # half the points hug the raceline (circle hits), half roam far (misses)
    near = wpts[rng.integers(0, len(wpts), K // 2)] + rng.uniform(
        -0.5, 0.5, size=(K // 2, 2)
    )
    far = wpts[rng.integers(0, len(wpts), K - K // 2)] + rng.uniform(
        -10, 10, size=(K - K // 2, 2)
    )
    pts = np.concatenate([near, far])
    nearest = np.empty((K, 6))  # proj(2), dist, t, i, _
    for k in range(K):
        p, d, t, i = wf.nearest_point_on_trajectory(pts[k], wpts)
        nearest[k] = [p[0], p[1], d, t, i, 0]
    inter = np.empty((K, 5))  # p(2), i2, t2, found
    for k in range(K):
        p0, d, t, i = wf.nearest_point_on_trajectory(pts[k], wpts)
        p, i2, t2 = wf.first_point_on_trajectory_intersecting_circle(
            pts[k], 0.82461887897713965, wpts, i + t, wrap=True
        )
        if p is None:
            inter[k] = [0, 0, -1, 0, 0]
        else:
            inter[k] = [p[0], p[1], i2, t2, 1]
    np.savez(os.path.join(OUT, "planner_kernels.npz"),
             pts=pts, wpts=wpts, nearest=nearest, inter=inter)
    print("planner_kernels.npz:", K, "cases; found:", int(inter[:, 4].sum()))

    # closed loop: reference planner + reference env, noise-free, 500 steps
    class Conf:
        wpt_path = "/root/reference/examples/example_waypoints.csv"
        wpt_delim = ";"
        wpt_rowskip = 3
        wpt_xind = 1
        wpt_yind = 2
        wpt_vind = 5

    planner = wf.PurePursuitPlanner(Conf(), 0.17145 + 0.15875)
    env = f110_env_mod.F110Env(
        map="/root/reference/examples/example_map", map_ext=".png",
        num_agents=1, timestep=0.01,
        integrator=base_classes.Integrator.RK4, seed=12345,
    )
    poses = np.array([[0.7, 0.0, 1.37079632679]])
    obs, *_ = env.reset(poses)
    env.sim.reset(poses)
    for agent in env.sim.agents:
        agent.scan_rng = ZeroRng()
    env.current_time = 0.0
    env.collisions = np.zeros((1,))
    env.near_starts = np.array([True])
    env.toggle_list = np.zeros((1,))
    obs, _, done, _ = env.step(np.zeros((1, 2)))

    T = 500
    tlad, vgain = 0.82461887897713965, 1.375
    rec_actions = np.empty((T, 2))
    rec_poses = np.empty((T, 3))
    rec_speed = np.empty((T,))
    for ti in range(T):
        speed, steer = planner.plan(obs["poses_x"][0], obs["poses_y"][0],
                                    obs["poses_theta"][0], tlad, vgain)
        rec_actions[ti] = [steer, speed]
        obs, _, done, _ = env.step(np.array([[steer, speed]]))
        rec_poses[ti] = [obs["poses_x"][0], obs["poses_y"][0],
                         obs["poses_theta"][0]]
        rec_speed[ti] = obs["linear_vels_x"][0]
        if done:
            break
    np.savez(os.path.join(OUT, "closed_loop.npz"),
             wpts_xyv=wpts_xyv, start=poses, actions=rec_actions[: ti + 1],
             poses=rec_poses[: ti + 1], speed=rec_speed[: ti + 1],
             tlad=tlad, vgain=vgain, done_at=(ti if done else -1))
    print(f"closed_loop.npz: {ti+1} steps, done={done}, "
          f"final pose {rec_poses[ti]}")


def main():
    os.makedirs(OUT, exist_ok=True)
    install_shims()
    import f110_gym.envs.dynamic_models as dm
    import f110_gym.envs.collision_models as cm
    import f110_gym.envs.laser_models as lm
    import f110_gym.envs.base_classes as base_classes
    import f110_gym.envs.f110_env as f110_env_mod

    gen_dynamics(dm)
    gen_collision(cm)
    gen_scans(lm)
    gen_env_rollout(f110_env_mod, base_classes)
    gen_planner(f110_env_mod, base_classes)
    print("all fixtures written to", OUT)


if __name__ == "__main__":
    main()
