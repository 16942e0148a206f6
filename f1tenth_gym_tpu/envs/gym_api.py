"""Reference-compatible stateful environment API.

``F110Env`` here mirrors the reference's Gym env surface
(f110_env.py:53-418): same constructor kwargs, same
``reset(poses) -> (obs, reward, done, info)`` 4-tuple convention, same
observation dict keys (docs/api/obv.rst), ``update_map`` / ``update_params``
/ ``add_render_callback`` / ``render``. Internally it is a thin host shell
around the pure jitted functions in ``f1tenth_gym_tpu.core`` — one compiled
step per (map, num_agents, integrator) configuration, with vehicle params and
timestep as dynamic inputs (no recompile on ``update_params``).

A Gymnasium-API variant (5-tuple, terminated/truncated) is exposed as
``F110GymnasiumEnv`` and registered as ``f1tenth_tpu/f110-v0`` when
gymnasium is importable.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu.config import (
    DEFAULT_SEED,
    DEFAULT_TIMESTEP,
    INTEGRATOR_EULER,
    INTEGRATOR_RK4,
    MODEL_ST,
    SimConfig,
)
from f1tenth_gym_tpu.core.env import env_reset, env_step
from f1tenth_gym_tpu.ops.lidar import make_scan_tables
from f1tenth_gym_tpu.state import VehicleParams
from f1tenth_gym_tpu.utils.map_loader import load_map


def _normalize_integrator(integrator) -> str:
    if isinstance(integrator, str):
        s = integrator.lower()
    else:  # enum-like (reference Integrator.RK4 / .Euler)
        s = getattr(integrator, "name", str(integrator)).lower()
    if s in (INTEGRATOR_RK4, INTEGRATOR_EULER):
        return s
    raise ValueError(f"unknown integrator {integrator!r}; use 'rk4' or 'euler'")


class F110Env:
    """Stateful, single-instance environment with the reference's API.

    kwargs (all optional, defaults match f110_env.py:102-159):
        seed, map, map_ext, params, num_agents, timestep, ego_idx,
        integrator, lidar_dist, model, num_beams, scan_noise, scan_engine,
        dtype

    scan_engine defaults to "auto": the Pallas kernel on TPU backends, the
    bit-exact reference marching engine elsewhere (see SimConfig).
    """

    metadata = {"render.modes": ["human", "human_fast", "rgb_array"]}

    def __init__(self, **kwargs):
        self.seed = kwargs.get("seed", DEFAULT_SEED)
        self.map_name = kwargs.get("map", None)
        self.map_ext = kwargs.get("map_ext", ".png")
        params = kwargs.get("params", None)
        self.num_agents = kwargs.get("num_agents", 2)
        self.timestep = kwargs.get("timestep", DEFAULT_TIMESTEP)
        self.ego_idx = kwargs.get("ego_idx", 0)
        integrator = _normalize_integrator(kwargs.get("integrator", INTEGRATOR_RK4))
        lidar_dist = kwargs.get("lidar_dist", 0.0)
        model = kwargs.get("model", MODEL_ST)
        num_beams = kwargs.get("num_beams", 1080)
        scan_noise = kwargs.get("scan_noise", True)
        scan_engine = kwargs.get("scan_engine", "auto")
        dtype = kwargs.get("dtype", "float32")

        if self.map_name is None:
            raise ValueError(
                "a map is required: pass map='/path/to/map_yaml' (with or "
                "without the .yaml extension) and map_ext for the image"
            )

        self.cfg = SimConfig(
            num_agents=self.num_agents,
            num_beams=num_beams,
            ego_idx=self.ego_idx,
            integrator=integrator,
            model=model,
            scan_noise=scan_noise,
            scan_engine=scan_engine,
            dtype=dtype,
        )
        jdtype = self.cfg.jnp_dtype

        # vehicle params as (A,) leaves so per-agent updates are in-place
        base = VehicleParams.create(params, dtype=jdtype)
        self.params = jax.tree.map(
            lambda leaf: jnp.broadcast_to(leaf, (self.num_agents,)), base
        )

        self.tables = make_scan_tables(
            num_beams=num_beams,
            lidar_dist=lidar_dist,
            width=float(base.width),
            lf=float(base.lf),
            lr=float(base.lr),
            dtype=jdtype,
        )
        self.map_data = load_map(
            self.map_name, self.map_ext, dtype=jdtype,
            extract_segments=self._wants_segments(),
        )

        self._reset_fn = jax.jit(
            lambda poses, key, params, map_data, timestep: env_reset(
                poses, key, params, map_data, self.tables, self.cfg, timestep
            )
        )
        self._step_fn = jax.jit(
            lambda state, actions, params, map_data, timestep: env_step(
                state, actions, params, map_data, self.tables, self.cfg, timestep
            )
        )

        self.state = None
        self.render_obs = None
        self.renderer = None
        self.render_callbacks = []
        self.current_time = 0.0

    # ------------------------------------------------------------- helpers
    def _wants_segments(self) -> bool:
        """Whether the configured scan engine needs wall segments extracted
        ("auto" resolves to the pallas kernel only on a TPU backend)."""
        e = self.cfg.scan_engine
        if e == "auto":
            return jax.default_backend() == "tpu"
        return e in ("segments", "pallas")

    def _host_obs(self, obs: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        out = {k: np.asarray(v) for k, v in obs.items()}
        out["ego_idx"] = int(out["ego_idx"])
        return out

    # ------------------------------------------------------------- gym API
    def reset(self, poses):
        """Reset to (num_agents, 3) poses. Returns (obs, reward, done, info)."""
        poses = np.asarray(poses, dtype=np.float64)
        if poses.shape != (self.num_agents, 3):
            raise ValueError(
                f"poses shape {poses.shape} != ({self.num_agents}, 3)"
            )
        key = jax.random.PRNGKey(self.seed)
        self.state, obs, reward, done, info = self._reset_fn(
            jnp.asarray(poses, dtype=self.cfg.jnp_dtype),
            key,
            self.params,
            self.map_data,
            self.timestep,
        )
        obs = self._host_obs(obs)
        self.current_time = float(self.state.current_time)
        self._update_render_obs(obs)
        return obs, float(reward), bool(done), jax.tree.map(np.asarray, info)

    def step(self, action):
        """Step with (num_agents, 2) [steer, speed] actions."""
        if self.state is None:
            raise RuntimeError("call reset(poses) before step()")
        action = jnp.asarray(np.asarray(action), dtype=self.cfg.jnp_dtype)
        self.state, obs, reward, done, info = self._step_fn(
            self.state, action, self.params, self.map_data, self.timestep
        )
        obs = self._host_obs(obs)
        self.current_time = float(self.state.current_time)
        self._update_render_obs(obs)
        return obs, float(reward), bool(done), jax.tree.map(np.asarray, info)

    def update_map(self, map_path, map_ext):
        """Swap the track (f110_env.py:351-362). Same raster shape avoids
        recompilation; a different shape triggers one new compile."""
        self.map_name = map_path
        self.map_ext = map_ext
        self.map_data = load_map(
            map_path, map_ext, dtype=self.cfg.jnp_dtype,
            extract_segments=self._wants_segments(),
        )
        if self.renderer is not None:
            self.renderer.update_map(map_path, map_ext)

    def update_params(self, params: Dict[str, Any], index: int = -1):
        """Update vehicle params (f110_env.py:364-375); no recompilation."""
        self.params = self.params.replace_params(params, agent_idx=index)

    def add_render_callback(self, callback_func):
        self.render_callbacks.append(callback_func)

    def _update_render_obs(self, obs):
        self.render_obs = {
            "ego_idx": obs["ego_idx"],
            "poses_x": obs["poses_x"],
            "poses_y": obs["poses_y"],
            "poses_theta": obs["poses_theta"],
            "lap_times": obs["lap_times"],
            "lap_counts": obs["lap_counts"],
        }

    def render(self, mode: str = "human"):
        """Host-side decoupled rendering (reference f110_env.py:387-418)."""
        assert mode in ("human", "human_fast", "rgb_array")
        if self.renderer is None:
            from f1tenth_gym_tpu.render.renderer import EnvRenderer

            self.renderer = EnvRenderer(
                headless=(mode == "rgb_array"),
                car_length=float(np.max(np.asarray(self.params.length))),
                car_width=float(np.max(np.asarray(self.params.width))),
            )
            self.renderer.update_map(self.map_name, self.map_ext)
        self.renderer.update_obs(self.render_obs)
        for cb in self.render_callbacks:
            cb(self.renderer)
        frame = self.renderer.draw(return_array=(mode == "rgb_array"))
        if mode == "human":
            time.sleep(0.005)
        return frame

    def close(self):
        if self.renderer is not None:
            self.renderer.close()
            self.renderer = None


try:  # gymnasium.make requires inheriting gymnasium.Env
    import gymnasium as _gymnasium

    _GymnasiumBase = _gymnasium.Env
except ImportError:  # pragma: no cover
    _GymnasiumBase = object


class F110GymnasiumEnv(_GymnasiumBase):
    """Gymnasium-flavored wrapper: 5-tuple step, spaces, options-reset."""

    metadata = {"render_modes": ["human", "human_fast", "rgb_array"]}

    def __init__(self, render_mode: Optional[str] = None, **kwargs):
        import gymnasium
        from gymnasium import spaces

        self._env = F110Env(**kwargs)
        self.render_mode = render_mode
        A, B = self._env.num_agents, self._env.cfg.num_beams
        # spaces declare the dtype the env actually emits (the configured
        # sim dtype), and observations are cast to it in _host_obs_cast —
        # under x64 some jnp ops widen to float64, which made the round-1
        # passive checker warn about dtype/bounds mismatches
        dt = np.dtype(self._env.cfg.dtype)
        self._np_dtype = dt
        big = np.finfo(dt).max
        self.action_space = spaces.Box(
            low=np.tile(
                np.array(
                    [np.min(np.asarray(self._env.params.s_min)),
                     np.min(np.asarray(self._env.params.v_min))],
                    dtype=dt,
                ),
                (A, 1),
            ),
            high=np.tile(
                np.array(
                    [np.max(np.asarray(self._env.params.s_max)),
                     np.max(np.asarray(self._env.params.v_max))],
                    dtype=dt,
                ),
                (A, 1),
            ),
            dtype=dt,
        )
        # scans: max_range clamp + additive Gaussian noise (sigma = 0.01)
        # applied post-clamp can push a beam slightly outside [0, max_range]
        max_range = float(np.asarray(self._env.tables.max_range))
        self.observation_space = spaces.Dict(
            {
                "scans": spaces.Box(-1.0, max_range + 1.0, (A, B), dt),
                "poses_x": spaces.Box(-big, big, (A,), dt),
                "poses_y": spaces.Box(-big, big, (A,), dt),
                "poses_theta": spaces.Box(-big, big, (A,), dt),
                "linear_vels_x": spaces.Box(-big, big, (A,), dt),
                "linear_vels_y": spaces.Box(-big, big, (A,), dt),
                "ang_vels_z": spaces.Box(-big, big, (A,), dt),
                "collisions": spaces.Box(0.0, 1.0, (A,), dt),
                "lap_times": spaces.Box(0.0, big, (A,), dt),
                "lap_counts": spaces.Box(0.0, big, (A,), dt),
            }
        )
        self._default_poses = None

    def _host_obs_cast(self, obs):
        obs.pop("ego_idx", None)
        return {k: np.asarray(v, dtype=self._np_dtype) for k, v in obs.items()}

    def reset(self, *, seed=None, options=None):
        if _GymnasiumBase is not object:
            super().reset(seed=seed)
        if seed is not None:
            self._env.seed = seed
        poses = None
        if options is not None:
            poses = options.get("poses", None)
        if poses is None:
            poses = self._default_poses
        if poses is None:
            poses = np.zeros((self._env.num_agents, 3))
        self._default_poses = poses
        obs, _, _, info = self._env.reset(poses)
        return self._host_obs_cast(obs), info

    def step(self, action):
        obs, reward, done, info = self._env.step(action)
        if self.render_mode in ("human", "human_fast"):
            self._env.render(self.render_mode)
        return self._host_obs_cast(obs), reward, bool(done), False, info

    def render(self):
        return self._env.render(self.render_mode or "rgb_array")

    def close(self):
        self._env.close()


def register_gymnasium():
    """Register 'f1tenth_tpu/f110-v0' with gymnasium when available."""
    try:
        import gymnasium
    except ImportError:  # pragma: no cover
        return False
    try:
        gymnasium.register(
            id="f1tenth_tpu/f110-v0",
            entry_point="f1tenth_gym_tpu.envs.gym_api:F110GymnasiumEnv",
        )
        return True
    except Exception:
        return False
