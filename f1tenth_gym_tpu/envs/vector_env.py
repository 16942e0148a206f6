"""Gymnasium ``VectorEnv`` adapter: thousands of TPU envs behind numpy IO.

The reference promises "massively parallel applications" (docs/index.rst:12)
and realizes it as "run many gym processes". Here the batch is ONE compiled
program stepping E envs in lockstep on the device (parallel/vector.py); this
adapter wraps it in the standard ``gymnasium.vector.VectorEnv`` interface so
off-the-shelf RL stacks (CleanRL, SB3 via compatibility shims, ...) consume
the batch without writing any JAX.

Autoreset follows Gymnasium's NEXT_STEP convention: the step after a
termination ignores that env's action and returns its reset observation.
Internally the reset observation is produced by a zero-action step from the
start pose — exactly the reference's ``reset()`` semantics
(f110_env.py:337-338: reset IS a zero-action step).

Throughput note: this interface converts the obs dict (notably scans,
E x A x num_beams) to numpy every step — that host<->device traffic is the
price of the numpy API. Keep rollouts fully on-device with
``parallel.rollout`` / ``make_autoreset_step`` when the policy is JAX.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu.config import DEFAULT_TIMESTEP, SimConfig
from f1tenth_gym_tpu.ops.lidar import make_scan_tables
from f1tenth_gym_tpu.state import VehicleParams
from f1tenth_gym_tpu.utils.map_loader import load_map

try:
    import gymnasium
    from gymnasium import spaces
    from gymnasium.vector import VectorEnv as _VectorBase
    from gymnasium.vector.utils import batch_space
except ImportError:  # pragma: no cover
    gymnasium = None
    _VectorBase = object


class F110VectorEnv(_VectorBase):
    """E lockstep racing envs as one on-device batch.

    Parameters mirror ``F110Env`` kwargs plus:
        num_envs: batch size E.
        poses: optional (E, A, 3) fixed start grid. Default: uniform
            corridor spawns (grouped start grid, corridor-aligned headings)
            sampled from the map's free space.
        seed: PRNG seed for spawns and scan noise.

    ``reset`` and autoreset return each env to its own start grid
    (reference reset semantics); pass fresh ``options={'poses': ...}`` to
    move the grid.
    """

    metadata: Dict[str, Any] = {"render_modes": []}

    def __init__(self, num_envs: int = 256, map: Optional[str] = None,
                 map_ext: str = ".png", num_agents: int = 2,
                 num_beams: int = 1080, timestep: float = DEFAULT_TIMESTEP,
                 params: Optional[Dict[str, Any]] = None,
                 poses: Optional[np.ndarray] = None, seed: int = 0,
                 scan_engine: str = "auto", dtype: str = "float32",
                 **cfg_kwargs):
        if gymnasium is None:  # pragma: no cover
            raise ImportError("F110VectorEnv requires gymnasium")
        from gymnasium.vector import AutoresetMode

        self.metadata = dict(self.metadata,
                             autoreset_mode=AutoresetMode.NEXT_STEP)
        if map is None:
            from f1tenth_gym_tpu.maps import map_path

            map = map_path("example_map")
        self.cfg = SimConfig(num_agents=num_agents, num_beams=num_beams,
                             dtype=dtype, scan_engine=scan_engine,
                             **cfg_kwargs)
        jd = self.cfg.jnp_dtype
        self.params = VehicleParams.create(params, dtype=jd)
        self.tables = make_scan_tables(num_beams=num_beams, dtype=jd)
        engine = self.cfg.resolved_scan_engine
        self.map_data = load_map(
            map, map_ext, dtype=jd,
            extract_segments=engine in ("segments", "pallas"),
            tile_culling=engine == "pallas")
        self.timestep = float(timestep)
        self.num_envs = int(num_envs)
        self._seed = seed

        from f1tenth_gym_tpu.parallel import (
            make_autoreset_step, uniform_pose_sampler,
        )

        if poses is not None:
            poses = np.asarray(poses)
            if poses.shape != (num_envs, num_agents, 3):
                raise ValueError(
                    f"poses must be ({num_envs}, {num_agents}, 3), "
                    f"got {poses.shape}")
            self._poses = jnp.asarray(poses, dtype=jd)
        else:
            sampler = uniform_pose_sampler(self.map_data, clearance=0.6,
                                           grouped=True, align_theta=True)
            self._poses = sampler(jax.random.PRNGKey(seed),
                                  (num_envs, num_agents))
        # make_autoreset_step already jits itself (with the map as an
        # argument, keeping big culling tables out of the program)
        self._astep = make_autoreset_step(
            self.params, self.map_data, self.tables, self.cfg,
            self.timestep, reset_to_start=True)
        self._states = None
        self._pending_reset = np.zeros(num_envs, bool)

        A, B = num_agents, num_beams
        dt = np.dtype(dtype)
        big = np.finfo(dt).max
        max_range = float(np.asarray(self.tables.max_range))
        self.single_action_space = spaces.Box(
            low=np.tile(np.array(
                [float(np.min(np.asarray(self.params.s_min))),
                 float(np.min(np.asarray(self.params.v_min)))], dtype=dt),
                (A, 1)),
            high=np.tile(np.array(
                [float(np.max(np.asarray(self.params.s_max))),
                 float(np.max(np.asarray(self.params.v_max)))], dtype=dt),
                (A, 1)),
            dtype=dt)
        self.single_observation_space = spaces.Dict({
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
        })
        self.action_space = batch_space(self.single_action_space, num_envs)
        self.observation_space = batch_space(self.single_observation_space,
                                             num_envs)
        self._np_dtype = dt

    def _host_obs(self, obs) -> Dict[str, np.ndarray]:
        obs.pop("ego_idx", None)
        return {k: np.asarray(v, dtype=self._np_dtype)
                for k, v in obs.items()}

    def reset(self, *, seed=None, options=None):
        from f1tenth_gym_tpu.parallel import batch_reset

        if seed is not None:
            self._seed = seed
        if options and options.get("poses") is not None:
            self._poses = jnp.asarray(options["poses"],
                                      dtype=self.cfg.jnp_dtype)
        keys = jax.random.split(jax.random.PRNGKey(self._seed),
                                self.num_envs)
        self._states, obs, _, _, _ = batch_reset(
            self._poses, keys, self.params, self.map_data, self.tables,
            self.cfg, self.timestep)
        self._pending_reset[:] = False
        return self._host_obs(obs), {}

    def step(self, actions):
        if self._states is None:
            raise RuntimeError("call reset() before step()")
        a = jnp.asarray(np.asarray(actions), dtype=self.cfg.jnp_dtype)
        if self._pending_reset.any():
            # NEXT_STEP autoreset: a freshly-reset env ignores the incoming
            # action — its spawn step is the reference's zero-action reset
            mask = jnp.asarray(self._pending_reset)[:, None, None]
            a = jnp.where(mask, 0.0, a)
        self._states, obs, reward, done, _ = self._astep(self._states, a)
        done_np = np.asarray(done).astype(bool)
        rewards = np.where(self._pending_reset, 0.0,
                           np.asarray(reward, np.float64))
        terminations = done_np & ~self._pending_reset
        # pending tracks "this step REPORTED a termination" (so the next
        # step is that env's reset/spawn step). Tracking raw done here
        # instead would permanently swallow terminations of an env whose
        # spawn state is itself terminal (e.g. an overlapping start grid):
        # done stays True every step and `& ~pending` masks it forever.
        # With `terminations`, such an env alternates report/reset —
        # 1-step episodes, which is what immediate-death spawns are.
        self._pending_reset = terminations.copy()
        truncations = np.zeros(self.num_envs, bool)
        return (self._host_obs(obs), rewards, terminations, truncations, {})

    def close(self, **kwargs):
        self._states = None


def register_gymnasium_vector():
    """Register 'f1tenth_tpu/f110-v0' vector entry point when available."""
    if gymnasium is None:  # pragma: no cover
        return False
    try:
        # attach the vector entry point to the existing registration
        spec = gymnasium.registry.get("f1tenth_tpu/f110-v0")
        if spec is not None and not spec.vector_entry_point:
            spec.vector_entry_point = (
                "f1tenth_gym_tpu.envs.vector_env:F110VectorEnv")
        return True
    except Exception:
        return False
