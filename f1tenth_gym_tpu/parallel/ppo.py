"""PPO learner over sharded env batches: the env<->learner boundary demo.

The reference has no training code at all; its ecosystem trains by running
many env processes against external RL libs. Here the full loop — rollout,
GAE, clipped PPO updates — is ONE jitted program over a ('env', 'model')
mesh:

  * env states + trajectories shard over the 'env' axis (pure data
    parallelism, zero cross-device traffic during stepping);
  * policy/value MLP weights are sharded over the 'model' axis (tensor
    parallelism on the hidden dimension) and replicated over 'env';
  * loss means over the sharded batch axis make XLA insert the gradient
    all-reduce over ICI — the NCCL-free equivalent of DDP.

This is deliberately a compact, production-shaped PPO (PER-AGENT rewards/
values/GAE — a crashing opponent never pollutes the ego's gradient —
multi-epoch minibatch updates, entropy bonus, advantage normalization),
not a toy.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from f1tenth_gym_tpu.config import SimConfig
from f1tenth_gym_tpu.parallel.sharding import ENV_AXIS, MODEL_AXIS
from f1tenth_gym_tpu.parallel.vector import batch_step
from f1tenth_gym_tpu.state import MapData, ScanTables, SimState, VehicleParams


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    obs_beams: int = 64          # scan downsample size fed to the net
    hidden: int = 256
    rollout_steps: int = 32
    epochs: int = 4
    minibatches: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    # reward shaping: progress (speed) minus crash penalty
    speed_reward: float = 1.0
    crash_penalty: float = 10.0


class ActorCritic(nn.Module):
    hidden: int
    act_dim: int = 2

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.hidden, name="fc1")(x)
        h = nn.tanh(h)
        h = nn.Dense(self.hidden, name="fc2")(h)
        h = nn.tanh(h)
        mean = nn.Dense(self.act_dim, name="pi_mean")(h)
        log_std = self.param(
            "pi_log_std", nn.initializers.constant(-0.5), (self.act_dim,)
        )
        value = nn.Dense(1, name="vf")(h)[..., 0]
        return mean, jnp.broadcast_to(log_std, mean.shape), value


def featurize(obs: Dict[str, jnp.ndarray], tables: ScanTables, obs_beams: int):
    """obs dict -> flat features (..., obs_beams + 2) for the ego of each agent.

    Scans mean-pool down to obs_beams and normalize by max_range; append
    normalized speed and yaw rate.
    """
    scans = obs["scans"]
    B = scans.shape[-1]
    stride = B // obs_beams
    pooled = scans[..., : obs_beams * stride]
    pooled = pooled.reshape(*pooled.shape[:-1], obs_beams, stride).mean(-1)
    pooled = pooled / tables.max_range
    v = obs["linear_vels_x"][..., None] / 10.0
    w = obs["ang_vels_z"][..., None] / 5.0
    return jnp.concatenate([pooled, v, w], axis=-1)


def gaussian_logp(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2.0 * log_std + jnp.log(2.0 * np.pi)),
        axis=-1,
    )


def scale_actions(raw, params: VehicleParams):
    """Map network outputs to [s_min, s_max] steer x [0, v_max] speed."""
    steer_lim = jnp.max(jnp.abs(jnp.stack(
        [jnp.max(jnp.atleast_1d(params.s_min)), jnp.max(jnp.atleast_1d(params.s_max))]
    )))
    v_hi = jnp.max(jnp.atleast_1d(params.v_max))
    steer = jnp.tanh(raw[..., 0]) * steer_lim
    speed = (jnp.tanh(raw[..., 1]) * 0.5 + 0.5) * v_hi
    return jnp.stack([steer, speed], axis=-1)


class TrainState(NamedTuple):
    net_params: Any
    opt_state: Any
    env_states: SimState
    key: jax.Array


class PPO:
    """PPO over a batched (optionally sharded) env."""

    def __init__(
        self,
        params: VehicleParams,
        map_data: MapData,
        tables: ScanTables,
        cfg: SimConfig,
        timestep: float,
        ppo_cfg: PPOConfig = PPOConfig(),
        step_fn: Optional[Callable] = None,  # e.g. autoreset step
        mesh: Optional[Mesh] = None,
    ):
        self.params = params
        self.map_data = map_data
        self.tables = tables
        self.cfg = cfg
        self.timestep = timestep
        self.pc = ppo_cfg
        self.mesh = mesh
        self.net = ActorCritic(hidden=ppo_cfg.hidden)
        self.tx = optax.chain(
            optax.clip_by_global_norm(ppo_cfg.max_grad_norm),
            optax.adam(ppo_cfg.lr),
        )
        self.step_fn = step_fn

    def _step(self, states, actions, map_data):
        """One env step with the map as data flow, not closure.

        When ``train_step`` is jitted with an explicit map_data argument,
        the map's (potentially hundreds-of-MB) culling tables become
        program PARAMETERS; a closure would embed them as constants in the
        lowered module. Custom step_fns participate via their ``.impl``
        attribute (make_autoreset_step provides one); bare closures still
        work but re-embed their captured map.
        """
        if map_data is None:
            map_data = self.map_data
        if self.step_fn is not None:
            impl = getattr(self.step_fn, "impl", None)
            if impl is not None:
                return impl(states, actions, map_data)
            return self.step_fn(states, actions)
        return batch_step(states, actions, self.params, map_data,
                          self.tables, self.cfg, self.timestep)

    # ------------------------------------------------------------- init
    def init(self, env_states: SimState, key: jax.Array) -> TrainState:
        feat_dim = self.pc.obs_beams + 2
        k1, k2 = jax.random.split(key)
        net_params = self.net.init(k1, jnp.zeros((1, feat_dim)))
        if self.mesh is not None:
            net_params = self._shard_net_params(net_params)
        opt_state = self.tx.init(net_params)
        return TrainState(net_params, opt_state, env_states, k2)

    def _shard_net_params(self, net_params):
        """Tensor-shard the MLP over the 'model' axis: fc1 kernel by output
        dim, fc2 kernel by input dim (Megatron-style column/row split);
        everything else replicated."""
        mesh = self.mesh

        def spec_for(path, leaf):
            name = "/".join(str(p.key) for p in path if hasattr(p, "key"))
            if "fc1/kernel" in name:
                return P(None, MODEL_AXIS)
            if "fc2/kernel" in name:
                return P(MODEL_AXIS, None)
            return P()

        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(
                leaf, NamedSharding(mesh, spec_for(path, leaf))
            ),
            net_params,
        )

    # ------------------------------------------------------------- rollout
    def _obs_of(self, states: SimState):
        return {
            "scans": states.scans,
            "linear_vels_x": states.x[..., 3],
            "ang_vels_z": states.x[..., 5],
        }

    def _policy(self, net_params, key, feats):
        mean, log_std, value = self.net.apply(net_params, feats)
        raw = mean + jnp.exp(log_std) * jax.random.normal(
            key, mean.shape, dtype=mean.dtype
        )
        logp = gaussian_logp(mean, log_std, raw)
        return raw, logp, value

    def _shaped_reward(self, states: SimState, done):
        """Progress-style shaping, PER AGENT (E, A): forward speed minus
        crash penalty. A crashing opponent must not pollute the ego's
        reward (and vice versa) — each agent learns on its own signal."""
        v = states.x[..., 3]  # (E, A)
        crash = states.collisions  # (E, A)
        return (
            self.pc.speed_reward * v * self.timestep
            - self.pc.crash_penalty * crash
        )

    def rollout(self, ts: TrainState, map_data: Optional[MapData] = None):
        """Collect rollout_steps transitions for every agent of each env."""
        pc = self.pc

        def body(carry, _):
            states, key = carry
            key, ak = jax.random.split(key)
            feats = featurize(self._obs_of(states), self.tables, pc.obs_beams)
            # per-agent shared policy: apply to (E, A, F)
            raw, logp, value = self._policy(ts.net_params, ak, feats)
            actions = scale_actions(raw, self.params)
            nstates, obs, _, done, _ = self._step(states, actions, map_data)
            reward = self._shaped_reward(nstates, done)
            out = dict(
                feats=feats, raw=raw, logp=logp, value=value,
                reward=reward, done=done,
            )
            return (nstates, key), out

        (states, key), traj = jax.lax.scan(
            body, (ts.env_states, ts.key), None, length=pc.rollout_steps
        )
        # bootstrap value for the last state
        feats_T = featurize(self._obs_of(states), self.tables, pc.obs_beams)
        _, _, value_T = self.net.apply(ts.net_params, feats_T)
        return ts._replace(env_states=states, key=key), traj, value_T

    # ------------------------------------------------------------- losses
    def _gae(self, traj, value_T):
        pc = self.pc
        # everything PER AGENT: values/rewards (T, E, A); env-level done
        # broadcasts over the agent axis
        values = traj["value"]  # (T, E, A)
        v_last = value_T  # (E, A)
        rewards = traj["reward"]  # (T, E, A)
        dones = traj["done"].astype(values.dtype)[..., None]  # (T, E, 1)

        def scan_fn(carry, x):
            gae, next_value = carry
            reward, done, value = x
            delta = reward + pc.gamma * next_value * (1 - done) - value
            gae = delta + pc.gamma * pc.gae_lambda * (1 - done) * gae
            return (gae, value), gae

        (_, _), advs = jax.lax.scan(
            scan_fn,
            (jnp.zeros_like(v_last), v_last),
            (rewards, dones, values),
            reverse=True,
        )
        returns = advs + values
        return advs, returns

    def _loss(self, net_params, batch):
        pc = self.pc
        mean, log_std, value = self.net.apply(net_params, batch["feats"])
        logp = gaussian_logp(mean, log_std, batch["raw"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]  # (N, A): per-agent advantages
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1 - pc.clip_eps, 1 + pc.clip_eps) * adv
        pg_loss = -jnp.minimum(pg1, pg2).mean()
        v_loss = 0.5 * ((value - batch["ret"]) ** 2).mean()
        ent = jnp.sum(log_std + 0.5 * jnp.log(2 * np.pi * np.e), axis=-1).mean()
        total = pg_loss + pc.vf_coef * v_loss - pc.ent_coef * ent
        return total, dict(pg=pg_loss, vf=v_loss, ent=ent)

    # ------------------------------------------------------------- train
    def train_step(self, ts: TrainState, map_data: Optional[MapData] = None):
        """One PPO iteration: rollout + epochs x minibatch updates. Jittable.

        Pass map_data explicitly when jitting (``jax.jit(ppo.train_step)``
        called as ``step(ts, m)``) so the map's culling tables enter the
        program as parameters instead of embedded constants — required for
        large multi-track worlds (see _step).
        """
        pc = self.pc
        ts, traj, value_T = self.rollout(ts, map_data)
        advs, returns = self._gae(traj, value_T)
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)

        T, E, A = advs.shape
        flat = dict(
            feats=traj["feats"].reshape(T * E, *traj["feats"].shape[2:]),
            raw=traj["raw"].reshape(T * E, *traj["raw"].shape[2:]),
            logp=traj["logp"].reshape(T * E, *traj["logp"].shape[2:]),
            adv=advs.reshape(T * E, A),
            ret=returns.reshape(T * E, A),
        )

        def epoch_body(carry, _):
            net_params, opt_state, key = carry
            key, pk = jax.random.split(key)
            perm = jax.random.permutation(pk, T * E)
            mb_size = (T * E) // pc.minibatches

            def mb_body(carry, mb_idx):
                net_params, opt_state = carry
                take = jax.lax.dynamic_slice_in_dim(perm, mb_idx * mb_size, mb_size)
                batch = {k: v[take] for k, v in flat.items()}
                (loss, aux), grads = jax.value_and_grad(self._loss, has_aux=True)(
                    net_params, batch
                )
                updates, opt_state = self.tx.update(grads, opt_state, net_params)
                net_params = optax.apply_updates(net_params, updates)
                return (net_params, opt_state), loss

            (net_params, opt_state), losses = jax.lax.scan(
                mb_body, (net_params, opt_state), jnp.arange(pc.minibatches)
            )
            return (net_params, opt_state, key), losses.mean()

        (net_params, opt_state, key), losses = jax.lax.scan(
            epoch_body, (ts.net_params, ts.opt_state, ts.key), None,
            length=pc.epochs,
        )
        metrics = dict(
            loss=losses.mean(),
            mean_reward=traj["reward"].mean(),
            crash_rate=traj["done"].mean(),
        )
        return ts._replace(
            net_params=net_params, opt_state=opt_state, key=key
        ), metrics
