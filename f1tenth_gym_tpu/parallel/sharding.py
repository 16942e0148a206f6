"""Device-mesh sharding of env batches.

The reference has no distributed execution at all (SURVEY.md §2 audit); its
lineage's only IPC was one ZMQ socket to one C++ process. Here the scaling
axes are native JAX:

  * env-batch data parallelism: the E axis of the batched ``SimState`` is
    sharded over the mesh's 'env' axis with ``NamedSharding`` — XLA runs the
    same compiled step on every device's shard with zero communication
    (env stepping is embarrassingly parallel);
  * learner parallelism: policy params replicate (or tensor-shard over a
    'model' axis) and gradient all-reduce rides ICI via jax collectives,
    see parallel/ppo.py;
  * multi-host: the same code under ``jax.distributed.initialize`` with a
    process-spanning mesh shards envs over hosts (DCN only carries the
    learner's all-reduce, never per-step env traffic).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from f1tenth_gym_tpu.state import SimState

ENV_AXIS = "env"
MODEL_AXIS = "model"


def make_mesh(
    num_env_shards: Optional[int] = None,
    num_model_shards: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('env', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if num_env_shards is None:
        num_env_shards = n // num_model_shards
    assert num_env_shards * num_model_shards == n, (
        f"{num_env_shards}x{num_model_shards} != {n} devices"
    )
    dev_array = np.array(devices).reshape(num_env_shards, num_model_shards)
    return Mesh(dev_array, (ENV_AXIS, MODEL_AXIS))


def env_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading E axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_states(states: SimState, mesh: Mesh) -> SimState:
    """Place a batched SimState with its E axis sharded over the mesh."""
    sh = env_batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), states)


def shard_env_pytree(tree, mesh: Mesh):
    """Shard any pytree whose every leaf has a leading E axis."""
    sh = env_batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    """Replicate map rasters / tables / params on every device."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
