from f1tenth_gym_tpu.parallel.vector import (
    batch_reset,
    batch_step,
    make_autoreset_step,
    sort_envs_for_locality,
    uniform_pose_sampler,
)
from f1tenth_gym_tpu.parallel.sharding import (
    ENV_AXIS,
    MODEL_AXIS,
    env_batch_sharding,
    make_mesh,
    replicate,
    shard_states,
)
from f1tenth_gym_tpu.parallel.rollout import Transition, rollout
from f1tenth_gym_tpu.parallel import multihost

__all__ = [
    "batch_reset",
    "batch_step",
    "make_autoreset_step",
    "uniform_pose_sampler",
    "sort_envs_for_locality",
    "make_mesh",
    "env_batch_sharding",
    "shard_states",
    "replicate",
    "ENV_AXIS",
    "MODEL_AXIS",
    "rollout",
    "Transition",
    "multihost",
]
