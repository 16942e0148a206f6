"""Multi-host (pod-slice) execution helpers.

The reference runs one env per OS process with no cross-process coordination
at all (SURVEY.md §2 audit). Here pod-scale runs use the standard JAX
multi-controller model: every host runs the same program,
``jax.distributed.initialize`` wires the processes together, and the env
batch shards over a global ('env', 'model') mesh whose 'env' axis spans
hosts. Env stepping then never communicates (each host steps its shard on
its local chips over ICI); only the learner's gradient all-reduce crosses
hosts over DCN.

Typical pod-slice launch (same script on every host; call ``initialize``
BEFORE any other jax API — backend initialization must not precede
``jax.distributed.initialize``):

    from f1tenth_gym_tpu.parallel import multihost
    multihost.initialize()                 # no-op on single host
    mesh = multihost.global_mesh()         # 'env' spans all chips of all hosts
    states = multihost.host_local_states(make_local_batch, mesh,
                                         envs_per_host=4096)
    # ... PPO(..., mesh=mesh) exactly as single-host

Exercised for real by tests/test_multihost.py: two coordinated CPU
processes x 4 virtual devices each, stitching host-local env batches into
one 8-device global array and cross-host all-reducing through a jitted
computation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from f1tenth_gym_tpu.parallel.sharding import ENV_AXIS, MODEL_AXIS


def is_initialized() -> bool:
    """True when the jax distributed runtime is wired up. Unlike
    jax.process_count(), this does NOT initialize the backend."""
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:  # pragma: no cover - private-API drift
        return False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Wire up multi-host JAX. On TPU pods / managed clusters with default
    env vars, call with no arguments; on other clusters pass the
    coordinator explicitly. Must run before any other jax API (anything
    that initializes the backend — even jax.process_count — breaks
    jax.distributed.initialize). No-op when already initialized; a
    single-host run without cluster env vars is detected and left local,
    but real failures of an EXPLICIT initialization are raised, never
    swallowed.
    """
    if is_initialized():
        return
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        if "already" in str(e).lower():
            return
        if explicit:
            raise
        # no-arg path, no cluster autodetection available: single host


def global_mesh(num_model_shards: int = 1) -> Mesh:
    """('env','model') mesh over ALL devices of ALL processes."""
    devices = np.array(jax.devices())
    n = len(devices)
    assert n % num_model_shards == 0
    return Mesh(devices.reshape(n // num_model_shards, num_model_shards),
                (ENV_AXIS, MODEL_AXIS))


def host_local_states(make_local_batch: Callable[[int], "jax.Array"],
                      mesh: Mesh, envs_per_host: int):
    """Assemble a globally-sharded env batch from host-local pieces.

    ``make_local_batch(envs_per_host)`` builds this host's slice of every
    leaf (e.g. via batch_reset on local envs); slices are stitched into one
    global array per leaf with ``jax.make_array_from_process_local_data``,
    so no host ever materializes the full batch. The global env count is
    ``envs_per_host * jax.process_count()``.
    """
    sharding = NamedSharding(mesh, P(ENV_AXIS))
    local = make_local_batch(envs_per_host)

    def stitch(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape)

    return jax.tree.map(stitch, local)
