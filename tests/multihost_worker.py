"""Worker for tests/test_multihost.py: one of N coordinated CPU processes.

Run as: python multihost_worker.py <process_id> <port> <num_processes>
Each process exposes 4 virtual CPU devices; together they form the global
8-device ('env','model') mesh. Exercises the REAL multi-process paths:
jax.distributed.initialize via multihost.initialize (explicit args),
host_local_states' make_array_from_process_local_data stitch, a jitted env
step over the globally-sharded batch, and a cross-process all-reduce.
"""

import os
import sys

pid, port, n = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from f1tenth_gym_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=n, process_id=pid)
assert multihost.is_initialized()
assert jax.process_count() == n, jax.process_count()
assert len(jax.devices()) == 4 * n
assert len(jax.local_devices()) == 4

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from f1tenth_gym_tpu import SimConfig, VehicleParams, make_scan_tables  # noqa: E402
from f1tenth_gym_tpu.parallel import batch_reset, batch_step  # noqa: E402
from f1tenth_gym_tpu.tracks.synthetic import ring_map_data, ring_start_poses  # noqa: E402

cfg = SimConfig(num_agents=1, num_beams=32, scan_noise=False)
params = VehicleParams.create()
tables = make_scan_tables(num_beams=32)
m = ring_map_data(size=64, radius=1.5)

ENVS_PER_HOST = 4
mesh = multihost.global_mesh()
assert mesh.devices.size == 4 * n


def make_local(envs):
    poses = jnp.asarray(np.stack([ring_start_poses(1, 1.5)] * envs))
    keys = jax.random.split(jax.random.PRNGKey(100 + pid), envs)
    states, *_ = batch_reset(poses, keys, params, m, tables, cfg, 0.01)
    return states


states = multihost.host_local_states(make_local, mesh,
                                     envs_per_host=ENVS_PER_HOST)
E = ENVS_PER_HOST * n
assert states.x.shape == (E, 1, 7), states.x.shape
assert len(states.x.sharding.device_set) == 4 * n

actions = jnp.zeros((E, 1, 2))


@jax.jit
def step_and_reduce(s, a):
    s, obs, r, d, _ = batch_step(s, a, params, m, tables, cfg, 0.01)
    # cross-host all-reduce: mean speed over the globally-sharded env axis
    return s, jnp.mean(s.x[:, :, 3])


for _ in range(3):
    states, mean_v = step_and_reduce(states, actions)
val = float(mean_v)  # replicated output: addressable on every host
assert np.isfinite(val)
print(f"MULTIHOST_OK pid={pid} mean_v={val:.6f}", flush=True)
