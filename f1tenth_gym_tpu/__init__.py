"""f1tenth_gym_tpu — a TPU-native autonomous-racing simulation framework.

A brand-new JAX/XLA implementation with the capabilities of f1tenth_gym
(reference: https://github.com/f1tenth/f1tenth_gym): multi-agent single-track
vehicle dynamics, 1080-beam LiDAR against a distance-field raster, collision
checking, lap bookkeeping, and a Gym-style API — all as pure jitted functions
batched over thousands of envs per chip and sharded over TPU meshes.
"""

from f1tenth_gym_tpu.version import __version__
from f1tenth_gym_tpu.config import (
    DEFAULT_PARAMS,
    INTEGRATOR_EULER,
    INTEGRATOR_RK4,
    MODEL_KS,
    MODEL_ST,
    Integrator,
    SimConfig,
)
from f1tenth_gym_tpu.state import MapData, ScanTables, SimState, VehicleParams
from f1tenth_gym_tpu.core import env_reset, env_step, init_state, make_env_fns, sim_step
from f1tenth_gym_tpu.ops.lidar import make_scan_tables
from f1tenth_gym_tpu.scan_sim import ScanSimulator2D
from f1tenth_gym_tpu.utils.checkpoint import load_pytree, save_pytree
from f1tenth_gym_tpu.utils.map_loader import load_map, make_map_data

__all__ = [
    "__version__",
    "SimConfig",
    "DEFAULT_PARAMS",
    "INTEGRATOR_RK4",
    "INTEGRATOR_EULER",
    "Integrator",
    "MODEL_ST",
    "MODEL_KS",
    "VehicleParams",
    "MapData",
    "ScanTables",
    "SimState",
    "sim_step",
    "env_step",
    "env_reset",
    "init_state",
    "make_env_fns",
    "make_scan_tables",
    "ScanSimulator2D",
    "load_map",
    "make_map_data",
    "save_pytree",
    "load_pytree",
]
