"""Vehicle dynamics model families.

The reference hardcodes the single-track (ST) model in RaceCar
(base_classes.py:286 etc.); here models are a registry keyed by name so envs
can run any family. Each model maps ``(x7, u2, params) -> dx7`` in the
shared 7-state layout [x, y, steer, vel, yaw, yaw_rate, slip].
"""

from f1tenth_gym_tpu.config import MODEL_KS, MODEL_ST
from f1tenth_gym_tpu.ops.dynamics import vehicle_dynamics_ks7, vehicle_dynamics_st

MODEL_REGISTRY = {
    MODEL_ST: vehicle_dynamics_st,
    MODEL_KS: vehicle_dynamics_ks7,
}


def get_model(name: str):
    try:
        return MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown model '{name}'; available: {sorted(MODEL_REGISTRY)}"
        ) from None


__all__ = ["MODEL_REGISTRY", "get_model", "MODEL_ST", "MODEL_KS"]
