"""Numeric kernels: dynamics, lidar, collision — the TPU analogue of the
reference's Numba @njit tier (SURVEY.md §1 L0)."""

from f1tenth_gym_tpu.ops.dynamics import (
    accl_constraints,
    euler_step,
    pid,
    rk4_step,
    steering_constraint,
    vehicle_dynamics_ks5,
    vehicle_dynamics_ks7,
    vehicle_dynamics_st,
)
from f1tenth_gym_tpu.ops.lidar import (
    add_scan_noise,
    beam_theta_indices,
    check_ttc,
    dt_lookup,
    get_scan,
    make_scan_tables,
)
from f1tenth_gym_tpu.ops.collision import (
    collision_multiple,
    collision_pairwise,
    get_vertices,
    ray_cast_opponents,
)
from f1tenth_gym_tpu.ops.pallas_scan import (
    build_seg_table,
    scan_pallas,
    scan_pallas_vmappable,
)

__all__ = [
    "accl_constraints",
    "steering_constraint",
    "vehicle_dynamics_ks5",
    "vehicle_dynamics_ks7",
    "vehicle_dynamics_st",
    "pid",
    "euler_step",
    "rk4_step",
    "make_scan_tables",
    "dt_lookup",
    "beam_theta_indices",
    "get_scan",
    "add_scan_noise",
    "check_ttc",
    "get_vertices",
    "collision_pairwise",
    "collision_multiple",
    "ray_cast_opponents",
    "build_seg_table",
    "scan_pallas",
    "scan_pallas_vmappable",
]
