"""Static simulation configuration and default vehicle parameters.

The reference environment (``f110_env.py:102-159``) parses ``gym.make`` kwargs
with try/except defaults. Here the static (shape/compile-affecting) knobs live
in a hashable frozen dataclass so they can be closed over by ``jax.jit``,
while all *physical* quantities (vehicle params, timestep) stay dynamic
pytree leaves so ``update_params`` (reference ``f110_env.py:364-375``) never
triggers recompilation.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax.numpy as jnp

# Integrator choices (reference: base_classes.py:40-42, Integrator enum).
INTEGRATOR_RK4 = "rk4"
INTEGRATOR_EULER = "euler"


class Integrator(enum.Enum):
    """Drop-in shim for reference user code that passes
    ``Integrator.RK4`` / ``Integrator.Euler`` (base_classes.py:40-42)."""

    RK4 = INTEGRATOR_RK4
    Euler = INTEGRATOR_EULER

    @property
    def name_str(self) -> str:
        return self.value

# Dynamics model families.
MODEL_ST = "st"  # 7-state single-track with |v|<0.5 kinematic switch (reference default)
MODEL_KS = "ks"  # kinematic bicycle embedded in the 7-state layout


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Hashable, static env configuration.

    Anything here changes array shapes or traced control flow, so changing it
    implies one recompile (reference analogue: num_agents / num_beams are
    fixed at construction, ``f110_env.py:134-136``).
    """

    num_agents: int = 2
    num_beams: int = 1080
    theta_dis: int = 2000
    ego_idx: int = 0
    integrator: str = INTEGRATOR_RK4
    model: str = MODEL_ST
    # Maximum sphere-marching iterations for the batched LiDAR kernel. The
    # reference uses an unbounded while loop (laser_models.py:133-141); with
    # eps=1e-4 each step advances at least one map cell once outside an
    # obstacle, so ceil(max_range / resolution) bounds the trip count. 1024
    # covers resolution >= 0.03 at max_range 30. The kernel also early-exits
    # via lax.while_loop when every beam has converged.
    max_march_iters: int = 1024
    # LiDAR engine: "march" = distance-field sphere marching, bit-compatible
    # with the reference (gather-bound on TPU); "segments" = XLA ray/polygon
    # intersection against extracted wall segments; "pallas" = hand-written
    # Mosaic kernel for the same ray/polygon math (fastest; accuracy within
    # the contour-simplification tolerance, see ops/pallas_scan.py);
    # "auto" = "pallas" on a TPU backend when the map has a segment table,
    # else "march". The default stays "march" because it is the bit-exact
    # parity engine; the flagship F110Env surface defaults to "auto".
    scan_engine: str = "march"
    # Whether scans get additive Gaussian noise (reference: laser_models.py:450-452).
    scan_noise: bool = True
    # Reference quirk: every RaceCar's rng is seeded with the same seed
    # (base_classes.py:119,204), so all agents of an env draw *identical*
    # noise each step. True replicates that; False draws independent noise.
    shared_agent_noise: bool = True
    # (A former fuse_extras option — noise + iTTC in the scan kernel's out
    # phase, opponents in a second kernel — was removed in round 5 after
    # measuring a net LOSS on v5e in two consecutive rounds: the noise
    # ARRAY operand re-added the HBM traffic the fusion saved, and the XLA
    # noise+iTTC+opponent block outruns the overlay kernel once the
    # closed-form windows + angle-addition trig landed in ops/collision.py.
    # The overlay kernel remains in ops/pallas_scan.py as a test oracle.)
    # Computation dtype for the simulation state ("float32" on TPU;
    # "float64" for CPU parity testing vs the float64 reference).
    dtype: str = "float32"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def resolved_scan_engine(self) -> str:
        """The engine "auto" resolves to on the current backend: the Pallas
        kernel on TPU, else the bit-exact marching engine. Use this when
        deciding whether a map needs segment extraction / tile culling
        (core/simulator.py applies the same rule at trace time, with the
        extra condition that the map actually carries a segment table)."""
        import jax

        if self.scan_engine != "auto":
            return self.scan_engine
        return "pallas" if jax.default_backend() == "tpu" else "march"


# Default vehicle parameter dict — values from reference f110_env.py:130.
DEFAULT_PARAMS = {
    "mu": 1.0489,
    "C_Sf": 4.718,
    "C_Sr": 5.4562,
    "lf": 0.15875,
    "lr": 0.17145,
    "h": 0.074,
    "m": 3.74,
    "I": 0.04712,
    "s_min": -0.4189,
    "s_max": 0.4189,
    "sv_min": -3.2,
    "sv_max": 3.2,
    "v_switch": 7.319,
    "a_max": 9.51,
    "v_min": -5.0,
    "v_max": 20.0,
    "width": 0.31,
    "length": 0.58,
}

# LiDAR defaults (reference: ScanSimulator2D.__init__, laser_models.py:360;
# RaceCar defaults, base_classes.py:69).
DEFAULT_FOV = 4.7
DEFAULT_MAX_RANGE = 30.0
DEFAULT_EPS = 0.0001
DEFAULT_SCAN_STD = 0.01
DEFAULT_TTC_THRESH = 0.005  # base_classes.py:115
DEFAULT_TIMESTEP = 0.01
DEFAULT_SEED = 12345
