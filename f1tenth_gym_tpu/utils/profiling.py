"""Profiling and throughput measurement.

The reference's only instrumentation is ad-hoc time.time() FPS loops inside
tests (laser_models.py:543-552) and an on-screen FPS display. Here:

* ``trace(logdir)``: context manager around jax.profiler for device traces
  viewable in TensorBoard/Perfetto (captures XLA/Mosaic kernel timelines);
* ``measure_steps_per_sec``: fenced steady-state throughput of any step fn
  (the harness bench.py uses the same fencing discipline);
* ``annotate``: named trace spans for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace", create_perfetto_link: bool = False):
    """Capture a device profile: ``with trace('/tmp/t'): run()``."""
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


annotate = jax.profiler.TraceAnnotation


def _fence(tree: Any) -> None:
    # block_until_ready alone can return early on tunneled backends; a tiny
    # host readback is a reliable fence.
    leaves = jax.tree.leaves(tree)
    if leaves:
        jax.block_until_ready(leaves)
        _ = float(jax.numpy.sum(leaves[0].ravel()[0]))


def measure_steps_per_sec(
    step_fn: Callable[[Any], Any],
    init: Any,
    num_steps: int = 64,
    warmup: int = 2,
    items_per_step: int = 1,
) -> Tuple[float, Any]:
    """Steady-state throughput of ``carry = step_fn(carry)``.

    Returns (items/sec, final carry). items_per_step scales the rate (e.g.
    the env-batch size for env-steps/s).
    """
    carry = init
    for _ in range(warmup):
        carry = step_fn(carry)
    _fence(carry)
    t0 = time.perf_counter()
    for _ in range(num_steps):
        carry = step_fn(carry)
    _fence(carry)
    dt = time.perf_counter() - t0
    return num_steps * items_per_step / dt, carry
