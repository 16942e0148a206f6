"""Genuine multi-process execution test (SURVEY §2 distributed audit).

Launches 2 coordinated CPU processes (4 virtual devices each) running
tests/multihost_worker.py: jax.distributed.initialize, an 8-device global
mesh whose 'env' axis spans both processes, the host-local stitch, jitted
stepping over the globally-sharded batch, and a cross-process all-reduce.
Both workers must agree on the reduced value.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_stitch_and_allreduce():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_ENABLE_X64")}
    env["PYTHONPATH"] = root
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert "MULTIHOST_OK" in out, f"worker {i} output:\n{out}"
    # the all-reduced value must be identical across processes
    vals = [line.split("mean_v=")[1].split()[0]
            for out in outs for line in out.splitlines()
            if "MULTIHOST_OK" in line]
    assert len(vals) == 2 and vals[0] == vals[1], vals
