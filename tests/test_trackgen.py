"""Random track generation: in-memory domain randomization + CLI emission."""

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

from f1tenth_gym_tpu import SimConfig, VehicleParams, make_env_fns, make_scan_tables
from f1tenth_gym_tpu.tracks.trackgen import random_track_map_data


def test_random_track_env_steps():
    """A fully in-memory random track is drivable: env steps on it, scans
    see walls, centerline start is collision-free."""
    m, wpts = random_track_map_data(seed=3, dtype=jnp.float64)
    assert m.dt.ndim == 2 and wpts.shape[1] == 3
    params = VehicleParams.create(dtype=jnp.float64)
    tables = make_scan_tables(num_beams=108, dtype=jnp.float64)
    cfg = SimConfig(num_agents=1, num_beams=108, dtype="float64")
    reset, step = make_env_fns(params, m, tables, cfg, 0.01)
    d = wpts[1, :2] - wpts[0, :2]
    pose = jnp.asarray([[wpts[0, 0], wpts[0, 1],
                         float(np.arctan2(d[1], d[0]))]])
    s, o, r, done, info = reset(pose, jax.random.PRNGKey(0))
    assert not bool(done)
    for _ in range(20):
        s, o, r, done, info = step(s, jnp.asarray([[0.0, 2.0]]))
    scans = np.asarray(o["scans"])
    assert np.all(scans > 0) and scans.min() < 2.5  # walls in sight
    assert float(s.collisions[0]) == 0.0
    # different seeds give different tracks
    m2, wpts2 = random_track_map_data(seed=4, dtype=jnp.float64)
    assert not np.allclose(wpts[:, :2], wpts2[:, :2])


def test_trackgen_cli(tmp_path):
    out = tmp_path / "maps"
    r = subprocess.run(
        [sys.executable, "-m", "f1tenth_gym_tpu.tracks.trackgen",
         "--seed", "9", "--n-maps", "1", "--out-dir", str(out)],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr
    files = sorted(os.listdir(out))
    assert any(f.endswith(".png") for f in files)
    assert any(f.endswith(".yaml") for f in files)
    assert any(f.endswith(".csv") for f in files)
