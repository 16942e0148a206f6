"""Pallas scan engine: interpret-mode equivalence vs the XLA segments engine.

The Pallas kernel (ops/pallas_scan.py) computes the same ray/segment
intersections as ops/segments.get_scan_segments with the same theta-LUT beam
discretization, so away from degenerate grazing incidence the two must agree
to f32 round-off. These tests run the kernel in interpret mode on CPU (the
same code path compiles on TPU; TPU-vs-XLA equivalence is additionally
asserted by the benchmarked engine parity in bench runs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from f1tenth_gym_tpu.config import SimConfig
from f1tenth_gym_tpu.ops.lidar import make_scan_tables
from f1tenth_gym_tpu.ops.pallas_scan import (
    build_seg_table,
    scan_pallas,
    scan_pallas_vmappable,
)
from f1tenth_gym_tpu.ops.segments import get_scan_segments
from f1tenth_gym_tpu.tracks.synthetic import ring_map_data

NB, TD = 256, 2000


@pytest.fixture(scope="module")
def ring():
    m = ring_map_data(size=256, radius=4.0, dtype=jnp.float32,
                      extract_segments=True)
    tables = make_scan_tables(num_beams=NB, dtype=jnp.float32)
    return m, tables


def _random_poses(n, radius=4.0, seed=0):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * np.pi, n)
    r = radius + rng.uniform(-1.0, 1.0, n)
    th = rng.uniform(0, 2 * np.pi, n)
    return jnp.asarray(
        np.stack([r * np.cos(ang), r * np.sin(ang), th], -1), jnp.float32)


def test_matches_xla_segments(ring):
    m, tables = ring
    poses = _random_poses(24)
    ours = np.asarray(scan_pallas(poses, m.seg_table, tables, NB, TD,
                                  interpret=True))
    ref = np.asarray(get_scan_segments(
        poses, m.segments.astype(jnp.float32), tables, NB, TD))
    err = np.abs(ours - ref.astype(np.float32))
    # same math modulo the kernel's approx reciprocal (~1e-3 relative) and
    # f32 vs x64 evaluation; grazing beams excluded by percentile. Error
    # budget: sigma=1cm beam noise, ~6cm contour tolerance.
    assert np.percentile(err, 99.5) < 5e-2, np.percentile(err, 99.5)
    assert np.median(err) < 5e-3


def test_batch_shapes_and_padding(ring):
    m, tables = ring
    poses = _random_poses(10)  # not a multiple of EA=8
    flat = scan_pallas(poses, m.seg_table, tables, NB, TD, interpret=True)
    assert flat.shape == (10, NB)
    shaped = scan_pallas(poses.reshape(5, 2, 3), m.seg_table, tables, NB, TD,
                         interpret=True)
    assert shaped.shape == (5, 2, NB)
    np.testing.assert_allclose(np.asarray(flat).reshape(5, 2, NB),
                               np.asarray(shaped), rtol=0, atol=0)


def test_custom_vmap_collapses(ring):
    """vmap over envs must produce the same values as the flat call."""
    m, tables = ring
    poses = _random_poses(16).reshape(8, 2, 3)

    def one_env(p):  # (A, 3) -> (A, NB)
        return scan_pallas_vmappable(p, m.seg_table, tables, NB, TD,
                                     interpret=True)

    vm = np.asarray(jax.vmap(one_env)(poses))
    flat = np.asarray(scan_pallas(poses, m.seg_table, tables, NB, TD,
                                  interpret=True))
    np.testing.assert_allclose(vm, flat, rtol=0, atol=0)


def test_engine_in_env_step(ring):
    """Full env step with scan_engine='pallas' runs and produces sane scans."""
    from f1tenth_gym_tpu.core.env import env_reset, env_step
    from f1tenth_gym_tpu.state import VehicleParams

    m, tables = ring
    cfg = SimConfig(num_agents=2, num_beams=NB, dtype="float32",
                    scan_engine="pallas")
    params = VehicleParams.create(dtype=jnp.float32)
    poses = jnp.asarray([[4.0, 0.0, np.pi / 2], [4.0, 1.0, np.pi / 2]],
                        jnp.float32)
    state, obs, *_ = env_reset(poses, jax.random.PRNGKey(0), params, m,
                               tables, cfg, 0.01)
    actions = jnp.asarray([[0.0, 1.0], [0.0, 1.0]], jnp.float32)
    state, obs, reward, done, info = env_step(
        state, actions, params, m, tables, cfg, 0.01)
    scans = np.asarray(obs["scans"])
    assert scans.shape == (2, NB)
    assert np.all(scans > 0.0) and np.all(scans <= 30.01)
    # on a 3m-wide ring the nearest wall is < 1.6m away
    assert scans.min() < 1.6


def test_overlay_kernel_fuzz_vs_xla(ring):
    """overlay_opponents_pallas vs ops.collision.ray_cast_opponents.

    Random scan poses and opponent boxes (including behind-the-scanner and
    far-away placements) must agree to f32 round-off: same blocked-view
    windows (closed form vs argmin over the uniform angle grid), same
    ray/edge intersections (inverse-range vs perpendicular form).
    """
    from f1tenth_gym_tpu.ops.collision import get_vertices, ray_cast_opponents
    from f1tenth_gym_tpu.ops.pallas_scan import overlay_opponents_pallas

    m, tables = ring
    rng = np.random.default_rng(0)
    n, O = 40, 3
    poses = np.stack([rng.uniform(-6, 6, n), rng.uniform(-6, 6, n),
                      rng.uniform(0, 2 * np.pi, n)], axis=1).astype(np.float32)
    # opponent centers scattered 0.5..12 m away in all directions
    ang = rng.uniform(0, 2 * np.pi, (n, O))
    dist = rng.uniform(0.5, 12.0, (n, O))
    opp_poses = np.stack(
        [poses[:, None, 0] + dist * np.cos(ang),
         poses[:, None, 1] + dist * np.sin(ang),
         rng.uniform(0, 2 * np.pi, (n, O))], axis=-1).astype(np.float32)
    verts = jax.vmap(jax.vmap(
        lambda p: get_vertices(p, jnp.float32(0.58), jnp.float32(0.31))
    ))(jnp.asarray(opp_poses))                      # (n, O, 4, 2)
    scans = jnp.asarray(
        rng.uniform(2.0, 30.0, (n, NB)).astype(np.float32))

    ref = jax.vmap(
        lambda p, sc, ov: ray_cast_opponents(p, sc, ov, tables)
    )(jnp.asarray(poses), scans, verts)
    ker = overlay_opponents_pallas(scans, jnp.asarray(poses), verts,
                                   tables, NB, TD, interpret=True)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                               rtol=0, atol=2e-3)
    # the overlay must actually fire somewhere in this ensemble
    assert float(jnp.sum(jnp.abs(ker - scans) > 1e-3)) > 50


def test_overlay_collinear_fallback_divergence(ring):
    """The reference's collinear-ray fallback (laser_models.py:275-278) and
    where the Pallas overlay kernel deliberately omits it.

    The fallback fires only when a beam/edge denominator is EXACTLY zero in
    float AND the scan origin is collinear with the edge — reachable in
    practice only through degenerate (zero-length-edge) opponent geometry,
    since v3 = (cos, sin)(beam_theta + pi/2) never lands exactly
    perpendicular through trig. Three pins:

    1. the XLA path (ops.collision.ray_cast_opponents) implements the
       fallback: a POINT opponent (all 4 vertices equal) clips the nearest
       beam to its distance, exactly as the reference does;
    2. the Pallas overlay kernel omits it: the same point opponent leaves
       the scan unchanged (the documented measure-zero divergence,
       ops/pallas_scan.py overlay docstring);
    3. any non-degenerate geometry — including a box with an edge exactly
       collinear with the scan origin — makes the two paths agree again:
       a closed rectangle's adjacent edges supply the same distance through
       the regular intersection path, which is why the fallback is
       measure-zero for real car boxes.
    """
    from f1tenth_gym_tpu.ops.collision import ray_cast_opponents
    from f1tenth_gym_tpu.ops.pallas_scan import overlay_opponents_pallas

    m, tables = ring
    pose = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    scan = jnp.full((NB,), 25.0, jnp.float32)

    # --- 1+2: point opponent 1.2 m away along beam 130's exact center
    # angle (an unambiguous nearest beam — angle 0 with an even beam count
    # is a half-bin TIE, where argmin-vs-closed-form tie-breaks differ in
    # f32); every edge zero-length: denom == 0 exactly, o/va/vb collinear
    # -> reference fallback distance |va - o| = 1.2 on that beam
    beam0 = 130
    phi = float(np.asarray(tables.scan_angles)[beam0])
    pt = jnp.tile(jnp.asarray(
        [[1.2 * np.cos(phi), 1.2 * np.sin(phi)]], jnp.float32), (4, 1))[None]
    ref = ray_cast_opponents(pose, scan, pt, tables)
    assert np.asarray(ref)[beam0] == pytest.approx(1.2, abs=1e-6)
    changed = np.flatnonzero(np.asarray(ref) != 25.0)
    np.testing.assert_array_equal(changed, [beam0])

    ker = overlay_opponents_pallas(scan[None], pose[None], pt[None],
                                   tables, NB, TD, interpret=True)
    np.testing.assert_array_equal(np.asarray(ker)[0], 25.0)

    # --- 3: collinear-but-closed box (near edge ON the scan origin's x
    # axis): both paths clip through the regular intersection math and
    # agree to f32 round-off
    box = jnp.asarray([[[1.0, 0.0], [1.5, 0.0], [1.5, 0.3], [1.0, 0.3]]],
                      jnp.float32)
    ref_b = ray_cast_opponents(pose, scan, box, tables)
    ker_b = overlay_opponents_pallas(scan[None], pose[None], box[None],
                                     tables, NB, TD, interpret=True)
    assert float(np.min(np.asarray(ref_b))) == pytest.approx(1.0, abs=2e-3)
    np.testing.assert_allclose(np.asarray(ker_b)[0], np.asarray(ref_b),
                               rtol=0, atol=2e-3)
