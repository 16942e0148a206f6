"""Pallas TPU LiDAR kernel: batched ray/segment casting at VPU compute speed.

This is the flagship scan engine. It computes the same ray/segment
intersections as ops/segments.py (reference semantics: the 1080-beam sweep
of laser_models.py:148-186 against polygonal walls, using the identical
theta-LUT beam discretization of laser_models.py:164-184) as a
hand-scheduled Mosaic kernel.

Kernel design (each choice measured on TPU v5e):

* one grid program computes EA=32 (env,agent) scans: per-program fixed
  costs (block DMA issue, accumulator setup) dominated at 1 scan/program
  (~17 us); EA tracked the sweep size across rounds (16 best pre-erosion,
  32 best once round-5 erosion culling shrank the sweep; 64 re-measured
  slower — VMEM pressure and unroll bloat beat the halved program count);
* beams live in LANES (R rows x 128), segments in SUBLANES (groups of 8):
  every op is a full (8, 128) vreg. The transposed orientation puts
  (K,1)->(K,128) lane-broadcasts on the critical path, which Mosaic lowers
  ~8x slower;
* an MXU formulation (den/num/ud/uo as one (K,8)@(8,512) dot) is numerically
  unusable at bf16 (catastrophic cancellation in c - nx*ox - ny*oy gives
  ~1% range errors) and 3x slower at Precision.HIGHEST; the pure-VPU form
  is exact f32 and faster;
* beam directions use VPU trig of the theta-LUT *bin index* instead of
  gathering the LUT: XLA TPU gathers run at ~0.18G lookups/s and were 65%
  of total step time. cos(i * 2pi/(theta_dis-1)) equals the f64-built LUT
  entry to f32 ulp;
* per-segment scalars are splat once per 8-segment group and amortized over
  all R beam rows and EA scans.

Wall-segment counts are kept small at the source: the native exact-boundary
contour tracer at 1.5-cell tolerance collapses rasterization stair-steps
(2621 -> 218 segments on the reference example map) at 3.5x BETTER accuracy
than cv2 center-line tracing (MSE 0.057 vs 0.20 against marched scans; the
reference's own cross-engine tolerance is MSE < 2.0, unittest/scan_sim.py:342).

Work reduction (round 2): EXACT per-tile segment culling. Each 16-scan
program selects, via scalar-prefetch block indexing (zero overhead,
measured), the table of segments PROVABLY visible from its scans' map
tile neighborhood (conservative range + umbra proofs, ops/culling.py) and
sweeps only those groups (dynamic fori_loop trip count). Heterogeneous
programs fall back to the full table (block 0), so results are bit-exact
either way; the env batch is kept tile-homogeneous by periodic locality
RELABELING (parallel.vector.sort_envs_for_locality) — envs are
independent, so no per-step scatter/unsort is ever needed, which is what
sank the round-1 sampled-visibility variant (fixed ~4-5 ms of plumbing at
8k scans, plus 0.7%-of-beams accuracy loss from sampling). On the
reference example map this sweeps a mean ~18/28 groups at racing
workloads: 343k -> ~480k env-steps/s/chip end to end.

In-loop culling variants measured and rejected (berlin / example maps,
v5e): (a) per-(tile,sector) segment-list loops — exact, but 11x SLOWER:
per-row processing forfeits the splat/fetch amortization over all 144
(scan,row) pairs that makes this kernel fast, and data-dependent group
indices defeat Mosaic's pipelining; (b) per-(group,scan,row) sector
bitmask predication (@pl.when on a scalar bit test) — exact, 4.4x slower:
a predicated region costs ~26 cycles vs the ~6-cycle tile body it skips;
(c) REGISTER-CARRIED accumulation (round 3: scan loop outer, group loop
inner, the R candidate tiles as fori_loop carries, out reduction fused
into the sweep, no acc scratch at all) — exact, 3.7x SLOWER (583k ->
158k env-steps/s end to end): 9 live (8,128) carries + splat temps blow
the vector register budget, Mosaic spills the carries through memory
every fori iteration, which costs far more than the acc load+store pair
it was meant to remove. The acc-scratch structure below stands.

PER-SCAN-tight culling (round 4): the subgroup-union sweep (mean 13.8
groups/scan) leaves ~30% on the table vs each scan's own tile set
(occupancy-weighted 9.5 at ts=1.25) — every mechanism tried to claim it
measured a net LOSS, because anything per-scan forfeits either the
8-scan splat amortization or Mosaic's loop pipelining:
(d) v9 SPLIT window blocks ([common-intersection | per-member-tile
extras], each scan sweeping common + its own extras range via a per-scan
dynamic fori) — exact (checksum-identical), 8.07 ms vs 5.54 ms at 8192
scans: a tiny dynamic fori costs ~350 cycles of pipeline disruption
EACH, x8 per program; even at trip 0 the traced loops cost ~0.5 ms/call
(hence ops/culling.py split_cap_groups defaults to 0 and the kernel only
traces the extras path when the pack has split blocks);
(e) CHUNKED per-tile solo engine (snake-ordered per-tile blocks stored
twice at half-chunk stride, one chunk DMA per subgroup, each scan solo-
sweeping its own block with clamped re-max instead of predication) —
exact, but 81.6% of racing subgroups straddle a TILE ROW (agent pairs
cross tj boundaries), their blocks sit a whole snake row apart, and no
1D pack order fixes 2D straddle: 10.0 ms vs 5.54 ms with the fallbacks.
Per-scan selection DMAs were also measured directly: SUB=1 (one
prefetch-indexed block per scan) costs ~1.5 us of unhidden DMA issue
per extra stream — 16.2 ms vs 5.54 ms at 8 streams/program. The
windowed subgroup-union design stands on all sides of the triangle
(DMA count, splat amortization, loop pipelining).

Measured cost structure at K=218 (v5e, 8192 scans): group loop ~300 us per
8-segment group, already at ~3.9/4 VPU issue slots per cycle — the loop is
ISSUE-BOUND, not schedulable faster at this op count. Round-5 operating
point with the erosion-culled pack (mean 7.86 swept groups/scan at
ts=1.25): 3.8 ms total at 8192 scans — ~2.2 ms sweep + ~1 ms of
dirs/fixed per-program costs + out phase (tools/kernel_sweep.py,
docs/performance.md).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from f1tenth_gym_tpu.state import ScanTables

TWO_PI = 2.0 * np.pi
LANES = 128
# (env, agent) scans per grid program. The round-3 phase breakdown measured
# ~4.8 us of per-PROGRAM grid overhead (dirs phase at 1024 programs: 4.9 ms
# vs 2.5 ms at 512) — so scans/program wants to be LARGE — while culled
# window tightness wants scan groups SMALL (mean swept groups 13.8 at 8
# scans/group vs 15.5 at 16, tools/culling_stats.py). The kernel decouples
# the two: EA scans share one grid program (amortizing the overhead), and
# each SUB=8-scan SUBGROUP selects its own culled window table via its own
# scalar-prefetch block index. The env knob exists for tuning sweeps.
EA = int(os.environ.get("F1TENTH_PALLAS_EA", "32"))
# scans per table-selection subgroup (EA % SUB == 0). Smaller subgroups pick
# tighter windows (less sweep work) at the cost of more per-program table
# DMAs; 8 measured best at EA=32 (see docs/performance.md).
SUB = int(os.environ.get("F1TENTH_PALLAS_SUB", "8"))
GROUP = 8       # segments per group (one sublane tile)


def build_seg_table(segments: np.ndarray) -> np.ndarray:
    """(K, 4) [ax, ay, bx, by] -> (Kp, 8) f32 kernel table, built in f64.

    Rows: [nx, ny, c, txn, tyn, -w0n, 0, 0] with n the UNIT normal (so
    num = c - n.o is a signed distance in meters: well-conditioned in f32)
    and the tangent scaled by 1/|e|^2 so the along-segment hit parameter w
    lies in [0, 1] (compared against constants; no per-segment bounds).
    Padding / degenerate rows get n = 0, c = 1 (so num = 1, never near the
    inverse-range formulation's division) and -w0n = 10 so the along-segment
    parameter can never fall in [0, 1].
    """
    segs = np.asarray(segments, np.float64)
    # drop the XLA engine's far-away padding rows up front — every retained
    # row costs kernel time
    segs = segs[segs[:, 0] < 1e6]
    ax, ay, bx, by = segs.T
    ex, ey = bx - ax, by - ay
    len2 = ex * ex + ey * ey
    ok = len2 > 0
    len2 = np.where(ok, len2, 1.0)
    ln = np.sqrt(len2)
    nx, ny = -ey / ln, ex / ln
    c = nx * ax + ny * ay
    txn, tyn = ex / len2, ey / len2
    w0n = (ax * ex + ay * ey) / len2
    out = np.stack([nx, ny, c, txn, tyn, -w0n,
                    np.zeros_like(c), np.zeros_like(c)], 1)
    out[~ok] = 0.0
    out[~ok, 2] = 1.0
    out[~ok, 5] = 10.0
    k = len(out)
    kp = ((k + GROUP - 1) // GROUP) * GROUP
    if kp > k:
        pad = np.zeros((kp - k, 8))
        pad[:, 2] = 1.0
        pad[:, 5] = 10.0
        out = np.concatenate([out, pad], 0)
    return out.astype(np.float32)


def _scan_kernel(R, theta_dis, num_beams, phases, has_extras,
                 bid_ref, ng_ref, orig_ref, nb_ref, segf_ref, *rest):
    """One program: EA scans of R*128 beams, each SUB-scan subgroup
    sweeping its own culled segment table.

    bid_ref (n_prog * S,) i32 SMEM (scalar-prefetch), S = EA // SUB
    subgroups per program: per-SUBGROUP table choice — bid > 0 sweeps
    block bid-1 of the deduped v9 window pack (ops/culling.py) via that
    subgroup's prefetch-indexed block (the same tile array is passed S
    times, once per subgroup input, so each subgroup DMAs its own block);
    bid == 0 sweeps the FULL fallback table segf_ref (its own resident
    input — multi-map worlds don't pad the window tables to the full
    set's row count). Per-subgroup selection is the round-3 key: it
    gives the culled-window tightness of small programs AND the
    per-program grid-overhead amortization of large ones (~4.8 us per
    program, 73% of kernel time when EA was dropped to 8).
    ng_ref (n_prog * S,) i32 SMEM: per-subgroup SHARED segment-group
    count (dynamic fori_loop trip count) — the common part of a v9 split
    block, the whole table otherwise. On split blocks each scan then
    sweeps its OWN extras range [est, est + ecnt) of the same block
    (scalars slots 8/9 below): the subgroup shares one block DMA while
    every scan sweeps exactly its own tile's visible set (round 4;
    mean swept groups/scan 13.8 -> ~10.3 on the bench workload).
    orig_ref (1,EA,16) f32 SMEM rows
    [ox, oy, ti0, angle_inc_bins, cos(ti0*binrad), sin(ti0*binrad),
     max_range, 0, extras_start_groups, extras_ngroups, 0 x 6];
    nb_ref (RG*2*8, 128) f32 VMEM: the scan-independent beam-fan tables
    cos(n*beta) / sin(n*beta) for beam index n (beta = angle increment in
    radians), one cos + one sin (8,128) tile per rowgroup;
    segf_ref (1,Kfull,8) + S per-subgroup (1,Kt,8) f32 VMEM blocks
    (double-buffered DMA; `rest` = S subgroup table refs, out_ref, acc,
    dirb); out (EA,R,128) f32; acc scratch (EA*R*8, 128) f32;
    dirb scratch (EA*ceil(R/8)*2*8, 128) f32 — beam dirs COMPUTED IN-KERNEL
    WITHOUT transcendentals (round 2: the stock cos/sin dominated the
    kernel's fixed cost). The theta-LUT discretization
    idx = floor(ti0 + n*inc) mod theta_dis (laser_models.py:164-184) gives
    angle == (ti0 + n*inc)*binrad - g (mod 2pi) with
    g = (frac + k)*binrad < 2*binrad ~ 0.0063 rad, so
    cos(idx*binrad) = cos(a + n*b)*cos(g) + sin(a + n*b)*sin(g) where the
    affine part comes from per-scan scalars x the shared cos/sin(n*beta)
    tables (angle addition) and cos(g) = 1 - g^2/2, sin(g) = g are EXACT to
    f32 at this magnitude (next terms < 5e-8). Directions match direct
    trig to ~2 ulp. Stored unreplicated (8 distinct beam rows per tile);
    the inner loop slices (1,128) rows and sublane-broadcasts them against
    the (8,128) segment splats (cheap, unlike lane broadcasts).
    """
    from jax.experimental import pallas as pl

    S = EA // SUB
    segt_refs = rest[:S]
    out_ref, acc, dirb = rest[S:]

    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    inv_td = jnp.float32(1.0 / theta_dis)
    bin_to_rad = jnp.float32(TWO_PI / (theta_dis - 1))

    lane = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 1
                                    ).astype(jnp.float32)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (GROUP, LANES), 0
                                    ).astype(jnp.float32)

    RG = (R + GROUP - 1) // GROUP

    def dirs_for(ea):
        ti0 = orig_ref[0, ea, 2]
        inc = orig_ref[0, ea, 3]
        ca = orig_ref[0, ea, 4]
        sa = orig_ref[0, ea, 5]
        for rg in range(RG):
            # beam index matrix for rows rg*8..rg*8+7: (8,128)
            beam = (row8 + jnp.float32(rg * GROUP)) * jnp.float32(LANES) + lane
            t = ti0 + beam * inc                     # unreduced LUT position
            k = jnp.floor(t * inv_td)                # mod-theta_dis count
            g = (t - jnp.floor(t) + k) * bin_to_rad  # frac + wrap correction
            cg = one - jnp.float32(0.5) * g * g      # cos(g), exact in f32
            cnb = nb_ref[rg * 2 * GROUP:rg * 2 * GROUP + GROUP, :]
            snb = nb_ref[rg * 2 * GROUP + GROUP:(rg + 1) * 2 * GROUP, :]
            cos_t = ca * cnb - sa * snb              # cos(a + n*b)
            sin_t = sa * cnb + ca * snb
            d0 = (ea * RG + rg) * 2 * GROUP
            dirb[d0:d0 + GROUP, :] = cos_t * cg + sin_t * g
            dirb[d0 + GROUP:d0 + 2 * GROUP, :] = sin_t * cg - cos_t * g

    def process_group(seg_ref, ea0, g, first):
        # INVERSE-RANGE formulation (round 2, measured faster than the direct
        # t = num/den form): accumulate s = 1/t = den/num with MAX instead of
        # t with MIN. 1/num depends only on (segment, scan-origin), so the
        # per-element reciprocal of round 1 becomes one exact divide per
        # 8-segment splat, amortized over all R beam rows. The along-segment
        # validity 0 <= w <= 1 multiplied through by s (> 0 for any candidate
        # that can win the max) becomes 0 <= b <= s with b = w*s = uo*s + ud;
        # min(b, s - b) >= 0 also implies s >= 0, so t > 0 needs no extra op.
        # Per-(8,128) tile: 11 ALU + 2 dir row loads + acc load/store, vs 13
        # ALU in the round-1 form — and no approx-reciprocal error (the
        # single exact division happens in the XLA epilogue).
        # (2-group unrolling with shared dx/dy loads was re-measured with
        # this formulation too: 281k vs 370k env-steps/s — register
        # pressure from 16 live splat tiles still beats the saved loads.
        # Group 0 is peeled with first=True: it STORES its candidates,
        # replacing both the acc zero-init and its load+max.)
        tb = seg_ref[0, pl.ds(g * GROUP, GROUP), :]          # (8,8)
        nx = jnp.broadcast_to(tb[:, 0:1], (GROUP, LANES))
        ny = jnp.broadcast_to(tb[:, 1:2], (GROUP, LANES))
        tx = jnp.broadcast_to(tb[:, 3:4], (GROUP, LANES))
        ty = jnp.broadcast_to(tb[:, 4:5], (GROUP, LANES))
        for ea in range(ea0, ea0 + SUB):
            process_ea(tb, nx, ny, tx, ty, ea, first)

    def process_ea(tb, nx, ny, tx, ty, ea, first):
        ox = orig_ref[0, ea, 0]
        oy = orig_ref[0, ea, 1]
        num8 = tb[:, 2:3] - ox * tb[:, 0:1] - oy * tb[:, 1:2]
        # guard the splat divide: |num| < 1e-12 m means the scan origin
        # sits ON the wall line — sub-picometer, never physical
        # (folding inv into nx/ny splats instead measured 33% SLOWER:
        # one extra lane-broadcast per (ea,group) beats the saved mul)
        num8 = jnp.where(jnp.abs(num8) < 1e-12, jnp.float32(1e-12), num8)
        inv8 = jnp.float32(1.0) / num8
        uo8 = ox * tb[:, 3:4] + oy * tb[:, 4:5] + tb[:, 5:6]
        inv = jnp.broadcast_to(inv8, (GROUP, LANES))
        uo = jnp.broadcast_to(uo8, (GROUP, LANES))
        for r in range(R):
            rg, dr = divmod(r, GROUP)
            d0 = (ea * RG + rg) * 2 * GROUP + dr
            dx = dirb[d0:d0 + 1, :]                      # (1,128)
            dy = dirb[d0 + GROUP:d0 + GROUP + 1, :]
            den = nx * dx + ny * dy       # (8,128)*(1,128): sublane bcast
            s = den * inv
            ud = tx * dx + ty * dy
            b = uo * s + ud
            q = jnp.minimum(b, s - b)
            sc = jnp.where(q >= zero, s, zero)
            a0 = (ea * R + r) * GROUP
            if first:
                acc[a0:a0 + GROUP, :] = sc
            else:
                acc[a0:a0 + GROUP, :] = jnp.maximum(
                    acc[a0:a0 + GROUP, :], sc)

    def process_one(seg_ref, ea, g):
        # single-scan group sweep for the v9 per-scan extras ranges: same
        # math as process_group, splats amortized over the 9 beam rows of
        # ONE scan only (extras are ~2-4 groups/scan; the common part
        # keeps the 8-scan amortization)
        tb = seg_ref[0, pl.ds(g * GROUP, GROUP), :]          # (8,8)
        nx = jnp.broadcast_to(tb[:, 0:1], (GROUP, LANES))
        ny = jnp.broadcast_to(tb[:, 1:2], (GROUP, LANES))
        tx = jnp.broadcast_to(tb[:, 3:4], (GROUP, LANES))
        ty = jnp.broadcast_to(tb[:, 4:5], (GROUP, LANES))
        process_ea(tb, nx, ny, tx, ty, ea, False)

    # (software-pipelining dirs_for(ea+1) through the peeled group-0 sweep
    # was measured SLOWER — 2.46 vs 2.09 ms at ng=1 — the scheduler gains
    # nothing and register pressure grows; keep the phases separate)
    # `phases` is a static debug mask ("dirs,sweep,out" in production) that
    # lets tools/kernel_phases.py time each phase in isolation.
    for ea in range(EA):
        dirs_for(ea)

    if "sweep" not in phases:
        if "out" in phases:
            for c in range(EA * R // GROUP):
                acc[c * GROUP * GROUP:(c + 1) * GROUP * GROUP, :] = (
                    jnp.zeros((GROUP * GROUP, LANES), jnp.float32))
    else:
        # ngroups >= 1 always (ops/culling.py keeps one padding group even
        # for all-wall tiles), so group 0 can be peeled unconditionally.
        # Each SUB-scan subgroup sweeps its own table: the choice
        # predicates once per subgroup — negligible next to the sweep it
        # selects.
        for s in range(S):
            bid = bid_ref[pl.program_id(0) * S + s]
            ng = ng_ref[pl.program_id(0) * S + s]
            ea0 = s * SUB

            def sweep(seg_ref, _ea0=ea0, _ng=ng):
                # shared part: the block's common groups, splats amortized
                # over all SUB scans (>= 1 group always — the builder keeps
                # a padding group even for empty sets, so the peeled
                # store-init covers every scan's acc)
                process_group(seg_ref, _ea0, 0, True)
                jax.lax.fori_loop(
                    1, _ng,
                    lambda g, _: (process_group(seg_ref, _ea0, g, False),
                                  0)[1],
                    0)
                # v9 per-scan extras: each scan sweeps its own tile's
                # extras range of the SAME resident block (zero extra DMA;
                # est/ecnt are 0 on union blocks and the full fallback).
                # Only traced when the pack HAS split blocks: even trip-0
                # dynamic fori loops measured ~0.5 ms/call of pipeline
                # disruption at 8 loops/program (round 4)
                if has_extras:
                    for ea in range(_ea0, _ea0 + SUB):
                        est = orig_ref[0, ea, 8].astype(jnp.int32)
                        ecnt = orig_ref[0, ea, 9].astype(jnp.int32)
                        jax.lax.fori_loop(
                            0, ecnt,
                            lambda g, _, _ea=ea, _est=est: (
                                process_one(seg_ref, _ea, _est + g), 0)[1],
                            0)

            @pl.when(bid == 0)
            def _(_sweep=sweep):
                _sweep(segf_ref)

            @pl.when(bid != 0)
            def _(_sweep=sweep, _s=s):
                _sweep(segt_refs[_s])

    if "out" not in phases:
        out_ref[0:GROUP, :] = acc[0:GROUP, :]
        return

    # out phase: the acc holds the max INVERSE range per (scan, row,
    # segment-slot); reduce the 8 slots and convert to the final clamped
    # range IN-KERNEL: out = min(1/max(s, eps), max_range). Fusing the
    # epilogue here saves a full read+write of the (n_pad*R, 128) output
    # in XLA (~74 MB of HBM traffic at 8192 scans). The 8 reduced (1,128)
    # rows of each chunk are assembled in registers and stored as ONE full
    # (8,128) tile — per-row (1,128) stores are partial-sublane writes,
    # which Mosaic lowers as read-modify-write.
    # (A round-3 FUSED variant also added caller-supplied beam noise and
    # reduced the reference's per-beam iTTC test here, saving the XLA
    # noise-add + iTTC passes' ~105 MB of HBM round trips at 8192 scans —
    # but its noise ARRAY operand re-added equivalent traffic and the
    # variant measured a net loss in rounds 3 AND 4; removed in round 5.)
    eps = jnp.float32(1e-9)
    max_range = orig_ref[0, 0, 6]
    for c in range(EA * R // GROUP):
        rows = [
            jnp.max(acc[(c * GROUP + i) * GROUP:
                        (c * GROUP + i + 1) * GROUP, :],
                    axis=0, keepdims=True)
            for i in range(GROUP)
        ]
        s = jnp.concatenate(rows, axis=0)
        out_ref[c * GROUP:(c + 1) * GROUP, :] = jnp.minimum(
            jnp.float32(1.0) / jnp.maximum(s, eps), max_range)


def select_windows(tig, tjg, blockmap, tile_ngroups, tile_ext,
                   nx, ny, full_ng):
    """Per-subgroup culled-window choice: the ONE definition of the
    selection cascade, shared by scan_pallas and tools/culling_stats.py.

    tig/tjg: (nsub, SUB) tile indices of each subgroup's scans. Picks the
    tightest v9 window tier (ops/culling.py pack) indexed by the
    subgroup's LOWER-LEFT tile: 1x1 when all its scans share a tile, 2x2
    when they span <= 1 tile per axis, 4x4 for spread <= 3, 8x8 for
    spread <= 7, else the full set (also on blockmap sentinel -1 = that
    window's table would be no smaller than the full set).

    Returns (bid, ng, est, ecnt):
      bid  (nsub,)      0 = full-table fallback, else 1 + block index
      ng   (nsub,)      the block's SHARED group count (common part of a
                        split block, whole union otherwise)
      est  (nsub, SUB)  per-SCAN extras start (group units into the block)
      ecnt (nsub, SUB)  per-SCAN extras group count (0 on union blocks,
                        the full fallback, and members with no extras)
    Pure jnp; works on numpy inputs too.
    """
    T = blockmap.shape[0] // 4
    ti_lo, ti_hi = tig.min(-1), tig.max(-1)
    tj_lo, tj_hi = tjg.min(-1), tjg.max(-1)
    in_grid = (ti_lo >= 0) & (tj_lo >= 0) & (ti_hi < nx) & (tj_hi < ny)
    sx = ti_hi - ti_lo
    sy = tj_hi - tj_lo
    tidx = jnp.clip(tj_lo * nx + ti_lo, 0, T - 1)
    blk2 = blockmap[tidx].astype(jnp.int32)
    blk1 = blockmap[T + tidx].astype(jnp.int32)
    blk4 = blockmap[2 * T + tidx].astype(jnp.int32)
    blk8 = blockmap[3 * T + tidx].astype(jnp.int32)
    use1 = in_grid & (sx == 0) & (sy == 0) & (blk1 >= 0)
    use2 = in_grid & (sx <= 1) & (sy <= 1) & (blk2 >= 0) & ~use1
    use4 = (in_grid & (sx <= 3) & (sy <= 3) & (blk4 >= 0)
            & ~use1 & ~use2)
    use8 = (in_grid & (sx <= 7) & (sy <= 7) & (blk8 >= 0)
            & ~use1 & ~use2 & ~use4)
    blk = jnp.where(use1, blk1,
                    jnp.where(use2, blk2,
                              jnp.where(use4, blk4,
                                        jnp.where(use8, blk8, -1))))
    bid = jnp.where(blk >= 0, 1 + blk, 0)
    blk_c = jnp.maximum(blk, 0)
    ng = jnp.where(blk >= 0, tile_ngroups[1 + blk_c].astype(jnp.int32),
                   full_ng)
    # per-SCAN member index within the selected window tier
    w = jnp.where(use1, 1, jnp.where(use2, 2, jnp.where(use4, 4, 8)))
    m = ((tjg - tj_lo[:, None]) * w[:, None]
         + (tig - ti_lo[:, None]))
    m = jnp.clip(m, 0, 63)
    if tile_ext is None:     # pack has no split blocks: extras all empty
        est = ecnt = jnp.zeros(tig.shape, jnp.int32)
    else:
        packed = tile_ext[blk_c[:, None], m].astype(jnp.int32)
        packed = jnp.where(blk[:, None] >= 0, packed, 0)
        est = packed // 256
        ecnt = packed % 256
    return bid, ng, est, ecnt


def scan_pallas(*args, **kwargs):
    """Public entry: misuse guard + the jitted kernel wrapper below.

    (The guard must run OUTSIDE jit: an erosion-gated pack — tile_meta
    slot 5 == 8, see ops/culling.py — requires the eligibility raster, and
    that can only be checked when the meta arrives as a concrete array.)
    """
    tile_meta = kwargs.get("tile_meta")
    if (tile_meta is not None and kwargs.get("elig_raster") is None
            and not isinstance(tile_meta, jax.core.Tracer)):
        if float(np.asarray(tile_meta)[5]) >= 8:
            raise ValueError(
                "erosion-gated culling pack used without its eligibility "
                "raster: pass elig_raster/elig_meta (MapData.cull_eligible "
                "+ [orig_x, orig_y, resolution]) to scan_pallas")
    return _scan_pallas(*args, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("num_beams", "theta_dis", "interpret", "phases"))
def _scan_pallas(
    pose: jnp.ndarray,            # (..., 3)
    seg_table: jnp.ndarray,       # (K, 8) from build_seg_table
    tables: ScanTables,
    num_beams: int,
    theta_dis: int,
    interpret: bool = False,
    phases: str = "dirs,sweep,out",  # debug-only phase mask (see kernel)
    tile_tables: jnp.ndarray = None,   # (n_blocks, Kmax, 8) v9 pack
    tile_ngroups: jnp.ndarray = None,  # (n_blocks + 1,) i32, [0]=full
    tile_meta: jnp.ndarray = None,     # (6,) [x0, y0, 1/ts, nx, ny, spread]
    tile_blockmap: jnp.ndarray = None,  # (4*n_tiles,) i32 window -> block
    tile_ext: jnp.ndarray = None,      # (n_blocks, 64) i32 extras ranges
    elig_raster: jnp.ndarray = None,   # (H, W) uint8 eligibility raster
    elig_meta: jnp.ndarray = None,     # (3,) [orig_x, orig_y, resolution]
) -> jnp.ndarray:
    """Batched LiDAR scan -> (..., num_beams) ranges.

    Drop-in replacement for ops.segments.get_scan_segments. Any batch shape;
    the batch is flattened, padded to a multiple of EA, and fed to the grid.
    Set interpret=True on CPU (tests).

    With the merged multi-window tables built by
    ops.culling.build_tile_tables (format v9: deduped 2x2 / 1x1 / 4x4 /
    8x8 window blocks addressed through tile_blockmap), each SUB=8-scan
    SUBGROUP of a program sweeps only the segments provably visible from
    the TIGHTEST window covering it — 1x1 when its scans share a tile,
    else 2x2 when they span <= 1 tile per axis, else 4x4, else 8x8, else
    the full table — exact in every case. On SPLIT blocks the subgroup
    sweep covers only the window's COMMON part and each scan then sweeps
    its own tile's extras range, i.e. exactly its tile's visible set
    (see ops/culling.py TileTables). Locality-sort the env batch
    (parallel.vector.sort_envs_for_locality with the map's tile grid) to
    keep subgroups tile-pure.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = pose.shape[:-1]
    p = pose.reshape(-1, 3).astype(jnp.float32)
    n = p.shape[0]
    n_pad = ((n + EA - 1) // EA) * EA
    if n_pad > n:
        p = jnp.concatenate([p, jnp.tile(p[-1:], (n_pad - n, 1))], axis=0)

    R = (num_beams + LANES - 1) // LANES
    fov = tables.fov.astype(jnp.float32)
    angle_inc = fov / (num_beams - 1)

    # only the per-scan theta-LUT starting bin (+ its cos/sin for the
    # in-kernel angle addition) is computed here; per-beam bin indices and
    # directions happen in-kernel (laser_models.py:164-184 discretization)
    # without transcendentals — see _scan_kernel
    theta = p[:, 2]
    ti0 = theta_dis * (theta - fov / 2.0) / jnp.float32(TWO_PI)
    ti0 = jnp.mod(jnp.mod(ti0, theta_dis) + theta_dis, theta_dis)
    bin_to_rad = jnp.float32(TWO_PI / (theta_dis - 1))
    inc_val = jnp.float32(theta_dis) * angle_inc / jnp.float32(TWO_PI)
    inc = jnp.full_like(ti0, inc_val)
    alpha = ti0 * bin_to_rad
    zeros = jnp.zeros_like(ti0)
    maxr = jnp.full_like(ti0, tables.max_range.astype(jnp.float32))

    # scan-independent beam-fan tables cos(n*beta)/sin(n*beta), one cos +
    # one sin (8,128) tile per rowgroup (n = beam index)
    RG = (R + GROUP - 1) // GROUP
    n_idx = jnp.arange(RG * GROUP * LANES, dtype=jnp.float32).reshape(
        RG, GROUP, LANES)
    beta = inc_val * bin_to_rad
    nb = jnp.concatenate(
        [jnp.concatenate([jnp.cos(n_idx[rg] * beta),
                          jnp.sin(n_idx[rg] * beta)], axis=0)
         for rg in range(RG)], axis=0)  # (RG*2*GROUP, LANES)

    grid = (n_pad // EA,)
    n_prog = grid[0]
    S = EA // SUB
    nsub = n_prog * S
    Kf = seg_table.shape[0]
    full = seg_table[None]  # (1, Kf, 8)
    if tile_tables is None:
        # never-matching padding rows (see build_seg_table): the tile
        # input is a tiny dummy block, every subgroup sweeps the full table
        tabs = jnp.zeros((1, GROUP, 8), jnp.float32
                         ).at[:, :, 2].set(1.0).at[:, :, 5].set(10.0)
        bid = jnp.zeros((nsub,), jnp.int32)
        ng = jnp.full((nsub,), Kf // GROUP, jnp.int32)
        est = ecnt = jnp.zeros((n_pad,), jnp.float32)
    else:
        if tile_blockmap is None:
            raise ValueError(
                "v9 tile tables need tile_blockmap alongside tile_tables/"
                "tile_ngroups/tile_meta (rebuild the map cache with "
                "ops.culling.build_tile_tables)")
        tabs = tile_tables
        x0, y0, inv_ts = tile_meta[0], tile_meta[1], tile_meta[2]
        nx = tile_meta[3].astype(jnp.int32)
        ny = tile_meta[4].astype(jnp.int32)
        ti = jnp.floor((p[:, 0] - x0) * inv_ts).astype(jnp.int32)
        tj = jnp.floor((p[:, 1] - y0) * inv_ts).astype(jnp.int32)
        bid, ng, est, ecnt = select_windows(
            ti.reshape(nsub, SUB), tj.reshape(nsub, SUB), tile_blockmap,
            tile_ngroups, tile_ext, nx, ny, Kf // GROUP)
        if elig_raster is not None:
            # EROSION-GATED pack (ops/culling.py erosion_refine): the
            # culled tables are only proven for scan origins whose raster
            # cell is eligible (right free component, clear of walls).
            # Subgroups containing any ineligible scan sweep the full
            # table, which keeps culled == full bitwise for EVERY pose.
            ex = jnp.floor((p[:, 0] - elig_meta[0]) / elig_meta[2]
                           ).astype(jnp.int32)
            ey = jnp.floor((p[:, 1] - elig_meta[1]) / elig_meta[2]
                           ).astype(jnp.int32)
            Hm, Wm = elig_raster.shape
            inb = (ex >= 0) & (ex < Wm) & (ey >= 0) & (ey < Hm)
            ok = inb & (elig_raster[jnp.clip(ey, 0, Hm - 1),
                                    jnp.clip(ex, 0, Wm - 1)] > 0)
            ok_sub = ok.reshape(nsub, SUB).all(-1)
            bid = jnp.where(ok_sub, bid, 0)
            ng = jnp.where(ok_sub, ng, Kf // GROUP)
            est = jnp.where(ok_sub[:, None], est, 0)
            ecnt = jnp.where(ok_sub[:, None], ecnt, 0)
        est = est.reshape(-1).astype(jnp.float32)
        ecnt = ecnt.reshape(-1).astype(jnp.float32)
    has_extras = tile_ext is not None

    scalars = jnp.stack(
        [p[:, 0], p[:, 1], ti0, inc, jnp.cos(alpha), jnp.sin(alpha),
         maxr, zeros, est, ecnt, zeros, zeros, zeros, zeros, zeros, zeros],
        axis=-1)  # (n_pad, 16)

    Kt = tabs.shape[1]
    assert EA % SUB == 0, f"EA={EA} must be a multiple of SUB={SUB}"
    kern = functools.partial(_scan_kernel, R, theta_dis, num_beams,
                             tuple(phases.split(",")), has_extras)

    # one BlockSpec per SUB-scan subgroup, all slicing the SAME merged
    # window array: subgroup s of program g DMAs block bid[g*S+s]-1
    sub_specs = [
        pl.BlockSpec(
            (1, Kt, 8),
            lambda g, b, m, _s=s: (jnp.maximum(b[g * S + _s] - 1, 0), 0, 0))
        for s in range(S)
    ]
    in_specs = [
        pl.BlockSpec((1, EA, 16), lambda g, b, m: (g, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((RG * 2 * GROUP, LANES), lambda g, b, m: (0, 0)),
        pl.BlockSpec((1, Kf, 8), lambda g, b, m: (0, 0, 0)),
    ] + sub_specs
    operands = [scalars.reshape(n_prog, EA, 16), nb, full] + [tabs] * S
    out_specs = pl.BlockSpec((EA * R, LANES), lambda g, b, m: (g, 0))
    out_shape = jax.ShapeDtypeStruct((n_pad * R, LANES), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((EA * R * GROUP, LANES), jnp.float32),
            pltpu.VMEM((EA * RG * 2 * GROUP, LANES), jnp.float32)],
    )
    res = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        # grid programs are independent: lets Mosaic pipeline the next
        # program's (prefetch-indexed) table DMAs under this one's sweep
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(bid, ng, *operands)

    # the kernel's out phase already emitted final clamped ranges
    out = res.reshape(n_pad, R * LANES)[:n, :num_beams]
    return out.reshape(*batch_shape, num_beams).astype(pose.dtype)


def scan_pallas_vmappable(pose, seg_table, tables, num_beams, theta_dis,
                          interpret=False, tile_tables=None,
                          tile_ngroups=None, tile_meta=None,
                          tile_blockmap=None, tile_ext=None,
                          elig_raster=None, elig_meta=None):
    """scan_pallas that collapses under jax.vmap into ONE pallas call.

    jax's default pallas batching rule adds a grid dimension per vmap level,
    which at (A=2)-sized inner batches pads every program to EA scans (16x
    wasted compute) and explodes the program count. The custom_vmap rule
    instead folds every batch axis into the kernel's own flat batch.
    """

    @jax.custom_batching.custom_vmap
    def fn(p):
        return scan_pallas(p, seg_table, tables, num_beams, theta_dis,
                           interpret=interpret, tile_tables=tile_tables,
                           tile_ngroups=tile_ngroups, tile_meta=tile_meta,
                           tile_blockmap=tile_blockmap, tile_ext=tile_ext,
                           elig_raster=elig_raster, elig_meta=elig_meta)

    @fn.def_vmap
    def _rule(axis_size, in_batched, p):  # noqa: ANN001
        return fn(p), True

    return fn(pose)


# --------------------------------------------------------------------------
# Opponent ray-cast overlay kernel (round 3; kept as a TEST ORACLE)
#
# Not on the production path: the XLA opponent pass in ops/collision.py
# (closed-form windows + angle-addition trig, round 5) measured faster than
# dispatching this kernel (0.71 vs ~3 ms at 8192 scans — the per-(scan,
# group) dynamic fori costs ~350 cycles of pipeline disruption each). It
# remains as the independent implementation the tests fuzz the XLA path
# against (test_overlay_kernel_fuzz_vs_xla, the collinear-divergence pin).
# --------------------------------------------------------------------------

EAO = 128   # scans per overlay program (its per-program work is tiny)


def _overlay_kernel(R, theta_dis, num_beams, OGp, rb_ref, orig_ref, nb_ref,
                    opp_ref, scan_ref, out_ref):
    """Clip each scan by its opponents' car-box edges, in place.

    Replicates laser_models.py:318-346 (the reference's ray_cast +
    get_blocked_view_indices pass) as a tiny second kernel over the
    already-row-formatted scan output of _scan_kernel:

    * opp_ref (1, EAO*OGp*8, 8): per scan, OGp groups of 8 edge rows in
      build_seg_table format with slots 6/7 = the opponent's blocked-view
      beam-index window [lo, hi] (get_blocked_view_indices semantics,
      computed closed-form outside — the reference's per-vertex nearest-
      beam argmin over a UNIFORM angle grid is a rounded affine map).
      Padding rows carry lo=1e9 > hi=-1e9: never selected.
    * rb_ref (n_prog*EAO*OGp*2,) i32: per (scan, group), the [first, last]
      128-beam ROW overlapped by the group's union window — the dynamic
      fori_loop bounds. An opponent subtends a narrow angle, so most of
      each scan's 9 rows are skipped entirely (dynamic trip counts are
      free, measured round 2); an empty window encodes [1, 0].
    * beam directions are recomputed per touched row by EXACT angle
      addition — cos/sin(theta - fov/2) per-scan scalars against shared
      cos/sin(n * angle_inc) tables. Unlike the wall kernel, the
      reference's opponent pass uses the CONTINUOUS beam angles
      theta + scan_angles (laser_models.py:329-334), not the theta-LUT
      discretization, so no small-angle correction term appears. Cheaper
      than persisting the main kernel's dirs scratch to HBM (~600 MB at
      8192 scans).

    The whole block is copied through (out := in) first, then only the
    touched rows are min-updated: single-row read-modify-write stores are
    fine at ~1-2 rows per scan.
    """
    from jax.experimental import pallas as pl

    lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1
                                      ).astype(jnp.float32)
    # copy the whole block through (out := in) in (8,128) tiles, then
    # min-update only the touched rows below
    n_rows = EAO * R
    for i in range(0, n_rows - GROUP + 1, GROUP):
        out_ref[i:i + GROUP, :] = scan_ref[i:i + GROUP, :]
    if n_rows % GROUP:
        out_ref[n_rows - (n_rows % GROUP):n_rows, :] = (
            scan_ref[n_rows - (n_rows % GROUP):n_rows, :])
    pid = pl.program_id(0)

    for ea in range(EAO):
        ox = orig_ref[0, ea, 0]
        oy = orig_ref[0, ea, 1]
        ca = orig_ref[0, ea, 2]
        sa = orig_ref[0, ea, 3]
        for g in range(OGp):
            base = (ea * OGp + g) * GROUP
            tb = opp_ref[0, base:base + GROUP, :]
            nx = jnp.broadcast_to(tb[:, 0:1], (GROUP, LANES))
            ny = jnp.broadcast_to(tb[:, 1:2], (GROUP, LANES))
            tx = jnp.broadcast_to(tb[:, 3:4], (GROUP, LANES))
            ty = jnp.broadcast_to(tb[:, 4:5], (GROUP, LANES))
            lo8 = jnp.broadcast_to(tb[:, 6:7], (GROUP, LANES))
            hi8 = jnp.broadcast_to(tb[:, 7:8], (GROUP, LANES))
            num8 = tb[:, 2:3] - ox * tb[:, 0:1] - oy * tb[:, 1:2]
            num8 = jnp.where(jnp.abs(num8) < 1e-12, jnp.float32(1e-12),
                             num8)
            inv = jnp.broadcast_to(jnp.float32(1.0) / num8, (GROUP, LANES))
            uo = jnp.broadcast_to(
                ox * tb[:, 3:4] + oy * tb[:, 4:5] + tb[:, 5:6],
                (GROUP, LANES))
            rb0 = (pid * EAO * OGp + ea * OGp + g) * 2
            rlo = rb_ref[rb0]
            rhi = rb_ref[rb0 + 1]

            def body(r, _, ea=ea, nx=nx, ny=ny, tx=tx, ty=ty, lo8=lo8,
                     hi8=hi8, inv=inv, uo=uo, ca=ca, sa=sa):
                rg = r // GROUP
                dr = r - rg * GROUP
                cnb = nb_ref[pl.ds(rg * 2 * GROUP + dr, 1), :]
                snb = nb_ref[pl.ds(rg * 2 * GROUP + GROUP + dr, 1), :]
                beam = r.astype(jnp.float32) * LANES + lane_f      # (1,128)
                # exact angle addition: dir = (cos, sin)(theta0 + n*inc)
                dx = ca * cnb - sa * snb
                dy = sa * cnb + ca * snb
                den = nx * dx + ny * dy
                s = den * inv
                b = uo * s + tx * dx + ty * dy
                q = jnp.minimum(b, s - b)
                beam8 = jnp.broadcast_to(beam, (GROUP, LANES))
                okm = (q >= 0) & (beam8 >= lo8) & (beam8 <= hi8)
                smax = jnp.max(jnp.where(okm, s, jnp.float32(0.0)),
                               axis=0, keepdims=True)             # (1,128)
                ridx = ea * R + r
                cur = out_ref[pl.ds(ridx, 1), :]
                new = jnp.where(
                    smax > 0,
                    jnp.minimum(cur, jnp.float32(1.0)
                                / jnp.maximum(smax, jnp.float32(1e-9))),
                    cur)
                out_ref[pl.ds(ridx, 1), :] = new
                return 0

            jax.lax.fori_loop(rlo, rhi + 1, body, 0)


@functools.partial(
    jax.jit, static_argnames=("num_beams", "theta_dis", "interpret"))
def overlay_opponents_pallas(
    scans: jnp.ndarray,        # (..., num_beams) the (noisy) wall scan
    pose: jnp.ndarray,         # (..., 3) POST-TTC-zeroing scan pose
    opp_vertices: jnp.ndarray,  # (..., O, 4, 2) PRE-zeroing opponent boxes
    tables: ScanTables,
    num_beams: int,
    theta_dis: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """laser_models.py:282-346 (blocked-view window + ray_cast min) on TPU.

    Builds the per-(scan, opponent-edge) segment rows + blocked windows in
    XLA (cheap: O(n*O) elementwise, no (O,4,B) argmin tensor — the
    reference's nearest-beam argmin over the uniform scan_angles grid is
    the closed form round((a + fov/2)/inc) clipped to [0, B-1]) and clips
    the scans in the _overlay_kernel. The reference's collinear-ray
    fallback (laser_models.py:275-278, a measure-zero geometry) is not
    reproduced.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = scans.shape[:-1]
    O = opp_vertices.shape[-3]
    OGp = max(1, (4 * O + GROUP - 1) // GROUP)
    p = pose.reshape(-1, 3).astype(jnp.float32)
    sc = scans.reshape(-1, num_beams).astype(jnp.float32)
    ov = opp_vertices.reshape(-1, O, 4, 2).astype(jnp.float32)
    n = p.shape[0]
    n_pad = ((n + EAO - 1) // EAO) * EAO

    R = (num_beams + LANES - 1) // LANES
    RG = (R + GROUP - 1) // GROUP
    fov = tables.fov.astype(jnp.float32)
    angle_inc = fov / (num_beams - 1)

    # --- blocked-view windows (get_blocked_view_indices closed form)
    o_xy = p[:, None, None, 0:2]                       # (n,1,1,2)
    vecs = ov - o_xy                                   # (n,O,4,2)
    vert_ang = jnp.arctan2(vecs[..., 1], vecs[..., 0])  # (n,O,4)
    theta = p[:, 2]
    ego = jnp.arctan2(jnp.sin(theta), jnp.cos(theta))[:, None, None]
    diff = ego - vert_ang
    diff = jnp.where(diff > np.pi, diff - 2 * np.pi, diff)
    diff = jnp.where(diff < -np.pi, diff + 2 * np.pi, diff)
    awx = -diff                                        # (n,O,4)
    idx = jnp.clip(jnp.round((awx + fov / 2.0) / angle_inc),
                   0, num_beams - 1)
    lo = jnp.min(idx, axis=-1)                         # (n,O)
    hi = jnp.max(idx, axis=-1)

    # --- edge rows in build_seg_table format (f32 on device)
    va = ov                                            # (n,O,4,2)
    vb = jnp.roll(ov, shift=-1, axis=-2)
    ex = vb[..., 0] - va[..., 0]
    ey = vb[..., 1] - va[..., 1]
    len2 = jnp.maximum(ex * ex + ey * ey, 1e-20)
    ln = jnp.sqrt(len2)
    rnx = -ey / ln
    rny = ex / ln
    rc = rnx * va[..., 0] + rny * va[..., 1]
    rtx = ex / len2
    rty = ey / len2
    rw0 = (va[..., 0] * ex + va[..., 1] * ey) / len2
    lo_e = jnp.broadcast_to(lo[..., None], rnx.shape)
    hi_e = jnp.broadcast_to(hi[..., None], rnx.shape)
    rows = jnp.stack([rnx, rny, rc, rtx, rty, -rw0, lo_e, hi_e],
                     axis=-1)                          # (n,O,4,8)
    rows = rows.reshape(n, 4 * O, 8)
    pad_rows = OGp * GROUP - 4 * O
    if pad_rows:
        pr = jnp.zeros((n, pad_rows, 8), jnp.float32)
        pr = pr.at[:, :, 2].set(1.0).at[:, :, 5].set(10.0)
        pr = pr.at[:, :, 6].set(1e9).at[:, :, 7].set(-1e9)
        rows = jnp.concatenate([rows, pr], axis=1)
    if n_pad > n:
        pad = jnp.zeros((n_pad - n, OGp * GROUP, 8), jnp.float32)
        pad = pad.at[:, :, 2].set(1.0).at[:, :, 5].set(10.0)
        pad = pad.at[:, :, 6].set(1e9).at[:, :, 7].set(-1e9)
        rows = jnp.concatenate([rows, pad], axis=0)
        p = jnp.concatenate([p, jnp.tile(p[-1:], (n_pad - n, 1))], axis=0)

    # --- per-(scan, group) touched-row bounds for the dynamic fori_loop
    glo = lo.reshape(n, O)
    ghi = hi.reshape(n, O)
    gpad = OGp * 2 - O          # group = 2 consecutive opponents (8 edges)
    if gpad:
        glo = jnp.concatenate(
            [glo, jnp.full((n, gpad), jnp.inf, glo.dtype)], axis=1)
        ghi = jnp.concatenate(
            [ghi, jnp.full((n, gpad), -jnp.inf, ghi.dtype)], axis=1)
    glo = jnp.min(glo.reshape(n, OGp, 2), axis=-1)
    ghi = jnp.max(ghi.reshape(n, OGp, 2), axis=-1)
    row_lo = jnp.where(jnp.isfinite(glo),
                       jnp.floor(glo / LANES), 1.0).astype(jnp.int32)
    row_hi = jnp.where(jnp.isfinite(ghi),
                       jnp.floor(ghi / LANES), 0.0).astype(jnp.int32)
    rb = jnp.stack([jnp.clip(row_lo, 0, R - 1),
                    jnp.clip(row_hi, 0, R - 1)], axis=-1)
    rb = jnp.where(jnp.isfinite(glo)[..., None], rb,
                   jnp.array([1, 0], jnp.int32))
    if n_pad > n:
        rb = jnp.concatenate(
            [rb, jnp.tile(jnp.array([[[1, 0]]], jnp.int32),
                          (n_pad - n, OGp, 1))], axis=0)
    rb = rb.reshape(-1)

    # --- per-scan angle-addition scalars: cos/sin(theta - fov/2) against
    # shared cos/sin(n * angle_inc) beam tables — the opponent pass uses
    # CONTINUOUS beam angles (theta + scan_angles), not the theta LUT
    theta0 = p[:, 2] - fov / 2.0
    zc = jnp.zeros_like(theta0)
    scalars = jnp.stack(
        [p[:, 0], p[:, 1], jnp.cos(theta0), jnp.sin(theta0),
         zc, zc, zc, zc], axis=-1)

    n_idx = jnp.arange(RG * GROUP * LANES, dtype=jnp.float32).reshape(
        RG, GROUP, LANES)
    nb = jnp.concatenate(
        [jnp.concatenate([jnp.cos(n_idx[rg] * angle_inc),
                          jnp.sin(n_idx[rg] * angle_inc)], axis=0)
         for rg in range(RG)], axis=0)

    scr = jnp.pad(sc, ((0, n_pad - n), (0, R * LANES - num_beams))
                  ).reshape(n_pad * R, LANES)

    n_prog = n_pad // EAO
    kern = functools.partial(_overlay_kernel, R, theta_dis, num_beams, OGp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_prog,),
        in_specs=[
            pl.BlockSpec((1, EAO, 8), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RG * 2 * GROUP, LANES), lambda g, b: (0, 0)),
            pl.BlockSpec((1, EAO * OGp * GROUP, 8), lambda g, b: (g, 0, 0)),
            pl.BlockSpec((EAO * R, LANES), lambda g, b: (g, 0)),
        ],
        out_specs=pl.BlockSpec((EAO * R, LANES), lambda g, b: (g, 0)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad * R, LANES), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(rb, scalars.reshape(n_prog, EAO, 8), nb,
      rows.reshape(n_prog, EAO * OGp * GROUP, 8), scr)

    out = out.reshape(n_pad, R * LANES)[:n, :num_beams]
    return out.reshape(*batch_shape, num_beams).astype(scans.dtype)


def overlay_opponents_vmappable(scans, pose, opp_vertices, tables,
                                num_beams, theta_dis, interpret=False):
    """overlay_opponents_pallas that collapses under jax.vmap."""

    @jax.custom_batching.custom_vmap
    def fn(sc, p, ov):
        return overlay_opponents_pallas(sc, p, ov, tables, num_beams,
                                        theta_dis, interpret=interpret)

    @fn.def_vmap
    def _rule(axis_size, in_batched, sc, p, ov):  # noqa: ANN001
        return fn(sc, p, ov), True

    return fn(scans, pose, opp_vertices)


