"""Depth-sorted bin-group walk: the successor to the per-tile packed walk.

The packed subtile walk (ops/raster_subtile.py) rides the tile structure:
each screen tile's 8 subtile bins advance in lockstep, so every tile pays
rows = max(depth of its 8 bins), and on real meshes the aligned layout
carries ~2.4x slot slack (bunny headline: 140k slots for 58k pairs).

Here the 8 bins that share a vector op are NOT a tile's subtiles — they
are ANY 8 nonempty bins of similar depth. All n_tiles*8 bins are sorted
by depth (descending, stable by bin id so spatial locality survives among
equals) and grouped 8 at a time; within a group the max/mean depth ratio
is ~1, so slots ~= pairs + chunk padding. The price is that a lane group's
pixel window is no longer derivable from the grid index: the kernel takes
per-group pixel-origin lanes (xl/yl) and the image is assembled from
per-bin [8, 16] blocks by one scatter at the end (the shade stage was
already gather/scatter shaped — see backends/raster.shade_groups).

Layout (built by build_packed_rows_grouped, walked by tile_eval_grouped):

  rows128 f32 [r_cap, 128]: row r, lanes 16g..16g+15 hold the channels of
  the r-th entry of GROUP-slot g's bin (same channel layout as
  raster_subtile: A0 B0 G0 A1 B1 G1 A2 B2 G2 ZX ZY ZC id - - -).
  rowptr i32 [grp_cap+1] CHUNK_RP-multiple group row ranges.
  gdepth i32 [grp_cap*8] true per-bin depths (kernel liveness mask).
  xl/yl f32 [grp_cap, 128]: lane l of group i covers pixel column
  xl[i, l] - 0.5 (already includes the +0.5 center) and rows yl[i, l] + s
  + 0.5, s = sublane; i.e. xl = bin_x0 + (l % 16) + 0.5, yl = bin_y0.

Tie-breaking is bit-identical to the other kernels: bins are sorted by
triangle id and the depth merge is strict less-than.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ascii_renderer_tpu.ops import mxu
from ascii_renderer_tpu.ops.raster_subtile import (
    CH_A, CH_B, CH_G, CH_PAIR, CH_ZC, CH_ZX, CH_ZY, MAX_TRI, N_CHAN, N_SUB,
    SUB_SHIFT, SUB_W, TILE_H, TILE_W)

CHUNK_RG = 32      # rows per DMA slab (16 KB)
WALK_BCAST = False  # build the walk's 13 plane blocks with per-16-lane
# VPU broadcasts instead of the MXU expand dot (pure selection either
# way — bit-identical in interpret mode; ab_slope knobs s8bc/s8bcdot).
# DEFAULT OFF: Mosaic rejects the [C,128]->[C,8,16] vector shape cast
# ("infer-vector-layout: unsupported shape cast"), so the broadcast
# form cannot lower on real TPU today — kept as the documented next
# step if Mosaic grows lane-granule reshapes (the expand dot is ~70 us
# of the walk's 148; a VPU broadcast would cut most of it).
DEPTH_GROUPING = "sort"  # "sort" = exact lax.sort by depth desc;
# "bucket" = sort-free counting order by ceil(depth/CHUNK_RG) bucket
# (MXU-blocked rank cumsum + one small scatter). Within a bucket every
# depth rounds to the same chunk count, so the grouped layout's padded
# row total is identical to the exact sort except at bucket-boundary
# groups — the lax.sort's fixed cost (~0.2 ms measured in-context at
# headline scale) is what this removes. Perf A/B knob (tools/ab_slope
# "s8bucket"); bit-identical output either way (assembly is a
# permutation-invariant bin gather).
# MEASURED (r4, interleaved slope A/B at headline scale): bucket LOSES —
# 0.807 vs 0.780 ms/frame. The rank-cumsum + scatter it adds costs more
# than the sort it removes, and boundary groups pad extra walk rows.
# "sort" stays the default; the knob remains for re-testing if the key
# sort ever grows.
COMPOSE_SLOT_GATHER = False  # trace-time flag (in-process perf A/B only)
# measured (tools/ab_slope, slope timing, distinct traces): composing the
# slot gather to src32[tri_s[pidx]] is +0.39 ms WORSE than materializing
# the pair-ordered copy and gathering from it — keep False
PROBE_SKIP_SLOT_GATHER = False  # wrong-output perf probe (tools/ab_slope)
PROBE_SKIP_PAIR_GATHER = False  # wrong-output perf probe (tools/ab_slope)
GATHER_BARRIER = False  # wrap the K-gather build's gathers in
# lax.optimization_barrier: tests whether XLA consumer-fusion is what
# makes the in-context pair gather ~30x its standalone cost (a gather
# fused into a relayout degrades from row-DMA to per-element loads).
# Perf A/B knob (tools/ab_slope "s8barrier"); bit-identical.
# MEASURED: no effect (medians 1.47 vs 1.49 ms) — consumer fusion is
# not the cause; neither is source stride (split16 ~equal) nor index
# locality (Morton reorder ~equal).
GATHER_INPUT_BARRIER = False  # barrier on the gather INDEX operands
# instead (tri_s from the key sort, pidx from the layout math): tests
# whether index-producer fusion into the gather forces a slow lowering.
# Perf A/B knob (tools/ab_slope "s8ibar"); bit-identical.
# MEASURED: no effect either (1.36 vs 1.40 ms) — not index fusion.
GATHER_FULL_ROWS = True  # hypothesis 5 for the pair gather's cost: the
# [:, :N_CHAN] half-row slice fuses INTO the gather and demotes it
# from full-row DMA to a strided 16-of-32-lane form. This flag gathers
# FULL 32-lane rows, barriers the result, then slices — 2x the bytes
# but the fast row path. Perf A/B knob (tools/ab_slope "s8full32");
# bit-identical (verified in-harness: s8full32 output == s8).
# MEASURED (r5, interleaved slope A/B at headline scale, 3 reps):
# full32 0.617 ms/frame vs base 0.812 vs srccopy 0.965 — after four
# refuted hypotheses (consumer fusion, index fusion, source stride,
# index locality), the slice-into-gather demotion was the real cause.
# Default ON; the old form stays behind the knob for re-testing.
GATHER_SRC_COPY = False  # force a physical copy (x + 0.0) of the pair
# gather's SOURCE before gathering: the same random gather is 24 us
# standalone from a plain parameter but ~340 us in context from the
# pack kernel's output slice, so this tests whether the source buffer's
# producer/layout is what falls off the fast gather path. Perf A/B knob
# (tools/ab_slope "s8srccopy"); bit-identical (+0.0 is kept by XLA for
# signed-zero semantics and is exact on all finite values).
PROBE_SKIP_DEPTHSORT = False    # wrong-output perf probe (tools/ab_slope)
PROBE_SKIP_TR = False           # wrong-output perf probe (tools/ab_slope)
N_EXP = 13         # expanded blocks: 4x C, 4x A, 4x B, id


def expand_matrix_g() -> jnp.ndarray:
    """Packed->expanded selection matrix for the grouped walk: unlike
    raster_subtile.expand_matrix, no lane position is baked in (pixel x
    comes from the xl input), so blocks are pure coefficient broadcasts:
      k = 0..3   C_w   (w = w0, w1, w2, z)
      k = 4..7   A_w
      k = 8..11  B_w
      k = 12     entry id
    and the kernel computes w_w = C_w + A_w * xl + B_w * (yl + s + .5)."""
    import numpy as np
    m = np.zeros((TILE_W, N_EXP * TILE_W), np.float32)
    w_src = [(CH_A[0], CH_B[0], CH_G[0]), (CH_A[1], CH_B[1], CH_G[1]),
             (CH_A[2], CH_B[2], CH_G[2]), (CH_ZX, CH_ZY, CH_ZC)]
    for l in range(TILE_W):
        g = l // SUB_W
        for w, (ca, cb, cc) in enumerate(w_src):
            m[g * SUB_W + cc, (0 + w) * TILE_W + l] = 1.0
            m[g * SUB_W + ca, (4 + w) * TILE_W + l] = 1.0
            m[g * SUB_W + cb, (8 + w) * TILE_W + l] = 1.0
        m[g * SUB_W + CH_PAIR, 12 * TILE_W + l] = 1.0
    return jnp.asarray(m)


def _kernel_grouped(rowptr_ref, depth_ref, data_hbm, m_ref, xl_ref, yl_ref,
                    z_ref, e_ref, buf, sem, *, r_cap: int):
    """Grouped bin walk: double-buffered DMA + MXU lane expansion, with
    per-bin depth liveness and per-group pixel origins."""
    t = pl.program_id(0)
    r0 = rowptr_ref[t]
    r1 = rowptr_ref[t + 1]
    n_chunks = (r1 - r0) // CHUNK_RG

    xlv = xl_ref[0]  # [1, 128]
    ylv = yl_ref[0]
    xl = jnp.broadcast_to(xlv, (TILE_H, TILE_W))
    vv = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + 0.5
          + jnp.broadcast_to(ylv, (TILE_H, TILE_W)))
    # x folded chunk-wide over the 4 w-blocks: [1, 512]
    x4 = jnp.concatenate([xlv] * 4, axis=1)
    # per-lane bin depth (liveness mask)
    grp = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) // SUB_W
    dlane = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    for g in range(N_SUB):
        dlane = jnp.where(grp == g, depth_ref[t * N_SUB + g], dlane)

    max_start = r_cap - CHUNK_RG

    def copy_in(c, slot):
        start = jnp.minimum(r0 + c * CHUNK_RG, max_start)
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(start, CHUNK_RG)], buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        copy_in(0, 0).start()

    def chunk_body(c, carry):
        zb, eb = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            copy_in(c + 1, 1 - slot).start()

        copy_in(c, slot).wait()

        y = mxu.select_dot(
            buf[slot], m_ref[...], (((1,), (0,)), ((), ())),
            in_kernel=True)
        # y [CHUNK_RG, 13*128]; fold the per-lane x: P_w = C_w + A_w * xl
        p4 = y[:, 0:4 * TILE_W] + x4 * y[:, 4 * TILE_W:8 * TILE_W]
        d0 = c * CHUNK_RG

        for r in range(CHUNK_RG):  # static unroll
            def wplane(w):
                pb = jnp.broadcast_to(
                    p4[r, w * TILE_W:(w + 1) * TILE_W][None, :],
                    (TILE_H, TILE_W))
                bb = jnp.broadcast_to(
                    y[r, (8 + w) * TILE_W:(9 + w) * TILE_W][None, :],
                    (TILE_H, TILE_W))
                return pb + bb * vv

            w0, w1, w2, z = wplane(0), wplane(1), wplane(2), wplane(3)
            ok = ((w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0)
                  & (z >= 0.0) & (z <= 1.0) & (d0 + r < dlane))
            zm = jnp.where(ok, z, jnp.inf)
            ide = jnp.broadcast_to(
                y[r, 12 * TILE_W:13 * TILE_W][None, :], (TILE_H, TILE_W))
            better = zm < zb  # strict: earlier (smaller tri id) wins ties
            zb = jnp.where(better, zm, zb)
            eb = jnp.where(better, ide, eb)
        return zb, eb

    z0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    e0 = jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)
    zb, eb = jax.lax.fori_loop(0, n_chunks, chunk_body, (z0, e0))
    z_ref[0, ...] = zb
    e_ref[0, ...] = eb


def tile_eval_grouped(rows128: jnp.ndarray, rowptr: jnp.ndarray,
                      gdepth: jnp.ndarray, xl: jnp.ndarray, yl: jnp.ndarray,
                      grp_cap: int, interpret: bool | None = None):
    """rows128 f32 [r_cap, 128] grouped-packed layout -> (z, entry id) f32
    [grp_cap, 8, 128] per GROUP (lane group g = bin gbins[i*8+g]);
    -1 = background. See module docstring for rowptr/gdepth/xl/yl."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r_cap = rows128.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grp_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE_W, N_EXP * TILE_W), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_RG, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_grouped, r_cap=r_cap),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((grp_cap, TILE_H, TILE_W),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((grp_cap, TILE_H, TILE_W),
                                        jnp.float32)),
        interpret=interpret,
    )(rowptr, gdepth, rows128, expand_matrix_g(),
      xl[:, None, :], yl[:, None, :])


def _kernel_grouped_skip(rowptr_ref, depth_ref, skip_ref, data_hbm, m_ref,
                         xl_ref, yl_ref, z_ref, e_ref, buf, sem, *,
                         r_cap: int):
    """Base grouped walk + per-bin skip window: entry index idx = d0 + r
    is live iff skip <= idx < skip + depth. This is the walk for the
    K-gather layouts (build_packed_rows_grouped_kgather): the rows were
    fetched K entries per gather row from K-aligned starts and relaid to
    the base [r_cap, 128] format, so each bin's first `skip` slots belong
    to the preceding bin in pair order and must not light its pixels.

    The walk's MXU cost is IDENTICAL to _kernel_grouped (K stays 128):
    the K2/K4 kernels' regression — expand-matrix K-dim scaling with the
    entries-per-row factor — does not apply.

    data_hbm is rows128 viewed [r_cap // 8, 8, 128] (untiled dim-0 DMA
    slices; rowptr entries are CHUNK_RG-multiples, so starts are
    8-aligned — same Mosaic-proof layout as the K2 kernel)."""
    t = pl.program_id(0)
    r0 = rowptr_ref[t]
    r1 = rowptr_ref[t + 1]
    n_chunks = (r1 - r0) // CHUNK_RG

    xlv = xl_ref[0]  # [1, 128]
    ylv = yl_ref[0]
    xl = jnp.broadcast_to(xlv, (TILE_H, TILE_W))
    vv = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + 0.5
          + jnp.broadcast_to(ylv, (TILE_H, TILE_W)))
    x4 = jnp.concatenate([xlv] * 4, axis=1)
    grp = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) // SUB_W
    dlane = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    slane = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    for g in range(N_SUB):
        dlane = jnp.where(grp == g, depth_ref[t * N_SUB + g], dlane)
        slane = jnp.where(grp == g, skip_ref[t * N_SUB + g], slane)

    max_start = r_cap - CHUNK_RG
    cb = CHUNK_RG // 8

    def copy_in(c, slot):
        start = jnp.minimum(r0 + c * CHUNK_RG, max_start)
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(start // 8, cb)], buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        copy_in(0, 0).start()

    def chunk_body(c, carry):
        zb, eb = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            copy_in(c + 1, 1 - slot).start()

        copy_in(c, slot).wait()

        if WALK_BCAST:
            # The expand "matmul" is a pure selection: every output
            # lane copies ONE input channel (expand_matrix_g has one
            # nonzero per column). Build the 13 plane blocks with
            # per-16-lane-group broadcasts on the VPU instead of an
            # MXU dot — identical values, zero MXU work.
            x3 = buf[slot].reshape(CHUNK_RG, N_SUB, 16)

            def bc(ch):
                return jnp.broadcast_to(
                    x3[:, :, ch:ch + 1], (CHUNK_RG, N_SUB, 16)
                ).reshape(CHUNK_RG, TILE_W)

            w_src = ((CH_A[0], CH_B[0], CH_G[0]),
                     (CH_A[1], CH_B[1], CH_G[1]),
                     (CH_A[2], CH_B[2], CH_G[2]),
                     (CH_ZX, CH_ZY, CH_ZC))
            y = jnp.concatenate(
                [bc(cc) for _, _, cc in w_src]
                + [bc(ca) for ca, _, _ in w_src]
                + [bc(cb) for _, cb, _ in w_src]
                + [bc(CH_PAIR)], axis=1)  # [CHUNK_RG, 13*128]
        else:
            y = mxu.select_dot(
                buf[slot].reshape(CHUNK_RG, TILE_W), m_ref[...],
                (((1,), (0,)), ((), ())),
                in_kernel=True)  # [CHUNK_RG, 13*128]
        p4 = y[:, 0:4 * TILE_W] + x4 * y[:, 4 * TILE_W:8 * TILE_W]
        d0 = c * CHUNK_RG

        for r in range(CHUNK_RG):  # static unroll
            def wplane(w):
                pb = jnp.broadcast_to(
                    p4[r, w * TILE_W:(w + 1) * TILE_W][None, :],
                    (TILE_H, TILE_W))
                bb = jnp.broadcast_to(
                    y[r, (8 + w) * TILE_W:(9 + w) * TILE_W][None, :],
                    (TILE_H, TILE_W))
                return pb + bb * vv

            w0, w1, w2, z = wplane(0), wplane(1), wplane(2), wplane(3)
            idx = d0 + r
            ok = ((w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0)
                  & (z >= 0.0) & (z <= 1.0)
                  & (idx >= slane) & (idx < slane + dlane))
            zm = jnp.where(ok, z, jnp.inf)
            ide = jnp.broadcast_to(
                y[r, 12 * TILE_W:13 * TILE_W][None, :], (TILE_H, TILE_W))
            better = zm < zb  # strict: earlier (smaller tri id) wins ties
            zb = jnp.where(better, zm, zb)
            eb = jnp.where(better, ide, eb)
        return zb, eb

    z0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    e0 = jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)
    zb, eb = jax.lax.fori_loop(0, n_chunks, chunk_body, (z0, e0))
    z_ref[0, ...] = zb
    e_ref[0, ...] = eb


def tile_eval_grouped_skip(rows128: jnp.ndarray, rowptr: jnp.ndarray,
                           gdepth: jnp.ndarray, gskip: jnp.ndarray,
                           xl: jnp.ndarray, yl: jnp.ndarray,
                           grp_cap: int, interpret: bool | None = None):
    """Skip-window base walk over a K-gathered layout
    (build_packed_rows_grouped_kgather). Same outputs/semantics as
    tile_eval_grouped; gskip i32 [grp_cap*8] leading dead slots per bin."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r_cap = rows128.shape[0]
    assert CHUNK_RG % 8 == 0 and r_cap % 8 == 0, (CHUNK_RG, r_cap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grp_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE_W, N_EXP * TILE_W), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_RG // 8, 8, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_grouped_skip, r_cap=r_cap),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((grp_cap, TILE_H, TILE_W),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((grp_cap, TILE_H, TILE_W),
                                        jnp.float32)),
        interpret=interpret,
    )(rowptr, gdepth, gskip, rows128.reshape(r_cap // 8, 8, TILE_W),
      expand_matrix_g(), xl[:, None, :], yl[:, None, :])


def build_packed_rows_grouped_kgather(src32: jnp.ndarray,
                                      pair_key: jnp.ndarray,
                                      tiles_x: int, n_tiles: int,
                                      r_cap: int, pair_cap: int,
                                      grp_cap: int, k: int):
    """build_packed_rows_grouped with a K-entry slot gather RELAID to the
    base single-entry layout.

    The K2/K4 walk kernels paid for their gather-row savings with a
    K-times-wider expand matrix (walk MXU cost scales with entries per
    slab row) — measured a net loss on TPU. Here the saving and the walk
    are decoupled: the slot gather fetches K consecutive bin entries per
    row from the pair-ordered source viewed [P/k, k*16] (1/k-th of the
    gather rows — TPU gathers are per-row-cost bound), then ONE XLA
    transpose relays [r_cap/k, 8, k, 16] -> [r_cap, 8, 16] so the walk
    runs the UNCHANGED-cost base kernel. Bins whose CSR offset is not
    K-aligned start mid-row; the walk masks the leading entries via a
    skip window (tile_eval_grouped_skip), preserving bit-identical
    winner selection (the skipped slots belong to other bins).

    Returns (rows128 [r_cap, 128], rowptr [grp_cap+1] (K1 row units,
    CHUNK_RG multiples), gdepth, gskip [grp_cap*8], xl, yl [grp_cap,128],
    gbins [grp_cap*8], n_rows, n_pairs, n_used) — n_rows in entry units
    (= K1 rows), comparable against r_cap exactly like the base build."""
    assert k in (2, 4, 8) and CHUNK_RG % k == 0 and r_cap % CHUNK_RG == 0
    r_capk = r_cap // k
    n_bins = n_tiles * N_SUB
    assert n_bins < (1 << 13)  # sentinel key (n_bins << 18) must fit int32
    bin_s = (pair_key >> SUB_SHIFT).astype(jnp.int32)
    tri_s = (pair_key & (MAX_TRI - 1)).astype(jnp.int32)
    P = pair_key.shape[0]
    p_eff = min(pair_cap, P)
    offsets = _bin_offsets(bin_s, p_eff, n_bins)
    n_pairs = jnp.sum((bin_s < n_bins).astype(jnp.int32))
    depth_bins = offsets[1:] - offsets[:-1]
    n_used = jnp.sum((depth_bins > 0).astype(jnp.int32))

    if PROBE_SKIP_DEPTHSORT:
        binperm = jnp.arange(n_bins, dtype=jnp.int32)
        dsorted = depth_bins
    else:
        binperm, dsorted = depth_group_order(depth_bins, n_bins)
    nsel = grp_cap * N_SUB
    if nsel > n_bins:
        pad = nsel - n_bins
        binperm = jnp.concatenate(
            [binperm, jnp.full((pad,), n_bins, jnp.int32)])
        dsorted = jnp.concatenate([dsorted, jnp.zeros((pad,), jnp.int32)])
    gbins = binperm[:nsel]
    gdepth = dsorted[:nsel]
    off_g = offsets[jnp.minimum(gbins, n_bins)]
    gskip = jnp.where(gdepth > 0, off_g % k, 0)
    offk = (off_g - gskip) // k        # K-aligned K-row start per bin
    rbk = (gdepth + gskip + k - 1) // k  # K-rows needed per bin
    gmaxk = rbk.reshape(grp_cap, N_SUB).max(axis=1)
    # group extents in K1 rows, padded to CHUNK_RG (divisible by k)
    d_pad = _round_up_i(gmaxk * k, CHUNK_RG)
    rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(d_pad).astype(jnp.int32)])
    n_rows = rowptr[-1]

    rowptrk = rowptr // k
    rk_ids = jnp.arange(r_capk, dtype=jnp.int32)
    # group-of-row map as a one-hot MXU product: [r_capk]-long gathers
    # indexed by t_r ran at descriptor rate (21.5 us for the group-start
    # lookup alone in the device profile); the [r_capk, grp_cap] one-hot
    # against the per-group start/offset tables is a few us of MXU and
    # exact (offsets < 2^24, ops/mxu.select_dot).
    cmp = (rk_ids[:, None] >= rowptrk[None, 1:]).astype(jnp.float32)
    t_r = jnp.minimum(jnp.sum(cmp, axis=1).astype(jnp.int32), grp_cap - 1)
    oh = (t_r[:, None] == jnp.arange(grp_cap, dtype=jnp.int32)[None, :])
    offk_g = offk.reshape(grp_cap, N_SUB)
    # [r_capk, 1+8]: group K-row start | per-bin K-aligned source starts
    gtab = jnp.concatenate(
        [rowptrk[:-1, None].astype(jnp.float32),
         offk_g.astype(jnp.float32)], axis=1)
    rows_tab = mxu.select_dot(gtab, oh.astype(jnp.float32),
                              (((1,), (0,)), ((), ())), sel_on_left=True)
    d_rk = rk_ids - rows_tab[:, 0].astype(jnp.int32)
    off_rows = rows_tab[:, 1:].astype(jnp.int32)      # [r_capk, 8]

    # pair-ordered 16-channel source, K entries per k*16-lane row
    if PROBE_SKIP_PAIR_GATHER:  # wrong-output probe: pair-gather cost.
        # A contiguous slice/pad stands in for the random gather (a
        # broadcast would let XLA fold the downstream slot gather away).
        Tsrc = src32.shape[0]
        if p_eff <= Tsrc:
            src_pair = src32[:p_eff, :N_CHAN]
        else:
            src_pair = jnp.concatenate(
                [src32[:, :N_CHAN],
                 jnp.zeros((p_eff - Tsrc, N_CHAN), jnp.float32)], axis=0)
    else:
        tri_idx = tri_s[:p_eff]
        if GATHER_INPUT_BARRIER:
            tri_idx = jax.lax.optimization_barrier(tri_idx)
        src_g = src32[:, :N_CHAN] + 0.0 if GATHER_SRC_COPY \
            else src32
        if GATHER_FULL_ROWS:  # full-row gather, slice AFTER the barrier
            g32 = jax.lax.optimization_barrier(src_g[tri_idx])
            src_pair = g32[:, :N_CHAN]
        else:
            src_pair = src_g[tri_idx][:, :N_CHAN]     # [p_eff, 16]
    if GATHER_BARRIER:
        src_pair = jax.lax.optimization_barrier(src_pair)
    pek = _round_up_i_static(p_eff, k)
    if pek > p_eff:
        src_pair = jnp.concatenate(
            [src_pair, jnp.zeros((pek - p_eff, N_CHAN), jnp.float32)],
            axis=0)
    srckk = src_pair.reshape(pek // k, k * N_CHAN)    # [P/k, k*16]
    pidx = jnp.clip((off_rows + d_rk[:, None]).reshape(-1),
                    0, pek // k - 1)
    if GATHER_INPUT_BARRIER:
        pidx = jax.lax.optimization_barrier(pidx)
    if PROBE_SKIP_SLOT_GATHER:  # wrong-output probe: slot-gather cost
        g = jnp.broadcast_to(srckk[:1], (r_capk * N_SUB, k * N_CHAN)) \
            + jnp.float32(0) * srckk.sum()
    else:
        g = srckk[pidx]                               # [r_capk*8, k*16]
    if GATHER_BARRIER:
        g = jax.lax.optimization_barrier(g)
    # K-row q, sub-entry p, slot s -> K1 row q*k+p, slot s
    rows128 = (g.reshape(r_capk, N_SUB, k, N_CHAN)
               .transpose(0, 2, 1, 3)
               .reshape(r_cap, N_SUB * N_CHAN))

    safe_bins = jnp.minimum(gbins, n_bins - 1)
    tile = safe_bins // N_SUB
    sub = safe_bins % N_SUB
    x0 = ((tile % tiles_x) * TILE_W + sub * SUB_W).astype(jnp.float32)
    y0 = ((tile // tiles_x) * TILE_H).astype(jnp.float32)
    lane_in = (jnp.arange(SUB_W, dtype=jnp.float32) + 0.5)
    xl = (jnp.repeat(x0.reshape(grp_cap, N_SUB), SUB_W, axis=1)
          + jnp.tile(lane_in, N_SUB)[None, :])
    yl = jnp.repeat(y0.reshape(grp_cap, N_SUB), SUB_W, axis=1)

    rowptr_k = jnp.minimum(rowptr, r_cap)
    return (rows128, rowptr_k, gdepth, gskip, xl, yl, gbins,
            n_rows, n_pairs, n_used)


def _round_up_i(x, q: int):
    return ((x + q - 1) // q) * q


def _round_up_i_static(x: int, q: int) -> int:
    return -(-x // q) * q


def expand_matrix_g256() -> jnp.ndarray:
    """expand_matrix_g for the direct-DMA kernel: input lanes are the
    concatenation of the 8 bins' 32-channel source rows (lane g*32 + c =
    channel c of group-slot g's entry), not the packed 16-channel lanes."""
    import numpy as np
    m = np.zeros((2 * TILE_W, N_EXP * TILE_W), np.float32)
    w_src = [(CH_A[0], CH_B[0], CH_G[0]), (CH_A[1], CH_B[1], CH_G[1]),
             (CH_A[2], CH_B[2], CH_G[2]), (CH_ZX, CH_ZY, CH_ZC)]
    for l in range(TILE_W):
        g = l // SUB_W
        for w, (ca, cb, cc) in enumerate(w_src):
            m[g * 32 + cc, (0 + w) * TILE_W + l] = 1.0
            m[g * 32 + ca, (4 + w) * TILE_W + l] = 1.0
            m[g * 32 + cb, (8 + w) * TILE_W + l] = 1.0
        m[g * 32 + CH_PAIR, 12 * TILE_W + l] = 1.0
    return jnp.asarray(m)


def _kernel_direct(goff_ref, gdepth_ref, gchunks_ref, data_hbm, m_ref,
                   xl_ref, yl_ref, z_ref, e_ref, buf, sem, *, p_max: int):
    """Grouped bin walk with PER-BIN DIRECT DMA: instead of walking a
    prep-materialized aligned layout, each lane group's bin entries are
    copied straight from the pair-ordered source table — 8 contiguous
    [CHUNK_RG, 32] slabs per chunk, double-buffered. This deletes the
    prep's slot inverse map and [r_cap*8, 32] slot gather (the two
    largest rows-build costs) and the rows128 HBM round trip."""
    t = pl.program_id(0)
    n_chunks = gchunks_ref[t]

    xlv = xl_ref[0]
    ylv = yl_ref[0]
    vv = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + 0.5
          + jnp.broadcast_to(ylv, (TILE_H, TILE_W)))
    x4 = jnp.concatenate([xlv] * 4, axis=1)
    grp = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) // SUB_W
    dlane = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    for g in range(N_SUB):
        dlane = jnp.where(grp == g, gdepth_ref[t * N_SUB + g], dlane)

    def copy_in(c, slot, g):
        start = jnp.minimum(goff_ref[t * N_SUB + g] + c * CHUNK_RG, p_max)
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(start, CHUNK_RG)], buf.at[slot, g],
            sem.at[slot, g])

    @pl.when(n_chunks > 0)
    def _():
        for g in range(N_SUB):
            copy_in(0, 0, g).start()

    def chunk_body(c, carry):
        zb, eb = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            for g in range(N_SUB):
                copy_in(c + 1, 1 - slot, g).start()

        for g in range(N_SUB):
            copy_in(c, slot, g).wait()

        x = jnp.concatenate([buf[slot, g] for g in range(N_SUB)], axis=1)
        y = mxu.select_dot(
            x, m_ref[...], (((1,), (0,)), ((), ())),
            in_kernel=True)  # [CHUNK_RG, 13*128]
        p4 = y[:, 0:4 * TILE_W] + x4 * y[:, 4 * TILE_W:8 * TILE_W]
        d0 = c * CHUNK_RG

        for r in range(CHUNK_RG):  # static unroll
            def wplane(w):
                pb = jnp.broadcast_to(
                    p4[r, w * TILE_W:(w + 1) * TILE_W][None, :],
                    (TILE_H, TILE_W))
                bb = jnp.broadcast_to(
                    y[r, (8 + w) * TILE_W:(9 + w) * TILE_W][None, :],
                    (TILE_H, TILE_W))
                return pb + bb * vv

            w0, w1, w2, z = wplane(0), wplane(1), wplane(2), wplane(3)
            ok = ((w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0)
                  & (z >= 0.0) & (z <= 1.0) & (d0 + r < dlane))
            zm = jnp.where(ok, z, jnp.inf)
            ide = jnp.broadcast_to(
                y[r, 12 * TILE_W:13 * TILE_W][None, :], (TILE_H, TILE_W))
            better = zm < zb
            zb = jnp.where(better, zm, zb)
            eb = jnp.where(better, ide, eb)
        return zb, eb

    z0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    e0 = jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)
    zb, eb = jax.lax.fori_loop(0, n_chunks, chunk_body, (z0, e0))
    z_ref[0, ...] = zb
    e_ref[0, ...] = eb


def tile_eval_direct(src_pair: jnp.ndarray, goff: jnp.ndarray,
                     gdepth: jnp.ndarray, gchunks: jnp.ndarray,
                     xl: jnp.ndarray, yl: jnp.ndarray, grp_cap: int,
                     interpret: bool | None = None):
    """Direct-DMA grouped walk. src_pair f32 [P_pad, 32] pair-ordered
    entry rows (P_pad must leave >= CHUNK_RG rows of slack past the last
    live pair: reads are clamped to start <= P_pad - CHUNK_RG); goff i32
    [grp_cap*8] per-bin start offsets into src_pair; gdepth i32
    [grp_cap*8] true per-bin depths; gchunks i32 [grp_cap] chunk counts
    (ceil(group max depth / CHUNK_RG)). Returns (z, e) [grp_cap, 8, 128]
    — bit-identical to tile_eval_grouped on the same grouping."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p_max = src_pair.shape[0] - CHUNK_RG
    assert p_max >= 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grp_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2 * TILE_W, N_EXP * TILE_W), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, N_SUB, CHUNK_RG, 32), jnp.float32),
            pltpu.SemaphoreType.DMA((2, N_SUB)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_direct, p_max=p_max),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((grp_cap, TILE_H, TILE_W),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((grp_cap, TILE_H, TILE_W),
                                        jnp.float32)),
        interpret=interpret,
    )(goff, gdepth, gchunks, src_pair, expand_matrix_g256(),
      xl[:, None, :], yl[:, None, :])


def expand_matrix_g_k2() -> jnp.ndarray:
    """expand_matrix_g for the two-entry-per-row (K2) walk: input rows
    carry TWO consecutive bin entries' 16 kernel channels per group slot
    (lane g*32 + j*16 + c = channel c of sub-entry j of slot g), and the
    output doubles to two 13-block sections, one per sub-entry j."""
    import numpy as np
    m = np.zeros((2 * TILE_W, 2 * N_EXP * TILE_W), np.float32)
    w_src = [(CH_A[0], CH_B[0], CH_G[0]), (CH_A[1], CH_B[1], CH_G[1]),
             (CH_A[2], CH_B[2], CH_G[2]), (CH_ZX, CH_ZY, CH_ZC)]
    for j in range(2):
        o = j * N_EXP * TILE_W
        for l in range(TILE_W):
            g = l // SUB_W
            for w, (ca, cb, cc) in enumerate(w_src):
                m[g * 32 + j * 16 + cc, o + (0 + w) * TILE_W + l] = 1.0
                m[g * 32 + j * 16 + ca, o + (4 + w) * TILE_W + l] = 1.0
                m[g * 32 + j * 16 + cb, o + (8 + w) * TILE_W + l] = 1.0
            m[g * 32 + j * 16 + CH_PAIR, o + 12 * TILE_W + l] = 1.0
    return jnp.asarray(m)


def _kernel_grouped_k2(rowptr_ref, depth_ref, skip_ref, data_hbm, m_ref,
                       xl_ref, yl_ref, z_ref, e_ref, buf, sem, *,
                       r_cap2: int, c2: int):
    """K2 grouped walk: each [c2, 256] slab row carries 2 entries per bin,
    so the gather-built layout has half the rows of the base walk. Per-bin
    odd source offsets are absorbed by a skip window: sub-entry index
    idx = 2*row + j is live iff skip <= idx < skip + depth.

    data_hbm is the rows256 table viewed [r_cap2 // 8, 8, 256]: Mosaic
    cannot prove a dynamic row start divisible by the (8, 128) tiling when
    it places the table in VMEM, but dim 0 of the 3-D view is untiled, so
    the DMA slices whole 8-row blocks at start // 8 (rowptr entries are
    c2-multiples, c2 = CHUNK_RG/2 = 16, so starts are always 8-aligned)."""
    t = pl.program_id(0)
    r0 = rowptr_ref[t]
    r1 = rowptr_ref[t + 1]
    n_chunks = (r1 - r0) // c2

    xlv = xl_ref[0]  # [1, 128]
    ylv = yl_ref[0]
    vv = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + 0.5
          + jnp.broadcast_to(ylv, (TILE_H, TILE_W)))
    x4 = jnp.concatenate([xlv] * 4, axis=1)
    grp = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) // SUB_W
    dlane = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    slane = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    for g in range(N_SUB):
        dlane = jnp.where(grp == g, depth_ref[t * N_SUB + g], dlane)
        slane = jnp.where(grp == g, skip_ref[t * N_SUB + g], slane)

    max_start = r_cap2 - c2
    cb = c2 // 8  # 8-row blocks per chunk (untiled dim-0 slices)

    def copy_in(c, slot):
        start = jnp.minimum(r0 + c * c2, max_start)
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(start // 8, cb)], buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        copy_in(0, 0).start()

    nb = N_EXP * TILE_W  # 13-block section size per sub-entry

    def chunk_body(c, carry):
        zb, eb = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            copy_in(c + 1, 1 - slot).start()

        copy_in(c, slot).wait()

        y = mxu.select_dot(
            buf[slot].reshape(c2, 2 * TILE_W), m_ref[...],
            (((1,), (0,)), ((), ())), in_kernel=True)  # [c2, 2*13*128]
        # fold the per-lane x per sub-entry: P_w = C_w + A_w * xl
        p4 = [y[:, j * nb + 0:j * nb + 4 * TILE_W]
              + x4 * y[:, j * nb + 4 * TILE_W:j * nb + 8 * TILE_W]
              for j in range(2)]
        d0 = c * (2 * c2)

        for r in range(c2):       # static unroll
            for j in range(2):    # sub-entry within the row
                o = j * nb

                def wplane(w):
                    pb = jnp.broadcast_to(
                        p4[j][r, w * TILE_W:(w + 1) * TILE_W][None, :],
                        (TILE_H, TILE_W))
                    bb = jnp.broadcast_to(
                        y[r, o + (8 + w) * TILE_W:o + (9 + w) * TILE_W][
                            None, :],
                        (TILE_H, TILE_W))
                    return pb + bb * vv

                w0, w1, w2, z = wplane(0), wplane(1), wplane(2), wplane(3)
                idx = d0 + 2 * r + j
                ok = ((w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0)
                      & (z >= 0.0) & (z <= 1.0)
                      & (idx >= slane) & (idx < slane + dlane))
                zm = jnp.where(ok, z, jnp.inf)
                ide = jnp.broadcast_to(
                    y[r, o + 12 * TILE_W:o + 13 * TILE_W][None, :],
                    (TILE_H, TILE_W))
                better = zm < zb  # strict: earlier (smaller tri id) wins
                zb = jnp.where(better, zm, zb)
                eb = jnp.where(better, ide, eb)
        return zb, eb

    z0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    e0 = jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)
    zb, eb = jax.lax.fori_loop(0, n_chunks, chunk_body, (z0, e0))
    z_ref[0, ...] = zb
    e_ref[0, ...] = eb


def tile_eval_grouped_k2(rows256: jnp.ndarray, rowptr: jnp.ndarray,
                         gdepth: jnp.ndarray, gskip: jnp.ndarray,
                         xl: jnp.ndarray, yl: jnp.ndarray,
                         grp_cap: int, interpret: bool | None = None):
    """K2 grouped walk: rows256 f32 [r_cap2, 256] two-entry rows (lane
    g*32 + j*16 + c); rowptr i32 [grp_cap+1] row ranges (CHUNK_RG/2
    multiples); gdepth/gskip i32 [grp_cap*8] per-bin depth and sub-entry
    skip. Returns (z, entry id) f32 [grp_cap, 8, 128] — bit-identical to
    tile_eval_grouped on the same grouping."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c2 = CHUNK_RG // 2
    r_cap2 = rows256.shape[0]
    assert c2 % 8 == 0 and r_cap2 % 8 == 0, (c2, r_cap2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grp_cap,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((2 * TILE_W, 2 * N_EXP * TILE_W),
                         lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_W), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, c2 // 8, 8, 2 * TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_grouped_k2, r_cap2=r_cap2, c2=c2),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((grp_cap, TILE_H, TILE_W),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((grp_cap, TILE_H, TILE_W),
                                        jnp.float32)),
        interpret=interpret,
    )(rowptr, gdepth, gskip,
      rows256.reshape(r_cap2 // 8, 8, 2 * TILE_W), expand_matrix_g_k2(),
      xl[:, None, :], yl[:, None, :])


def build_packed_rows_grouped_k2(src32: jnp.ndarray, pair_key: jnp.ndarray,
                                 tiles_x: int, n_tiles: int, r_cap: int,
                                 pair_cap: int, grp_cap: int):
    """build_packed_rows_grouped with TWO entries per gather row.

    The base layout gathers one [32]-channel row per (group row, bin)
    slot and discards half of it (only 16 channels feed the kernel). Here
    the pair-ordered source is pre-sliced to its 16 kernel channels and
    re-viewed as [P/2, 32] two-entry rows, so the slot gather fetches two
    consecutive bin entries per row — half the gather rows, a quarter of
    the gathered bytes (TPU gathers are per-row-cost bound). Bins whose
    CSR offset is odd start mid-row; the kernel masks the leading
    sub-entry via gskip.

    Returns (rows256 [r_cap//2, 256], rowptr [grp_cap+1] (row units),
    gdepth, gskip [grp_cap*8], xl, yl [grp_cap, 128], gbins [grp_cap*8],
    n_rows, n_pairs, n_used) — n_rows in ENTRY units (2x row count) so
    callers compare it against the same r_cap as the base walk."""
    c2 = CHUNK_RG // 2
    assert r_cap % CHUNK_RG == 0
    r_cap2 = r_cap // 2
    n_bins = n_tiles * N_SUB
    assert n_bins < (1 << 13)  # sentinel key (n_bins << 18) must fit int32
    bin_s = (pair_key >> SUB_SHIFT).astype(jnp.int32)
    tri_s = (pair_key & (MAX_TRI - 1)).astype(jnp.int32)
    P = pair_key.shape[0]
    p_eff = min(pair_cap, P)
    offsets = _bin_offsets(bin_s, p_eff, n_bins)
    n_pairs = jnp.sum((bin_s < n_bins).astype(jnp.int32))
    depth_bins = offsets[1:] - offsets[:-1]
    n_used = jnp.sum((depth_bins > 0).astype(jnp.int32))

    negd, binperm = jax.lax.sort(
        (-depth_bins, jnp.arange(n_bins, dtype=jnp.int32)), num_keys=1)
    nsel = grp_cap * N_SUB
    if nsel > n_bins:
        pad = nsel - n_bins
        binperm = jnp.concatenate(
            [binperm, jnp.full((pad,), n_bins, jnp.int32)])
        negd = jnp.concatenate([negd, jnp.zeros((pad,), jnp.int32)])
    gbins = binperm[:nsel]
    gdepth = -negd[:nsel]
    off_g = offsets[jnp.minimum(gbins, n_bins)]
    gskip = jnp.where(gdepth > 0, off_g & 1, 0)
    o2 = (off_g - gskip) >> 1          # even-aligned two-entry row start
    rb = (gdepth + gskip + 1) >> 1     # rows needed per bin
    gmax2 = rb.reshape(grp_cap, N_SUB).max(axis=1)
    d_pad = ((gmax2 + c2 - 1) // c2) * c2
    rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(d_pad).astype(jnp.int32)])
    n_rows = rowptr[-1] * 2            # entry units (vs r_cap)

    r_ids = jnp.arange(r_cap2, dtype=jnp.int32)
    t_r = jnp.minimum(jnp.sum(
        (r_ids[:, None] >= rowptr[None, 1:]).astype(jnp.int32), axis=1),
        grp_cap - 1)
    d_r = r_ids - rowptr[:-1][t_r]
    go2 = o2.reshape(grp_cap, N_SUB)
    off_rows = go2[t_r]                               # [r_cap2, 8]

    # pair-ordered 16-channel source, two entries per 32-lane row
    src_pair = src32[tri_s[:p_eff]][:, :N_CHAN]       # [p_eff, 16]
    pe2 = p_eff + (p_eff & 1)
    if pe2 > p_eff:
        src_pair = jnp.concatenate(
            [src_pair, jnp.zeros((1, N_CHAN), jnp.float32)], axis=0)
    srck2 = src_pair.reshape(pe2 // 2, 2 * N_CHAN)    # [P/2, 32]
    pidx = jnp.clip((off_rows + d_r[:, None]).reshape(-1),
                    0, pe2 // 2 - 1)
    g = srck2[pidx]                                   # [r_cap2*8, 32]
    rows256 = g.reshape(r_cap2, N_SUB * 2 * N_CHAN)

    safe_bins = jnp.minimum(gbins, n_bins - 1)
    tile = safe_bins // N_SUB
    sub = safe_bins % N_SUB
    x0 = ((tile % tiles_x) * TILE_W + sub * SUB_W).astype(jnp.float32)
    y0 = ((tile // tiles_x) * TILE_H).astype(jnp.float32)
    lane_in = (jnp.arange(SUB_W, dtype=jnp.float32) + 0.5)
    xl = (jnp.repeat(x0.reshape(grp_cap, N_SUB), SUB_W, axis=1)
          + jnp.tile(lane_in, N_SUB)[None, :])
    yl = jnp.repeat(y0.reshape(grp_cap, N_SUB), SUB_W, axis=1)

    rowptr_k = jnp.minimum(rowptr, r_cap2)
    return (rows256, rowptr_k, gdepth, gskip, xl, yl, gbins,
            n_rows, n_pairs, n_used)


def build_packed_rows_grouped_k4(src32: jnp.ndarray, pair_key: jnp.ndarray,
                                 tiles_x: int, n_tiles: int, r_cap: int,
                                 pair_cap: int, grp_cap: int):
    """build_packed_rows_grouped with FOUR entries per gather row,
    lowered to the K2 kernel layout.

    The slot gather reads the pair-ordered 16-channel source re-viewed as
    [P/4, 64] four-entry rows — a quarter of the base walk's gather rows
    (gathers are per-row-cost bound). A K4 kernel is infeasible (the 0/1
    expand matrix grows as K^2: 13.6 MB VMEM at K4 vs ~16 MB/core), so
    the gathered [r_cap/4 * 8, 64] block is relaid to the K2 row format
    by one XLA transpose (K4 row q half p of slot g -> K2 row 2q+p) and
    walked by tile_eval_grouped_k2 unchanged. Bins whose CSR offset is
    not 4-aligned start mid-row: gskip in [0, 3], same skip-window mask.

    Returns the same tuple as build_packed_rows_grouped_k2 (rowptr in K2
    row units, CHUNK_RG/2 multiples; n_rows in entry units vs r_cap)."""
    c2 = CHUNK_RG // 2
    c4 = CHUNK_RG // 4
    assert r_cap % CHUNK_RG == 0 and CHUNK_RG % 4 == 0
    r_cap2 = r_cap // 2
    r_cap4 = r_cap // 4
    n_bins = n_tiles * N_SUB
    assert n_bins < (1 << 13)  # sentinel key (n_bins << 18) must fit int32
    bin_s = (pair_key >> SUB_SHIFT).astype(jnp.int32)
    tri_s = (pair_key & (MAX_TRI - 1)).astype(jnp.int32)
    P = pair_key.shape[0]
    p_eff = min(pair_cap, P)
    offsets = _bin_offsets(bin_s, p_eff, n_bins)
    n_pairs = jnp.sum((bin_s < n_bins).astype(jnp.int32))
    depth_bins = offsets[1:] - offsets[:-1]
    n_used = jnp.sum((depth_bins > 0).astype(jnp.int32))

    negd, binperm = jax.lax.sort(
        (-depth_bins, jnp.arange(n_bins, dtype=jnp.int32)), num_keys=1)
    nsel = grp_cap * N_SUB
    if nsel > n_bins:
        pad = nsel - n_bins
        binperm = jnp.concatenate(
            [binperm, jnp.full((pad,), n_bins, jnp.int32)])
        negd = jnp.concatenate([negd, jnp.zeros((pad,), jnp.int32)])
    gbins = binperm[:nsel]
    gdepth = -negd[:nsel]
    off_g = offsets[jnp.minimum(gbins, n_bins)]
    gskip = jnp.where(gdepth > 0, off_g & 3, 0)
    o4 = (off_g - gskip) >> 2          # 4-aligned four-entry row start
    rb = (gdepth + gskip + 3) >> 2     # K4 rows needed per bin
    gmax4 = rb.reshape(grp_cap, N_SUB).max(axis=1)
    d_pad = ((gmax4 + c4 - 1) // c4) * c4
    rowptr4 = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(d_pad).astype(jnp.int32)])
    n_rows = rowptr4[-1] * 4           # entry units (vs r_cap)

    r_ids = jnp.arange(r_cap4, dtype=jnp.int32)
    t_r = jnp.minimum(jnp.sum(
        (r_ids[:, None] >= rowptr4[None, 1:]).astype(jnp.int32), axis=1),
        grp_cap - 1)
    d_r = r_ids - rowptr4[:-1][t_r]
    go4 = o4.reshape(grp_cap, N_SUB)
    off_rows = go4[t_r]                               # [r_cap4, 8]

    # pair-ordered 16-channel source, four entries per 64-lane row
    src_pair = src32[tri_s[:p_eff]][:, :N_CHAN]       # [p_eff, 16]
    pe4 = -(-p_eff // 4) * 4
    if pe4 > p_eff:
        src_pair = jnp.concatenate(
            [src_pair, jnp.zeros((pe4 - p_eff, N_CHAN), jnp.float32)],
            axis=0)
    srck4 = src_pair.reshape(pe4 // 4, 4 * N_CHAN)    # [P/4, 64]
    pidx = jnp.clip((off_rows + d_r[:, None]).reshape(-1),
                    0, pe4 // 4 - 1)
    g = srck4[pidx]                                   # [r_cap4*8, 64]
    # K4 row q, half p, slot g  ->  K2 row 2q+p, slot g
    rows256 = (g.reshape(r_cap4, N_SUB, 2, 2 * N_CHAN)
               .transpose(0, 2, 1, 3)
               .reshape(r_cap2, N_SUB * 2 * N_CHAN))

    safe_bins = jnp.minimum(gbins, n_bins - 1)
    tile = safe_bins // N_SUB
    sub = safe_bins % N_SUB
    x0 = ((tile % tiles_x) * TILE_W + sub * SUB_W).astype(jnp.float32)
    y0 = ((tile // tiles_x) * TILE_H).astype(jnp.float32)
    lane_in = (jnp.arange(SUB_W, dtype=jnp.float32) + 0.5)
    xl = (jnp.repeat(x0.reshape(grp_cap, N_SUB), SUB_W, axis=1)
          + jnp.tile(lane_in, N_SUB)[None, :])
    yl = jnp.repeat(y0.reshape(grp_cap, N_SUB), SUB_W, axis=1)

    rowptr_k = jnp.minimum(rowptr4 * 2, r_cap2)
    return (rows256, rowptr_k, gdepth, gskip, xl, yl, gbins,
            n_rows, n_pairs, n_used)


_N_BUCKETS = 64  # depth buckets for DEPTH_GROUPING="bucket"; depths past
# (_N_BUCKETS-1)*CHUNK_RG share the top bucket (their groups go ragged —
# a perf-only concern for extreme-depth outlier scenes)


def depth_group_order(depth_bins: jnp.ndarray, n_bins: int):
    """Bin visit order for the depth-similar grouping: returns
    (binperm i32 [n_bins], depth_sorted i32 [n_bins]) with depths in
    DESCENDING chunk-bucket order, ascending bin id within a bucket.

    DEPTH_GROUPING="sort" is the exact stable sort; "bucket" computes the
    same chunk-quantized order sort-free: per-bin bucket one-hot, counts,
    MXU-blocked exclusive rank cumsum down the bin axis, and one small
    unique-index scatter to invert the permutation."""
    if DEPTH_GROUPING != "bucket":
        negd, binperm = jax.lax.sort(
            (-depth_bins, jnp.arange(n_bins, dtype=jnp.int32)), num_keys=1)
        return binperm, -negd
    B = _N_BUCKETS
    # bucket 0 = deepest so bucket-ascending order is depth-descending
    bkt = B - 1 - jnp.minimum((depth_bins + CHUNK_RG - 1) // CHUNK_RG,
                              B - 1)
    oh = (bkt[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]
          ).astype(jnp.float32)                       # [n_bins, B]
    # exclusive within-bucket rank down the bin axis, MXU-blocked
    c = 512
    pad = (-n_bins) % c
    x = jnp.concatenate([oh, jnp.zeros((pad, B), jnp.float32)], axis=0)
    x = x.reshape(-1, c, B)                           # [R, c, B]
    m = jnp.triu(jnp.ones((c, c), jnp.float32), k=1)  # M[j, i] = 1, j < i
    in_blk = mxu.count_dot(
        x, m, (((1,), (0,)), ((), ())))               # [R, B, c]
    # in_blk[r, b, i] = sum_{j<i} x[r, j, b]  (exclusive in-block rank)
    blk_tot = x.sum(axis=1)                           # [R, B]
    blk_off = jnp.cumsum(blk_tot, axis=0) - blk_tot   # exclusive [R, B]
    rank = (in_blk + blk_off[:, :, None]).transpose(0, 2, 1) \
        .reshape(-1, B)[:n_bins]                      # [n_bins, B]
    counts = blk_tot.sum(axis=0)                      # [B]
    bucket_off = jnp.cumsum(counts) - counts          # exclusive [B]
    pos = (bucket_off[bkt]
           + jnp.take_along_axis(rank, bkt[:, None], axis=1)[:, 0]
           ).astype(jnp.int32)                        # permutation
    ids = jnp.arange(n_bins, dtype=jnp.int32)
    binperm = jnp.zeros((n_bins,), jnp.int32).at[pos].set(
        ids, unique_indices=True)
    return binperm, depth_bins[binperm]


def _bin_offsets(bin_s: jnp.ndarray, p_eff: int, n_bins: int) -> jnp.ndarray:
    """offsets[q] = #entries of the SORTED bin_s[:p_eff] with bin < q,
    q in [0, n_bins] — the CSR offsets of the pair list.

    Equivalent to jnp.searchsorted(bin_s[:p_eff], arange(n_bins+1)) but
    ~free in context where searchsorted costs ~0.8 ms at headline scale
    (tools/exp_offsets.py): a two-level search shaped to the TPU emitter's
    fast paths. Level 1 locates each query's 64-wide row via a tiny
    scatter+cummax over the row heads (no batched gather); level 2 is ONE
    leading-index row gather + an in-row predicate count."""
    S = 64
    M = -(-p_eff // S)
    d = bin_s[:p_eff]
    if M * S > p_eff:  # sentinel-pad the tail row (n_bins sorts last)
        d = jnp.concatenate(
            [d, jnp.full((M * S - p_eff,), n_bins, jnp.int32)])
    d2 = d.reshape(M, S)
    samp = d2[:, 0]                                   # sorted row heads
    io = jnp.arange(M, dtype=jnp.int32) + 1
    ends = jnp.zeros((n_bins + 1,), jnp.int32).at[
        jnp.minimum(samp, n_bins)].max(io)
    j = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         jax.lax.cummax(ends)[:-1]])  # #row heads < q
    q = jnp.arange(n_bins + 1, dtype=jnp.int32)
    row = d2[jnp.maximum(j - 1, 0)]                   # [n_bins+1, S]
    cnt = jnp.sum((row < q[:, None]).astype(jnp.int32), axis=1)
    return jnp.where(j == 0, 0, S * (j - 1) + cnt)


def build_groups_direct(src32: jnp.ndarray, pair_key: jnp.ndarray,
                        tiles_x: int, n_tiles: int, pair_cap: int,
                        grp_cap: int):
    """Grouping prep for the direct-DMA walk: NO aligned row layout is
    materialized — just the pair-ordered source gather plus per-bin
    (offset, depth) metadata in depth-sorted group order.

    Returns (src_pair [p_eff + CHUNK_RG, 32], goff, gdepth [grp_cap*8],
    gchunks [grp_cap], xl, yl [grp_cap, 128], gbins [grp_cap*8],
    n_rows, n_pairs, n_used). n_rows = gchunks.sum() * CHUNK_RG (the
    walk's total slot count, for capacity accounting only — there is no
    r_cap to overflow)."""
    n_bins = n_tiles * N_SUB
    assert n_bins < (1 << 13)  # sentinel key (n_bins << 18) must fit int32
    bin_s = (pair_key >> SUB_SHIFT).astype(jnp.int32)
    tri_s = (pair_key & (MAX_TRI - 1)).astype(jnp.int32)
    P = pair_key.shape[0]
    p_eff = min(pair_cap, P)
    offsets = _bin_offsets(bin_s, p_eff, n_bins)
    n_pairs = jnp.sum((bin_s < n_bins).astype(jnp.int32))
    depth_bins = offsets[1:] - offsets[:-1]
    n_used = jnp.sum((depth_bins > 0).astype(jnp.int32))

    negd, binperm = jax.lax.sort(
        (-depth_bins, jnp.arange(n_bins, dtype=jnp.int32)), num_keys=1)
    nsel = grp_cap * N_SUB
    if nsel > n_bins:
        pad = nsel - n_bins
        binperm = jnp.concatenate(
            [binperm, jnp.full((pad,), n_bins, jnp.int32)])
        negd = jnp.concatenate([negd, jnp.zeros((pad,), jnp.int32)])
    gbins = binperm[:nsel]
    gdepth = -negd[:nsel]
    gmax = gdepth[0::N_SUB]
    gchunks = (gmax + CHUNK_RG - 1) // CHUNK_RG
    n_rows = (gchunks * CHUNK_RG).sum().astype(jnp.int32)
    goff = offsets[:n_bins][jnp.minimum(gbins, n_bins - 1)]

    src_pair = src32[tri_s[:p_eff]]
    src_pair = jnp.concatenate(
        [src_pair, jnp.zeros((CHUNK_RG, 32), jnp.float32)], axis=0)

    safe_bins = jnp.minimum(gbins, n_bins - 1)
    tile = safe_bins // N_SUB
    sub = safe_bins % N_SUB
    x0 = ((tile % tiles_x) * TILE_W + sub * SUB_W).astype(jnp.float32)
    y0 = ((tile // tiles_x) * TILE_H).astype(jnp.float32)
    lane_in = (jnp.arange(SUB_W, dtype=jnp.float32) + 0.5)
    xl = (jnp.repeat(x0.reshape(grp_cap, N_SUB), SUB_W, axis=1)
          + jnp.tile(lane_in, N_SUB)[None, :])
    yl = jnp.repeat(y0.reshape(grp_cap, N_SUB), SUB_W, axis=1)
    return (src_pair, goff, gdepth, gchunks, xl, yl, gbins,
            n_rows, n_pairs, n_used)


def build_packed_rows_grouped(src32: jnp.ndarray, pair_key: jnp.ndarray,
                              tiles_x: int, n_tiles: int, r_cap: int,
                              pair_cap: int, grp_cap: int):
    """Sorted pair keys -> depth-sorted grouped row layout.

    src32 f32 [T, 32] with the entry id pre-baked at CH_PAIR (a
    pack_channels slice, as in build_packed_rows_pre_id). Returns
    (rows128 [r_cap, 128], rowptr [grp_cap+1], gdepth [grp_cap*8],
    xl [grp_cap, 128], yl [grp_cap, 128], gbins [grp_cap*8],
    n_rows, n_pairs, n_used):
      n_used  = number of nonempty bins; bins beyond grp_cap*8 (in depth
                order: the SHALLOWEST) are dropped -> caller must retry
                with a bigger bin cap when n_used > grp_cap*8;
      n_rows  = true grouped row count (vs r_cap);
      n_pairs = true pair count (vs pair_cap)."""
    assert r_cap % CHUNK_RG == 0
    n_bins = n_tiles * N_SUB
    assert n_bins < (1 << 13), "sentinel bin n_bins must keep (n_bins << SUB_SHIFT) | tri inside int32"
    bin_s = (pair_key >> SUB_SHIFT).astype(jnp.int32)
    tri_s = (pair_key & (MAX_TRI - 1)).astype(jnp.int32)
    P = pair_key.shape[0]
    p_eff = min(pair_cap, P)
    offsets = _bin_offsets(bin_s, p_eff, n_bins)
    n_pairs = jnp.sum((bin_s < n_bins).astype(jnp.int32))
    depth_bins = offsets[1:] - offsets[:-1]           # [n_bins]
    n_used = jnp.sum((depth_bins > 0).astype(jnp.int32))

    # depth-descending stable order (ties keep bin id ascending)
    if PROBE_SKIP_DEPTHSORT:
        negd, binperm = -depth_bins, jnp.arange(n_bins, dtype=jnp.int32)
    else:
        negd, binperm = jax.lax.sort(
            (-depth_bins, jnp.arange(n_bins, dtype=jnp.int32)), num_keys=1)
    nsel = grp_cap * N_SUB
    if nsel > n_bins:  # more group slots than bins: sentinel-pad (depth 0,
        pad = nsel - n_bins  # bin id n_bins -> dropped by the assembly)
        binperm = jnp.concatenate(
            [binperm, jnp.full((pad,), n_bins, jnp.int32)])
        negd = jnp.concatenate([negd, jnp.zeros((pad,), jnp.int32)])
    gbins = binperm[:nsel]
    gdepth = -negd[:nsel]
    gmax = gdepth[0::N_SUB]                           # head of each group
    d_pad = ((gmax + CHUNK_RG - 1) // CHUNK_RG) * CHUNK_RG
    rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(d_pad).astype(jnp.int32)])
    n_rows = rowptr[-1]

    # group-of-row via one [r_cap, grp_cap] compare+reduce (a cumsum over
    # [r_cap] marks is latency-bound in context)
    r_ids = jnp.arange(r_cap, dtype=jnp.int32)
    if PROBE_SKIP_TR:
        t_r = jax.lax.rem(r_ids, grp_cap)
        d_r = jnp.zeros_like(r_ids) + rowptr[0] * 0
    else:
        t_r = jnp.minimum(jnp.sum(
            (r_ids[:, None] >= rowptr[None, 1:]).astype(jnp.int32), axis=1),
            grp_cap - 1)
        d_r = r_ids - rowptr[:-1][t_r]
    goffsets = offsets[:n_bins][gbins].reshape(grp_cap, N_SUB)
    off_rows = goffsets[t_r]                          # [r_cap, 8]
    pidx = jnp.clip((off_rows + d_r[:, None]).reshape(-1), 0, p_eff - 1)
    if PROBE_SKIP_SLOT_GATHER:
        g = jnp.broadcast_to(src32[:1], (r_cap * N_SUB, src32.shape[1]))
    elif COMPOSE_SLOT_GATHER:
        # composed gather: slot -> pair -> tri as one i32 gather + ONE
        # 32-ch row gather, instead of materializing a [p_eff, 32]
        # pair-ordered copy and row-gathering from it (bit-identical;
        # saves ~16 MB of HBM traffic at headline scale)
        g = src32[tri_s[:p_eff][pidx]]                # [r_cap*8, 32]
    else:
        src_pair = src32[tri_s[:p_eff]]               # [p_eff, 32]
        g = src_pair[pidx]                            # [r_cap*8, 32]
    rows128 = g[:, :N_CHAN].reshape(r_cap, N_SUB * N_CHAN)

    # pixel origins per group lane (sentinel slots clamp to the last bin —
    # their depth is 0, so the kernel never lights their lanes)
    safe_bins = jnp.minimum(gbins, n_bins - 1)
    tile = safe_bins // N_SUB
    sub = safe_bins % N_SUB
    x0 = ((tile % tiles_x) * TILE_W + sub * SUB_W).astype(jnp.float32)
    y0 = ((tile // tiles_x) * TILE_H).astype(jnp.float32)
    lane_in = (jnp.arange(SUB_W, dtype=jnp.float32) + 0.5)
    xl = (jnp.repeat(x0.reshape(grp_cap, N_SUB), SUB_W, axis=1)
          + jnp.tile(lane_in, N_SUB)[None, :])
    yl = jnp.repeat(y0.reshape(grp_cap, N_SUB), SUB_W, axis=1)

    rowptr_k = jnp.minimum(rowptr, r_cap)
    return (rows128, rowptr_k, gdepth, xl, yl, gbins,
            n_rows, n_pairs, n_used)


def assemble_group_image(vals: jnp.ndarray, gbins: jnp.ndarray,
                         n_tiles: int, tiles_y: int, tiles_x: int,
                         rows: int, cols: int, fill: float) -> jnp.ndarray:
    """Grouped per-pixel values [grp_cap, 8, 128(, C)] -> image
    [rows, cols(, C)]. Bins not covered by any group (empty or overflow)
    take `fill`. One [n_bins]-row gather + two reshuffles."""
    n_bins = n_tiles * N_SUB
    grp_cap = vals.shape[0]
    has_c = vals.ndim == 4
    C = vals.shape[3] if has_c else 1
    inv = jnp.full((n_bins,), grp_cap * N_SUB, jnp.int32)
    inv = inv.at[gbins].set(jnp.arange(grp_cap * N_SUB, dtype=jnp.int32),
                            mode="drop")
    if not has_c:
        # channel-free twin: the trailing size-1 dim forced every
        # intermediate into a degenerate {..., 1}-minor layout (the two
        # reshuffles cost 25 us for the idx plane in the device
        # profile); without it they run in clean 128-lane tiles
        flat = (vals.reshape(grp_cap, TILE_H, N_SUB, SUB_W)
                .transpose(0, 2, 1, 3)
                .reshape(grp_cap * N_SUB, TILE_H * SUB_W))
        bg = jnp.full((1, TILE_H * SUB_W), fill, vals.dtype)
        flat = jnp.concatenate([flat, bg], axis=0)
        img_bins = flat[inv]                          # [n_bins, 8*16]
        img = (img_bins.reshape(tiles_y, tiles_x, N_SUB, TILE_H, SUB_W)
               .transpose(0, 3, 1, 2, 4)
               .reshape(tiles_y * TILE_H, tiles_x * TILE_W))
        return img[:rows, :cols]
    # (g, h, sub, w, C) -> bin-major rows [grp_cap*8, 8*16*C]
    flat = (vals.reshape(grp_cap, TILE_H, N_SUB, SUB_W, C)
            .transpose(0, 2, 1, 3, 4)
            .reshape(grp_cap * N_SUB, TILE_H * SUB_W * C))
    bg = jnp.full((1, TILE_H * SUB_W * C), fill, vals.dtype)
    flat = jnp.concatenate([flat, bg], axis=0)
    img_bins = flat[inv]                              # [n_bins, 8*16*C]
    img = (img_bins.reshape(tiles_y, tiles_x, N_SUB, TILE_H, SUB_W, C)
           .transpose(0, 3, 1, 2, 4, 5)
           .reshape(tiles_y * TILE_H, tiles_x * TILE_W, C))
    return img[:rows, :cols]
