"""Subtile-packed bin-walk: 8 entries per vector op, ~3 VPU cycles/entry.

The full-tile walk (ops/raster_bins.py) evaluates every bin entry against
all 1024 pixels of its 8x128 tile; at bunny scale the median triangle is
~3x2 px, so >99% of each [8,128] vector op is wasted lanes. Here each tile
splits into 8 column subtiles of 8x16 px, bins are per (tile, subtile),
and the prep packs the tile's 8 subtile bins side by side on the lane
axis: ONE [8,128] vector op evaluates 8 *different* entries, each against
its own 16-lane pixel window. Per-entry cost drops ~8x; correctness is
unchanged because every pixel belongs to exactly one subtile, so lane
groups never conflict.

Data layout (built by `build_subtile_rows`, consumed by the kernel):

  rows f32 [R_CAP, 16, 128]: row r, lane group g (lanes 16g..16g+15) holds
  the r-th entry of subtile g's bin for the current tile, value broadcast
  across its 16 lanes. Channels (sublanes):
    0..8   edge planes  w_k = A_k*px + B_k*py + G_k   (k = 0,1,2)
    9..11  depth plane  z   = ZX*px + ZY*py + ZC
    12     entry id (triangle id by default; f32, exact below 2^24)
    13..15 zero padding
  Planes are in GLOBAL pixel coordinates: because lane group g occupies
  exactly the lanes of its subtile's pixel columns, the kernel evaluates
  px = tile_x0 + lane + 0.5 / py = tile_y0 + sublane + 0.5 once per tile
  and every lane group lands on precisely its own subtile's pixels — no
  per-pair coordinate fold is needed. Dead slots point at an inert row
  with G0 = +1 (w0 > 0 -> never inside).

  rowptr i32 [n_tiles + 1]: tile t owns rows [rowptr[t], rowptr[t+1]),
  always a multiple of CHUNK_R (the prep pads each tile's row range), so
  chunked DMA never crosses into the next tile's rows.

Tie-breaking matches the full-tile kernels bit-for-bit: bins are sorted by
triangle id and the merge is strict less-than, so the first (= smallest
id) entry wins depth ties.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 8, 128
SUB_W = 16          # subtile width in px; 8 subtiles per tile
N_SUB = TILE_W // SUB_W
N_CHAN = 16
CHUNK_R = 8         # rows per DMA slab: 8 x 16 x 128 f32 = 64 KB
SUB_SHIFT = 18      # sort key: (tile*8 + subtile) << 18 | tri
MAX_TRI = 1 << SUB_SHIFT

CH_A = (0, 3, 6)
CH_B = (1, 4, 7)
CH_G = (2, 5, 8)
CH_ZX, CH_ZY, CH_ZC = 9, 10, 11
CH_PAIR = 12


def _kernel(rowptr_ref, data_hbm, z_ref, e_ref, buf, sem, *, tiles_x: int,
            r_cap: int):
    """Double-buffered bin walk: chunk c+1's DMA is in flight while chunk c
    computes (the walk is DMA-latency-bound otherwise). The prefetch clamp
    keeps the lookahead inside the data array; rows past a tile's range are
    inert (never selected) so reading them is harmless."""
    t = pl.program_id(0)
    r0 = rowptr_ref[t]
    r1 = rowptr_ref[t + 1]
    n_chunks = (r1 - r0) // CHUNK_R  # prep pads per tile -> exact

    ty = t // tiles_x
    tx = t % tiles_x
    u = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
         .astype(jnp.float32) + tx.astype(jnp.float32) * TILE_W + 0.5)
    v = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
         .astype(jnp.float32) + ty.astype(jnp.float32) * TILE_H + 0.5)

    max_start = r_cap - CHUNK_R

    def copy_in(c, slot):
        start = jnp.minimum(r0 + c * CHUNK_R, max_start)
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(start, CHUNK_R)], buf.at[slot], sem.at[slot])

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

        for r in range(CHUNK_R):  # static unroll: no per-row loop overhead
            blk = buf[slot, r]  # [N_CHAN, 128]

            def ch(i, blk=blk):
                return jnp.broadcast_to(blk[i][None, :], (TILE_H, TILE_W))

            w0 = ch(0) * u + ch(1) * v + ch(2)
            w1 = ch(3) * u + ch(4) * v + ch(5)
            w2 = ch(6) * u + ch(7) * v + ch(8)
            z = ch(CH_ZX) * u + ch(CH_ZY) * v + ch(CH_ZC)
            ok = ((w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0)
                  & (z >= 0.0) & (z <= 1.0))
            zm = jnp.where(ok, z, jnp.inf)
            better = zm < zb  # strict: earlier (smaller tri id) wins ties
            zb = jnp.where(better, zm, zb)
            eb = jnp.where(better, ch(CH_PAIR), eb)
        return zb, eb

    z0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    e0 = jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)
    zb, eb = jax.lax.fori_loop(0, n_chunks, chunk_body, (z0, e0))
    z_ref[0, ...] = zb
    e_ref[0, ...] = eb


def tile_eval_subtile(rows_data: jnp.ndarray, rowptr: jnp.ndarray,
                      tiles_x: int, n_tiles: int,
                      interpret: bool | None = None):
    """rows_data f32 [R_CAP, 16, 128] (see module docstring); rowptr i32
    [n_tiles+1] with CHUNK_R-multiple ranges -> (z [n_tiles, 8, 128] f32,
    entry id f32 [n_tiles, 8, 128], -1 = background)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    import functools
    r_cap = rows_data.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_R, N_CHAN, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, tiles_x=tiles_x, r_cap=r_cap),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W),
                                        jnp.float32)),
        interpret=interpret,
    )(rowptr, rows_data)


def build_subtile_rows(src: jnp.ndarray, pair_key: jnp.ndarray,
                       tiles_x: int, n_tiles: int, r_cap: int,
                       pair_cap: int = 1 << 30, entry: str = "tri"):
    """Build the aligned row layout from sorted (bin, tri) pairs.

    src f32 [V+1, 16]: per-triangle GLOBAL-coordinate planes (channels
    A0,B0,G0,A1,B1,G1,A2,B2,G2,ZX,ZY,ZC,...; w_k = A_k*px + B_k*py + G_k at
    pixel centers); row V must be all-zero (dump row for dead pair slots).
    pair_key i32 [P] SORTED keys ((bin << SUB_SHIFT) | tri, bin = tile*8 +
    subtile; dead pairs have bin == n_tiles*8 and sort to the end).

    entry: what the kernel reports as the per-pixel winner id — "tri"
    (the triangle id, so shading indexes the per-triangle plane table
    directly with NO pair-table gather) or "pair" (the sorted-pair index,
    for callers that need the bin slot itself).

    Returns (rows f32 [r_cap, 16, 128], rowptr i32 [n_tiles+1] clamped to
    r_cap for safe kernel DMA, n_rows i32 scalar TRUE row count, n_pairs
    i32 scalar). If n_rows > r_cap the layout is truncated (bottom tile
    rows dropped) — callers must check and retry with a bigger cap (see
    raster.suggest_caps_subtile)."""
    assert r_cap % CHUNK_R == 0
    n_bins = n_tiles * N_SUB
    bin_s = (pair_key >> SUB_SHIFT).astype(jnp.int32)
    tri_s = (pair_key & (MAX_TRI - 1)).astype(jnp.int32)
    P = pair_key.shape[0]
    offsets = jnp.searchsorted(
        bin_s, jnp.arange(n_bins + 1, dtype=jnp.int32)).astype(jnp.int32)
    n_pairs = offsets[-1]
    depth = (offsets[1:] - offsets[:-1]).reshape(n_tiles, N_SUB)
    d_tile = depth.max(axis=1)
    d_pad = ((d_tile + CHUNK_R - 1) // CHUNK_R) * CHUNK_R
    rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(d_pad).astype(jnp.int32)])
    n_rows = rowptr[-1]

    # Pair-ordered entry rows, truncated to the real-pair prefix: the
    # sorted order puts all live pairs first, so rows past pair_cap are
    # only needed when n_pairs > pair_cap (reported; caller retries).
    # Row pair_cap is the inert dump (G0=+1 -> never inside).
    p_eff = min(pair_cap, P)
    src_pair = src[tri_s[:p_eff]]  # [p_eff, 16] locality-friendly rows
    ids = (tri_s[:p_eff].astype(jnp.float32) if entry == "tri"
           else jnp.arange(p_eff, dtype=jnp.float32))
    src_pair = src_pair.at[:, CH_PAIR].set(ids)
    inert = jnp.zeros((1, N_CHAN), jnp.float32).at[0, CH_G[0]].set(1.0)
    src_pair = jnp.concatenate([src_pair, inert], axis=0)

    # row -> (tile, depth) map. t_r via scatter + MXU-blocked cumsum:
    # jnp.searchsorted at [r_cap] query scale lowers ~3.4x slower on TPU
    # (measured 1.41 ms vs 0.41). Row gathers use a 1-D leading index
    # (offsets8[t_r]) — XLA's batched 2-D-index gather is ~6x slower.
    from ascii_renderer_tpu.backends.raster import _cumsum_i32
    r_ids = jnp.arange(r_cap, dtype=jnp.int32)
    marks = jnp.zeros((r_cap,), jnp.float32).at[rowptr[1:]].add(
        1.0, mode="drop")
    t_r = jnp.clip(_cumsum_i32(marks), 0, n_tiles - 1)
    d_r = r_ids - rowptr[:-1][t_r]
    off_rows = offsets[:n_bins].reshape(n_tiles, N_SUB)[t_r]  # [r_cap, 8]
    dep_rows = depth[t_r]
    live = ((d_r[:, None] < dep_rows) & (r_ids < n_rows)[:, None]
            ).reshape(-1)
    pidx = (off_rows + d_r[:, None]).reshape(-1)
    pidx = jnp.where(live & (pidx < p_eff), pidx, p_eff)  # dead -> inert
    g = src_pair[pidx]  # [r_cap*8, 16] one wide flat row gather
    g = g.reshape(r_cap, N_SUB, N_CHAN)
    rows = jnp.repeat(g.transpose(0, 2, 1), SUB_W, axis=-1)  # [r_cap,16,128]
    rowptr_k = jnp.minimum(rowptr, r_cap)
    return rows, rowptr_k, n_rows, n_pairs


# ---------------------------------------------------------------------------
# Packed-lane layout: the 16x-broadcast moved from HBM onto the MXU
# ---------------------------------------------------------------------------
# The expanded [R_CAP, 16, 128] layout above costs 8 KB of HBM per entry
# row (written by the prep, read back by the kernel — ~185 MB/frame at the
# 69k-tri headline) because TPU DMA slabs must be 128-lane aligned, so the
# per-subtile entry values are materialized pre-broadcast. The packed form
# stores one entry row as ONE 128-lane vector — lane j = g*SUB_W + c holds
# channel c of subtile g's entry — and the kernel expands it on-core:
#
#   Y = X @ M   with a constant one-hot-structured M f32 [128, 13*128]:
#   for output block k and lane l (pixel column l of the tile), column
#   k*128 + l reads only channels of group g = l // SUB_W. Blocks:
#     k = 0..3   P_w(l) = A_w * (l + 0.5) + C_w     (w = w0, w1, w2, z)
#     k = 4..7   a_w(l) = A_w                        (x-plane coefficient)
#     k = 8..11  b_w(l) = B_w                        (y-plane coefficient)
#     k = 12     entry id
#   so w_w(s, l) = P_w(l) + a_w(l) * tile_x0 + b_w(l) * (tile_y0 + s + .5)
#   — two FMAs per edge/depth plane per row, with the lane-varying part
#   baked into the matmul. One [CHUNK_RP, 128] x [128, 1664] MXU op per
#   chunk replaces 16x the DMA traffic.

CHUNK_RP = 32      # packed rows per DMA slab: 32 x 128 f32 = 16 KB
N_EXP = 13          # expanded blocks: 4x P, 4x a, 4x b, id


def expand_matrix() -> jnp.ndarray:
    """The constant packed->expanded selection matrix M f32 [128, N_EXP*128]
    (see module comment). Built once per trace; XLA folds it to a literal."""
    import numpy as np
    m = np.zeros((TILE_W, N_EXP * TILE_W), np.float32)
    # per-w channel sources: (A, B, C) channel indices in the packed lane
    w_src = [(CH_A[0], CH_B[0], CH_G[0]), (CH_A[1], CH_B[1], CH_G[1]),
             (CH_A[2], CH_B[2], CH_G[2]), (CH_ZX, CH_ZY, CH_ZC)]
    for l in range(TILE_W):
        g = l // SUB_W
        for w, (ca, cb, cc) in enumerate(w_src):
            m[g * SUB_W + ca, (0 + w) * TILE_W + l] = l + 0.5  # P: A*(l+.5)
            m[g * SUB_W + cc, (0 + w) * TILE_W + l] = 1.0      # P: + C
            m[g * SUB_W + ca, (4 + w) * TILE_W + l] = 1.0      # a
            m[g * SUB_W + cb, (8 + w) * TILE_W + l] = 1.0      # b
        m[g * SUB_W + CH_PAIR, 12 * TILE_W + l] = 1.0          # id
    return jnp.asarray(m)


def _kernel_packed(rowptr_ref, data_hbm, m_ref, z_ref, e_ref, buf, sem, *,
                   tiles_x: int, r_cap: int):
    """Packed-layout bin walk (double-buffered DMA, MXU lane expansion)."""
    t = pl.program_id(0)
    r0 = rowptr_ref[t]
    r1 = rowptr_ref[t + 1]
    n_chunks = (r1 - r0) // CHUNK_RP  # prep pads per tile -> exact

    ty = (t // tiles_x).astype(jnp.float32)
    tx = (t % tiles_x).astype(jnp.float32)
    bx = tx * TILE_W                      # tile-global x offset
    # v(s) = tile_y0 + s + 0.5 as an [8, 128] column pattern
    vv = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + ty * TILE_H + 0.5)

    max_start = r_cap - CHUNK_RP

    def copy_in(c, slot):
        start = jnp.minimum(r0 + c * CHUNK_RP, max_start)
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(start, CHUNK_RP)], buf.at[slot], sem.at[slot])

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

        y = jax.lax.dot_general(
            buf[slot], m_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # [CHUNK_RP, 13*128]
        # fold the tile x offset chunk-wide: P'_w = P_w + a_w * bx
        p4 = y[:, 0:4 * TILE_W] + bx * y[:, 4 * TILE_W:8 * TILE_W]

        for r in range(CHUNK_RP):  # static unroll
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
                  & (z >= 0.0) & (z <= 1.0))
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


def tile_eval_packed(rows128: jnp.ndarray, rowptr: jnp.ndarray,
                     tiles_x: int, n_tiles: int,
                     interpret: bool | None = None):
    """rows128 f32 [R_CAP, 128] packed layout (lane j = g*16 + c); rowptr
    i32 [n_tiles+1] with CHUNK_RP-multiple ranges -> (z [n_tiles, 8, 128]
    f32, entry id f32 [n_tiles, 8, 128], -1 = background)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    import functools
    r_cap = rows128.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE_W, N_EXP * TILE_W), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_RP, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_packed, tiles_x=tiles_x, r_cap=r_cap),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W),
                                        jnp.float32)),
        interpret=interpret,
    )(rowptr, rows128, expand_matrix())


def build_packed_rows_pre_id(src32: jnp.ndarray, pair_key: jnp.ndarray,
                             tiles_x: int, n_tiles: int, r_cap: int,
                             pair_cap: int = 1 << 30):
    """Lean packed-rows build for sources with the entry id PRE-BAKED in
    channel CH_PAIR (src32 f32 [T, 32], e.g. a pack_channels slice with
    an iota channel at col 12). Compared to build_packed_rows this skips
    the [pair_cap, 32] set-column copy, the inert-row concat (consumers
    must run the kernel's per-bin depth mask: tile_eval_packed_d), and
    searches bin offsets over the LIVE SORTED PREFIX only (bin_s[:p_eff])
    — live pairs sort first, so offsets clamp at p_eff exactly when pairs
    overflow pair_cap, which the exact n_pairs (full-array single query)
    reports for the caller's retry.

    Returns (rows128 f32 [r_cap, 128], rowptr, depth i32 [n_tiles*8],
    n_rows, n_pairs). Dead/padding slots hold arbitrary live-pair rows;
    the depth-masked kernel never selects them."""
    assert r_cap % CHUNK_RP == 0
    n_bins = n_tiles * N_SUB
    bin_s = (pair_key >> SUB_SHIFT).astype(jnp.int32)
    tri_s = (pair_key & (MAX_TRI - 1)).astype(jnp.int32)
    P = pair_key.shape[0]
    p_eff = min(pair_cap, P)
    offsets = jnp.searchsorted(
        bin_s[:p_eff], jnp.arange(n_bins + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    n_pairs = jnp.searchsorted(
        bin_s, jnp.asarray(n_bins, jnp.int32)).astype(jnp.int32)
    depth = (offsets[1:] - offsets[:-1]).reshape(n_tiles, N_SUB)
    d_tile = depth.max(axis=1)
    d_pad = ((d_tile + CHUNK_RP - 1) // CHUNK_RP) * CHUNK_RP
    rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(d_pad).astype(jnp.int32)])
    n_rows = rowptr[-1]

    src_pair = src32[tri_s[:p_eff]]  # [p_eff, 32]; ids already in place

    from ascii_renderer_tpu.backends.raster import _cumsum_i32
    r_ids = jnp.arange(r_cap, dtype=jnp.int32)
    marks = jnp.zeros((r_cap,), jnp.float32).at[rowptr[1:]].add(
        1.0, mode="drop")
    t_r = jnp.clip(_cumsum_i32(marks), 0, n_tiles - 1)
    d_r = r_ids - rowptr[:-1][t_r]
    off_rows = offsets[:n_bins].reshape(n_tiles, N_SUB)[t_r]  # [r_cap, 8]
    pidx = jnp.clip((off_rows + d_r[:, None]).reshape(-1), 0, p_eff - 1)
    g = src_pair[pidx]  # [r_cap*8, 32] one wide flat row gather
    rows128 = g[:, :N_CHAN].reshape(r_cap, N_SUB * N_CHAN)
    rowptr_k = jnp.minimum(rowptr, r_cap)
    return rows128, rowptr_k, depth.reshape(-1), n_rows, n_pairs


def _kernel_packed_d(rowptr_ref, depth_ref, data_hbm, m_ref, z_ref, e_ref,
                     buf, sem, *, tiles_x: int, r_cap: int):
    """_kernel_packed plus a per-bin depth mask: entry slot d of lane
    group g is live iff d < depth[tile*8 + g] — dead/padding slots in the
    aligned layout hold arbitrary pair rows and die here instead of via a
    prep-side inert fill (saves the prep two full-array copy passes)."""
    t = pl.program_id(0)
    r0 = rowptr_ref[t]
    r1 = rowptr_ref[t + 1]
    n_chunks = (r1 - r0) // CHUNK_RP

    ty = (t // tiles_x).astype(jnp.float32)
    tx = (t % tiles_x).astype(jnp.float32)
    bx = tx * TILE_W
    vv = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + ty * TILE_H + 0.5)
    # depth of each lane's bin, as an [8, 128] i32 pattern (built once)
    grp = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1) // SUB_W
    dlane = jnp.zeros((TILE_H, TILE_W), jnp.int32)
    for g in range(N_SUB):
        dlane = jnp.where(grp == g, depth_ref[t * N_SUB + g], dlane)

    max_start = r_cap - CHUNK_RP

    def copy_in(c, slot):
        start = jnp.minimum(r0 + c * CHUNK_RP, max_start)
        return pltpu.make_async_copy(
            data_hbm.at[pl.ds(start, CHUNK_RP)], buf.at[slot], sem.at[slot])

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

        y = jax.lax.dot_general(
            buf[slot], m_ref[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        p4 = y[:, 0:4 * TILE_W] + bx * y[:, 4 * TILE_W:8 * TILE_W]
        d0 = c * CHUNK_RP

        for r in range(CHUNK_RP):
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


def tile_eval_packed_d(rows128: jnp.ndarray, rowptr: jnp.ndarray,
                       depth: jnp.ndarray, tiles_x: int, n_tiles: int,
                       interpret: bool | None = None):
    """tile_eval_packed with the per-bin depth mask (pairs with
    build_packed_rows_pre_id). depth i32 [n_tiles*8]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    import functools
    r_cap = rows128.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TILE_W, N_EXP * TILE_W), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK_RP, TILE_W), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_packed_d, tiles_x=tiles_x, r_cap=r_cap),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W),
                                        jnp.float32)),
        interpret=interpret,
    )(rowptr, depth, rows128, expand_matrix())


def build_packed_rows(src: jnp.ndarray, pair_key: jnp.ndarray,
                      tiles_x: int, n_tiles: int, r_cap: int,
                      pair_cap: int = 1 << 30, entry: str = "tri"):
    """Build the packed aligned row layout by a slot->pair inverse map +
    ONE [r_cap*8, 32]-wide row gather (measured faster than the earlier
    scatter-onto-inert-base form: no base materialization, and width-32
    rows dodge the pathological width-16 gather emitter).

    Same contract as build_subtile_rows, but returns rows128 f32
    [r_cap, 128] (packed lanes j = g*SUB_W + c, consumed by
    tile_eval_packed) and rowptr in CHUNK_RP quanta.

    TPU gather-emitter gotchas this build engineers around (measured at
    headline scale, see PARITY.md): a [70k, 16]-wide row gather costs
    0.83 ms while the same gather at width 32 costs 0.03 ms (XLA picks a
    pathological emitter exactly at width 16), and 1-D index gathers cost
    ~0.4 ms per 70k indices while 8-wide row gathers are ~free — so the
    row tables here are padded to 32 channels and the offsets/rowptr
    lookups go through 8-wide broadcast tables."""
    assert r_cap % CHUNK_RP == 0
    n_bins = n_tiles * N_SUB
    bin_s = (pair_key >> SUB_SHIFT).astype(jnp.int32)
    tri_s = (pair_key & (MAX_TRI - 1)).astype(jnp.int32)
    P = pair_key.shape[0]
    offsets = jnp.searchsorted(
        bin_s, jnp.arange(n_bins + 1, dtype=jnp.int32)).astype(jnp.int32)
    n_pairs = offsets[-1]
    depth = (offsets[1:] - offsets[:-1]).reshape(n_tiles, N_SUB)
    d_tile = depth.max(axis=1)
    d_pad = ((d_tile + CHUNK_RP - 1) // CHUNK_RP) * CHUNK_RP
    rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(d_pad).astype(jnp.int32)])
    n_rows = rowptr[-1]

    p_eff = min(pair_cap, P)
    src32 = jnp.concatenate(
        [src, jnp.zeros((src.shape[0], 32 - src.shape[1]), jnp.float32)],
        axis=1) if src.shape[1] < 32 else src[:, :32]
    src_pair = src32[tri_s[:p_eff]]  # [p_eff, 32] one wide row gather
    ids = (tri_s[:p_eff].astype(jnp.float32) if entry == "tri"
           else jnp.arange(p_eff, dtype=jnp.float32))
    src_pair = src_pair.at[:, CH_PAIR].set(ids)
    # inert dump row (G0 = +1 -> never inside; ZC = 2 fails depth range)
    inert = jnp.zeros((1, 32), jnp.float32).at[0, CH_G[0]].set(1.0)
    inert = inert.at[0, CH_ZC].set(2.0)
    src_pair = jnp.concatenate([src_pair, inert], axis=0)

    # slot -> pair inverse map, then ONE [r_cap*8, 32] row gather.
    # t_r via scatter + MXU-blocked cumsum (searchsorted at this query
    # scale lowers ~3.4x slower); offsets/depth lookups ride a 1-D
    # leading-index 8-wide row gather, which is ~free (see docstring).
    from ascii_renderer_tpu.backends.raster import _cumsum_i32
    r_ids = jnp.arange(r_cap, dtype=jnp.int32)
    marks = jnp.zeros((r_cap,), jnp.float32).at[rowptr[1:]].add(
        1.0, mode="drop")
    t_r = jnp.clip(_cumsum_i32(marks), 0, n_tiles - 1)
    d_r = r_ids - rowptr[:-1][t_r]
    off_rows = offsets[:n_bins].reshape(n_tiles, N_SUB)[t_r]  # [r_cap, 8]
    dep_rows = depth[t_r]
    live = ((d_r[:, None] < dep_rows) & (r_ids < n_rows)[:, None]
            ).reshape(-1)
    pidx = (off_rows + d_r[:, None]).reshape(-1)
    pidx = jnp.where(live & (pidx < p_eff), pidx, p_eff)  # dead -> inert
    g = src_pair[pidx]  # [r_cap*8, 32] one wide flat row gather
    rows128 = g[:, :N_CHAN].reshape(r_cap, N_SUB * N_CHAN)
    rowptr_k = jnp.minimum(rowptr, r_cap)
    return rows128, rowptr_k, n_rows, n_pairs
