"""Pallas TPU kernel: binned rasterization with dynamic per-tile bins.

Replaces an earlier fixed-slot-table kernel design which
capped each tile at `slots` triangles and silently dropped the rest beyond a
small spill buffer — at bunny scale hot tiles hold thousands of triangles
(max measured 4572 vs a 256 cap). Here every tile walks its EXACT bin:

  XLA prep: (tile, tri) pairs -> one packed sort -> per-tile offsets via
  searchsorted -> triangle channel data pre-gathered into sorted-pair order.

  kernel: grid (n_tiles,), offsets ride scalar prefetch (SMEM). Each tile
  runs a DYNAMIC fori over its chunks; each chunk DMAs a slab of the sorted
  data into VMEM and evaluates its triangles against the (8, 128)-pixel
  tile. Work is proportional to actual bin sizes — empty tiles cost
  ~nothing, dense tiles take as many chunks as they need, nothing dropped.

Memory layout: HBM DMA slices must span full 128-lane rows, so pair entries
pack 8-to-a-row: data [P/8, 128] where lanes [k*16, k*16+16) hold entry k's
channels. The kernel's inner loop over k is a static 8-way unroll, so every
lane index is static (Mosaic requirement); the sublane index may be dynamic.

Entries are stored in PLANE form, not vertex form: the three edge functions
w_k(p) = A_k px + B_k py + G_k and the screen-linear depth plane
z(p) = ZX px + ZY py + ZC (z = sum_k w_k z_k / area is itself affine in the
pixel coords because area = w0+w1+w2 is constant). The XLA prep computes
the 12 coefficients once per (tile, tri) pair source triangle; the kernel
then runs 3 FMA pairs + 1 for depth per entry with NO per-pixel divide
(the vertex form cost a vector divide per entry-tile evaluation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 8, 128
N_CHAN = 16
PACK = 8  # entries per 128-lane row
CHUNK_ROWS = 32  # packed rows per DMA slab -> 256 entries
CHUNK = PACK * CHUNK_ROWS

CH_A0, CH_B0, CH_G0 = 0, 1, 2  # edge 0 plane: w0 = A0*px + B0*py + G0
CH_A1, CH_B1, CH_G1 = 3, 4, 5
CH_A2, CH_B2, CH_G2 = 6, 7, 8
CH_ZX, CH_ZY, CH_ZC = 9, 10, 11  # depth plane: z = ZX*px + ZY*py + ZC
CH_VALID = 12
CH_TID = 13


def _kernel(off_ref, data_hbm, z_ref, t_ref, buf, sem, *, tiles_x: int):
    i = pl.program_id(0)
    ty = i // tiles_x
    tx = i % tiles_x
    py = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + ty.astype(jnp.float32) * TILE_H + 0.5)
    px = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          .astype(jnp.float32) + tx.astype(jnp.float32) * TILE_W + 0.5)

    off0 = off_ref[i]  # entry (pair) indices
    off1 = off_ref[i + 1]
    # DMA row offsets must be 8-row aligned -> entry alignment 64
    start = (off0 // (8 * PACK)) * (8 * PACK)
    # empty bins must run ZERO chunks (the aligned start would otherwise
    # round a 0-length bin up to one full wasted chunk per tile)
    n_chunks = jnp.where(off1 > off0,
                         (off1 - start + CHUNK - 1) // CHUNK, 0)

    def chunk_body(c, carry):
        zbest, tbest = carry
        base = start + c * CHUNK  # entry index of this slab
        cp = pltpu.make_async_copy(
            data_hbm.at[pl.ds(base // PACK, CHUNK_ROWS)], buf, sem)
        cp.start()
        cp.wait()

        def row_body(r, carry2):
            zb, tb = carry2
            for k in range(PACK):  # static unroll -> static lane offsets
                lane = k * N_CHAN
                p = base + r * PACK + k
                live = (p >= off0) & (p < off1) & (buf[r, lane + CH_VALID] > 0.0)
                w0 = (buf[r, lane + CH_A0] * px + buf[r, lane + CH_B0] * py
                      + buf[r, lane + CH_G0])
                w1 = (buf[r, lane + CH_A1] * px + buf[r, lane + CH_B1] * py
                      + buf[r, lane + CH_G1])
                w2 = (buf[r, lane + CH_A2] * px + buf[r, lane + CH_B2] * py
                      + buf[r, lane + CH_G2])
                inside = (w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0) & live
                z = (buf[r, lane + CH_ZX] * px + buf[r, lane + CH_ZY] * py
                     + buf[r, lane + CH_ZC])
                ok = inside & (z >= 0.0) & (z <= 1.0)
                z = jnp.where(ok, z, jnp.inf)
                better = z < zb  # strict: earlier (smaller tri id) wins ties
                zb = jnp.where(better, z, zb)
                tb = jnp.where(better, buf[r, lane + CH_TID], tb)
            return zb, tb

        return jax.lax.fori_loop(0, CHUNK_ROWS, row_body, (zbest, tbest))

    z0 = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    t0 = jnp.full((TILE_H, TILE_W), -1.0, jnp.float32)
    zb, tb = jax.lax.fori_loop(0, n_chunks, chunk_body, (z0, t0))
    z_ref[0, ...] = zb
    t_ref[0, ...] = tb


def pack_entries(data: jnp.ndarray) -> jnp.ndarray:
    """[P, N_CHAN] entries (P a multiple of PACK) -> packed [P/PACK, 128]."""
    p = data.shape[0]
    assert p % PACK == 0
    return data.reshape(p // PACK, PACK * N_CHAN)


def tile_eval_bins(data_packed: jnp.ndarray, offsets: jnp.ndarray,
                   tiles_x: int, n_tiles: int,
                   interpret: bool | None = None):
    """data_packed f32 [P/8, 128] (see pack_entries; include >= CHUNK+64
    inert trailing entries); offsets i32 [n_tiles + 1] in ENTRY units ->
    (z [n_tiles, 8, 128] f32, tid f32 [n_tiles, 8, 128], -1 = none)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_kernel, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((CHUNK_ROWS, PACK * N_CHAN), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32)),
        interpret=interpret,
    )(offsets, data_packed)


# --------------------------------------------------------------------------
# MXU array-form variant: 128-entry chunks, plane evaluation as matmuls
# --------------------------------------------------------------------------
MM_CHUNK = 128  # entries per chunk == lane width


PIX = TILE_H * TILE_W  # 1024 pixels per tile, flattened row-major


def _kernel_mm(off_ref, data_hbm, z_ref, t_ref, buf, sem, *, tiles_x: int):
    """Array-form bin walk. Each chunk holds 128 entries channel-major
    ([16 chan, 128 entries]). All four planes (3 edges + depth) of all 128
    entries are evaluated against ALL 1024 tile pixels with ONE
    [3,512]^T @ [3,1024] MXU dot per chunk: the lhs packs the four plane
    coefficient triples side by side on lanes, so rows [0:128) of the
    [512, 1024] product are w0, [128:256) w1, [256:384) w2, [384:512) z.
    The winner is a min-reduction over the entry axis — no per-entry
    scalar loads at all. HIGHEST precision keeps the bf16x3-pass dots
    f32-faithful (plane coefficients of near-clipped triangles reach 1e10;
    single-pass bf16 shifts edges by hundreds of pixels). Tie-breaking
    matches the sequential kernel: within a chunk the smallest tri id among
    depth-equal winners (bins are sorted by tri id), across chunks strict
    less-than."""
    i = pl.program_id(0)
    ty = i // tiles_x
    tx = i % tiles_x

    off0 = off_ref[i]
    off1 = off_ref[i + 1]
    start = (off0 // MM_CHUNK) * MM_CHUNK
    n_chunks = jnp.where(off1 > off0,
                         (off1 - start + MM_CHUNK - 1) // MM_CHUNK, 0)

    # rhs [3, 1024]: rows = (px, py, 1) for the flattened tile pixels
    pidx = jax.lax.broadcasted_iota(jnp.int32, (3, PIX), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (3, PIX), 0)
    pr = pidx // TILE_W
    pc = pidx - pr * TILE_W
    pxv = (pc + tx * TILE_W).astype(jnp.float32) + 0.5
    pyv = (pr + ty * TILE_H).astype(jnp.float32) + 0.5
    rhs = jnp.where(rowi == 0, pxv, jnp.where(rowi == 1, pyv, 1.0))

    dn = (((0,), (0,)), ((), ()))
    onesr = jnp.ones((1, PIX), jnp.float32)

    def chunk_body(c, carry):
        base = start + c * MM_CHUNK
        cp = pltpu.make_async_copy(data_hbm.at[base // MM_CHUNK], buf, sem)
        cp.start()
        cp.wait()
        lhs4 = jnp.concatenate(
            [buf[0:3, :], buf[3:6, :], buf[6:9, :], buf[9:12, :]], axis=1)
        big = jax.lax.dot_general(lhs4, rhs, dn,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32)
        w0 = big[0 * MM_CHUNK:1 * MM_CHUNK]
        w1 = big[1 * MM_CHUNK:2 * MM_CHUNK]
        w2 = big[2 * MM_CHUNK:3 * MM_CHUNK]
        z = big[3 * MM_CHUNK:4 * MM_CHUNK]
        # tid broadcast onto the entry (sublane) axis via a K=1 matmul —
        # the cheap in-kernel way to transpose a lane vector
        tidm = jax.lax.dot_general(buf[13:14, :], onesr, dn,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        eidx = base + jax.lax.broadcasted_iota(jnp.int32, (MM_CHUNK, PIX), 0)
        liv = (eidx >= off0) & (eidx < off1)
        ok = ((w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0) & liv
              & (z >= 0.0) & (z <= 1.0))
        zm = jnp.where(ok, z, jnp.inf)
        # reduce per 128-pixel group (static lane slices — a [PIX] result
        # could not be reshaped to the (8, 128) output block in-kernel)
        out = list(carry)  # z rows then t rows, 2*TILE_H of [TILE_W]
        for r in range(TILE_H):
            zmr = zm[:, r * TILE_W:(r + 1) * TILE_W]
            tmr = tidm[:, r * TILE_W:(r + 1) * TILE_W]
            zrow = jnp.min(zmr, axis=0)  # [TILE_W]
            trow = jnp.min(jnp.where(zmr == zrow[None, :], tmr, jnp.inf),
                           axis=0)
            better = zrow < out[r]
            out[r] = jnp.where(better, zrow, out[r])
            out[TILE_H + r] = jnp.where(better, trow, out[TILE_H + r])
        return tuple(out)

    init = ([jnp.full((TILE_W,), jnp.inf, jnp.float32)] * TILE_H
            + [jnp.full((TILE_W,), -1.0, jnp.float32)] * TILE_H)
    fin = jax.lax.fori_loop(0, n_chunks, chunk_body, tuple(init))
    for r in range(TILE_H):
        z_ref[0, r, :] = fin[r]
        t_ref[0, r, :] = fin[TILE_H + r]


def tile_eval_bins_mm(data_mm: jnp.ndarray, offsets: jnp.ndarray,
                      tiles_x: int, n_tiles: int,
                      interpret: bool | None = None):
    """data_mm f32 [P/128, N_CHAN, 128] (channel-major 128-entry chunks;
    include >= 2*MM_CHUNK inert trailing entries); offsets i32 [n_tiles+1]
    in ENTRY units -> (z, tid) as in tile_eval_bins ([n_tiles, 8, 128])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_kernel_mm, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((N_CHAN, MM_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32)),
        interpret=interpret,
    )(offsets, data_mm)


# --------------------------------------------------------------------------
# Fused-shading variant: interpolate + light inside the walk
# --------------------------------------------------------------------------
NS_CHAN = 64
NS_PACK = 2  # entries per 128-lane row

S_VALID = 0
S_X0, S_X1, S_X2 = 1, 2, 3
S_Y0, S_Y1, S_Y2 = 4, 5, 6
S_Z0, S_Z1, S_Z2 = 7, 8, 9
S_IW0, S_IW1, S_IW2 = 10, 11, 12
S_ATTR = 13  # 9 attrs (nx ny nz cr cg cb wx wy wz) x 3 vertices = 27 ch
S_CHUNK_ROWS = 32
S_CHUNK = NS_PACK * S_CHUNK_ROWS

# light params layout (SMEM f32 [64]):
#   0..2 ambient rgb, 3..5 dir-light dir, 6..8 dir-light col, 9 n_point,
#   10 + 6*i .. : point light i (pos xyz, col rgb), up to 8
L_MAX_PL = 8


def _shaded_kernel(off_ref, data_hbm, light_ref, rgb_r, buf, sem,
                   *, tiles_x: int):
    i = pl.program_id(0)
    ty = i // tiles_x
    tx = i % tiles_x
    py = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + ty.astype(jnp.float32) * TILE_H + 0.5)
    px = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          .astype(jnp.float32) + tx.astype(jnp.float32) * TILE_W + 0.5)

    off0 = off_ref[i]
    off1 = off_ref[i + 1]
    start = (off0 // (8 * NS_PACK)) * (8 * NS_PACK)
    n_chunks = jnp.where(off1 > off0,
                         (off1 - start + S_CHUNK - 1) // S_CHUNK, 0)

    zero = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    carry0 = (jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32),) + (zero,) * 9

    def chunk_body(c, carry):
        base = start + c * S_CHUNK
        cp = pltpu.make_async_copy(
            data_hbm.at[pl.ds(base // NS_PACK, S_CHUNK_ROWS)], buf, sem)
        cp.start()
        cp.wait()

        def row_body(r, carry2):
            out = list(carry2)
            for k in range(NS_PACK):
                ln = k * NS_CHAN
                b_ = lambda ch: buf[r, ln + ch]
                p = base + r * NS_PACK + k
                live = (p >= off0) & (p < off1) & (b_(S_VALID) > 0.0)
                x0 = b_(S_X0)
                x1 = b_(S_X1)
                x2 = b_(S_X2)
                y0 = b_(S_Y0)
                y1 = b_(S_Y1)
                y2 = b_(S_Y2)
                w0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
                w1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
                w2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
                area = w0 + w1 + w2
                inside = (w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0) & live
                inv_area = 1.0 / area
                z = (w0 * b_(S_Z0) + w1 * b_(S_Z1) + w2 * b_(S_Z2)) * inv_area
                ok = inside & (z >= 0.0) & (z <= 1.0)
                z = jnp.where(ok, z, jnp.inf)
                better = z < out[0]
                out[0] = jnp.where(better, z, out[0])
                # perspective-correct barycentrics
                bw0 = w0 * b_(S_IW0)
                bw1 = w1 * b_(S_IW1)
                bw2 = w2 * b_(S_IW2)
                dnm = bw0 + bw1 + bw2
                inv_dnm = 1.0 / jnp.where(jnp.abs(dnm) < 1e-30, 1e-30, dnm)
                p0 = bw0 * inv_dnm
                p1 = bw1 * inv_dnm
                p2 = bw2 * inv_dnm
                for a in range(9):
                    val = (p0 * b_(S_ATTR + a) + p1 * b_(S_ATTR + 9 + a)
                           + p2 * b_(S_ATTR + 18 + a))
                    out[1 + a] = jnp.where(better, val, out[1 + a])
            return tuple(out)

        return jax.lax.fori_loop(0, S_CHUNK_ROWS, row_body, carry)

    st = jax.lax.fori_loop(0, n_chunks, chunk_body, carry0)
    zb = st[0]
    nx, ny, nz, cr, cg, cb, wx, wy_, wz = st[1:]
    hit = zb < jnp.inf

    inv_nl = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
    nx = nx * inv_nl
    ny = ny * inv_nl
    nz = nz * inv_nl

    amb_r = light_ref[0]
    amb_g = light_ref[1]
    amb_b = light_ref[2]
    ddx = light_ref[3]
    ddy = light_ref[4]
    ddz = light_ref[5]
    dcr = light_ref[6]
    dcg = light_ref[7]
    dcb = light_ref[8]
    n_pl = light_ref[9]
    ndl = jnp.maximum(-(nx * ddx + ny * ddy + nz * ddz), 0.0)
    orr = cr * (amb_r + dcr * ndl)
    og = cg * (amb_g + dcg * ndl)
    ob = cb * (amb_b + dcb * ndl)
    for pi in range(L_MAX_PL):
        base = 10 + 6 * pi
        lx = light_ref[base + 0] - wx
        ly = light_ref[base + 1] - wy_
        lz = light_ref[base + 2] - wz
        d2 = jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-4)
        inv_d = jax.lax.rsqrt(d2)
        ndlp = jnp.maximum((nx * lx + ny * ly + nz * lz) * inv_d, 0.0)
        att = 1.0 / (1.0 + d2 * 0.05)
        on = jnp.where(n_pl > pi + 0.5, ndlp * att, 0.0)
        orr = orr + cr * light_ref[base + 3] * on
        og = og + cg * light_ref[base + 4] * on
        ob = ob + cb * light_ref[base + 5] * on

    rgb_r[0, 0] = jnp.where(hit, jnp.clip(orr, 0.0, 1.0), 0.0)
    rgb_r[0, 1] = jnp.where(hit, jnp.clip(og, 0.0, 1.0), 0.0)
    rgb_r[0, 2] = jnp.where(hit, jnp.clip(ob, 0.0, 1.0), 0.0)


def tile_eval_bins_shaded(data_packed: jnp.ndarray, offsets: jnp.ndarray,
                          light_params: jnp.ndarray, tiles_x: int,
                          n_tiles: int, interpret: bool | None = None):
    """Fused walk + perspective-correct interpolation + fragment lighting.

    data_packed f32 [P/2, 128] (NS_CHAN=64-channel entries, 2 per row);
    light_params f32 [64] (see layout above) -> rgb [n_tiles, 3, 8, 128]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(_shaded_kernel, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 3, TILE_H, TILE_W),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S_CHUNK_ROWS, NS_PACK * NS_CHAN), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 3, TILE_H, TILE_W),
                                       jnp.float32),
        interpret=interpret,
    )(offsets, data_packed, light_params)
