"""Pallas TPU megakernel: the full path-trace bounce loop in VMEM.

The XLA formulation of the tracer spends ~46 ms/frame at the default
workload in ~30 fusion boundaries — every bounce stage round-trips its
[P, R] candidate matrices through HBM. This kernel keeps a (8, 128) ray
block entirely in registers/VMEM for the whole path:

  grid = (n_ray_blocks,)
  scene: primitive entries packed 4-per-128-lane-row (32 channels each),
         streamed from VMEM with scalar reads (static lane offsets via a
         4-way unrolled inner loop, the raster_bins.py pattern);
  per bounce: one eager-select primitive stream (t + hit attributes
         computed per prim, winner kept by running min), an any-hit shadow
         stream for NEE, BRDF sampling, Russian roulette;
  RNG:   counter-based per-RAY hash (lowbias32 avalanche of
         (ray uid, seed, draw index)) — a pure function of the ray's
         uid, so the noise a pixel draws is invariant under ANY ray
         placement (adaptive compaction, row-band sharding, block
         assignment) and identical between TPU and interpret mode;
         a different (still deterministic) stream than the XLA path's
         threefry, consistent with the declared RNG non-parity;
  atlas: ASCII-texture fetches become a one-hot MXU matmul gather
         ([rays, texels] @ [texels, 4]); atlases up to MAX_ATLAS_TEXELS
         are supported in-kernel, larger ones fall back to the XLA path.

Semantics match backends/pathtrace.trace_eye_paths (NEE, RR, Fresnel,
glyph short-circuit, LUT shading, candidate order) except the RNG stream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH, BW = 8, 128  # ray block
ATLAS_PROBE = None  # wrong-output perf probes for the atlas block
# (tools/exp_pt_slope.py --probe=...):
#   "skip"   — atlas present but the fetch block is replaced by zeros
#              (no cond, no fetch): its total in-context cost
#   "nocond" — fetch runs UNCONDITIONALLY (no any(texturable) gate):
#              isolates the lax.cond region cost from the fetch compute
BOUNCE_SKIP = False  # per-bounce dead-block skip: wrap each bounce j>=1
# in a scalar any(alive) cond, and the NEE shadow stream in an
# any(alive & ~specular) cond. Bit-identical either way (dead lanes
# never change state; RNG draws are pure functions of uid/seed/draw
# index). MEASURED (r5, canary-gated, config 0 demo room): skip LOSES
# ~9% (321 vs 352 FPS; hd 16.5 vs 17.9) — the reference workload is a
# CLOSED ROOM, rays die only via light-hit/RR, so whole-block death is
# rare while the cond's region boundaries cost real spills (16 (8,128)
# carries per bounce). Kept as a knob for open scenes where most rays
# escape to the env after bounce 1.
N_CHAN = 32
PACK = 4  # entries per 128-lane row
# Entry-stream layout. "vec": entries are lane-replicated [E, N_CHAN, 128]
# vector rows — each channel access is one (1, 128) row slice + sublane
# broadcast on the VPU. "scalar": the packed [rows, 128] descriptor form —
# each channel access is a VMEM scalar read + splat (~20/entry), which the
# round-3 per-HLO profile isolated as the kernel bottleneck (PARITY.md:
# "scalar-read-bound"). vec costs 128x the VMEM (16 KB/entry), so it is
# gated at MAX_VEC_ENTRIES and large scenes fall back to scalar.
PRIM_LAYOUT = "vec"
MAX_VEC_ENTRIES = 256
# Two-level gather budget: atlas lives in VMEM as [2*128, texels/128]
# (8 bytes/texel) and the per-ray cost is O(texels/128 + 128), so the cap
# is VMEM-bound at a 256x256 atlas rather than compute-bound at 32x32.
MAX_ATLAS_TEXELS = 65536
# Hardware dynamic-gather fast path (tpu.dynamic_gather via
# jnp.take_along_axis along lanes): per fetch, each 128-texel slab row is
# sublane-broadcast to the (8, 128) ray block and ONE lane-gather picks
# every ray's texel; a hi where-chain then selects among slabs. Cost is
# O(slabs) vreg-ops per fetch vs the one-hot form's ~2k (the one-hot
# slab-select dot VPU-expands to a [256, 1024] K=4 MAC — measured r5 at
# ~2 us/fetch = 57% of the 960x540 frame, invariant across dot shapes
# because the expansion, not the MXU, binds). Gather moves bits verbatim,
# so values are exact like the one-hot form. Beyond this many slab rows
# the transposed one-hot layout + MXU slab select takes over.
GATHER_MAX_ROWS = 32


def use_gather_layout(atlas_texels: int) -> bool:
    """Static predicate shared by the host packer and the kernel: the
    slab-major [2*rows_t, 128] dynamic-gather layout is used iff the
    atlas fits GATHER_MAX_ROWS slab rows (else the transposed one-hot
    [2*128, rows_t] layout)."""
    return 0 < atlas_texels <= GATHER_MAX_ROWS * 128

# entry channels (shared by spheres and tris; unused fields zero)
# kind: 0 = inert, 1 = sphere, 2 = triangle
C_KIND = 0
C_AX, C_AY, C_AZ = 1, 2, 3          # sphere center | tri unit normal
C_E1X = 4                           # sphere radius | tri plane offset n.a
# Triangles are stored as a precomputed world->barycentric transform
# (normal + plane offset + two affine barycentric rows) instead of
# (a, e1, e2): the in-kernel test needs ~2/3 of Moller-Trumbore's vector
# ops and the geometric normal comes for free. bad_scale = 1e-6/|e1 x e2|
# reproduces MT's |det| < 1e-6 degenerate/parallel cutoff exactly
# (det_MT = -(d.n)*|e1 x e2|).
C_NX, C_NY, C_NZ = 1, 2, 3
C_D0 = 4
C_R1X, C_R1Y, C_R1Z = 5, 6, 7       # u = r1 . p + c1
C_C1 = 8
C_R2X, C_R2Y, C_R2Z = 9, 22, 23     # v = r2 . p + c2
C_C2, C_BADS = 24, 25
C_SHR, C_SHG, C_SHB = 10, 11, 12    # shading albedo (LUT semantics)
C_ISLIGHT, C_ISSPEC, C_TEXTURABLE = 13, 14, 15
C_UVAX, C_UVAY, C_UVBX, C_UVBY, C_UVCX, C_UVCY = 16, 17, 18, 19, 20, 21


def _bits_to_unit(bits):
    # LOGICAL shift: must be uint32 (an int32 arithmetic shift sign-extends
    # and produces negative "uniforms" -> sqrt(negative) = NaN)
    b = pltpu.bitcast(bits, jnp.uint32) if bits.dtype != jnp.uint32 else bits
    mant = (b >> 9) | jnp.uint32(0x3F800000)
    return pltpu.bitcast(mant, jnp.float32) - 1.0


def _make_uniform(seed_scalar, uid_u32):
    """U[0,1) per-ray counter-based sampler: a lowbias32 avalanche hash
    of (ray uid, seed, draw index). The draw a ray sees depends ONLY on
    its uid and the seed — not on its (block, lane) placement — so any
    ray permutation (adaptive compaction, row-band sharding) leaves each
    pixel's noise bit-identical, and TPU and interpret mode produce the
    SAME stream (the hardware PRNG this replaces was per-block-seeded
    and lane-positional, which made block-skip compaction change every
    pixel's noise)."""
    seed_u = seed_scalar.astype(jnp.uint32)
    # draw index as a STATIC Python int, folded into a u32 constant per
    # call site: a traced u32 counter cell would leak tracers across the
    # per-bounce skip cond's region boundary (pallas then rejects the
    # kernel for capturing constants). (k * 0x85EBCA6B) mod 2^32 equals
    # the old u32 multiply bit-for-bit, so every draw is unchanged.
    counter = [0]

    def uniform(shape):
        assert shape == uid_u32.shape
        counter[0] += 1
        kc = jnp.uint32((counter[0] * 0x85EBCA6B) & 0xFFFFFFFF)
        x = uid_u32 ^ (seed_u * jnp.uint32(0x9E3779B1) + kc)
        # lowbias32 finalizer (best-known 2-round 32-bit avalanche)
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        x = x ^ (x >> 16)
        return _bits_to_unit(x)
    return uniform


def _kernel(params_ref, bact_r, prim_hbm, rox_r, roy_r, roz_r, rdx_r,
            rdy_r, rdz_r, uid_r, seed_r, atlas_r,
            lor_r, log_r, lob_r, ov_r, fet_r,
            *, bounces: int, sph_rows: int, n_rows: int, nee: bool,
            atlas_texels: int, atlas_w: int, atlas_h: int,
            vec_layout: bool):
    blk = pl.program_id(0)

    # Per-block adaptive gate (sim/accum active mask -> block granularity):
    # an inactive block writes zeros and skips the whole path loop. The
    # zeros are never folded — accumulate() freezes exactly the pixels
    # whose rays made their block inactive — so adaptive runs follow the
    # IDENTICAL state trajectory as full runs (tested in
    # tests/test_aux_subsystems.py).
    @pl.when(bact_r[blk] == 0)
    def _skip_block():
        zero = jnp.zeros((BH, BW), jnp.float32)
        lor_r[0] = zero
        log_r[0] = zero
        lob_r[0] = zero
        ov_r[0] = zero
        fet_r[0] = zero

    @pl.when(bact_r[blk] != 0)
    def _run_block():
        _kernel_body(seed_r[0], params_ref, prim_hbm, rox_r, roy_r,
                     roz_r, rdx_r, rdy_r, rdz_r, uid_r, atlas_r,
                     lor_r, log_r, lob_r, ov_r, fet_r,
                     bounces=bounces, sph_rows=sph_rows, n_rows=n_rows,
                     nee=nee, atlas_texels=atlas_texels, atlas_w=atlas_w,
                     atlas_h=atlas_h, vec_layout=vec_layout)


def _kernel_body(seed, params_ref, prim_hbm, rox_r, roy_r, roz_r, rdx_r,
                 rdy_r, rdz_r, uid_r, atlas_r,
                 lor_r, log_r, lob_r, ov_r, fet_r,
                 *, bounces: int, sph_rows: int, n_rows: int, nee: bool,
                 atlas_texels: int, atlas_w: int, atlas_h: int,
                 vec_layout: bool):
    uid = pltpu.bitcast(uid_r[0], jnp.uint32)
    _uniform = _make_uniform(seed, uid)

    # scalar params: light cx, cy, cz, radius, lcol r g b, eps
    lcx = params_ref[0]
    lcy = params_ref[1]
    lcz = params_ref[2]
    lrad = params_ref[3]
    lcr = params_ref[4]
    lcg = params_ref[5]
    lcb = params_ref[6]
    eps = params_ref[7]

    rox = rox_r[0]
    roy = roy_r[0]
    roz = roz_r[0]
    rdx = rdx_r[0]
    rdy = rdy_r[0]
    rdz = rdz_r[0]

    Lr = jnp.zeros((BH, BW), jnp.float32)
    Lg = jnp.zeros((BH, BW), jnp.float32)
    Lb = jnp.zeros((BH, BW), jnp.float32)
    Tr = jnp.ones((BH, BW), jnp.float32)
    Tg = jnp.ones((BH, BW), jnp.float32)
    Tb = jnp.ones((BH, BW), jnp.float32)
    spec_f = jnp.ones((BH, BW), jnp.float32)  # 0/1 (Mosaic can't select i1)
    override = jnp.zeros((BH, BW), jnp.float32)

    def prim_stream(ox, oy, oz, dx, dy, dz, want_attrs: bool):
        """Stream primitives in two specialized passes (sphere rows then
        triangle rows — each entry only pays its own math). Winner carry:
        [t, nx, ny, nz, shr, shg, shb, is_light_f, is_spec_f,
        texturable_f, uvx, uvy] (flags as f32 0/1; Mosaic cannot select i1
        vectors through a fori carry). Without want_attrs: (t,).

        Channel access per layout: vec — one (N_CHAN, 128) entry block
        loaded per entry, channels are (1, 128) row slices that sublane-
        broadcast against the (8, 128) ray block; scalar — per-channel
        VMEM scalar reads + splats (the round-3 bottleneck, kept only for
        scenes beyond the vec VMEM budget)."""
        big = jnp.full((BH, BW), jnp.float32(3e38))
        init = [big]
        if want_attrs:
            init += [jnp.zeros((BH, BW), jnp.float32) for _ in range(11)]

        def entry_buf(r, k):
            if vec_layout:
                blk = prim_hbm[r * PACK + k]  # (N_CHAN, 128)
                return lambda c: blk[c:c + 1, :]
            ln = k * N_CHAN
            return lambda c: prim_hbm[r, ln + c]

        def sphere_row(r, carry):
            out = list(carry)
            for k in range(PACK):
                buf = entry_buf(r, k)
                live = buf(C_KIND) > 0.0
                ax = buf(C_AX)
                ay = buf(C_AY)
                az = buf(C_AZ)
                rad = buf(C_E1X)
                ocx = ox - ax
                ocy = oy - ay
                ocz = oz - az
                b = ocx * dx + ocy * dy + ocz * dz
                c = ocx * ocx + ocy * ocy + ocz * ocz - rad * rad
                h = b * b - c
                sq = jnp.sqrt(jnp.maximum(h, 0.0))
                t1 = -b - sq
                t2 = -b + sq
                t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, 3e38))
                t = jnp.where((h >= 0.0) & live, t, 3e38)
                better = t < out[0]
                out[0] = jnp.where(better, t, out[0])
                if want_attrs:
                    inv_r = 1.0 / jnp.maximum(rad, 1e-6)
                    nx = (ox + t * dx - ax) * inv_r
                    ny = (oy + t * dy - ay) * inv_r
                    nz = (oz + t * dz - az) * inv_r
                    vals = [nx, ny, nz,
                            buf(C_SHR), buf(C_SHG), buf(C_SHB),
                            buf(C_ISLIGHT), buf(C_ISSPEC), 0.0, 0.0, 0.0]
                    for q, val in enumerate(vals):
                        out[1 + q] = jnp.where(better, val, out[1 + q])
            return tuple(out)

        def tri_row(r, carry):
            # precomputed-transform test (see the channel-layout comment):
            #   t = (d0 - n.o) / (n.d);  p = o + t d;
            #   u = r1.p + c1;  v = r2.p + c2
            # Same miss conditions as Moller-Trumbore (incl. the redundant
            # u > 1, which MT needs for its NaN/edge behavior); the
            # geometric normal is the stored n, flipped against the ray
            # like MT's normalized e1 x e2. Precision caveat: evaluating
            # the barycentric affine form at the world-space hit point
            # loses ~eps*|p|/edge_length relative to MT's translate-first
            # (o - a) form, so edge hit/miss decisions can differ from MT
            # in fp for scenes far from the origin — fine at this
            # framework's scene scales; store vertex a and evaluate
            # r.(p - a) if large-coordinate scenes ever matter.
            out = list(carry)
            for k in range(PACK):
                buf = entry_buf(r, k)
                live = buf(C_KIND) > 0.0
                nx_ = buf(C_NX)
                ny_ = buf(C_NY)
                nz_ = buf(C_NZ)
                ndotd = nx_ * dx + ny_ * dy + nz_ * dz
                bad = jnp.abs(ndotd) < buf(C_BADS)
                inv = 1.0 / jnp.where(bad, 1.0, ndotd)
                ndoto = nx_ * ox + ny_ * oy + nz_ * oz
                t = (buf(C_D0) - ndoto) * inv
                hpx = ox + t * dx
                hpy = oy + t * dy
                hpz = oz + t * dz
                u = (buf(C_R1X) * hpx + buf(C_R1Y) * hpy
                     + buf(C_R1Z) * hpz + buf(C_C1))
                v = (buf(C_R2X) * hpx + buf(C_R2Y) * hpy
                     + buf(C_R2Z) * hpz + buf(C_C2))
                miss = (bad | (u < 0.0) | (u > 1.0) | (v < 0.0)
                        | (u + v > 1.0) | (t <= eps) | jnp.logical_not(live))
                t = jnp.where(miss, 3e38, t)
                better = t < out[0]
                out[0] = jnp.where(better, t, out[0])
                if want_attrs:
                    flip = ndotd > 0.0
                    cnx = jnp.where(flip, -nx_, nx_)
                    cny = jnp.where(flip, -ny_, ny_)
                    cnz = jnp.where(flip, -nz_, nz_)
                    w0 = 1.0 - u - v
                    uvx = (w0 * buf(C_UVAX) + u * buf(C_UVBX)
                           + v * buf(C_UVCX))
                    uvy = (w0 * buf(C_UVAY) + u * buf(C_UVBY)
                           + v * buf(C_UVCY))
                    vals = [cnx, cny, cnz,
                            buf(C_SHR), buf(C_SHG), buf(C_SHB),
                            buf(C_ISLIGHT), buf(C_ISSPEC),
                            buf(C_TEXTURABLE), uvx, uvy]
                    for q, val in enumerate(vals):
                        out[1 + q] = jnp.where(better, val, out[1 + q])
            return tuple(out)

        carry = jax.lax.fori_loop(0, sph_rows, sphere_row, tuple(init))
        carry = jax.lax.fori_loop(sph_rows, n_rows, tri_row, carry)
        return carry

    def atlas_fetch(uvx, uvy):
        """Nearest-texel atlas gather. Two layouts, one static predicate
        (use_gather_layout, shared with the host packer):

        FAST PATH (atlases <= GATHER_MAX_ROWS slab rows): atlas_r is
        slab-major int32 [rows_t, 128] — sublane r holds texels
        r*128..r*128+127 as bit-packed rgba bytes ((r<<24)|(g<<16)|
        (b<<8)|a, bitcast to i32). Per slab: sublane-broadcast the row
        to (8, 128) and ONE hardware lane-gather (tpu.dynamic_gather via
        take_along_axis axis=1) picks every ray's texel-within-slab; an
        (hi == r) where-chain selects among slabs, then integer shifts
        unpack the four bytes. Gathers and wheres move the 32 bits
        verbatim, so values are exact. O(rows_t) vreg-ops per fetch.

        FALLBACK (larger atlases): atlas_r is transposed [2*128, rows_t]
        (atlas_r[l, r] = texel r*128 + l; sublanes 128.. its alpha) and
        the fetch is the two-level one-hot: per ray-sublane, a
        [rows_t, 128] row one-hot -> [256, rows_t] @ [rows_t, 128] MXU
        dot selects each ray's slab, then a [128, 128] lane one-hot +
        sublane reduction picks the texel. Exact: every one-hot column
        has a single 1, so the HIGHEST-precision dot conveys the f32
        value unchanged. MEASURED (r5): this form VPU-expands to a
        K=rows_t MAC over a [256, 1024] output, ~2 us/fetch regardless
        of dot shape — kept only beyond the gather path's VMEM-cheap
        range. Returns (tr, tg, tb in 0..1, abyte f32, inbounds)."""
        tx = jnp.floor(uvx + 0.5)
        ty = jnp.floor(uvy + 0.5)
        inb = (tx >= 0) & (tx < atlas_w) & (ty >= 0) & (ty < atlas_h)
        lin = jnp.clip(ty * atlas_w + tx, 0, atlas_texels - 1).astype(
            jnp.int32)
        hi = lin >> 7   # [8, 128] slab (row-of-128-texels) index
        lo = lin & 127  # [8, 128] texel within slab

        if use_gather_layout(atlas_texels):
            rows_t = atlas_r.shape[0]
            xi = None
            for r in range(rows_t):  # static unroll over slab rows
                row = jnp.broadcast_to(atlas_r[r:r + 1, :], (BH, BW))
                g = jnp.take_along_axis(row, lo, axis=1)
                xi = g if xi is None else jnp.where(hi == r, g, xi)
            xu = pltpu.bitcast(xi, jnp.uint32)

            def byte_f32(shift):
                # mask to a byte (< 256) then bitcast to i32 for the f32
                # convert (Mosaic has no u32 -> f32 cast)
                b = (xu >> shift) & jnp.uint32(255) if shift else \
                    xu & jnp.uint32(255)
                return pltpu.bitcast(b, jnp.int32).astype(jnp.float32)

            ab = byte_f32(0)
            inv255 = 1.0 / 255.0
            return (byte_f32(24) * inv255, byte_f32(16) * inv255,
                    byte_f32(8) * inv255, ab, inb)
        else:
            rows_t = atlas_r.shape[1]
            a2 = atlas_r[...]  # [256, rows_t]
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (BW, BW), 0)
            packed_rows = []
            ab_rows = []
            for s in range(BH):  # static unroll over ray-block sublanes
                ohh = (jax.lax.broadcasted_iota(
                    jnp.int32, (rows_t, BW), 0)
                    == hi[s:s + 1, :]).astype(jnp.float32)
                slab = jax.lax.dot_general(
                    a2, ohh, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)  # [256, 128]
                ohl = (l_iota == lo[s:s + 1, :]).astype(jnp.float32)
                packed_rows.append(jnp.sum(slab[0:BW] * ohl, axis=0,
                                           keepdims=True))
                ab_rows.append(jnp.sum(slab[BW:2 * BW] * ohl, axis=0,
                                       keepdims=True))
            packed = jnp.concatenate(packed_rows, axis=0)  # [8, 128]
            ab = jnp.concatenate(ab_rows, axis=0)
        r_ = jnp.floor(packed / 65536.0)
        rem = packed - r_ * 65536.0
        g_ = jnp.floor(rem / 256.0)
        b_ = rem - g_ * 256.0
        inv255 = 1.0 / 255.0
        return r_ * inv255, g_ * inv255, b_ * inv255, ab, inb

    def _bounce(j, rox, roy, roz, rdx, rdy, rdz, Lr, Lg, Lb, Tr, Tg, Tb,
                alive_f, spec_f, override, fetched_f):
        """One bounce (specialized per static j). Flags cross the
        per-bounce skip cond as f32 0/1 (Mosaic rejects i1 vectors
        through control-flow region boundaries)."""
        alive = alive_f > 0.5
        fetched = fetched_f > 0.5
        (t, nx, ny, nz, shr, shg, shb, is_light_f, is_spec_f,
         texturable_f, uvx, uvy) = prim_stream(rox, roy, roz, rdx, rdy, rdz,
                                               True)
        is_light = is_light_f > 0.5
        is_spec = is_spec_f > 0.5
        texturable = texturable_f > 0.5
        # light sphere (analytic, not in the entry list)
        ocx = rox - lcx
        ocy = roy - lcy
        ocz = roz - lcz
        b = ocx * rdx + ocy * rdy + ocz * rdz
        c = ocx * ocx + ocy * ocy + ocz * ocz - lrad * lrad
        h = b * b - c
        sq = jnp.sqrt(jnp.maximum(h, 0.0))
        t1 = -b - sq
        t2 = -b + sq
        t_l = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, 3e38))
        t_l = jnp.where(h >= 0.0, t_l, 3e38)
        lwin = t_l < t
        t = jnp.where(lwin, t_l, t)
        is_light = is_light | lwin

        hit = t < 1e30
        # env on miss (shader_utils.js:20-25)
        tt = jnp.clip(rdy * 0.5 + 0.5, 0.0, 1.0) ** 1.2
        s = jnp.clip((rdy + 0.05) / 0.1, 0.0, 1.0)
        s = s * s * (3.0 - 2.0 * s)
        er = 0.063 * (1 - s) + (0.90 * (1 - tt) + 0.45 * tt) * s
        eg = 0.0525 * (1 - s) + (0.95 * (1 - tt) + 0.65 * tt) * s
        eb = 0.042 * (1 - s) + (1.00 * (1 - tt) + 0.95 * tt) * s
        miss = alive & jnp.logical_not(hit)
        Lr = jnp.where(miss, Lr + Tr * er, Lr)
        Lg = jnp.where(miss, Lg + Tg * eg, Lg)
        Lb = jnp.where(miss, Lb + Tb * eb, Lb)
        alive = alive & hit

        lt = alive & is_light & (spec_f > 0.5)
        Lr = jnp.where(lt, Lr + Tr * lcr, Lr)
        Lg = jnp.where(lt, Lg + Tg * lcg, Lg)
        Lb = jnp.where(lt, Lb + Tb * lcb, Lb)
        alive = alive & jnp.logical_not(is_light)

        hx = rox + t * rdx
        hy = roy + t * rdy
        hz = roz + t * rdz

        if atlas_texels > 0:
            def _fetch(_):
                fr, fg, fb, fab, finb = atlas_fetch(uvx, uvy)
                # f32 0/1 flag, not i1: Mosaic rejects bool vectors through
                # control-flow region boundaries
                return fr, fg, fb, fab, finb.astype(jnp.float32)

            def _skip(_):
                zz = jnp.zeros((BH, BW), jnp.float32)
                return zz, zz, zz, zz, zz

            # Gate policy (r5, measured at 960x540 spp8): the dynamic-
            # gather fetch is ~30 vreg-ops, and wrapping it in an
            # any(alive & texturable) lax.cond costs ~4.5 ms/frame MORE
            # than the skips save (30.7 gated vs 26.2 unconditional vs
            # 24.9 fetch-free) — the cond region's spill/refill around a
            # live branch dwarfs its tiny body. So the gather path runs
            # unconditionally. The one-hot fallback's fetch is ~2 us
            # (~32 ms/frame here), where the same gate saved ~8 ms —
            # it keeps the cond. Semantics are identical either way:
            # skipped blocks return zeros, which downstream masks
            # (`sampled` requires texturable) never read.
            gated = not use_gather_layout(atlas_texels)
            if ATLAS_PROBE == "skip":      # wrong-output probe
                txr, txg, txb, ab, inb_f = _skip(0)
            elif ATLAS_PROBE == "nocond":  # wrong-output-free probe
                txr, txg, txb, ab, inb_f = _fetch(0)
            elif ATLAS_PROBE == "dummy":   # wrong-output probe: keep the
                # cond region, make the taken branch trivial — isolates
                # the cond/register-pressure structure from fetch compute
                need = jnp.any(alive & texturable)
                txr, txg, txb, ab, inb_f = jax.lax.cond(need, _skip,
                                                        _skip, 0)
            elif not gated:
                txr, txg, txb, ab, inb_f = _fetch(0)
            else:
                need = jnp.any(alive & texturable)
                txr, txg, txb, ab, inb_f = jax.lax.cond(need, _fetch,
                                                        _skip, 0)
            sampled = alive & texturable & (inb_f > 0.5) & (ab >= 0.5)
            glyph = sampled & (ab >= 31.5) & (ab <= 126.5)
            if j == 0:
                fetched = sampled
                Lr = jnp.where(glyph, txr, Lr)
                Lg = jnp.where(glyph, txg, Lg)
                Lb = jnp.where(glyph, txb, Lb)
                override = jnp.where(glyph, ab, override)
                alive = alive & jnp.logical_not(glyph)
                solid = sampled & (ab < 1.5)
            else:
                solid = sampled  # solid OR glyph-truncated-to-solid
            shr = jnp.where(solid, txr, shr)
            shg = jnp.where(solid, txg, shg)
            shb = jnp.where(solid, txb, shb)

        # ---- next direction (BRDF) ----
        u1 = _uniform((BH, BW))
        u2 = _uniform((BH, BW))
        phi = 6.2831853 * u1
        s2 = jnp.sqrt(1.0 - u2)
        ny_ok = jnp.abs(ny) < 0.999
        axx = jnp.where(ny_ok, 0.0, 1.0)
        axy = jnp.where(ny_ok, 1.0, 0.0)
        # uu = normalize(cross(n, axis)); vv = cross(uu, n)
        ux_ = ny * 0.0 - nz * axy
        uy_ = nz * axx - nx * 0.0
        uz_ = nx * axy - ny * axx
        uinv = jax.lax.rsqrt(jnp.maximum(ux_ * ux_ + uy_ * uy_ + uz_ * uz_,
                                         1e-24))
        ux_ = ux_ * uinv
        uy_ = uy_ * uinv
        uz_ = uz_ * uinv
        vx_ = uy_ * nz - uz_ * ny
        vy_ = uz_ * nx - ux_ * nz
        vz_ = ux_ * ny - uy_ * nx
        cp_ = s2 * jnp.cos(phi)
        sp_ = s2 * jnp.sin(phi)
        sr2 = jnp.sqrt(u2)
        ddx = cp_ * ux_ + sp_ * vx_ + sr2 * nx
        ddy = cp_ * uy_ + sp_ * vy_ + sr2 * ny
        ddz = cp_ * uz_ + sp_ * vz_ + sr2 * nz
        dinv = jax.lax.rsqrt(jnp.maximum(ddx * ddx + ddy * ddy + ddz * ddz,
                                         1e-24))
        ddx = ddx * dinv
        ddy = ddy * dinv
        ddz = ddz * dinv

        # specular branch (shader_utils.js:216-229)
        ndotr = rdx * nx + rdy * ny + rdz * nz
        flip = ndotr > 0.0
        eta = jnp.where(flip, 1.5, 1.0 / 1.5)
        nnx = jnp.where(flip, -nx, nx)
        nny = jnp.where(flip, -ny, ny)
        nnz = jnp.where(flip, -nz, nz)
        r0 = 0.04
        fres = r0 + (1.0 - r0) * (1.0 - jnp.abs(ndotr)) ** 5
        cosi = nnx * rdx + nny * rdy + nnz * rdz
        kk = 1.0 - eta * eta * (1.0 - cosi * cosi)
        tir = kk < 0.0
        f = eta * cosi + jnp.sqrt(jnp.maximum(kk, 0.0))
        rfx = eta * rdx - f * nnx
        rfy = eta * rdy - f * nny
        rfz = eta * rdz - f * nnz
        u3 = _uniform((BH, BW))
        use_reflect = tir | (u3 < fres)
        d2 = rdx * nnx + rdy * nny + rdz * nnz
        rlx = rdx - 2.0 * d2 * nnx
        rly = rdy - 2.0 * d2 * nny
        rlz = rdz - 2.0 * d2 * nnz
        sx_ = jnp.where(use_reflect, rlx, rfx)
        sy_ = jnp.where(use_reflect, rly, rfy)
        sz_ = jnp.where(use_reflect, rlz, rfz)
        sinv = jax.lax.rsqrt(jnp.maximum(sx_ * sx_ + sy_ * sy_ + sz_ * sz_,
                                         1e-24))
        sx_ = sx_ * sinv
        sy_ = sy_ * sinv
        sz_ = sz_ * sinv

        ndx = jnp.where(is_spec, sx_, ddx)
        ndy = jnp.where(is_spec, sy_, ddy)
        ndz = jnp.where(is_spec, sz_, ddz)
        spec_now = is_spec

        ndn = ndx * nx + ndy * ny + ndz * nz
        absorb = alive & (jnp.logical_not(spec_now) | (ndn < 0.0))
        Tr = jnp.where(absorb, Tr * shr, Tr)
        Tg = jnp.where(absorb, Tg * shg, Tg)
        Tb = jnp.where(absorb, Tb * shb, Tb)

        # ---- NEE (pathtrace_shader.js:159-169) ----
        if nee and j < bounces - 1:
            # Shadow-stream gate: NEE contributes only to alive diffuse
            # lanes, so a block that is all-dead-or-specular this bounce
            # skips the whole t-only entry stream. Bit-identical: the
            # skip fires only when `contrib` would be all-false (every L
            # update below is contrib-gated), and the h1/h2 draws are
            # pure functions of (uid, seed, trace position), unchanged
            # by the runtime branch.
            def _nee(L3):
                Lr, Lg, Lb = L3
                h1 = _uniform((BH, BW)) * 2.0 - 1.0
                h2 = _uniform((BH, BW)) * 6.2831853
                sl = jnp.sqrt(jnp.maximum(1.0 - h1 * h1, 0.0))
                lpx = lcx + lrad * sl * jnp.sin(h2)
                lpy = lcy + lrad * sl * jnp.cos(h2)
                lpz = lcz + lrad * h1
                ldx = lpx - hx
                ldy = lpy - hy
                ldz = lpz - hz
                dist = jnp.sqrt(jnp.maximum(
                    ldx * ldx + ldy * ldy + ldz * ldz, 1e-24))
                ldx = ldx / dist
                ldy = ldy / dist
                ldz = ldz / dist
                sox = hx + nx * eps
                soy = hy + ny * eps
                soz = hz + nz * eps
                (t_sh,) = prim_stream(sox, soy, soz, ldx, ldy, ldz, False)
                shadowed = t_sh < dist
                dlx = lcx - hx
                dly = lcy - hy
                dlz = lcz - hz
                dd2 = jnp.maximum(dlx * dlx + dly * dly + dlz * dlz, 1e-12)
                cam = jnp.sqrt(1.0 - jnp.clip(lrad * lrad / dd2, 0.0, 1.0))
                wgt = 2.0 * (1.0 - cam)
                ndl = jnp.maximum(ldx * nx + ldy * ny + ldz * nz, 0.0)
                contrib = alive & jnp.logical_not(spec_now) & \
                    jnp.logical_not(shadowed)
                wnd = wgt * ndl
                Lr = jnp.where(contrib, Lr + Tr * lcr * wnd, Lr)
                Lg = jnp.where(contrib, Lg + Tg * lcg * wnd, Lg)
                Lb = jnp.where(contrib, Lb + Tb * lcb * wnd, Lb)
                return Lr, Lg, Lb

            if BOUNCE_SKIP:
                need_nee = jnp.any(alive & jnp.logical_not(spec_now))
                Lr, Lg, Lb = jax.lax.cond(need_nee, _nee, lambda L3: L3,
                                          (Lr, Lg, Lb))
            else:
                Lr, Lg, Lb = _nee((Lr, Lg, Lb))

        side = jnp.where(ndn > 0.0, eps, -eps)
        rox = jnp.where(alive, hx + nx * side, rox)
        roy = jnp.where(alive, hy + ny * side, roy)
        roz = jnp.where(alive, hz + nz * side, roz)
        rdx = jnp.where(alive, ndx, rdx)
        rdy = jnp.where(alive, ndy, rdy)
        rdz = jnp.where(alive, ndz, rdz)
        spec_f = jnp.where(alive, is_spec_f, spec_f)

        if j >= 2:  # Russian roulette
            pmax = jnp.clip(jnp.maximum(Tr, jnp.maximum(Tg, Tb)), 0.05, 0.95)
            u4 = _uniform((BH, BW))
            alive = alive & jnp.logical_not(u4 > pmax)
            ipm = 1.0 / pmax
            Tr = jnp.where(alive, Tr * ipm, Tr)
            Tg = jnp.where(alive, Tg * ipm, Tg)
            Tb = jnp.where(alive, Tb * ipm, Tb)

        return (rox, roy, roz, rdx, rdy, rdz, Lr, Lg, Lb, Tr, Tg, Tb,
                alive.astype(jnp.float32), spec_f, override,
                fetched.astype(jnp.float32))

    state = (rox, roy, roz, rdx, rdy, rdz, Lr, Lg, Lb, Tr, Tg, Tb,
             jnp.ones((BH, BW), jnp.float32), spec_f, override,
             jnp.zeros((BH, BW), jnp.float32))
    ALIVE_F = 12  # state index of the alive flag plane
    for j in range(bounces):
        if j == 0 or not BOUNCE_SKIP:
            state = _bounce(j, *state)  # every lane starts alive at j=0
        else:
            # Dead-block bounce skip (BOUNCE_SKIP knob — measured ~9%
            # WORSE on the closed-room reference workload, see the flag
            # comment): once a whole (8, 128) block is dead, every later
            # entry-stream pass over it is waste. Bit-identical: dead
            # lanes never change state in the body (every update is
            # alive-gated), and each lane's RNG draws are pure functions
            # of (uid, seed, trace position), so skipping a block cannot
            # perturb any other block or any later frame.
            state = jax.lax.cond(
                jnp.any(state[ALIVE_F] > 0.5),
                lambda s, j=j: _bounce(j, *s), lambda s: s, state)

    (_rox, _roy, _roz, _rdx, _rdy, _rdz, Lr, Lg, Lb, _Tr, _Tg, _Tb,
     _alive_f, _spec_f, override, fetched_f) = state

    lor_r[0] = Lr
    log_r[0] = Lg
    lob_r[0] = Lb
    ov_r[0] = override
    fet_r[0] = fetched_f


def trace_blocks(params, prim_packed, ro, rd, seed, atlas_flat, *,
                 bounces: int, nee: bool, atlas_w: int, atlas_h: int,
                 sph_rows: int, interpret: bool | None = None,
                 block_active=None, uid=None):
    """params f32 [8]; prim_packed f32 [rows, 128]; ro/rd f32 [B, 8, 128, 3]
    (B ray blocks); seed i32 scalar; atlas_flat in the layout
    use_gather_layout(texels) selects — slab-major i32 rgba [rows_t, 128]
    for the dynamic-gather fast path, transposed f32 [2*128, rows_t]
    beyond it (see _kernel.atlas_fetch); if the atlas is disabled pass
    any zero f32 block and atlas_w = atlas_h = 0. block_active: optional i32 [B]
    adaptive gate (0 = skip the block, outputs zero). uid: optional i32
    [B, 8, 128] per-ray RNG ids (default: the ray's stream position) —
    the noise a ray draws is a pure function of (uid, seed), so callers
    that permute rays (adaptive compaction) pass the canonical ids to
    keep each pixel's noise placement-invariant.

    Returns (lo [B,8,128,3], override [B,8,128], fetched [B,8,128])."""
    lor, log, lob, ov, fet = trace_blocks_raw(
        params, prim_packed, ro, rd, seed, atlas_flat, bounces=bounces,
        nee=nee, atlas_w=atlas_w, atlas_h=atlas_h, sph_rows=sph_rows,
        interpret=interpret, block_active=block_active, uid=uid)
    lo = jnp.stack([lor, log, lob], axis=-1)
    return lo, ov, fet


def trace_blocks_raw(params, prim_packed, ro, rd, seed, atlas_flat, *,
                     bounces: int, nee: bool, atlas_w: int, atlas_h: int,
                     sph_rows: int, interpret: bool | None = None,
                     layout: str | None = None, block_active=None,
                     uid=None):
    """trace_blocks without the [..., 3] stack: returns the kernel's
    native channel-separate outputs (lor, log, lob, ov, fet), each f32
    [B, 8, 128]. The stack to image-space [..., 3] arrays costs ~0.5 ms
    of degenerate-layout relayouts per 64-sample batch at the bench
    workload (tools/profile_trace.py --pt) — consumers that reduce over
    samples should stay in this packed channel layout
    (backends/pathtrace.render_pt).

    layout: None = auto (PRIM_LAYOUT, falling back to "scalar" beyond
    MAX_VEC_ENTRIES); "vec"/"scalar" force one (tests, A/Bs). Both
    layouts are bit-identical: same candidate order, same arithmetic —
    only the channel-access instruction class differs."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B = ro.shape[0]
    n_rows = prim_packed.shape[0]
    n_entries = n_rows * PACK
    if layout is None:
        layout = ("vec" if PRIM_LAYOUT == "vec"
                  and n_entries <= MAX_VEC_ENTRIES else "scalar")
    if layout == "vec":
        # lane-replicate on device: packing runs inside the jitted frame,
        # so this is a [E, N_CHAN] -> [E, N_CHAN, 128] broadcast per trace
        # (~16 KB/entry of VMEM; scene-size gated above)
        prim_in = jnp.broadcast_to(
            prim_packed.reshape(n_entries, N_CHAN)[:, :, None],
            (n_entries, N_CHAN, BW))
    else:
        prim_in = prim_packed
    atlas_texels = atlas_w * atlas_h if atlas_w > 0 else 0
    if use_gather_layout(atlas_texels):
        assert atlas_texels <= atlas_flat.shape[0] * 128
        assert atlas_flat.dtype == jnp.int32
    else:
        assert atlas_texels <= atlas_flat.shape[1] * 128
    kernel = functools.partial(
        _kernel, bounces=bounces, sph_rows=sph_rows, n_rows=n_rows, nee=nee,
        atlas_texels=atlas_texels, atlas_w=atlas_w, atlas_h=atlas_h,
        vec_layout=(layout == "vec"))

    def comp_spec():
        return pl.BlockSpec((1, BH, BW), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    if block_active is None:
        block_active = jnp.ones((B,), jnp.int32)
    else:
        block_active = block_active.astype(jnp.int32)
    if uid is None:  # canonical stream position
        uid = jnp.arange(B * BH * BW, dtype=jnp.int32).reshape(B, BH, BW)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            comp_spec(), comp_spec(), comp_spec(),
            comp_spec(), comp_spec(), comp_spec(),
            comp_spec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(comp_spec() for _ in range(5)),
    )
    outs = (jax.ShapeDtypeStruct((B, BH, BW), jnp.float32),) * 5
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=outs, interpret=interpret,
    )(params, block_active, prim_in,
      ro[..., 0], ro[..., 1], ro[..., 2],
      rd[..., 0], rd[..., 1], rd[..., 2],
      uid, seed_arr, atlas_flat)
