"""Forward rasterizer backend (ref: raster.js + raster_shader.js).

TPU-native redesign, not a GL translation:

  1. **Vertex pipeline** — one MXU matmul transforms every vertex by the
     MVP (lookAt/perspective semantics of raster.js:15-45, pixel aspect in
     the projection), followed by branchless near-plane clipping in clip
     space with a static x2 triangle expansion (GL clips primitives in
     hardware; XLA wants static shapes).
  2. **Visibility buffer** — a `lax.scan` over triangle chunks rasterizes
     into a per-pixel (depth, triangle-id) pair: edge functions + barycentric
     depth (screen-space linear, like gl_FragCoord.z), z-test by min-merge.
     No per-pixel loops; each chunk step is a dense [C, H, W] VPU program.
  3. **Deferred shading** — one gather fetches the winning triangle's
     vertices per pixel, re-derives perspective-correct barycentrics, and
     evaluates the reference's fragment lighting (ambient + one directional
     + up to 8 unshadowed point lights, raster_shader.js:42-62).

Reference behaviors preserved:
  - camera mapping identical to the tracers ("MATCH PT", raster.js:40-45);
  - near=0.05 / far=100 projection (raster.js:299);
  - back-face culling of clockwise-in-window-coords faces (raster.js:100-102;
    our row-major y-down screen space flips the sign, see `_AREA_FRONT`);
  - default directional light when the scene provides none
    (raster.js:66-69,307-315); ambient = env color * intensity;
  - point-light attenuation 1/(1 + d^2*0.05), no shadows.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.geom.tessellate import tessellate_scene
from ascii_renderer_tpu.scene.builder import SceneData

from ascii_renderer_tpu.backends.raster_common import (  # noqa: F401
    FAR, MAX_V_CAP, NEAR, TILE_H, TILE_W, _DEFAULT_AMBIENT, _DEFAULT_DIR,
    _DEFAULT_DIR_COL, _cumsum_i32, _round_up, _shade_rows, shade_from_table)
from ascii_renderer_tpu.backends.raster_channels import (  # noqa: F401
    _COMPACT_KEYS, _clip_channels_core, _edge, build_plane_table,
    channels_clip_array, channels_to_setup, clip_attrs_channel_lists,
    clip_attrs_channels, clip_attrs_compact_lists, compact_valid_ch,
    count_big_small, render_channels_diag, setup_screen,
    setup_screen_channels, shade_planes_ch, shade_visibility,
    transform_clip, transform_clip_channels, transform_clip_channels9,
    visibility_binned, visibility_binned_ch, visibility_scan)
from ascii_renderer_tpu.backends.raster_oracles import (  # noqa: F401
    _build_bins, _entry_planes_src, _subtile_pair_keys, render_fused_ch,
    render_subtile2_diag, shade_tiles_compact, suggest_caps_subtile,
    visibility_subtile, visibility_subtile_tiles)

# --------------------------------------------------------------------------
# Matrices (semantics of raster.js:15-45)
# --------------------------------------------------------------------------
def perspective(fovy_rad: float, aspect: float, near: float = NEAR,
                far: float = FAR) -> jnp.ndarray:
    f = 1.0 / jnp.tan(jnp.maximum(1e-6, fovy_rad * 0.5))
    nf = 1.0 / (near - far)
    return jnp.array([
        [f / aspect, 0, 0, 0],
        [0, f, 0, 0],
        [0, 0, (far + near) * nf, 2 * far * near * nf],
        [0, 0, -1, 0],
    ], dtype=jnp.float32)


def look_at(eye: jnp.ndarray, center: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    f = center - eye
    f = f / jnp.linalg.norm(f)
    s = jnp.cross(f, up)
    s = s / jnp.linalg.norm(s)
    u = jnp.cross(s, f)
    m = jnp.stack([s, u, -f])  # rows
    t = -m @ eye
    return jnp.concatenate([
        jnp.concatenate([m, t[:, None]], axis=1),
        jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=jnp.float32),
    ], axis=0)


def camera_mvp(cam: Camera, rows: int, cols: int, pixel_aspect: float) -> jnp.ndarray:
    cp, sp = jnp.cos(cam.pitch), jnp.sin(cam.pitch)
    cy, sy = jnp.cos(cam.yaw), jnp.sin(cam.yaw)
    look = jnp.stack([cp * cy, sp, cp * sy])
    aspect = jnp.maximum(1e-6, (cols / max(1, rows)) * pixel_aspect)
    proj = perspective(cam.fov_y, aspect)
    view = look_at(cam.pos, cam.pos + look, jnp.array([0.0, 1.0, 0.0], jnp.float32))
    return proj @ view


def positions_to_pos9(positions) -> jnp.ndarray:
    """Static per-scene prep: soup positions f32 [V=3T, 3] -> channel-major
    pos9 f32 [9, T] (rows xa ya za xb yb zb xc yc zc). Hoisting this
    transpose out of the frame loop lets the vertex stage run as pure
    fusable channel FMAs (no per-frame matmul or [T,12] relayout)."""
    V = positions.shape[0]
    return jnp.asarray(positions).reshape(V // 3, 3, 3).transpose(1, 2, 0) \
        .reshape(9, V // 3)



# --------------------------------------------------------------------------
# 2-D homogeneous setup (Olano-Greer): planes from the clip-matrix adjoint
# --------------------------------------------------------------------------
EPS_W = 1e-4  # near-guard for projections used ONLY by binning bboxes


def setup_2dh(pos9: jnp.ndarray, attrs_t: jnp.ndarray, mvp: jnp.ndarray,
              rows: int, cols: int):
    """Triangle setup in 2-D homogeneous coordinates: every per-pixel
    plane (edges, depth, attributes, perspective denominator) comes from
    the adjoint of the per-triangle viewport-folded clip matrix
    M = [[x'_a, x'_b, x'_c], [y'..], [w..]] — row i of M^{-1} gives the
    affine screen function lambda_i / w(p), so coverage (all >= 0), depth,
    and perspective-correct attribute interpolation need NO near-plane
    clipping: the visible sheet is selected by the kernel's existing
    z in [0,1] range test (z >= 0 IS the near clip), and triangles
    behind the camera can never satisfy all three edge tests.

    Replaces the branchless clip expansion + attribute lerp pipeline
    (transform_clip_channels / clip_attrs_*) for the subtile path: the
    domain stays [T] (no x2 clip split), attribute planes are exact for
    clipped triangles too (interpolating planes are clip-invariant).

    pos9 f32 [9, T] (positions_to_pos9); attrs_t f32 [3A, T] channel-major
    per-slot attributes (soup_static_prep); returns a channel dict [T]:
    e{k}{a,b,c} edge planes (inside <=> value <= 0, scale 1/|det|),
    zx/zy/zc the exact screen-z plane, p{j}{a,b,c} attribute planes and
    dna/dnb/dnc the denominator plane (common scale 1/det — the N/D ratio
    cancels it), bx0/bx1/by0/by1 the binning bbox (near-crossing edges
    contribute their eps-plane intersections, so crossers honestly span
    to the screen border they bleed toward), and valid.

    Ref semantics preserved: back-face cull = negative signed screen area
    (det and area share sign for all-front tris: area2 = det * prod(1/w)),
    near/far 0.05/100 via the z-range test, degenerate-area cull."""
    A3, T = attrs_t.shape
    A = A3 // 3
    m = mvp
    vs = {}
    for i, s in enumerate("abc"):
        px, py, pz = pos9[3 * i], pos9[3 * i + 1], pos9[3 * i + 2]
        xc = m[0, 0] * px + m[0, 1] * py + m[0, 2] * pz + m[0, 3]
        yc = m[1, 0] * px + m[1, 1] * py + m[1, 2] * pz + m[1, 3]
        zc = m[2, 0] * px + m[2, 1] * py + m[2, 2] * pz + m[2, 3]
        wc = m[3, 0] * px + m[3, 1] * py + m[3, 2] * pz + m[3, 3]
        # viewport fold: sx = x'/w, sy = y'/w, sz = z''/w
        vs[f"x{s}"] = (xc + wc) * (0.5 * cols)
        vs[f"y{s}"] = (wc - yc) * (0.5 * rows)
        vs[f"z{s}"] = (zc + wc) * 0.5
        vs[f"w{s}"] = wc

    def cross3(s1, s2):
        x1, y1, w1 = vs[f"x{s1}"], vs[f"y{s1}"], vs[f"w{s1}"]
        x2, y2, w2 = vs[f"x{s2}"], vs[f"y{s2}"], vs[f"w{s2}"]
        return (y1 * w2 - w1 * y2, w1 * x2 - x1 * w2, x1 * y2 - y1 * x2)

    e0 = cross3("b", "c")
    e1 = cross3("c", "a")
    e2 = cross3("a", "b")
    det = vs["xa"] * e0[0] + vs["ya"] * e0[1] + vs["wa"] * e0[2]
    det_safe = jnp.where(jnp.abs(det) < 1e-30, -1e-30, det)
    ninv = 1.0 / det_safe          # negative for front faces
    inv = -ninv                    # positive scale: keeps inside <=> <= 0

    ch = {}
    for k, e in enumerate((e0, e1, e2)):
        ch[f"e{k}a"], ch[f"e{k}b"], ch[f"e{k}c"] = (
            e[0] * inv, e[1] * inv, e[2] * inv)
    for nm, j in (("zx", 0), ("zy", 1), ("zc", 2)):
        ch[nm] = (vs["za"] * e0[j] + vs["zb"] * e1[j]
                  + vs["zc"] * e2[j]) * ninv
    for jj in range(A):
        aa, ab, ac = attrs_t[jj], attrs_t[A + jj], attrs_t[2 * A + jj]
        for c_i, sfx in enumerate("abc"):
            ch[f"p{jj}{sfx}"] = (aa * e0[c_i] + ab * e1[c_i]
                                 + ac * e2[c_i]) * ninv
    for c_i, sfx in enumerate("abc"):
        ch[f"dn{sfx}"] = (e0[c_i] + e1[c_i] + e2[c_i]) * ninv

    # ---- binning bbox over projectable candidates --------------------
    big = jnp.float32(1e9)
    x0 = jnp.full((T,), big)
    x1 = jnp.full((T,), -big)
    y0 = jnp.full((T,), big)
    y1 = jnp.full((T,), -big)

    def fold(mask, xq, yq, x0, x1, y0, y1):
        return (jnp.where(mask, jnp.minimum(x0, xq), x0),
                jnp.where(mask, jnp.maximum(x1, xq), x1),
                jnp.where(mask, jnp.minimum(y0, yq), y0),
                jnp.where(mask, jnp.maximum(y1, yq), y1))

    front = {}
    for s in "abc":
        w = vs[f"w{s}"]
        front[s] = w > EPS_W
        iw = 1.0 / jnp.where(front[s], w, 1.0)
        x0, x1, y0, y1 = fold(front[s], vs[f"x{s}"] * iw, vs[f"y{s}"] * iw,
                              x0, x1, y0, y1)
    inv_eps = 1.0 / EPS_W
    for s1, s2 in (("a", "b"), ("b", "c"), ("c", "a")):
        w1, w2 = vs[f"w{s1}"], vs[f"w{s2}"]
        crossing = front[s1] != front[s2]
        t = (w1 - EPS_W) / jnp.where(crossing, w1 - w2, 1.0)
        xq = (vs[f"x{s1}"]
              + t * (vs[f"x{s2}"] - vs[f"x{s1}"])) * inv_eps
        yq = (vs[f"y{s1}"]
              + t * (vs[f"y{s2}"] - vs[f"y{s1}"])) * inv_eps
        x0, x1, y0, y1 = fold(crossing, xq, yq, x0, x1, y0, y1)
    ch["bx0"], ch["bx1"], ch["by0"], ch["by1"] = x0, x1, y0, y1

    # ---- validity ----------------------------------------------------
    all_front = front["a"] & front["b"] & front["c"]
    iw3 = tuple(1.0 / jnp.where(front[s], vs[f"w{s}"], 1.0) for s in "abc")
    a2h = det * iw3[0] * iw3[1] * iw3[2]
    sz = tuple(vs[f"z{s}"] * iw3[i] for i, s in enumerate("abc"))
    szmin = jnp.minimum(jnp.minimum(sz[0], sz[1]), sz[2])
    szmax = jnp.maximum(jnp.maximum(sz[0], sz[1]), sz[2])
    valid_front = ((a2h < 0.0) & (jnp.abs(a2h) > 1e-12)
                   & (szmax >= 0.0) & (szmin <= 1.0))
    valid_cross = det < -1e-20
    ch["valid"] = jnp.where(all_front, valid_front, valid_cross)
    return ch


def _plane_keys_2dh(n_attrs: int):
    return tuple([f"p{j}{s}" for j in range(n_attrs) for s in "abc"]
                 + ["dna", "dnb", "dnc"])


def _subtile_pair_keys_bbox(cch, rows: int, cols: int, *, big_cap: int,
                            ty_lo=0, tiles_y_band: int | None = None):
    """Sorted (bin << SUB_SHIFT | tri) pair keys from precomputed bbox
    channels (2DH path)."""
    return _pair_keys_core(cch["bx0"], cch["bx1"], cch["by0"], cch["by1"],
                           cch["valid"], rows, cols, big_cap=big_cap,
                           ty_lo=ty_lo, tiles_y_band=tiles_y_band)


def _pair_keys_core(xmin, xmax, ymin, ymax, valid, rows: int, cols: int,
                    *, big_cap: int, ty_lo=0,
                    tiles_y_band: int | None = None):
    """Shared key-emission core: bbox + valid [T] -> sorted pair keys.
    Small tris (bbox within a 2x2 tile-row x subtile-col window) emit up
    to 4 candidate keys; big tris one key per overlapped bin via a
    [big_cap, n_bins] overlap matrix.

    ty_lo/tiles_y_band restrict emission to the tile-row band
    [ty_lo, ty_lo + tiles_y_band) with LOCAL bin ids (bin 0 = the band's
    first subtile) — the hook for row-band sharding of the grouped
    pipeline (render_soup_rows_sharded). tiles_y_band must be static;
    ty_lo may be traced (lax.axis_index). Defaults reproduce the full
    frame exactly."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    T = xmin.shape[0]
    assert T < RS.MAX_TRI, f"subtile sort key supports < {RS.MAX_TRI} tris"
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    tiles_y_eff = tiles_y if tiles_y_band is None else tiles_y_band
    sx_n = tiles_x * RS.N_SUB
    n_bins = tiles_y_eff * tiles_x * RS.N_SUB

    sc0 = jnp.floor(xmin / RS.SUB_W).astype(jnp.int32)
    sc1 = jnp.floor(xmax / RS.SUB_W).astype(jnp.int32)
    ty0 = jnp.floor(ymin / TILE_H).astype(jnp.int32)
    ty1 = jnp.floor(ymax / TILE_H).astype(jnp.int32)
    # clamp BEFORE the span test so borderless-huge bboxes (near-plane
    # crossers) classify big but index sanely
    sc0c = jnp.clip(sc0, 0, sx_n - 1)
    sc1c = jnp.clip(sc1, 0, sx_n - 1)
    ty0c = jnp.clip(ty0, 0, tiles_y - 1)
    ty1c = jnp.clip(ty1, 0, tiles_y - 1)
    if tiles_y_band is None:
        y_lo_px, y_hi_px = 0, rows
    else:
        y_lo_px = ty_lo * TILE_H
        y_hi_px = jnp.minimum((ty_lo + tiles_y_eff) * TILE_H, rows)
    onscreen = ((xmax > 0) & (xmin < cols)
                & (ymax > y_lo_px) & (ymin < y_hi_px))
    fits = ((sc1 - sc0) < 2) & ((ty1 - ty0) < 2)
    small = valid & onscreen & fits
    bigt = valid & onscreen & jnp.logical_not(fits)

    tri_ids = jnp.arange(T, dtype=jnp.int32)
    key_parts = []
    for k in range(4):
        ty = ty0 + (k // 2)
        sc = sc0 + (k % 2)
        tyl = ty - ty_lo  # band-local tile row (identity when unbanded)
        ok = (small & (tyl >= 0) & (tyl < tiles_y_eff) & (sc >= 0)
              & (sc < sx_n) & (ty <= ty1) & (sc <= sc1))
        bins = jnp.where(ok, tyl * sx_n + sc, n_bins)
        key_parts.append((bins << RS.SUB_SHIFT) | tri_ids)

    # big_cap == 0 is a static specialization for scenes the probe showed
    # have no big tris (e.g. the bunny headline): the big key part — 20%
    # of the sort input — and the overlap matrix vanish from the program.
    # A big tri appearing later overflows diag n_big and the caller
    # recompiles with a real cap (the standard retry path).
    big_cap = min(big_cap, T)
    if big_cap > 0:
        scores, idxs = jax.lax.top_k(bigt.astype(jnp.int32), big_cap)
        big_idx = jnp.where(scores > 0, idxs, T)

        def padi(c, fill):
            return jnp.concatenate([c, jnp.asarray([fill], c.dtype)]
                                   )[big_idx]

        bsc0 = padi(sc0c, 1)
        bsc1 = padi(sc1c, 0)
        bty0 = padi(ty0c, 1)
        bty1 = padi(ty1c, 0)
        bins_g = jnp.arange(n_bins, dtype=jnp.int32)
        g_ty = bins_g // sx_n + ty_lo  # global tile row of the local bin
        g_sc = bins_g % sx_n
        overlap = ((g_sc[None, :] >= bsc0[:, None])
                   & (g_sc[None, :] <= bsc1[:, None])
                   & (g_ty[None, :] >= bty0[:, None])
                   & (g_ty[None, :] <= bty1[:, None])
                   & (big_idx < T)[:, None])
        bins_big = jnp.where(overlap, bins_g[None, :], n_bins)
        tri_big = jnp.minimum(
            jnp.broadcast_to(big_idx[:, None], (big_cap, n_bins)), T - 1
        ).astype(jnp.int32)
        key_parts.append(((bins_big << RS.SUB_SHIFT) | tri_big).reshape(-1))
    if PROBE_SKIP_KEYSORT:
        return jnp.concatenate(key_parts)
    # is_stable=False: lax.sort defaults to a STABLE sort, which TPU
    # lowers as a 2-tuple (keys, iota) sort — the iota payload rides all
    # bitonic passes and doubles the cost (320 -> ~160 us measured at
    # headline scale, tools/profile_trace.py). The sorted ARRAY of a
    # key-only sort is bit-identical without stability: equal keys are
    # identical values (duplicates exist only among bin=n_bins
    # sentinels), so no downstream consumer can observe the tie order.
    return jax.lax.sort(jnp.concatenate(key_parts), is_stable=False)


def count_big_small_bbox(cch, rows: int, cols: int, ty_lo=0,
                         tiles_y_band: int | None = None):
    """Big/small classification counts from 2DH bbox channels (matches
    _subtile_pair_keys_bbox's rules incl. its band restriction; XLA CSEs
    the shared math)."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    xmin, xmax = cch["bx0"], cch["bx1"]
    ymin, ymax = cch["by0"], cch["by1"]
    sc0 = jnp.floor(xmin / RS.SUB_W).astype(jnp.int32)
    sc1 = jnp.floor(xmax / RS.SUB_W).astype(jnp.int32)
    ty0 = jnp.floor(ymin / TILE_H).astype(jnp.int32)
    ty1 = jnp.floor(ymax / TILE_H).astype(jnp.int32)
    if tiles_y_band is None:
        y_lo_px, y_hi_px = 0, rows
    else:
        y_lo_px = ty_lo * TILE_H
        y_hi_px = jnp.minimum((ty_lo + tiles_y_band) * TILE_H, rows)
    onscreen = ((xmax > 0) & (xmin < cols)
                & (ymax > y_lo_px) & (ymin < y_hi_px))
    fits = ((sc1 - sc0) < 2) & ((ty1 - ty0) < 2)
    small = cch["valid"] & onscreen & fits
    bigt = cch["valid"] & onscreen & jnp.logical_not(fits)
    return small.sum().astype(jnp.int32), bigt.sum().astype(jnp.int32)



HEADLINE_KERNEL = "subtile8"  # the grouped-walk generation every headline
# call site uses (bench configs, the fused frame step, RasterBackend,
# row-band sharding): landing a measured A/B winner (tools/ab_slope) is
# a one-line flip here plus the SHADE_TABLE_W / raster_group.CHUNK_RG
# knobs below. All generations are bit-identical (tests/test_raster_
# channels.py, test_raster_group.py), so goldens are unaffected by the
# flip. subtile8 = K8 slot gather relaid to the base walk layout
# (ops/raster_group.build_packed_rows_grouped_kgather): beat subtile3
# in every A/B rep (median 1.26 vs 1.55 ms at 960x540/69k; the K2/K4
# in-kernel variants lost — expand-matrix K-dim scales walk MXU cost).
# subtile4 (per-bin direct DMA) is TPU-infeasible: its [CHUNK, 32]
# per-bin VMEM slabs violate the 128-lane tiling (Mosaic reject);
# interpret-mode oracle only.
SHADE_TABLE_W = -1  # shade-table gather width: -1 = 3A+3 rounded up to a
# lane-aligned multiple of 8 (A/B winner "t24": 21 -> 24 measured 1.55 ->
# 1.51 ms on the headline, stable across reps); 0 = exact 3A+3; N = fixed
# width (perf A/B). Widths below 3A+3 would truncate the point-light
# world-pos planes — the -1 default always covers them.
SETUP_PACKED = False  # True = ONE Pallas kernel fuses 2DH setup + pack
# (ops/setup2dh.setup_2dh_fused_packed); False = two-kernel path (setup
# channel-major, then ops/pack). The fused kernel was landed on the HLO
# cycle model's prediction, but the device profile (tools/
# profile_trace.py) refutes it: fused kernel 564 us vs two-kernel
# 305+15 us (+38 us of interface copies) at 960x540/69k — the fused
# kernel's per-step eye-dot transposes dominate and the "interface
# cost" the model priced at ~260k cycles is actually ~40 us. The
# two-kernel path is the measured winner and the default; True kept as
# a perf A/B knob (ab_slope: default vs "s8oldsetup" is now inverted).
# subtile4 (interpret-only oracle) always uses the old path (needs
# 32-wide rows).
PACK_SPLIT16 = True  # the pack kernel emits the walk channels (16 wide)
# and the shade table as two CONTIGUOUS arrays for the K-gather kernels
# (subtile5-8) instead of lane-slices of one 40-wide pack: the compiler's
# own cost model attributes 196k cycles (~0.21 ms, 15% of the frame) to
# materializing the strided 24-of-40 shade-table slice
# (tools/hlo_cycles.py: total 1.206M -> 1.010M estimated cycles).
# Run-to-run tunnel noise (~+-0.15 ms) hid this in the slope A/B —
# trust the deterministic cycle model for layout work. Only applies to
# the K-gather kernels; older paths keep the single pack.
PACK_SPLIT = False  # pack kernel emits src32+shade table as CONTIGUOUS
# arrays (ops/pack.pack_channels_split) instead of lane-slices of one
# wider pack — row gathers from a slice of a wider array read strided
# rows (~20x slower gather path, tools/exp_rows.py); perf A/B
PROBE_SKIP_SHADE_GATHER = False  # wrong-output perf probe (tools/ab_slope)
PROBE_SKIP_KEYSORT = False       # wrong-output perf probe (tools/ab_slope)
PROBE_SKIP_WALK = False          # wrong-output perf probe (tools/ab_slope)

def soup_static_prep(positions, normals, colors, scene: SceneData):
    """Static per-scene device tables for the raster pipeline:
    (pos9 f32 [9, T], attrs_t f32 [3A, T]) — channel-major positions and
    per-slot attributes (A = 6 without point lights, 9 with; see
    render_soup_diag), hoisting the concat/reshape/transpose out of the
    frame loop for the 2DH setup."""
    if scene.pt_pos.shape[0] == 0:
        attrs = jnp.concatenate([jnp.asarray(normals),
                                 jnp.asarray(colors)], axis=1)
    else:
        attrs = jnp.concatenate([jnp.asarray(normals), jnp.asarray(colors),
                                 jnp.asarray(positions)], axis=1)
    V, A = attrs.shape
    return positions_to_pos9(positions), attrs.reshape(V // 3, 3 * A).T



def shade_groups(e, xl, yl, table, scene: SceneData, n_attrs: int):
    """Deferred shading over grouped kernel output (subtile3 path): every
    group is nonempty by construction (groups cover only nonempty bins in
    depth order), so there is no tile compaction step — the group layout
    IS the compaction. e f32 [grp_cap, 8, 128] winner tri ids (-1 = bg);
    xl/yl f32 [grp_cap, 128] pixel-origin lanes (see ops/raster_group);
    table [N, W] per-triangle shade planes. Returns rgb f32
    [grp_cap, 8, 128, 3]."""
    grp_cap = e.shape[0]
    idx = e.reshape(-1).astype(jnp.int32)
    hit = idx >= 0
    if PROBE_SKIP_SHADE_GATHER:
        g = jnp.broadcast_to(table[:1], (idx.shape[0], table.shape[1]))
    else:
        g = table[jnp.where(hit, idx, 0)]  # non-hit rows zeroed after
    px = jnp.broadcast_to(xl[:, None, :], (grp_cap, TILE_H, TILE_W))
    py = jnp.broadcast_to(
        yl[:, None, :] + (jnp.arange(TILE_H, dtype=jnp.float32)
                          + 0.5)[None, :, None],
        (grp_cap, TILE_H, TILE_W))
    hit3 = (e >= 0.0)
    return _shade_rows(g, hit3, px, py, scene, n_attrs)




# --------------------------------------------------------------------------
# Full pipeline
# --------------------------------------------------------------------------
def render_soup_diag(positions, normals, colors, scene: SceneData,
                     cam: Camera, rows: int, cols: int, pixel_aspect: float,
                     v_cap: int, big_cap: int = 64, kernel: str = "mm",
                     r_cap: int = 16384, pair_cap: int = 65536,
                     tile_cap: int | None = None, pos9=None,
                     attrs_t=None, emit: str = "rgb", ramp_len: int = 10,
                     row_lo=None, band_rows: int | None = None):
    """Compacted raster pipeline with capacity diagnostics.

    row_lo/band_rows (grouped kernels, not subtile4): rasterize only the
    horizontal band [row_lo, row_lo + band_rows) of the rows x cols frame
    and return a [band_rows, cols, 3] image — the row-band sharding hook
    (render_soup_rows_sharded). band_rows must be static and TILE_H-
    aligned; row_lo may be traced (lax.axis_index * band) but must be
    TILE_H-aligned. Caps and diag counts are per-band.

    Returns (rgb f32 [rows, cols, 3], diag) with i32 device scalars. The
    frame is exact iff every diag count is within its cap (n_valid <=
    v_cap, n_big <= big_cap, and for kernel='subtile' n_rows <= r_cap,
    n_pairs <= pair_cap, n_tiles_nz <= tile_cap); otherwise work was
    dropped and the caller should re-render with caps from
    `suggest_caps*` (see RasterBackend.render for the adaptive loop).

    emit='idx' (grouped kernels only): quantize to ramp indices IN GROUP
    LAYOUT and assemble (idx i32 [rows, cols], rgb8 u8 [rows, cols, 3])
    instead of the f32 rgb image — the glyph path's image-space work then
    starts from the assembled index plane (ascii.ascii_pass.
    glyph_from_index). Bit-identical to quantizing the assembled image
    (assembly is a pure permutation); moves 4x fewer image bytes."""
    # lightless-scene specialization: world-pos attr planes feed only the
    # point-light terms, and the padded point-light count is a STATIC 0
    # for scenes without any (scene/builder.py rounds 0 up to 0)
    if scene.pt_pos.shape[0] == 0:
        attrs = jnp.concatenate([normals, colors], axis=1)
    else:
        attrs = jnp.concatenate([normals, colors, positions], axis=1)
    mvp = camera_mvp(cam, rows, cols, pixel_aspect)
    if kernel in ("subtile3", "subtile4", "subtile5", "subtile6",
                  "subtile7", "subtile8"):
        # Fused-setup + depth-sorted grouped walk (the round-3 headline
        # path): setup_2dh as ONE Pallas kernel emitting the packed
        # channel block directly, bins grouped by depth instead of by
        # tile (ops/raster_group) so aligned-layout slack ~ chunk padding
        # only, and shading runs on the group layout (= the nonempty
        # compaction) before one scatter-free bin-gather image assembly.
        # tile_cap is reinterpreted as BIN capacity (grp_cap = cap // 8).
        from ascii_renderer_tpu.ops import raster_group as RG
        from ascii_renderer_tpu.ops.setup2dh import setup_2dh_fused
        from ascii_renderer_tpu.ops.pack import pack_channels

        if pos9 is None:
            pos9 = positions_to_pos9(positions)
        A = attrs.shape[1]
        if attrs_t is None:
            attrs_t = attrs.reshape(-1, 3 * A).T
        banded = band_rows is not None
        if banded:
            assert kernel != "subtile4", "band sharding: grouped walks only"
            assert band_rows % TILE_H == 0, band_rows
            tiles_y = band_rows // TILE_H
            ty_lo = jnp.asarray(row_lo, jnp.int32) // TILE_H
            out_rows = band_rows
        else:
            tiles_y = -(-rows // TILE_H)
            ty_lo = 0
            out_rows = rows
        tiles_x = -(-cols // TILE_W)
        n_tiles = tiles_y * tiles_x
        if tile_cap is None:
            tile_cap = n_tiles * 8
        grp_cap = max(1, tile_cap // 8)
        tw = (_round_up(3 * A + 3, 8) if SHADE_TABLE_W < 0
              else (SHADE_TABLE_W if SHADE_TABLE_W else 3 * A + 3))
        if SETUP_PACKED and kernel != "subtile4":
            # one kernel emits bbox + both row-major gather tables; the
            # channel-major intermediate and its slice/pad interface
            # (~260k estimated cycles) never exist (tools/hlo_cycles.py)
            from ascii_renderer_tpu.ops.setup2dh import setup_2dh_fused_packed
            bbox, src32, table = setup_2dh_fused_packed(
                pos9, attrs_t, mvp, rows, cols, tw)
        else:
            # cm arrives in the setup kernel's blocked [c, N/128, 128]
            # tiling; the blocked pack reads it without relayout copies
            cm, bbox = setup_2dh_fused(pos9, attrs_t, mvp, rows, cols)
            if PACK_SPLIT16 and kernel in ("subtile5", "subtile6",
                                           "subtile7", "subtile8"):
                from ascii_renderer_tpu.ops.pack import (
                    pack_channels_split_blocked)
                src32, table = pack_channels_split_blocked(
                    cm, [(0, 16), (16, 16 + tw)])
            elif PACK_SPLIT:
                from ascii_renderer_tpu.ops.pack import (
                    pack_channels_split_blocked)
                src32, table = pack_channels_split_blocked(
                    cm, [(0, 32), (16, 16 + tw)])
            else:
                cm2 = cm.reshape(cm.shape[0], -1)
                pack_w = max(-(-cm2.shape[0] // 8) * 8,
                             16 + SHADE_TABLE_W if SHADE_TABLE_W else 0)
                g40 = pack_channels(cm2, width=pack_w)
                # cols past 3A+3 are junk, never read
                src32, table = g40[:, :32], g40[:, 16:16 + tw]
        n_valid = jnp.sum(bbox["valid"].astype(jnp.int32))
        keys = _subtile_pair_keys_bbox(
            bbox, rows, cols, big_cap=big_cap, ty_lo=ty_lo,
            tiles_y_band=tiles_y if banded else None)
        if kernel == "subtile4":  # direct-DMA walk: no aligned layout
            (src_pair, goff, gdepth, gchunks, xl, yl, gbins, n_rows,
             n_pairs, n_used) = RG.build_groups_direct(
                src32, keys, tiles_x, n_tiles, pair_cap, grp_cap)
            _z, e = RG.tile_eval_direct(src_pair, goff, gdepth, gchunks,
                                        xl, yl, grp_cap)
        elif kernel in ("subtile7", "subtile8"):  # K-gather -> base walk
            kk = 4 if kernel == "subtile7" else 8
            (rows128, rowptr, gdepth, gskip, xl, yl, gbins, n_rows,
             n_pairs, n_used) = RG.build_packed_rows_grouped_kgather(
                src32, keys, tiles_x, n_tiles, r_cap, pair_cap,
                grp_cap, kk)
            if banded:
                yl = yl + (ty_lo * TILE_H).astype(jnp.float32)
            if PROBE_SKIP_WALK:
                e = (jnp.zeros((grp_cap, TILE_H, TILE_W), jnp.float32)
                     + jnp.sum(rows128) * 0.0)
            else:
                _z, e = RG.tile_eval_grouped_skip(rows128, rowptr, gdepth,
                                                  gskip, xl, yl, grp_cap)
        elif kernel in ("subtile5", "subtile6"):  # K2/K4 multi-entry rows
            build = (RG.build_packed_rows_grouped_k2 if kernel == "subtile5"
                     else RG.build_packed_rows_grouped_k4)
            (rows256, rowptr, gdepth, gskip, xl, yl, gbins, n_rows,
             n_pairs, n_used) = build(
                src32, keys, tiles_x, n_tiles, r_cap, pair_cap,
                grp_cap)
            if banded:
                # bins (and so yl) are band-local; the 2DH planes live in
                # GLOBAL screen coordinates, so shift the pixel-origin
                # lanes to global y before the walk evaluates them
                yl = yl + (ty_lo * TILE_H).astype(jnp.float32)
            _z, e = RG.tile_eval_grouped_k2(rows256, rowptr, gdepth,
                                            gskip, xl, yl, grp_cap)
        else:
            (rows128, rowptr, gdepth, xl, yl, gbins, n_rows, n_pairs,
             n_used) = RG.build_packed_rows_grouped(
                src32, keys, tiles_x, n_tiles, r_cap, pair_cap,
                grp_cap)
            if banded:
                # shift band-local pixel-origin lanes to global y (planes
                # are in global screen coordinates)
                yl = yl + (ty_lo * TILE_H).astype(jnp.float32)
            if PROBE_SKIP_WALK:
                # keep the rows build live with a cheap reduce
                e = (jnp.zeros((grp_cap, TILE_H, TILE_W), jnp.float32)
                     + jnp.sum(rows128) * 0.0)
            else:
                _z, e = RG.tile_eval_grouped(rows128, rowptr, gdepth, xl,
                                             yl, grp_cap)
        rgbg = shade_groups(e, xl, yl, table, scene, A)
        diag = {"n_valid": n_valid, "n_big": None,
                "n_rows": n_rows, "n_pairs": n_pairs,
                "n_tiles_nz": n_used}
        _n_small, diag["n_big"] = count_big_small_bbox(
            bbox, rows, cols, ty_lo=ty_lo,
            tiles_y_band=tiles_y if banded else None)
        if emit == "idx":
            from ascii_renderer_tpu.core import quantize as Q
            # empty-ramp fallback must match glyph_from_index's ramp_codes
            # (core/quantize.py DEFAULT_RAMP), else the index plane and the
            # glyph decision quantize with different ramp lengths
            ramp_len = ramp_len if ramp_len > 0 else len(Q.DEFAULT_RAMP)
            rgb8g = Q.float_rgb_to_u8(rgbg)            # [grp, 8, 128, 3]
            bidx = Q.quantize_index(rgb8g, ramp_len)   # [grp, 8, 128]
            idx_img = RG.assemble_group_image(
                bidx.astype(jnp.float32), gbins, n_tiles, tiles_y,
                tiles_x, out_rows, cols, 0.0).astype(jnp.int32)
            rgb8_img = RG.assemble_group_image(
                rgb8g.astype(jnp.float32), gbins, n_tiles, tiles_y,
                tiles_x, out_rows, cols, 0.0).astype(jnp.uint8)
            return (idx_img, rgb8_img), diag
        rgb = RG.assemble_group_image(rgbg, gbins, n_tiles, tiles_y,
                                      tiles_x, out_rows, cols, 0.0)
        return rgb, diag
    if kernel == "subtile2":  # gen-2 2DH path, kept as oracle
        return render_subtile2_diag(
            attrs, scene, mvp, rows, cols, big_cap=big_cap, r_cap=r_cap,
            pair_cap=pair_cap, tile_cap=tile_cap, positions=positions,
            pos9=pos9, attrs_t=attrs_t)
    # clip-expansion channel generations ('mm'/'loop'/'subtile'): live at
    # small/mid scale (see RasterBackend.render), defined in raster_channels
    return render_channels_diag(
        positions, attrs, scene, mvp, rows, cols, v_cap=v_cap,
        big_cap=big_cap, kernel=kernel, r_cap=r_cap, pair_cap=pair_cap,
        tile_cap=tile_cap, pos9=pos9)


def suggest_caps(n_valid: int, n_big: int):
    """Adaptive capacities with growth margin (host-side policy).

    Sized ~30%/50% above the last observed counts so camera motion doesn't
    recompile every frame; rounded to coarse quanta so nearby scenes share
    compiled programs."""
    v_cap = min(MAX_V_CAP, _round_up(int(n_valid * 1.3) + 512, 8192))
    big_cap = max(64, _round_up(int(n_big * 1.5) + 8, 64))
    return v_cap, big_cap


def suggest_caps_grouped(n_valid: int, n_big: int, n_rows: int,
                         n_pairs: int, n_used: int):
    """Adaptive capacities for the grouped (subtile3) pipeline:
    (v_cap, big_cap, r_cap, pair_cap, bin_cap). v_cap is informational
    only (no compaction); bin_cap (= grp_cap * 8) bounds how many
    nonempty bins the depth-sorted grouping covers; r_cap stays a
    CHUNK_RG multiple."""
    from ascii_renderer_tpu.ops import raster_group as RG

    v_cap = _round_up(int(n_valid) + 1, 4096)
    big_cap = 0 if n_big == 0 else max(16, _round_up(int(n_big * 1.5) + 8,
                                                     16))
    # tight margins: every 1% of cap slack is real prep-stage work (r_cap
    # slack measured ~0.1 ms per 10% at the headline — tools/
    # exp_headline_ab.py --caps). Finer quanta mean a growing scene
    # retries/recompiles in ~5% steps; the compile cache amortizes this
    # per cap tuple.
    r_cap = _round_up(int(n_rows * 1.05) + 64, max(RG.CHUNK_RG, 256))
    pair_cap = _round_up(int(n_pairs * 1.06) + 256, 2048)
    bin_cap = _round_up(int(n_used * 1.08) + 8, 32)
    return v_cap, big_cap, r_cap, pair_cap, bin_cap

def render_soup(positions, normals, colors, scene: SceneData, cam: Camera,
                rows: int, cols: int, pixel_aspect: float,
                chunk: int = 64, method: str = "auto",
                v_cap: int | None = None, big_cap: int = 64,
                r_cap: int = 16384, pair_cap: int = 65536,
                tile_cap: int | None = None, pos9=None,
                attrs_t=None) -> jnp.ndarray:
    """Triangle soup -> shaded RGB f32 [rows, cols, 3].

    method: 'scatter' (binned Pallas bin-walk, fast for many small tris),
    'subtile' (subtile-packed walk, fastest), 'scan' (chunked dense scan,
    the oracle-tested reference path), or 'auto' (scatter above 512 tris).
    v_cap enables the compacted pipeline (see render_soup_diag); None
    keeps the exact uncapped path (method='subtile' requires v_cap)."""
    attrs = jnp.concatenate([normals, colors, positions], axis=1)  # [V, 9]
    mvp = camera_mvp(cam, rows, cols, pixel_aspect)
    if method == "auto":
        # measured on TPU at bunny scale: visibility+deferred 104 ms vs
        # fused-shading 232 ms (eager per-entry attribute interpolation
        # outweighs the deferred gathers) — keep the visibility buffer
        method = "scatter" if positions.shape[0] // 3 * 2 > 512 else "scan"
    if (method in ("scatter", "scatter_mm", "scatter_loop", "subtile",
                   "subtile2", "subtile3", "subtile4", "subtile5",
                   "subtile6", "subtile7", "subtile8")
            and v_cap is not None):
        kern = {"scatter_loop": "loop", "subtile": "subtile",
                "subtile2": "subtile2", "subtile3": "subtile3",
                "subtile4": "subtile4", "subtile5": "subtile5",
                "subtile6": "subtile6", "subtile7": "subtile7",
                "subtile8": "subtile8"}.get(method, "mm")
        rgb, _diag = render_soup_diag(
            positions, normals, colors, scene, cam, rows, cols, pixel_aspect,
            v_cap=v_cap, big_cap=big_cap, kernel=kern, r_cap=r_cap,
            pair_cap=pair_cap, tile_cap=tile_cap, pos9=pos9,
            attrs_t=attrs_t)
        return rgb
    if method == "fused":
        ch = transform_clip_channels(positions, mvp)
        ch = setup_screen_channels(ch, rows, cols)
        attr_slots = clip_attrs_channel_lists(attrs, ch)
        # re-group: each slot list of A=9 channels
        return render_fused_ch(ch, attr_slots, scene, rows, cols)
    if method in ("scatter", "scatter_mm", "scatter_loop"):
        # channel-major fast path end to end; shading gathers use the
        # materialized [2T,3,*] arrays — measured FASTER than per-channel
        # 1-D gathers (2 wide gathers at 27 ms beat 36 narrow ones at
        # ~125 ms: TPU gather cost is dominated by per-op overhead)
        ch = transform_clip_channels(positions, mvp)
        ch = setup_screen_channels(ch, rows, cols)
        # kernel="mm" (default): MXU array-form bin walk — measured 12.5 ->
        # 11.8 ms/frame over the sequential loop kernel at bunny scale, and
        # bit-identical in interpret mode / <1e-4 rgb on TPU (bf16x3 dots).
        # "scatter_loop" keeps the scalar-load loop kernel selectable.
        kern = "loop" if method == "scatter_loop" else "mm"
        _zbuf, tid = visibility_binned_ch(ch, rows, cols, kernel=kern)
        attr_slots = clip_attrs_channel_lists(attrs, ch)
        return shade_planes_ch(tid, ch, attr_slots, scene, rows, cols)
    clip, tattr, valid = transform_clip(positions, attrs, mvp)
    setup = setup_screen(clip, valid, rows, cols)
    _zbuf, tid = visibility_scan(setup, rows, cols, chunk)
    return shade_visibility(tid, clip, tattr, scene, rows, cols)


def render_soup_rows_sharded(positions, normals, colors, scene: SceneData,
                             cam: Camera, rows: int, cols: int,
                             pixel_aspect: float, mesh, axis: str = "rows",
                             *, big_cap: int = 64, r_cap: int = 16384,
                             pair_cap: int = 65536,
                             bin_cap: int | None = None,
                             kernel: str | None = None):
    """Row-band sharding of the grouped raster pipeline (the headline
    path scaling over ICI): each of the mesh's ``axis`` devices owns a
    tile-row band of ONE frame — band-local pair keys, grouped walk,
    shade, and assembly all run device-local, with no cross-device
    collective at all (tile-owned z-buffers per SURVEY §5).

    Returns (rgb f32 [rows, cols, 3] sharded over ``axis``, overflow i32
    [n_devices]): overflow[i] counts the caps band i exceeded — caps are
    per-band and identical across devices, so size them for the heaviest
    band and re-render when any overflow[i] > 0 (the RasterBackend retry
    contract, but collectively).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec

    if kernel is None:
        kernel = HEADLINE_KERNEL
    P_ = PartitionSpec
    n = mesh.shape[axis]
    assert rows % (TILE_H * n) == 0, (rows, TILE_H, n)
    band = rows // n
    tiles_x = -(-cols // TILE_W)
    if bin_cap is None:  # full band coverage: bins can never overflow
        bin_cap = (band // TILE_H) * tiles_x * 8
    T = positions.shape[0] // 3
    v_cap = _round_up(2 * T + 1, 4096)  # informational (no compaction)
    pos9 = positions_to_pos9(positions)

    def shard_fn(positions, normals, colors, pos9, scene, cam):
        i = jax.lax.axis_index(axis)
        rgb, diag = render_soup_diag(
            positions, normals, colors, scene, cam, rows, cols,
            pixel_aspect, v_cap=v_cap, big_cap=big_cap, kernel=kernel,
            r_cap=r_cap, pair_cap=pair_cap, tile_cap=bin_cap, pos9=pos9,
            row_lo=i * band, band_rows=band)
        over = ((diag["n_big"] > big_cap).astype(jnp.int32)
                + (diag["n_rows"] > r_cap).astype(jnp.int32)
                + (diag["n_pairs"] > pair_cap).astype(jnp.int32)
                + (diag["n_tiles_nz"] > bin_cap).astype(jnp.int32))
        return rgb, over[None]

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, and everything here is device-local anyway (no
    # collectives to typecheck)
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P_(), P_(), P_(), P_(), P_(), P_()),
                   out_specs=(P_(axis), P_(axis)), check_vma=False)
    return jax.jit(fn)(positions, normals, colors, pos9, scene, cam)


_ADAPTIVE_MIN_TRIS = 2048  # below this the compacted path isn't worth caps


class RasterBackend:
    """Backend-protocol wrapper (contract 5). Tessellation happens on scene
    push (the analog of the reference's VBO rebuild, raster.js:130-266).

    Capacity management: large soups render through the compacted pipeline
    with adaptive (v_cap, big_cap). Every frame's diagnostics are checked
    on the host (the frame is being read back anyway); on overflow the caps
    grow with margin and the frame re-renders, so no triangle is ever
    silently dropped — the GL analog is buffer reallocation on overflow."""

    name = "raster"

    def __init__(self, cfg=None):
        self.cfg = cfg
        self._scene: SceneData | None = None
        self._soup = None
        self._pos9 = None
        self._attrs_t = None
        self._fns = {}
        self._caps = None  # (v_cap, big_cap) once sized

    def set_scene(self, scene: SceneData):
        self._scene = scene
        p, n, c = tessellate_scene(scene)
        self._soup = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c))
        self._pos9, self._attrs_t = soup_static_prep(*self._soup, scene)
        self._fns = {}
        self._caps = None

    def set_soup(self, positions, normals, colors, scene: SceneData):
        """Direct mesh path for pre-tessellated geometry (benchmarks)."""
        self._scene = scene
        self._soup = (jnp.asarray(positions), jnp.asarray(normals),
                      jnp.asarray(colors))
        self._pos9, self._attrs_t = soup_static_prep(*self._soup, scene)
        self._fns = {}
        self._caps = None

    def _fn(self, rows, cols, pixel_aspect, caps):
        key = (rows, cols, float(pixel_aspect), self._soup[0].shape[0], caps)
        fn = self._fns.get(key)
        if fn is None:
            if caps is None:
                fn = jax.jit(functools.partial(
                    render_soup, rows=rows, cols=cols,
                    pixel_aspect=pixel_aspect))
            elif len(caps) == 2:  # mid scale: compacted mm bin-walk
                fn = jax.jit(functools.partial(
                    render_soup_diag, rows=rows, cols=cols,
                    pixel_aspect=pixel_aspect, v_cap=caps[0],
                    big_cap=caps[1]))
            else:
                fn = jax.jit(functools.partial(
                    render_soup_diag, rows=rows, cols=cols,
                    pixel_aspect=pixel_aspect, kernel=HEADLINE_KERNEL,
                    v_cap=caps[0], big_cap=caps[1], r_cap=caps[2],
                    pair_cap=caps[3], tile_cap=caps[4]))
            self._fns[key] = fn
        return fn

    def render(self, time_sec, camera: Camera, rows: int, cols: int,
               pixel_aspect: float = 1.0) -> Frame:
        if self._scene is None or self._soup[0].shape[0] == 0:
            return Frame.blank(rows, cols)
        from ascii_renderer_tpu.ops import raster_subtile as RS
        n2t = self._soup[0].shape[0] // 3 * 2
        if n2t < _ADAPTIVE_MIN_TRIS or n2t > RS.MAX_TRI - 4096:
            rgb = self._fn(rows, cols, pixel_aspect, None)(
                *self._soup, self._scene, camera)
            return Frame.from_float(rgb)
        if n2t < 32768:  # mid scale: subtile prep overhead doesn't pay
            caps = self._caps or (n2t, 64)
            for _ in range(4):
                rgb, diag = self._fn(rows, cols, pixel_aspect, caps)(
                    *self._soup, self._scene, camera, pos9=self._pos9)
                counts = (int(diag["n_valid"]), int(diag["n_big"]))
                if all(c <= cap for c, cap in zip(counts, caps)):
                    break
                caps = suggest_caps(*counts)
            # adopt lean suggested caps after the first (safe-cap) frame,
            # then hold them while they fit — re-deriving every frame
            # would recompile across quantum boundaries as counts drift
            self._caps = caps if self._caps else suggest_caps(*counts)
            return Frame.from_float(rgb)
        n_tiles = (-(-rows // TILE_H)) * (-(-cols // TILE_W))
        caps = self._caps or (n2t, 64, _round_up(n2t, 2048), 4 * n2t,
                              n_tiles * 8)
        for _ in range(4):  # overflow retries (caps grow geometrically)
            rgb, diag = self._fn(rows, cols, pixel_aspect, caps)(
                *self._soup, self._scene, camera, pos9=self._pos9,
                attrs_t=self._attrs_t)
            counts = tuple(int(diag[k]) for k in
                           ("n_valid", "n_big", "n_rows", "n_pairs",
                            "n_tiles_nz"))
            # skip v_cap (index 0): the 2DH pipelines have no compaction,
            # so n_valid drifting past it costs nothing — retrying on it
            # would recompile a byte-identical program
            if all(c <= cap for c, cap in zip(counts[1:], caps[1:])):
                break
            caps = suggest_caps_grouped(*counts)
        # adopt lean suggested caps after the first (safe-cap) frame, then
        # hold them while they fit — re-deriving every frame would
        # recompile across quantum boundaries as counts drift
        self._caps = caps if self._caps else suggest_caps_grouped(*counts)
        return Frame.from_float(rgb)

    def dispose(self):
        self._scene = self._soup = self._pos9 = self._attrs_t = None
        self._fns = {}
        self._caps = None
