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

NEAR, FAR = 0.05, 100.0
_DEFAULT_AMBIENT = (0.15, 0.18, 0.22)  # raster.js:66-69
_DEFAULT_DIR = (0.25, -1.0, 0.15)
_DEFAULT_DIR_COL = (1.2, 1.15, 1.1)


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


# --------------------------------------------------------------------------
# Vertex transform + near clip — channel-major fast path
# --------------------------------------------------------------------------
def transform_clip_channels(positions: jnp.ndarray, mvp: jnp.ndarray):
    """Channel-major vertex stage: positions f32 [V=3T, 3] -> dict of
    [2T]-shaped per-component arrays for the near-clipped triangles.

    Why: [T, 3]-shaped intermediates put a size-3 dimension on the TPU's
    128-lane axis (2% VPU efficiency, 42x padded memory). Every op here
    runs on flat [T] channels instead; only the initial transform is a
    matmul. Semantically identical to :func:`transform_clip` (same rotation
    canonicalization and x2 expansion); attribute lerping for clipped
    vertices is returned as (rot, t_ab, t_ac, t_bc, case) so the caller can
    apply it to attribute arrays lazily.

    Returns dict with keys:
      x/y/z/w per vertex slot a,b,c  -> 'xa','ya','za','wa', ... [2T]
      'valid' [2T] bool
      'lerp' info dict for attribute reconstruction.
    """
    V = positions.shape[0]
    T = V // 3
    clip = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])],
                           axis=1) @ mvp.T  # [V, 4] (MXU)
    # per-vertex-slot channels [T], via ONE channel-major transpose —
    # slicing cv[:, i, j] from a [T, 3, 4] view reads with stride 12 on
    # the minor axis (wastes 11/12 of every vector load); rows of the
    # [12, T] transpose are contiguous (same fix as clip_attrs).
    cv_t = clip.reshape(T, 12).T
    ch = {f"{c}{s}": cv_t[4 * i + j]
          for i, s in enumerate("abc")
          for j, c in enumerate("xyzw")}
    return _clip_channels_core(ch)


def positions_to_pos9(positions) -> jnp.ndarray:
    """Static per-scene prep: soup positions f32 [V=3T, 3] -> channel-major
    pos9 f32 [9, T] (rows xa ya za xb yb zb xc yc zc). Hoisting this
    transpose out of the frame loop lets the vertex stage run as pure
    fusable channel FMAs (no per-frame matmul or [T,12] relayout)."""
    V = positions.shape[0]
    return jnp.asarray(positions).reshape(V // 3, 3, 3).transpose(1, 2, 0) \
        .reshape(9, V // 3)


def transform_clip_channels9(pos9: jnp.ndarray, mvp: jnp.ndarray):
    """transform_clip_channels on pre-transposed geometry (see
    positions_to_pos9): 16 four-term FMA chains over contiguous [T]
    channels replace the matmul + minor-axis transpose."""
    ch = {}
    for i, s in enumerate("abc"):
        px, py, pz = pos9[3 * i], pos9[3 * i + 1], pos9[3 * i + 2]
        for j, c in enumerate("xyzw"):
            ch[f"{c}{s}"] = (mvp[j, 0] * px + mvp[j, 1] * py
                             + mvp[j, 2] * pz + mvp[j, 3])
    return _clip_channels_core(ch)


def _clip_channels_core(ch):
    """Shared near-clip channel math: per-slot clip channels x/y/z/w{a,b,c}
    [T] -> the [2T] clipped-triangle channel dict (see
    transform_clip_channels)."""
    d = {s: ch[f"z{s}"] + ch[f"w{s}"] for s in "abc"}
    ins = {s: d[s] >= 0.0 for s in "abc"}
    n_in = (ins["a"].astype(jnp.int32) + ins["b"].astype(jnp.int32)
            + ins["c"].astype(jnp.int32))

    # rotation r in {0,1,2}: 1-in -> first inside vertex first;
    # 2-in -> outside vertex last (matches transform_clip)
    first_in = jnp.where(ins["a"], 0, jnp.where(ins["b"], 1, 2))
    first_out = jnp.where(~ins["a"], 0, jnp.where(~ins["b"], 1, 2))
    rot = jnp.where(n_in == 1, first_in,
                    jnp.where(n_in == 2, (first_out + 1) % 3, 0))

    def rot_sel(ca, cb, cc, r):
        return jnp.where(r == 0, ca, jnp.where(r == 1, cb, cc))

    rch = {}
    names = "abc"
    for k, s in enumerate("abc"):
        # rotated slot s takes original slot (rot + k) % 3
        srcs = [names[(i + k) % 3] for i in range(3)]  # for rot=0,1,2
        for c in "xyzw":
            rch[f"{c}{s}"] = rot_sel(ch[f"{c}{srcs[0]}"], ch[f"{c}{srcs[1]}"],
                                     ch[f"{c}{srcs[2]}"], rot)
    rd = {}
    for k, s in enumerate("abc"):
        srcs = [names[(i + k) % 3] for i in range(3)]
        rd[s] = rot_sel(d[srcs[0]], d[srcs[1]], d[srcs[2]], rot)

    ta = rd["a"] / jnp.where(rd["a"] == rd["b"], 1.0, rd["a"] - rd["b"])  # a->b
    tc = rd["a"] / jnp.where(rd["a"] == rd["c"], 1.0, rd["a"] - rd["c"])  # a->c
    tb = rd["b"] / jnp.where(rd["b"] == rd["c"], 1.0, rd["b"] - rd["c"])  # b->c

    def lerp(c0, c1, t):
        return c0 + t * (c1 - c0)

    one_in = n_in == 1
    two_in = n_in == 2
    out = {}
    for c in "xyzw":
        a0, b0, c0 = rch[f"{c}a"], rch[f"{c}b"], rch[f"{c}c"]
        ab = lerp(a0, b0, ta)
        ac = lerp(a0, c0, tc)
        bc = lerp(b0, c0, tb)
        # tri1: 3-in (a,b,c); 1-in (a, ab, ac); 2-in (a, b, bc)
        t1a = a0
        t1b = jnp.where(one_in, ab, b0)
        t1c = jnp.where(one_in, ac, jnp.where(two_in, bc, c0))
        # tri2 (only 2-in): (a, bc, ac)
        t2a, t2b, t2c = a0, bc, ac
        out[f"{c}a"] = jnp.concatenate([t1a, t2a])
        out[f"{c}b"] = jnp.concatenate([t1b, t2b])
        out[f"{c}c"] = jnp.concatenate([t1c, t2c])
    out["valid"] = jnp.concatenate([n_in >= 1, two_in])
    out["rot"] = rot
    out["t_ab"], out["t_ac"], out["t_bc"] = ta, tc, tb
    out["n_in"] = n_in
    return out


def setup_screen_channels(ch, rows: int, cols: int):
    """Channel-major screen setup: adds screen-space sx/sy/sz per slot and
    the facing/degenerate cull to ``ch`` (in place) and returns it."""
    for s in "abc":
        w = ch[f"w{s}"]
        inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
        ch[f"sx{s}"] = (ch[f"x{s}"] * inv_w + 1.0) * 0.5 * cols
        ch[f"sy{s}"] = (1.0 - ch[f"y{s}"] * inv_w) * 0.5 * rows
        ch[f"sz{s}"] = (ch[f"z{s}"] * inv_w + 1.0) * 0.5
        ch[f"iw{s}"] = inv_w
    e0x = ch["sxb"] - ch["sxa"]
    e0y = ch["syb"] - ch["sya"]
    e1x = ch["sxc"] - ch["sxa"]
    e1y = ch["syc"] - ch["sya"]
    area2 = e0x * e1y - e0y * e1x
    ch["valid"] = ch["valid"] & (area2 < 0.0) & (jnp.abs(area2) > 1e-12)
    ch["area2"] = area2
    return ch


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


def _subtile_pair_keys_bbox(cch, rows: int, cols: int, *, big_cap: int):
    """Sorted (bin << SUB_SHIFT | tri) pair keys from precomputed bbox
    channels (2DH path)."""
    return _pair_keys_core(cch["bx0"], cch["bx1"], cch["by0"], cch["by1"],
                           cch["valid"], rows, cols, big_cap=big_cap)


def _pair_keys_core(xmin, xmax, ymin, ymax, valid, rows: int, cols: int,
                    *, big_cap: int):
    """Shared key-emission core: bbox + valid [T] -> sorted pair keys.
    Small tris (bbox within a 2x2 tile-row x subtile-col window) emit up
    to 4 candidate keys; big tris one key per overlapped bin via a
    [big_cap, n_bins] overlap matrix."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    T = xmin.shape[0]
    assert T < RS.MAX_TRI, f"subtile sort key supports < {RS.MAX_TRI} tris"
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    sx_n = tiles_x * RS.N_SUB
    n_bins = n_tiles * RS.N_SUB

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
    onscreen = (xmax > 0) & (xmin < cols) & (ymax > 0) & (ymin < rows)
    fits = ((sc1 - sc0) < 2) & ((ty1 - ty0) < 2)
    small = valid & onscreen & fits
    bigt = valid & onscreen & jnp.logical_not(fits)

    tri_ids = jnp.arange(T, dtype=jnp.int32)
    key_parts = []
    for k in range(4):
        ty = ty0 + (k // 2)
        sc = sc0 + (k % 2)
        ok = (small & (ty >= 0) & (ty < tiles_y) & (sc >= 0) & (sc < sx_n)
              & (ty <= ty1) & (sc <= sc1))
        bins = jnp.where(ok, ty * sx_n + sc, n_bins)
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
        g_ty = bins_g // sx_n
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
    return jax.lax.sort(jnp.concatenate(key_parts))


def count_big_small_bbox(cch, rows: int, cols: int):
    """Big/small classification counts from 2DH bbox channels (matches
    _subtile_pair_keys_bbox's rules; XLA CSEs the shared math)."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    xmin, xmax = cch["bx0"], cch["bx1"]
    ymin, ymax = cch["by0"], cch["by1"]
    sc0 = jnp.floor(xmin / RS.SUB_W).astype(jnp.int32)
    sc1 = jnp.floor(xmax / RS.SUB_W).astype(jnp.int32)
    ty0 = jnp.floor(ymin / TILE_H).astype(jnp.int32)
    ty1 = jnp.floor(ymax / TILE_H).astype(jnp.int32)
    onscreen = (xmax > 0) & (xmin < cols) & (ymax > 0) & (ymin < rows)
    fits = ((sc1 - sc0) < 2) & ((ty1 - ty0) < 2)
    small = cch["valid"] & onscreen & fits
    bigt = cch["valid"] & onscreen & jnp.logical_not(fits)
    return small.sum().astype(jnp.int32), bigt.sum().astype(jnp.int32)


def channels_to_setup(ch):
    """Adapter: channel dict -> the [T,3,...] setup dict the scan/oracle
    paths consume (materializes the small-lane layout; test use only)."""
    xy = jnp.stack([jnp.stack([ch["sxa"], ch["sya"]], axis=-1),
                    jnp.stack([ch["sxb"], ch["syb"]], axis=-1),
                    jnp.stack([ch["sxc"], ch["syc"]], axis=-1)], axis=1)
    z01 = jnp.stack([ch["sza"], ch["szb"], ch["szc"]], axis=1)
    return {"xy": xy, "z01": z01, "valid": ch["valid"], "area2": ch["area2"]}


def transform_clip(positions: jnp.ndarray, attrs: jnp.ndarray,
                   mvp: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """positions f32 [V=3T, 3], attrs f32 [V, A] -> near-clipped triangles.

    Returns (clip [2T, 3, 4], tattr [2T, 3, A], valid [2T]): each input
    triangle emits up to two output triangles (static expansion — the
    two-in/one-out clip case genuinely needs both).
    """
    v4 = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=1)
    clip = v4 @ mvp.T  # [V, 4] — the MXU does the whole vertex stage
    T = positions.shape[0] // 3
    A = attrs.shape[1]
    bundle = jnp.concatenate([clip, attrs], axis=1).reshape(T, 3, 4 + A)

    d = bundle[..., 2] + bundle[..., 3]  # z + w >= 0 is inside (near plane)
    inside = d >= 0.0
    n_in = inside.sum(axis=1)  # [T]

    # Rotate each triangle so the pattern is canonical:
    #   1-in  -> the inside vertex first;  2-in -> the OUTSIDE vertex last.
    idx_first_in = jnp.argmax(inside, axis=1)
    idx_out = jnp.argmax(jnp.logical_not(inside), axis=1)
    rot = jnp.where(n_in == 1, idx_first_in,
                    jnp.where(n_in == 2, (idx_out + 1) % 3, 0))
    # rotation as roll+select (static slices) — a take_along_axis gather
    # here costs ~30 ms at bunny scale on TPU, the selects are free
    b1 = jnp.roll(bundle, -1, axis=1)
    b2 = jnp.roll(bundle, -2, axis=1)
    r = rot[:, None, None]
    vb = jnp.where(r == 0, bundle, jnp.where(r == 1, b1, b2))
    d1 = jnp.roll(d, -1, axis=1)
    d2 = jnp.roll(d, -2, axis=1)
    rd = rot[:, None]
    db = jnp.where(rd == 0, d, jnp.where(rd == 1, d1, d2))

    a, b, c = vb[:, 0], vb[:, 1], vb[:, 2]
    da, db_, dc = db[:, 0], db[:, 1], db[:, 2]

    def lerp(p, q, dp, dq):
        t = dp / (dp - dq)
        return p + t[:, None] * (q - p)

    ab = lerp(a, b, da, db_)
    ac = lerp(a, c, da, dc)
    bc = lerp(b, c, db_, dc)

    # case 3-in: (a, b, c) ; case 1-in: (a, ab, ac) ; case 2-in: (a, b, bc)
    one_in = (n_in == 1)[:, None, None]
    two_in = (n_in == 2)[:, None, None]
    tri1 = jnp.where(one_in, jnp.stack([a, ab, ac], axis=1),
                     jnp.where(two_in, jnp.stack([a, b, bc], axis=1),
                               jnp.stack([a, b, c], axis=1)))
    # second output exists only in the 2-in case: (a, bc, ca')
    tri2 = jnp.stack([a, bc, ac], axis=1)

    valid1 = n_in >= 1
    valid2 = n_in == 2
    tris = jnp.concatenate([tri1, tri2], axis=0)  # [2T, 3, 4+A]
    valid = jnp.concatenate([valid1, valid2], axis=0)
    return tris[..., :4], tris[..., 4:], valid


# --------------------------------------------------------------------------
# Triangle setup (screen space)
# --------------------------------------------------------------------------
def setup_screen(clip: jnp.ndarray, valid: jnp.ndarray, rows: int, cols: int):
    """clip [T,3,4] -> screen-space setup.

    Returns dict of xy [T,3,2] (x right, y DOWN from the top row), z01 [T,3],
    inv_w [T,3], area2 [T] (y-down signed area*2), valid [T] after degenerate
    + facing cull. Front faces (GL CCW in y-up window coords) have NEGATIVE
    y-down area; back-face culling keeps area2 < 0 (raster.js:100-102).
    """
    w = clip[..., 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[..., :3] * inv_w[..., None]
    x = (ndc[..., 0] + 1.0) * 0.5 * cols
    y = (1.0 - ndc[..., 1]) * 0.5 * rows
    z01 = (ndc[..., 2] + 1.0) * 0.5
    xy = jnp.stack([x, y], axis=-1)

    e0 = xy[:, 1] - xy[:, 0]
    e1 = xy[:, 2] - xy[:, 0]
    area2 = e0[..., 0] * e1[..., 1] - e0[..., 1] * e1[..., 0]
    front = area2 < 0.0  # see docstring
    valid = valid & front & (jnp.abs(area2) > 1e-12)
    return {"xy": xy, "z01": z01, "inv_w": inv_w, "area2": area2, "valid": valid}


def _edge(ax, ay, bx, by, px, py):
    """Edge function: cross(b-a, p-a)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def visibility_scan(setup, rows: int, cols: int, chunk: int = 64):
    """Chunked z-buffer pass producing the visibility buffer.

    Returns (zbuf f32 [H,W], tid i32 [H,W], -1 = background). Each scan step
    rasterizes `chunk` triangles as a dense [C,H,W] program and min-merges.
    """
    xy, z01, valid = setup["xy"], setup["z01"], setup["valid"]
    T = xy.shape[0]
    C = min(chunk, max(T, 1))
    pad = (-T) % C
    if pad:
        padf = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        xy, z01 = padf(xy), padf(z01)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    n_chunks = (T + pad) // C

    px = jnp.arange(cols, dtype=jnp.float32) + 0.5
    py = jnp.arange(rows, dtype=jnp.float32) + 0.5
    pxg = px[None, :]  # [1, W]
    pyg = py[:, None]  # [H, 1]

    xs = xy[..., 0].reshape(n_chunks, C, 3)
    ys = xy[..., 1].reshape(n_chunks, C, 3)
    zs = z01.reshape(n_chunks, C, 3)
    vs = valid.reshape(n_chunks, C)
    tids = jnp.arange(T + pad, dtype=jnp.int32).reshape(n_chunks, C)

    def step(carry, inp):
        zbuf, tbuf = carry
        x, y, z, v, tid = inp
        # edge functions at all pixel centers: [C, H, W]
        w0 = _edge(x[:, 1, None, None], y[:, 1, None, None],
                   x[:, 2, None, None], y[:, 2, None, None], pxg, pyg)
        w1 = _edge(x[:, 2, None, None], y[:, 2, None, None],
                   x[:, 0, None, None], y[:, 0, None, None], pxg, pyg)
        w2 = _edge(x[:, 0, None, None], y[:, 0, None, None],
                   x[:, 1, None, None], y[:, 1, None, None], pxg, pyg)
        # front faces have negative orientation: inside = all edges <= 0
        inside = (w0 <= 0) & (w1 <= 0) & (w2 <= 0) & v[:, None, None]
        area = w0 + w1 + w2  # = area2 (negative)
        b0 = w0 / area
        b1 = w1 / area
        b2 = w2 / area
        zpix = b0 * z[:, 0, None, None] + b1 * z[:, 1, None, None] + b2 * z[:, 2, None, None]
        ok = inside & (zpix >= 0.0) & (zpix <= 1.0)
        zpix = jnp.where(ok, zpix, jnp.inf)
        kmin = jnp.argmin(zpix, axis=0)  # [H, W]
        zmin = jnp.min(zpix, axis=0)
        tmin = jnp.take_along_axis(tid[:, None, None] * jnp.ones_like(zpix, jnp.int32),
                                   kmin[None], axis=0)[0]
        better = zmin < zbuf
        return (jnp.where(better, zmin, zbuf),
                jnp.where(better, tmin, tbuf)), None

    z0 = jnp.full((rows, cols), jnp.inf, jnp.float32)
    t0 = jnp.full((rows, cols), -1, jnp.int32)
    (zbuf, tbuf), _ = jax.lax.scan(step, (z0, t0), (xs, ys, zs, vs, tids))
    return zbuf, tbuf


TILE_H, TILE_W = 8, 128  # f32-native VPU tile of the cell grid
SHADE_TABLE_W = 0  # 0 = exact 3A+3; else padded gather width (perf A/B)
PROBE_SKIP_SHADE_GATHER = False  # wrong-output perf probe (tools/ab_slope)
PROBE_SKIP_KEYSORT = False       # wrong-output perf probe (tools/ab_slope)
PROBE_SKIP_WALK = False          # wrong-output perf probe (tools/ab_slope)

MAX_V_CAP = (1 << 19) - 4096  # packed sort key leaves 19 bits for tri ids


def _cumsum_i32(mask: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a bool/0-1 [N] array as i32, MXU-blocked.

    XLA's native 1-D cumsum lowers poorly on TPU at raster scales (measured
    2.2 ms at N=589k — as expensive as a full sort). Blocking into [N/512,
    512] rows and multiplying by a constant upper-triangular matrix runs the
    whole scan on the MXU in ~0.1 ms. Exact: counts < 2^24 are exact in f32
    and HIGHEST-precision dots are f32-faithful."""
    n = mask.shape[0]
    c = 512
    pad = (-n) % c
    x = jnp.concatenate([mask.astype(jnp.float32),
                         jnp.zeros((pad,), jnp.float32)]).reshape(-1, c)
    triu = jnp.triu(jnp.ones((c, c), jnp.float32))  # M[j,i]=1 for j<=i
    row_cum = jax.lax.dot_general(
        x, triu, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [R, C] within-row inclusive
    offs = jnp.cumsum(row_cum[:, -1]) - row_cum[:, -1]  # exclusive row offset
    out = (row_cum + offs[:, None]).reshape(-1)[:n]
    return out.astype(jnp.int32)


_COMPACT_KEYS = ("sxa", "sxb", "sxc", "sya", "syb", "syc",
                 "sza", "szb", "szc", "iwa", "iwb", "iwc", "area2")


def compact_valid_ch(ch, v_cap: int):
    """Order-preserving compaction of the valid clipped triangles.

    The clip expansion + culling leaves ~70% of the [2T] channel slots dead
    on real meshes (bunny headline: 41k valid of 137k), yet binning, the
    pair sort, and the shading-plane table all paid for every slot. This
    compacts the 13 screen channels to a static [v_cap] via one blocked
    cumsum + one unique-index scatter + one wide row gather (~0.5 ms at
    bunny scale vs ~2+ ms saved downstream).

    Returns (cch, cidx, n_valid): cch is a channel dict like ``ch`` but
    [v_cap]-shaped (slots past n_valid are inert zeros with valid=False),
    cidx [v_cap] i32 maps compacted slot -> original [2T] index (fill = 2T),
    n_valid is the dynamic count. **If n_valid > v_cap the overflow
    triangles are dropped** — callers must check the returned count
    (see `render_soup_diag` / `suggest_caps`) and re-render with a larger
    cap; compaction preserves ascending original order, so winner selection
    and depth-tie behavior are bit-identical to the uncompacted path."""
    keys = _COMPACT_KEYS
    valid = ch["valid"]
    n2t = valid.shape[0]
    assert v_cap <= MAX_V_CAP, f"v_cap {v_cap} exceeds {MAX_V_CAP}"
    n_valid = jnp.sum(valid.astype(jnp.int32))
    ids = jnp.arange(n2t, dtype=jnp.int32)
    key = jnp.where(valid, ids, n2t + ids)  # invalid sort after all valid
    skey = jax.lax.sort(key)
    if v_cap > n2t:  # [T]-domain callers may pass caps sized for [2T]
        skey = jnp.concatenate(
            [skey, jnp.full((v_cap - n2t,), n2t, jnp.int32)])
    cidx = jnp.where(skey[:v_cap] < n2t, skey[:v_cap], n2t)
    packed = jnp.stack([ch[k] for k in keys], axis=-1)  # [N, C]
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, len(keys)), jnp.float32)], axis=0)
    g = packed[cidx].T  # one wide row gather, then channel-major unpack
    cch = {k: g[i] for i, k in enumerate(keys)}
    cch["valid"] = cidx < n2t
    return cch, cidx, n_valid


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


def clip_attrs_compact_lists(attrs: jnp.ndarray, ch, cidx: jnp.ndarray):
    """clip_attrs_channel_lists, evaluated only at the compacted slots.

    attrs f32 [V=3T, A]; ch carries the per-source-triangle lerp records
    (rot, t_ab/t_ac/t_bc, n_in — all [T]); cidx [v_cap] holds original
    [2T]-space ids (o < T = first clip output of tri o, o >= T = second).
    Returns 3 slot lists of A channels, each [v_cap]."""
    V, A = attrs.shape
    T = V // 3
    n2t = 2 * T
    attr27 = attrs.reshape(T, 3 * A)  # row-major: v0 | v1 | v2 — a free view
    info = jnp.stack([
        ch["rot"].astype(jnp.float32), ch["t_ab"], ch["t_ac"], ch["t_bc"],
        (ch["n_in"] == 1).astype(jnp.float32),
        (ch["n_in"] == 2).astype(jnp.float32),
    ], axis=-1)  # [T, 6]
    src_tri = jnp.where(cidx < n2t, cidx % T, 0)
    is2 = cidx >= T  # dump slots land here too; their values are never read
    ai = attr27[src_tri].T   # [27, v_cap]
    fo = info[src_tri].T     # [6, v_cap]
    rot, ta, tc, tb = fo[0], fo[1], fo[2], fo[3]
    one_in = fo[4] > 0.5
    two_in = fo[5] > 0.5

    out_slots = [[], [], []]
    for j in range(A):
        base = [ai[0 * A + j], ai[1 * A + j], ai[2 * A + j]]
        r = [jnp.where(rot == 0.0, base[(0 + k) % 3],
                       jnp.where(rot == 1.0, base[(1 + k) % 3],
                                 base[(2 + k) % 3])) for k in range(3)]
        ab = r[0] + ta * (r[1] - r[0])
        ac = r[0] + tc * (r[2] - r[0])
        bc = r[1] + tb * (r[2] - r[1])
        t1b = jnp.where(one_in, ab, r[1])
        t1c = jnp.where(one_in, ac, jnp.where(two_in, bc, r[2]))
        out_slots[0].append(r[0])  # tri1 and tri2 share vertex a
        out_slots[1].append(jnp.where(is2, bc, t1b))
        out_slots[2].append(jnp.where(is2, ac, t1c))
    return out_slots


def count_big_small(ch, rows: int, cols: int, tile_window: int = 2):
    """Classify valid tris by bbox tile span (duplicates the binning
    classification; XLA CSEs it away when both live in one program).
    Returns (n_small, n_big) i32 scalars."""
    xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
    ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
    xmin = jnp.minimum(jnp.minimum(xa, xb), xc)
    xmax = jnp.maximum(jnp.maximum(xa, xb), xc)
    ymin = jnp.minimum(jnp.minimum(ya, yb), yc)
    ymax = jnp.maximum(jnp.maximum(ya, yb), yc)
    tx0 = jnp.floor(xmin / TILE_W).astype(jnp.int32)
    ty0 = jnp.floor(ymin / TILE_H).astype(jnp.int32)
    tx1 = jnp.floor(xmax / TILE_W).astype(jnp.int32)
    ty1 = jnp.floor(ymax / TILE_H).astype(jnp.int32)
    onscreen = (xmax > 0) & (xmin < cols) & (ymax > 0) & (ymin < rows)
    fits = ((tx1 - tx0) < tile_window) & ((ty1 - ty0) < tile_window)
    small = ch["valid"] & onscreen & fits
    big = ch["valid"] & onscreen & jnp.logical_not(fits)
    return small.sum().astype(jnp.int32), big.sum().astype(jnp.int32)


def clip_attrs_channel_lists(attrs: jnp.ndarray, ch):
    """Apply the clip rotation + lerp recorded by transform_clip_channels to
    per-vertex attributes, channel-wise. attrs f32 [V=3T, A] ->
    3 lists (one per output vertex slot) of A channels, each [2T]."""
    V, A = attrs.shape
    T = V // 3
    # One channel-major transpose up front: [V, A] -> [3*A, T]. Every
    # per-channel read below is then a contiguous [T] row instead of a
    # stride-A minor-axis slice (which wastes 1-1/A of every vector load;
    # measured 10.6 ms -> ~1 ms/frame on the 69k-tri headline).
    av_t = attrs.reshape(T, 3 * A).T
    rot = ch["rot"]
    n_in = ch["n_in"]
    one_in = n_in == 1
    two_in = n_in == 2
    ta, tc, tb = ch["t_ab"], ch["t_ac"], ch["t_bc"]

    def rot_sel(c0, c1, c2, r):
        return jnp.where(r == 0, c0, jnp.where(r == 1, c1, c2))

    out_slots = [[], [], []]  # per output slot: list of [2T] channels
    for j in range(A):
        base = [av_t[0 * A + j], av_t[1 * A + j], av_t[2 * A + j]]
        r = [rot_sel(base[(0 + k) % 3], base[(1 + k) % 3], base[(2 + k) % 3],
                     rot) for k in range(3)]
        ab = r[0] + ta * (r[1] - r[0])
        ac = r[0] + tc * (r[2] - r[0])
        bc = r[1] + tb * (r[2] - r[1])
        t1a = r[0]
        t1b = jnp.where(one_in, ab, r[1])
        t1c = jnp.where(one_in, ac, jnp.where(two_in, bc, r[2]))
        out_slots[0].append(jnp.concatenate([t1a, r[0]]))
        out_slots[1].append(jnp.concatenate([t1b, bc]))
        out_slots[2].append(jnp.concatenate([t1c, ac]))
    return out_slots


def clip_attrs_channels(attrs: jnp.ndarray, ch) -> jnp.ndarray:
    """Array-layout view of clip_attrs_channel_lists: tattr [2T, 3, A]
    (used by the scan/oracle paths and tests)."""
    out_slots = clip_attrs_channel_lists(attrs, ch)
    slot_arr = [jnp.stack(s, axis=-1) for s in out_slots]  # 3 x [2T, A]
    return jnp.stack(slot_arr, axis=1)  # [2T, 3, A]


def channels_clip_array(ch) -> jnp.ndarray:
    """Materialize the [2T, 3, 4] clip array from channels (one stack; used
    only by the deferred shading gather)."""
    rowsv = []
    for s in "abc":
        rowsv.append(jnp.stack([ch[f"x{s}"], ch[f"y{s}"], ch[f"z{s}"],
                                ch[f"w{s}"]], axis=-1))
    return jnp.stack(rowsv, axis=1)


def _build_bins(ch, rows: int, cols: int, big_cap: int = 64,
                tile_window: int = 2):
    """Shared binning prep: (tile, tri) pairs -> packed sort -> offsets.
    Returns (tri_s [P] i32 sorted pair tri-ids, offsets [n_tiles+1] i32,
    tiles_y, tiles_x)."""
    xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
    ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
    valid = ch["valid"]
    T = xa.shape[0]
    assert T < (1 << 19), "packed sort key supports < 524288 clipped tris"
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    wy = wx = tile_window

    xmin = jnp.minimum(jnp.minimum(xa, xb), xc)
    xmax = jnp.maximum(jnp.maximum(xa, xb), xc)
    ymin = jnp.minimum(jnp.minimum(ya, yb), yc)
    ymax = jnp.maximum(jnp.maximum(ya, yb), yc)
    tx0 = jnp.floor(xmin / TILE_W).astype(jnp.int32)
    ty0 = jnp.floor(ymin / TILE_H).astype(jnp.int32)
    tx1 = jnp.floor(xmax / TILE_W).astype(jnp.int32)
    ty1 = jnp.floor(ymax / TILE_H).astype(jnp.int32)
    onscreen = (xmax > 0) & (xmin < cols) & (ymax > 0) & (ymin < rows)
    fits = ((tx1 - tx0) < wx) & ((ty1 - ty0) < wy)
    small = valid & onscreen & fits
    big = valid & onscreen & jnp.logical_not(fits)

    oy = jnp.arange(wy, dtype=jnp.int32)
    ox = jnp.arange(wx, dtype=jnp.int32)
    ty = ty0[:, None, None] + oy[None, :, None]
    tx = tx0[:, None, None] + ox[None, None, :]
    pair_ok = (small[:, None, None]
               & (ty >= 0) & (ty < tiles_y) & (tx >= 0) & (tx < tiles_x)
               & (ty <= ty1[:, None, None]) & (tx <= tx1[:, None, None]))
    tile_small = jnp.where(pair_ok, ty * tiles_x + tx, n_tiles).reshape(-1)
    tri_small = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None, None], (T, wy, wx)).reshape(-1)

    (big_idx,) = jnp.nonzero(big, size=big_cap, fill_value=T)

    def padi(c, fill):
        return jnp.concatenate([c, jnp.asarray([fill], c.dtype)])[big_idx]

    btx0 = padi(tx0, 1)
    btx1 = padi(tx1, 0)
    bty0 = padi(ty0, 1)
    bty1 = padi(ty1, 0)
    tids_grid = jnp.arange(n_tiles, dtype=jnp.int32)
    g_ty = tids_grid // tiles_x
    g_tx = tids_grid % tiles_x
    overlap = ((g_tx[None, :] >= btx0[:, None]) & (g_tx[None, :] <= btx1[:, None])
               & (g_ty[None, :] >= bty0[:, None]) & (g_ty[None, :] <= bty1[:, None])
               & (big_idx < T)[:, None])
    tile_big = jnp.where(overlap, tids_grid[None, :], n_tiles).reshape(-1)
    tri_big = jnp.broadcast_to(big_idx[:, None],
                               (big_cap, n_tiles)).reshape(-1).astype(jnp.int32)
    tri_big = jnp.minimum(tri_big, T - 1)

    tile_id = jnp.concatenate([tile_small, tile_big])
    pair_tri = jnp.concatenate([tri_small, tri_big])
    packed = jax.lax.sort((tile_id << 19) | pair_tri)
    tile_s = packed >> 19
    tri_s = packed & ((1 << 19) - 1)
    offsets = jnp.searchsorted(tile_s, jnp.arange(n_tiles + 1,
                                                  dtype=jnp.int32)
                               ).astype(jnp.int32)
    return tri_s, offsets, tiles_y, tiles_x


def render_fused_ch(ch, attr_slots, scene: SceneData, rows: int, cols: int,
                    big_cap: int = 64):
    """Fully fused rasterization: binning + the shaded Pallas kernel
    (ops/raster_bins.tile_eval_bins_shaded) — no visibility buffer, no
    deferred gathers. attr_slots: 3 lists of 9 channels [2T] each
    (nx ny nz cr cg cb wx wy wz per output vertex slot)."""
    from ascii_renderer_tpu.ops import raster_bins as RB

    tri_s, offsets, tiles_y, tiles_x = _build_bins(ch, rows, cols, big_cap)
    n_tiles = tiles_y * tiles_x
    P = tri_s.shape[0]

    def padg(c, fill=0.0):
        return jnp.concatenate([c, jnp.asarray([fill], c.dtype)])[tri_s]

    chans = [jnp.ones((P,), jnp.float32)]  # S_VALID
    for key in ("sxa", "sxb", "sxc", "sya", "syb", "syc"):
        chans.append(padg(ch[key]))
    for key in ("sza", "szb", "szc"):
        chans.append(padg(ch[key], jnp.inf))
    for key in ("iwa", "iwb", "iwc"):
        chans.append(padg(ch[key]))
    for slot in range(3):
        for a in range(9):
            chans.append(padg(attr_slots[slot][a]))
    data = jnp.stack(chans, axis=-1)  # [P, 40]
    data = jnp.concatenate(
        [data, jnp.zeros((P, RB.NS_CHAN - data.shape[1]), jnp.float32)],
        axis=-1)
    tail = RB.S_CHUNK + 8 * RB.NS_PACK
    total = P + tail
    pad_rows = (-total) % RB.NS_PACK + tail
    data = jnp.concatenate(
        [data, jnp.zeros((pad_rows, RB.NS_CHAN), jnp.float32)], axis=0)
    packed = data.reshape(data.shape[0] // RB.NS_PACK,
                          RB.NS_PACK * RB.NS_CHAN)

    # light params (matches shade_visibility's semantics)
    ambient = scene.env_color * scene.env_intensity
    have_dl = scene.n_dl > 0
    ddir = jnp.where(have_dl, scene.dl_dir[0],
                     jnp.asarray(_DEFAULT_DIR, jnp.float32))
    dcol = jnp.where(have_dl, scene.dl_col[0],
                     jnp.asarray(_DEFAULT_DIR_COL, jnp.float32))
    n_pl = jnp.minimum(scene.n_pt, RB.L_MAX_PL).astype(jnp.float32)
    lp = jnp.zeros((64,), jnp.float32)
    lp = lp.at[0:3].set(ambient).at[3:6].set(ddir).at[6:9].set(dcol)
    lp = lp.at[9].set(n_pl)
    for i in range(min(RB.L_MAX_PL, scene.pt_pos.shape[0])):
        lp = lp.at[10 + 6 * i: 13 + 6 * i].set(scene.pt_pos[i])
        lp = lp.at[13 + 6 * i: 16 + 6 * i].set(scene.pt_col[i])

    rgbt = RB.tile_eval_bins_shaded(packed, offsets, lp, tiles_x, n_tiles)
    img = (rgbt.reshape(tiles_y, tiles_x, 3, TILE_H, TILE_W)
           .transpose(0, 3, 1, 4, 2)
           .reshape(tiles_y * TILE_H, tiles_x * TILE_W, 3))
    return img[:rows, :cols]


def build_plane_table(ch, attr_slots) -> jnp.ndarray:
    """Per-triangle shading-plane table [N, 3*(A+1) padded to 8] (see
    shade_planes_ch): A attribute planes + the perspective denominator,
    3 coeffs each. A = 9 (nx ny nz cr cg cb wx wy wz) normally; 6 when
    the scene has no point lights (world-pos planes feed only the
    point-light terms — a static specialization worth ~25% of the
    table-build math at bunny scale)."""
    A = len(attr_slots[0])
    sx = [ch[f"sx{s}"] for s in "abc"]
    sy = [ch[f"sy{s}"] for s in "abc"]
    iw = [ch[f"iw{s}"] for s in "abc"]
    # edge-function coefficients: w_k = alpha_k*px + beta_k*py + gamma_k
    alpha, beta, gamma = [], [], []
    for k in range(3):
        x1, y1 = sx[(k + 1) % 3], sy[(k + 1) % 3]
        x2, y2 = sx[(k + 2) % 3], sy[(k + 2) % 3]
        alpha.append(-(y2 - y1))
        beta.append(x2 - x1)
        gamma.append((y2 - y1) * x1 - (x2 - x1) * y1)
    area = ch["area2"]  # w0+w1+w2 is constant per tri (set in setup)
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)

    planes = []  # 10 x (a, b, c) channels [2T]
    for j in range(A):
        av = [attr_slots[k][j] for k in range(3)]
        pa = sum(alpha[k] * iw[k] * av[k] for k in range(3)) * inv_area
        pb = sum(beta[k] * iw[k] * av[k] for k in range(3)) * inv_area
        pc = sum(gamma[k] * iw[k] * av[k] for k in range(3)) * inv_area
        planes.append((pa, pb, pc))
    da = sum(alpha[k] * iw[k] for k in range(3)) * inv_area
    db = sum(beta[k] * iw[k] for k in range(3)) * inv_area
    dc = sum(gamma[k] * iw[k] for k in range(3)) * inv_area
    planes.append((da, db, dc))

    chans = [c for p in planes for c in p]
    n = chans[0].shape[0]
    if n % 512 == 0:  # MXU-transpose pack (see ops/pack.py)
        from ascii_renderer_tpu.ops.pack import pack_channels
        return pack_channels(chans)
    table = jnp.stack(chans, axis=-1)
    pad = (-table.shape[1]) % 8
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((table.shape[0], pad), jnp.float32)], axis=-1)
    return table


def shade_planes_ch(tid, ch, attr_slots, scene: SceneData, rows: int,
                    cols: int):
    """Deferred shading via per-triangle screen-space PLANE coefficients.

    Perspective-correct interpolation of attribute A is N_A(p)/D(p) where
    both N_A = sum_k w_k(p) iw_k A_k / area and D = sum_k w_k(p) iw_k / area
    are LINEAR in the pixel coords (the edge functions w_k are). So each
    triangle precomputes 10 planes (9 attrs + denominator, 3 coeffs each)
    as cheap channel math, and the per-pixel stage is ONE 32-wide
    gather + ~40 FMAs — replacing the two wide vertex gathers (clip +
    attrs, ~80 MB of random access) the rederivation needed."""
    table = build_plane_table(ch, attr_slots)
    table = jnp.concatenate(
        [table, jnp.zeros((1, table.shape[1]), jnp.float32)], axis=0)  # bg
    return shade_from_table(tid, table, scene, rows, cols,
                            n_attrs=len(attr_slots[0]))


def shade_from_table(tid, table, scene: SceneData, rows: int, cols: int,
                     n_attrs: int = 9):
    """Per-pixel plane evaluation + reference fragment lighting.

    tid i32 [rows, cols] indexes rows of `table` [N+1, W] (plane-table
    rows + one trailing all-zero background row); -1 = background.
    n_attrs = 6 when the table was built without world-pos planes
    (lightless-scene specialization; point lights require 9)."""
    R_ = rows * cols
    tidf = tid.reshape(R_)
    hit = tidf >= 0
    g = table[jnp.where(hit, tidf, table.shape[0] - 1)]  # [R, W]
    px = jnp.broadcast_to((jnp.arange(cols, dtype=jnp.float32) + 0.5)[None],
                          (rows, cols)).reshape(R_)
    py = jnp.broadcast_to((jnp.arange(rows, dtype=jnp.float32) + 0.5)[:, None],
                          (rows, cols)).reshape(R_)
    rgb = _shade_rows(g, hit, px, py, scene, n_attrs)
    return rgb.reshape(rows, cols, 3)


def _shade_rows(g, hit, px, py, scene: SceneData, n_attrs: int):
    """Plane evaluation + lighting over flat pixel rows: g [R, W] gathered
    plane rows, hit [R], px/py [R] pixel centers -> rgb f32 [R, 3]."""
    dn = 3 * n_attrs
    d = g[:, dn] * px + g[:, dn + 1] * py + g[:, dn + 2]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

    def attr(j):
        return (g[:, 3 * j] * px + g[:, 3 * j + 1] * py
                + g[:, 3 * j + 2]) * inv_d

    nx, ny, nz = attr(0), attr(1), attr(2)
    cr, cg, cb = attr(3), attr(4), attr(5)
    if n_attrs >= 9:
        wx, wy_, wz = attr(6), attr(7), attr(8)
    else:
        assert scene.pt_pos.shape[0] == 0, (
            "point lights require world-pos planes (n_attrs=9)")
        wx = wy_ = wz = jnp.zeros_like(nx)
    inv_nl = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
    nx, ny, nz = nx * inv_nl, ny * inv_nl, nz * inv_nl

    ambient = scene.env_color * scene.env_intensity
    have_dl = scene.n_dl > 0
    ddir = jnp.where(have_dl, scene.dl_dir[0],
                     jnp.asarray(_DEFAULT_DIR, jnp.float32))
    dcol = jnp.where(have_dl, scene.dl_col[0],
                     jnp.asarray(_DEFAULT_DIR_COL, jnp.float32))
    ndl = jnp.maximum(-(nx * ddir[0] + ny * ddir[1] + nz * ddir[2]), 0.0)
    out_r = cr * (ambient[0] + dcol[0] * ndl)
    out_g = cg * (ambient[1] + dcol[1] * ndl)
    out_b = cb * (ambient[2] + dcol[2] * ndl)

    pl_valid = jnp.arange(scene.pt_pos.shape[0]) < scene.n_pt
    for i in range(scene.pt_pos.shape[0]):
        lx = scene.pt_pos[i, 0] - wx
        ly = scene.pt_pos[i, 1] - wy_
        lz = scene.pt_pos[i, 2] - wz
        d2 = jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-4)
        inv_dd = jax.lax.rsqrt(d2)
        ndlp = jnp.maximum((nx * lx + ny * ly + nz * lz) * inv_dd, 0.0)
        att = 1.0 / (1.0 + d2 * 0.05)
        w_i = jnp.where(pl_valid[i], ndlp * att, 0.0)
        out_r = out_r + cr * scene.pt_col[i, 0] * w_i
        out_g = out_g + cg * scene.pt_col[i, 1] * w_i
        out_b = out_b + cb * scene.pt_col[i, 2] * w_i

    rgb = jnp.stack([jnp.clip(out_r, 0.0, 1.0), jnp.clip(out_g, 0.0, 1.0),
                     jnp.clip(out_b, 0.0, 1.0)], axis=-1)
    return jnp.where(hit[:, None], rgb, 0.0)


def visibility_binned_ch(ch, rows: int, cols: int, *, kernel: str = "mm",
                         big_cap: int = 64,
                         tile_window: int = 2):
    """Channel-major tile-binned visibility with EXACT per-tile bins.

    1. small triangles (bbox within a 2x2 tile window) emit up to 4
       (tile, tri) pairs; big triangles (up to ``big_cap``, compacted) emit
       one pair per bbox-overlapped tile — so walls/floors cost pairs, not
       a full-screen scan pass;
    2. one packed (tile << 19 | tri) i32 sort + searchsorted builds exact
       per-tile bin ranges;
    3. triangle channel data is pre-gathered into sorted-pair order and the
       Pallas kernel (ops/raster_bins.py) walks each tile's bin with a
       DYNAMIC chunk loop — nothing is capped or dropped, work scales with
       actual bin sizes.

    Only triangles beyond ``big_cap`` *screen-huge* ones are dropped (a
    scene with more than 64 wall-scale triangles on screen should raise
    the cap)."""
    from ascii_renderer_tpu.ops import raster_bins as RB

    xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
    ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
    za, zb, zc = ch["sza"], ch["szb"], ch["szc"]
    valid = ch["valid"]
    T = xa.shape[0]
    assert T < (1 << 19), "packed sort key supports < 524288 clipped tris"
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    wy = wx = tile_window

    xmin = jnp.minimum(jnp.minimum(xa, xb), xc)
    xmax = jnp.maximum(jnp.maximum(xa, xb), xc)
    ymin = jnp.minimum(jnp.minimum(ya, yb), yc)
    ymax = jnp.maximum(jnp.maximum(ya, yb), yc)
    tx0 = jnp.floor(xmin / TILE_W).astype(jnp.int32)
    ty0 = jnp.floor(ymin / TILE_H).astype(jnp.int32)
    tx1 = jnp.floor(xmax / TILE_W).astype(jnp.int32)
    ty1 = jnp.floor(ymax / TILE_H).astype(jnp.int32)
    onscreen = (xmax > 0) & (xmin < cols) & (ymax > 0) & (ymin < rows)
    fits = ((tx1 - tx0) < wx) & ((ty1 - ty0) < wy)
    small = valid & onscreen & fits
    big = valid & onscreen & jnp.logical_not(fits)

    # ---- small pairs: static 2x2 window ----
    # Built as wy*wx flat [T] channels, NOT a [T, wy, wx] array: minor dims
    # of size 2 put 2 of 128 vector lanes to work. The pre-sort pair order
    # differs from the array layout but the multiset of (tile, tri) keys is
    # identical, and the packed sort canonicalizes it.
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    tile_small_parts = []
    for k in range(wy * wx):
        ty = ty0 + (k // wx)
        tx = tx0 + (k % wx)
        ok = (small & (ty >= 0) & (ty < tiles_y) & (tx >= 0) & (tx < tiles_x)
              & (ty <= ty1) & (tx <= tx1))
        tile_small_parts.append(jnp.where(ok, ty * tiles_x + tx, n_tiles))
    tile_small = jnp.concatenate(tile_small_parts)
    tri_small = jnp.tile(tri_ids, wy * wx)

    # ---- big pairs: per-overlapped-tile emission for <= big_cap tris ----
    # top_k on a 0/1 score instead of jnp.nonzero: one fused op vs the
    # ~50-op cumsum+scatter decomposition. XLA top_k is stable, so equal
    # scores keep ascending index order — same result as nonzero.
    scores, idxs = jax.lax.top_k(big.astype(jnp.int32), big_cap)
    big_idx = jnp.where(scores > 0, idxs, T)

    def padi(c, fill):
        return jnp.concatenate([c, jnp.asarray([fill], c.dtype)])[big_idx]

    btx0 = padi(tx0, 1)
    btx1 = padi(tx1, 0)  # fill slots get an empty range
    bty0 = padi(ty0, 1)
    bty1 = padi(ty1, 0)
    tids_grid = jnp.arange(n_tiles, dtype=jnp.int32)
    g_ty = tids_grid // tiles_x
    g_tx = tids_grid % tiles_x
    overlap = ((g_tx[None, :] >= btx0[:, None]) & (g_tx[None, :] <= btx1[:, None])
               & (g_ty[None, :] >= bty0[:, None]) & (g_ty[None, :] <= bty1[:, None])
               & (big_idx < T)[:, None])
    tile_big = jnp.where(overlap, tids_grid[None, :], n_tiles).reshape(-1)
    tri_big = jnp.broadcast_to(big_idx[:, None],
                               (big_cap, n_tiles)).reshape(-1).astype(jnp.int32)
    tri_big = jnp.minimum(tri_big, T - 1)  # fill slots point anywhere (dumped)

    tile_id = jnp.concatenate([tile_small, tile_big])
    pair_tri = jnp.concatenate([tri_small, tri_big])

    packed = jax.lax.sort((tile_id << 19) | pair_tri)
    tile_s = packed >> 19
    tri_s = packed & ((1 << 19) - 1)
    offsets = jnp.searchsorted(tile_s, jnp.arange(n_tiles + 1,
                                                  dtype=jnp.int32)
                               ).astype(jnp.int32)

    # ---- pre-gather channel data into sorted-pair order ----
    # ONE [P, 16] row gather instead of nine 1-D gathers: TPU gather cost
    # is dominated by rows/sec, not bytes, so packing all entry channels
    # into 64 B rows first is ~9x cheaper (measured: 35 ms -> 4 ms/frame
    # on the 69k-tri headline). Channel 10 is prefilled with arange(T) so
    # the gathered value IS the source triangle id; tri_s is always in
    # [0, T) (small pairs carry real ids, big fill slots are min'd to T-1)
    # so no fill row is needed.
    P = tri_s.shape[0]
    # entries in PLANE form (see ops/raster_bins.py): per-edge coefficients
    # w_k = A_k*px + B_k*py + G_k plus the screen-linear depth plane
    # z = ZX*px + ZY*py + ZC — the kernel then runs pure FMAs with no
    # per-pixel divide. Computed as [2T] channel math, negligible next to
    # the per-pixel work it removes from the kernel.
    sxv, syv, szv = (xa, xb, xc), (ya, yb, yc), (za, zb, zc)
    acs, bcs, gcs = [], [], []
    for k in range(3):
        x1, y1 = sxv[(k + 1) % 3], syv[(k + 1) % 3]
        x2, y2 = sxv[(k + 2) % 3], syv[(k + 2) % 3]
        acs.append(-(y2 - y1))
        bcs.append(x2 - x1)
        gcs.append((y2 - y1) * x1 - (x2 - x1) * y1)
    area = (xb - xa) * (yc - ya) - (yb - ya) * (xc - xa)  # == w0+w1+w2
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    zpx = (acs[0] * za + acs[1] * zb + acs[2] * zc) * inv_area
    zpy = (bcs[0] * za + bcs[1] * zb + bcs[2] * zc) * inv_area
    zpc = (gcs[0] * za + gcs[1] * zb + gcs[2] * zc) * inv_area
    src = jnp.stack([
        acs[0], bcs[0], gcs[0], acs[1], bcs[1], gcs[1],
        acs[2], bcs[2], gcs[2], zpx, zpy, zpc,
        jnp.ones_like(xa),
        jnp.arange(xa.shape[0], dtype=jnp.float32),
    ], axis=-1)
    src = jnp.concatenate(
        [src, jnp.zeros((src.shape[0], RB.N_CHAN - 14), jnp.float32)],
        axis=-1)
    # inert tail so any aligned slab read past the last bin stays in bounds,
    # rounded so the packed layout divides evenly. Folded into the gather:
    # row T of src is all-zero and the padded tail of tri_s points at it,
    # so the single row gather emits the padded table directly.
    if kernel == "mm":
        tail = 2 * RB.MM_CHUNK
        quantum = RB.MM_CHUNK
    else:
        tail = RB.CHUNK + 8 * RB.PACK
        quantum = RB.PACK
    total = P + tail
    pad_rows = (-total) % quantum + tail
    src = jnp.concatenate([src, jnp.zeros((1, RB.N_CHAN), jnp.float32)])
    tri_sp = jnp.concatenate(
        [tri_s, jnp.full((pad_rows,), src.shape[0] - 1, jnp.int32)])
    data = src[tri_sp]
    if kernel == "mm":
        mm = data.reshape(-1, RB.MM_CHUNK, RB.N_CHAN).transpose(0, 2, 1)
        ztile, tidf = RB.tile_eval_bins_mm(mm, offsets, tiles_x, n_tiles)
    else:
        packed = RB.pack_entries(data)
        ztile, tidf = RB.tile_eval_bins(packed, offsets, tiles_x, n_tiles)
    tt = tidf.astype(jnp.int32)

    zimg = (ztile.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W))
    timg = (tt.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W))
    zbuf = zimg[:rows, :cols]
    tid = jnp.where(timg[:rows, :cols] < 0, -1, timg[:rows, :cols])
    return zbuf, tid


def _entry_planes_src(ch) -> jnp.ndarray:
    """Per-triangle GLOBAL-coordinate plane channels for the subtile kernel:
    src f32 [T+1, 16] with A/B/G per edge + ZX/ZY/ZC depth plane (pixel-
    center form: w_k = A_k*px + B_k*py + G_k evaluated at px+0.5 handled by
    the per-pair fold in build_subtile_rows). Row T is the all-zero dump."""
    xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
    ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
    za, zb, zc = ch["sza"], ch["szb"], ch["szc"]
    sxv, syv = (xa, xb, xc), (ya, yb, yc)
    acs, bcs, gcs = [], [], []
    for k in range(3):
        x1, y1 = sxv[(k + 1) % 3], syv[(k + 1) % 3]
        x2, y2 = sxv[(k + 2) % 3], syv[(k + 2) % 3]
        acs.append(-(y2 - y1))
        bcs.append(x2 - x1)
        gcs.append((y2 - y1) * x1 - (x2 - x1) * y1)
    area = (xb - xa) * (yc - ya) - (yb - ya) * (xc - xa)
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    zpx = (acs[0] * za + acs[1] * zb + acs[2] * zc) * inv_area
    zpy = (bcs[0] * za + bcs[1] * zb + bcs[2] * zc) * inv_area
    zpc = (gcs[0] * za + gcs[1] * zb + gcs[2] * zc) * inv_area
    zero = jnp.zeros_like(xa)
    src = jnp.stack([
        acs[0], bcs[0], gcs[0], acs[1], bcs[1], gcs[1],
        acs[2], bcs[2], gcs[2], zpx, zpy, zpc,
        zero, zero, zero, zero,
    ], axis=-1)
    # dump row (dead bin slots): G0 = +1 -> w0 > 0 never inside; ZC = 2
    # as belt-and-braces (z > 1 also fails the depth-range test)
    dump = jnp.zeros((1, 16), jnp.float32).at[0, 2].set(1.0).at[0, 11].set(2.0)
    return jnp.concatenate([src, dump], axis=0)


def _subtile_pair_keys(cch, rows: int, cols: int, *, big_cap: int):
    """Sorted (bin << SUB_SHIFT | tri) pair keys for the subtile pipeline
    (see visibility_subtile for the binning rules)."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    xa, xb, xc = cch["sxa"], cch["sxb"], cch["sxc"]
    ya, yb, yc = cch["sya"], cch["syb"], cch["syc"]
    xmin = jnp.minimum(jnp.minimum(xa, xb), xc)
    xmax = jnp.maximum(jnp.maximum(xa, xb), xc)
    ymin = jnp.minimum(jnp.minimum(ya, yb), yc)
    ymax = jnp.maximum(jnp.maximum(ya, yb), yc)
    return _pair_keys_core(xmin, xmax, ymin, ymax, cch["valid"], rows, cols,
                           big_cap=big_cap)


def visibility_subtile(cch, rows: int, cols: int, *, big_cap: int = 64,
                       r_cap: int = 16384, pair_cap: int = 1 << 30):
    """Subtile-binned visibility via ops/raster_subtile (see its docstring).

    Bins are per (8-row tile, 16-px column subtile); small tris (bbox
    within a 2x2 tile-row x subtile-col window) emit up to 4 pairs, big
    tris (up to big_cap, compacted) one pair per overlapped subtile.
    Returns (zbuf f32 [rows, cols], pair_idx i32 [rows, cols] (-1 = bg),
    tri_s i32 [P] pair->triangle map, n_rows, n_pairs) — callers must
    check n_rows <= r_cap (aligned-layout capacity) for exactness."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    assert r_cap % RS.CHUNK_R == 0
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    keys = _subtile_pair_keys(cch, rows, cols, big_cap=big_cap)
    tri_s = (keys & (RS.MAX_TRI - 1)).astype(jnp.int32)

    src = _entry_planes_src(cch)
    rows_data, rowptr, n_rows, n_pairs = RS.build_subtile_rows(
        src, keys, tiles_x, n_tiles, r_cap, pair_cap, entry="pair")
    ztile, etile = RS.tile_eval_subtile(rows_data, rowptr, tiles_x, n_tiles)

    zimg = (ztile.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W))
    eimg = (etile.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W))
    zbuf = zimg[:rows, :cols]
    eidx = eimg[:rows, :cols].astype(jnp.int32)
    eidx = jnp.where(eidx < 0, -1, eidx)
    return zbuf, eidx, tri_s, n_rows, n_pairs


def visibility_subtile_tiles(cch, rows: int, cols: int, *, big_cap: int,
                             r_cap: int, pair_cap: int):
    """Tiled-form twin of visibility_subtile for the tile-compacted shade:
    returns (etile f32 [n_tiles, 8, 128] winning TRIANGLE ids (-1 = bg),
    nonempty bool [n_tiles], n_rows, n_pairs). Emitting tri ids (not pair
    ids) lets shading index the per-triangle plane table directly — no
    [pair_cap]-row pair-table gather. A tile is nonempty iff it owns
    aligned rows (its bins hold at least one pair)."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    assert r_cap % RS.CHUNK_RP == 0
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    keys = _subtile_pair_keys(cch, rows, cols, big_cap=big_cap)
    src = _entry_planes_src(cch)
    rows128, rowptr, n_rows, n_pairs = RS.build_packed_rows(
        src, keys, tiles_x, n_tiles, r_cap, pair_cap, entry="tri")
    _ztile, etile = RS.tile_eval_packed(rows128, rowptr, tiles_x, n_tiles)
    nonempty = rowptr[1:] > rowptr[:-1]
    return etile, nonempty, n_rows, n_pairs


def shade_tiles_compact(etile, nonempty, ptable, scene: SceneData,
                        rows: int, cols: int, tile_cap: int, n_attrs: int):
    """Tile-compacted deferred shading: only NONEMPTY tiles' pixels run the
    plane-table gather + lighting (the bunny headline covers ~14% of the
    screen; the full-image gather paid for every background pixel).

    etile f32 [n_tiles, 8, 128] winning pair ids; ptable [P+1, W] with the
    trailing background row; returns rgb f32 [rows, cols, 3]. Tiles beyond
    ``tile_cap`` are dropped — callers check diag n_tiles_nz and retry."""
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    (nz_ids,) = jnp.nonzero(nonempty, size=tile_cap, fill_value=n_tiles)
    pad_tile = jnp.full((1, TILE_H, TILE_W), -1.0, jnp.float32)
    et = jnp.concatenate([etile, pad_tile], axis=0)[nz_ids]  # [tc, 8, 128]

    idx = et.reshape(-1).astype(jnp.int32)
    hit = idx >= 0
    g = ptable[jnp.where(hit, idx, ptable.shape[0] - 1)]  # [tc*1024, W]

    t_ids = jnp.minimum(nz_ids, n_tiles - 1)
    ty = (t_ids // tiles_x).astype(jnp.float32)
    tx = (t_ids % tiles_x).astype(jnp.float32)
    sub = jnp.arange(TILE_H, dtype=jnp.float32)
    lane = jnp.arange(TILE_W, dtype=jnp.float32)
    px = jnp.broadcast_to(
        tx[:, None, None] * TILE_W + lane[None, None, :] + 0.5,
        (tile_cap, TILE_H, TILE_W))
    py = jnp.broadcast_to(
        ty[:, None, None] * TILE_H + sub[None, :, None] + 0.5,
        (tile_cap, TILE_H, TILE_W))
    rgb_flat = _shade_rows(g, hit, px.reshape(-1), py.reshape(-1), scene,
                           n_attrs)
    rgb_tiles = rgb_flat.reshape(tile_cap, TILE_H, TILE_W, 3)
    full = jnp.zeros((n_tiles + 1, TILE_H, TILE_W, 3), jnp.float32)
    full = full.at[nz_ids].set(rgb_tiles, mode="drop")
    img = (full[:n_tiles].reshape(tiles_y, tiles_x, TILE_H, TILE_W, 3)
           .transpose(0, 2, 1, 3, 4)
           .reshape(tiles_y * TILE_H, tiles_x * TILE_W, 3))
    return img[:rows, :cols]


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
    px = jnp.broadcast_to(xl[:, None, :],
                          (grp_cap, TILE_H, TILE_W)).reshape(-1)
    py = jnp.broadcast_to(
        yl[:, None, :] + (jnp.arange(TILE_H, dtype=jnp.float32)
                          + 0.5)[None, :, None],
        (grp_cap, TILE_H, TILE_W)).reshape(-1)
    rgb = _shade_rows(g, hit, px, py, scene, n_attrs)
    return rgb.reshape(grp_cap, TILE_H, TILE_W, 3)


def visibility_binned(setup, rows: int, cols: int, slots: int = 256,
                      tile_window: int = 2, big_cap: int = 64,
                      slot_chunk: int = 16):
    """Setup-dict adapter over visibility_binned_ch (kept for tests and
    API compatibility; `slots`/`slot_chunk` are obsolete no-ops from the
    fixed-slot-table design)."""
    xy, z01 = setup["xy"], setup["z01"]
    ch = {
        "sxa": xy[:, 0, 0], "sya": xy[:, 0, 1],
        "sxb": xy[:, 1, 0], "syb": xy[:, 1, 1],
        "sxc": xy[:, 2, 0], "syc": xy[:, 2, 1],
        "sza": z01[:, 0], "szb": z01[:, 1], "szc": z01[:, 2],
        "valid": setup["valid"],
    }
    return visibility_binned_ch(ch, rows, cols, big_cap=big_cap,
                                tile_window=tile_window)





def shade_visibility(tid, clip, attrs, scene: SceneData, rows: int, cols: int):
    """Deferred pass: gather winner-triangle data per pixel, reconstruct
    perspective-correct barycentrics, run the fragment lighting."""
    hit = tid >= 0
    safe = jnp.maximum(tid, 0)
    tri_clip = clip[safe]  # [H, W, 3, 4]
    tri_attr = attrs[safe]  # [H, W, 3, A]

    w = tri_clip[..., 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = tri_clip[..., :2] * inv_w[..., None]
    x = (ndc[..., 0] + 1.0) * 0.5 * cols
    y = (1.0 - ndc[..., 1]) * 0.5 * rows

    px = jnp.arange(cols, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(rows, dtype=jnp.float32)[:, None] + 0.5
    w0 = _edge(x[..., 1], y[..., 1], x[..., 2], y[..., 2], px, py)
    w1 = _edge(x[..., 2], y[..., 2], x[..., 0], y[..., 0], px, py)
    w2 = _edge(x[..., 0], y[..., 0], x[..., 1], y[..., 1], px, py)
    area = w0 + w1 + w2
    area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    b = jnp.stack([w0, w1, w2], axis=-1) / area[..., None]  # [H, W, 3]

    # perspective-correct interpolation (GL default for varyings)
    bw = b * inv_w
    denom = jnp.sum(bw, axis=-1, keepdims=True)
    bpc = bw / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    interp = jnp.einsum("hwk,hwka->hwa", bpc, tri_attr)  # [H, W, A]

    nrm = interp[..., 0:3]
    col = interp[..., 3:6]
    pos = interp[..., 6:9]
    n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

    ambient = scene.env_color * scene.env_intensity
    # default directional light when the scene has none (raster.js:66-69)
    have_dl = scene.n_dl > 0
    ddir = jnp.where(have_dl, scene.dl_dir[0],
                     jnp.asarray(_DEFAULT_DIR, jnp.float32))
    dcol = jnp.where(have_dl, scene.dl_col[0],
                     jnp.asarray(_DEFAULT_DIR_COL, jnp.float32))
    out = col * ambient
    ndl = jnp.maximum(jnp.sum(n * (-ddir), axis=-1), 0.0)
    out = out + col * dcol * ndl[..., None]

    pl_valid = jnp.arange(scene.pt_pos.shape[0]) < scene.n_pt
    for i in range(scene.pt_pos.shape[0]):
        lvec = scene.pt_pos[i] - pos
        d2 = jnp.maximum(jnp.sum(lvec * lvec, axis=-1), 1e-4)
        L = lvec / jnp.sqrt(d2)[..., None]
        ndlp = jnp.maximum(jnp.sum(n * L, axis=-1), 0.0)
        att = 1.0 / (1.0 + d2 * 0.05)
        w_i = jnp.where(pl_valid[i], ndlp * att, 0.0)
        out = out + col * scene.pt_col[i] * w_i[..., None]

    out = jnp.clip(out, 0.0, 1.0)
    return jnp.where(hit[..., None], out, 0.0)  # clear color black


# --------------------------------------------------------------------------
# Full pipeline
# --------------------------------------------------------------------------
def render_soup_diag(positions, normals, colors, scene: SceneData,
                     cam: Camera, rows: int, cols: int, pixel_aspect: float,
                     v_cap: int, big_cap: int = 64, kernel: str = "mm",
                     r_cap: int = 16384, pair_cap: int = 65536,
                     tile_cap: int | None = None, pos9=None,
                     attrs_t=None, emit: str = "rgb", ramp_len: int = 10):
    """Compacted raster pipeline with capacity diagnostics.

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
    if kernel in ("subtile3", "subtile4"):
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
        tiles_y = -(-rows // TILE_H)
        tiles_x = -(-cols // TILE_W)
        n_tiles = tiles_y * tiles_x
        if tile_cap is None:
            tile_cap = n_tiles * 8
        grp_cap = max(1, tile_cap // 8)
        cm, bbox = setup_2dh_fused(pos9, attrs_t, mvp, rows, cols)
        n_valid = jnp.sum(bbox["valid"].astype(jnp.int32))
        keys = _subtile_pair_keys_bbox(bbox, rows, cols, big_cap=big_cap)
        pack_w = max(-(-cm.shape[0] // 8) * 8,
                     16 + SHADE_TABLE_W if SHADE_TABLE_W else 0)
        g40 = pack_channels(cm, width=pack_w)
        if kernel == "subtile4":  # direct-DMA walk: no aligned layout
            (src_pair, goff, gdepth, gchunks, xl, yl, gbins, n_rows,
             n_pairs, n_used) = RG.build_groups_direct(
                g40[:, :32], keys, tiles_x, n_tiles, pair_cap, grp_cap)
            _z, e = RG.tile_eval_direct(src_pair, goff, gdepth, gchunks,
                                        xl, yl, grp_cap)
        else:
            (rows128, rowptr, gdepth, xl, yl, gbins, n_rows, n_pairs,
             n_used) = RG.build_packed_rows_grouped(
                g40[:, :32], keys, tiles_x, n_tiles, r_cap, pair_cap,
                grp_cap)
            if PROBE_SKIP_WALK:
                # keep the rows build live with a cheap reduce
                e = (jnp.zeros((grp_cap, TILE_H, TILE_W), jnp.float32)
                     + jnp.sum(rows128) * 0.0)
            else:
                _z, e = RG.tile_eval_grouped(rows128, rowptr, gdepth, xl,
                                             yl, grp_cap)
        tw = SHADE_TABLE_W if SHADE_TABLE_W else 3 * A + 3
        table = g40[:, 16:16 + tw]  # cols >= 3A+3 are junk, never read
        rgbg = shade_groups(e, xl, yl, table, scene, A)
        diag = {"n_valid": n_valid, "n_big": None,
                "n_rows": n_rows, "n_pairs": n_pairs,
                "n_tiles_nz": n_used}
        _n_small, diag["n_big"] = count_big_small_bbox(bbox, rows, cols)
        if emit == "idx":
            from ascii_renderer_tpu.core import quantize as Q
            rgb8g = Q.float_rgb_to_u8(rgbg)            # [grp, 8, 128, 3]
            bidx = Q.quantize_index(rgb8g, ramp_len)   # [grp, 8, 128]
            idx_img = RG.assemble_group_image(
                bidx.astype(jnp.float32), gbins, n_tiles, tiles_y,
                tiles_x, rows, cols, 0.0).astype(jnp.int32)
            rgb8_img = RG.assemble_group_image(
                rgb8g.astype(jnp.float32), gbins, n_tiles, tiles_y,
                tiles_x, rows, cols, 0.0).astype(jnp.uint8)
            return (idx_img, rgb8_img), diag
        rgb = RG.assemble_group_image(rgbg, gbins, n_tiles, tiles_y,
                                      tiles_x, rows, cols, 0.0)
        return rgb, diag
    if kernel == "subtile2":  # 2DH setup: no clip expansion, [T] domain
        # No compaction either: T < 2^18 fits the pair-key id budget
        # directly, invalid triangles simply emit no pairs, and the sort
        # order over original ids equals the compacted order (compaction
        # preserved ascending ids) — so the whole valid-sort + 37-channel
        # gather stage is deleted. v_cap is accepted but unused here.
        from ascii_renderer_tpu.ops import raster_subtile as RS
        from ascii_renderer_tpu.ops.pack import pack_channels

        if pos9 is None:
            pos9 = positions_to_pos9(positions)
        A = attrs.shape[1]
        if attrs_t is None:
            attrs_t = attrs.reshape(-1, 3 * A).T
        ach = setup_2dh(pos9, attrs_t, mvp, rows, cols)
        n_valid = jnp.sum(ach["valid"].astype(jnp.int32))
        tiles_y = -(-rows // TILE_H)
        tiles_x = -(-cols // TILE_W)
        n_tiles = tiles_y * tiles_x
        if tile_cap is None:
            tile_cap = n_tiles
        keys = _subtile_pair_keys_bbox(ach, rows, cols, big_cap=big_cap)
        # ONE row-major pack serves both consumers by slicing: cols 0..11
        # kernel entry planes, col 12 the triangle id (an iota channel —
        # baking it here saves build_packed_rows a full [pair_cap, 32]
        # set-column copy pass), 13..15 don't-care (the expand matrix
        # zeroes them), cols 16..16+3A+2 the shade plane table.
        T_ = ach["e0a"].shape[0]
        src_ch = [ach[k] for k in
                  ("e0a", "e0b", "e0c", "e1a", "e1b", "e1c",
                   "e2a", "e2b", "e2c", "zx", "zy", "zc")]
        ids_ch = [jnp.arange(T_, dtype=jnp.float32), jnp.zeros((T_,)),
                  jnp.zeros((T_,)), jnp.zeros((T_,))]
        plane_ch = [ach[k] for k in _plane_keys_2dh(A)]
        # width 40 at A=6 (no point lights), 48 at A=9 (world-pos planes)
        g40 = pack_channels(src_ch + ids_ch + plane_ch,
                            width=-(-(16 + 3 * A + 3) // 8) * 8)
        rows128, rowptr, depth, n_rows, n_pairs = \
            RS.build_packed_rows_pre_id(g40[:, :32], keys, tiles_x,
                                        n_tiles, r_cap, pair_cap)
        _ztile, etile = RS.tile_eval_packed_d(rows128, rowptr, depth,
                                              tiles_x, n_tiles)
        nonempty = rowptr[1:] > rowptr[:-1]
        # bg hits index the last row; _shade_rows selects 0 for non-hits,
        # so its content is irrelevant (no appended bg row needed)
        table = g40[:, 16:16 + 3 * A + 3]
        rgb = shade_tiles_compact(etile, nonempty, table, scene, rows,
                                  cols, tile_cap=tile_cap, n_attrs=A)
        _n_small, n_big = count_big_small_bbox(ach, rows, cols)
        n_tiles_nz = nonempty.sum().astype(jnp.int32)
        return rgb, {"n_valid": n_valid, "n_big": n_big,
                     "n_rows": n_rows, "n_pairs": n_pairs,
                     "n_tiles_nz": n_tiles_nz}
    ch = (transform_clip_channels9(pos9, mvp) if pos9 is not None
          else transform_clip_channels(positions, mvp))
    ch = setup_screen_channels(ch, rows, cols)
    cch, cidx, n_valid = compact_valid_ch(ch, v_cap)
    attr_slots = clip_attrs_compact_lists(attrs, ch, cidx)
    if kernel == "subtile":
        tiles_y = -(-rows // TILE_H)
        tiles_x = -(-cols // TILE_W)
        if tile_cap is None:
            tile_cap = tiles_y * tiles_x  # safe default: no compaction win
        etile, nonempty, n_rows, n_pairs = visibility_subtile_tiles(
            cch, rows, cols, big_cap=big_cap, r_cap=r_cap,
            pair_cap=pair_cap)
        # kernel emits triangle ids -> shade indexes the per-triangle
        # plane table directly (one trailing all-zero background row)
        table = build_plane_table(cch, attr_slots)  # [v_cap, W]
        table = jnp.concatenate(
            [table, jnp.zeros((1, table.shape[1]), jnp.float32)], axis=0)
        rgb = shade_tiles_compact(etile, nonempty, table, scene, rows,
                                  cols, tile_cap=tile_cap,
                                  n_attrs=len(attr_slots[0]))
        _n_small, n_big = count_big_small(cch, rows, cols)
        n_tiles_nz = nonempty.sum().astype(jnp.int32)
        return rgb, {"n_valid": n_valid, "n_big": n_big,
                     "n_rows": n_rows, "n_pairs": n_pairs,
                     "n_tiles_nz": n_tiles_nz}
    _zbuf, tid = visibility_binned_ch(cch, rows, cols, kernel=kernel,
                                      big_cap=big_cap)
    rgb = shade_planes_ch(tid, cch, attr_slots, scene, rows, cols)
    _n_small, n_big = count_big_small(cch, rows, cols)
    zero = jnp.zeros((), jnp.int32)
    return rgb, {"n_valid": n_valid, "n_big": n_big,
                 "n_rows": zero, "n_pairs": zero, "n_tiles_nz": zero}


def _round_up(x, q):
    return -(-x // q) * q


def suggest_caps(n_valid: int, n_big: int):
    """Adaptive capacities with growth margin (host-side policy).

    Sized ~30%/50% above the last observed counts so camera motion doesn't
    recompile every frame; rounded to coarse quanta so nearby scenes share
    compiled programs."""
    v_cap = min(MAX_V_CAP, _round_up(int(n_valid * 1.3) + 512, 8192))
    big_cap = max(64, _round_up(int(n_big * 1.5) + 8, 64))
    return v_cap, big_cap


def suggest_caps_subtile(n_valid: int, n_big: int, n_rows: int,
                         n_pairs: int, n_tiles_nz: int = 0):
    """Adaptive capacities for the subtile pipeline: (v_cap, big_cap,
    r_cap, pair_cap, tile_cap). Same margin policy as suggest_caps; r_cap
    stays a CHUNK_R multiple (kernel DMA granularity)."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    max_sub_v = RS.MAX_TRI - 4096
    v_cap = min(max_sub_v, _round_up(int(n_valid * 1.15) + 512, 4096))
    # n_big == 0 -> static big_cap = 0: the big key part drops out of the
    # compiled program entirely (see _subtile_pair_keys_bbox); the retry
    # loop re-caps if a big tri ever appears
    big_cap = 0 if n_big == 0 else max(16, _round_up(int(n_big * 1.5) + 8,
                                                     16))
    r_cap = _round_up(int(n_rows * 1.08) + 256, max(RS.CHUNK_R, 1024))
    pair_cap = _round_up(int(n_pairs * 1.15) + 512, 4096)
    tile_cap = _round_up(int(n_tiles_nz * 1.15) + 8, 32)
    return v_cap, big_cap, r_cap, pair_cap, tile_cap


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
                   "subtile2", "subtile3", "subtile4")
            and v_cap is not None):
        kern = {"scatter_loop": "loop", "subtile": "subtile",
                "subtile2": "subtile2", "subtile3": "subtile3",
                "subtile4": "subtile4"}.get(method, "mm")
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
                    pixel_aspect=pixel_aspect, kernel="subtile3",
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
