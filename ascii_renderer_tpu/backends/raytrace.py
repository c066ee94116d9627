"""Deterministic single-bounce Whitted ray tracer (ref: raytrace.js +
raytrace_shader.js).

Semantics reproduced exactly:
  - brute-force nearest hit over spheres, then planes, then triangles with
    strict `t < best` (first-listed primitive wins ties) — realized here as
    argmin over the concatenated candidate array, which has the same
    tie-break (raytrace_shader.js:129-150);
  - diffuse shading = directional + point lights with hard shadows; shadow
    rays test spheres and triangles only, not planes
    (raytrace_shader.js:152-166); ambient/env contributes ZERO to diffuse
    (the shader's `uEnv * max(N.y*0.0, 0.0)` — kept verbatim);
  - point-light attenuation 1/(1 + d^2*0.05), shadow tmax = d - 2*EPS;
  - mirrors get exactly one deterministic reflection bounce; the reflected
    hit is shaded diffuse regardless of its own reflectivity;
  - miss -> clamp(env color * intensity, 0, 1);
  - EPS = 1e-4 (raytrace_shader.js:65).

Deliberate fixes of reference quirks (SURVEY §2 "known quirks"):
  - materials come from the packed unified table (the reference indexed the
    table as an array and got default gray);
  - quads participate (split into two tris; the reference RT ignored quads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import numpy as np

from ascii_renderer_tpu.core.camera import Camera, primary_ray_dirs
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.backends import pt_core as pc
from ascii_renderer_tpu.geom import intersect as gi
from ascii_renderer_tpu.scene.builder import SceneData

EPS = 1e-4


def _all_tris(scene: SceneData):
    """Concatenate scene tris with quad-split tris (a,b,c) + (a,c,d)."""
    va = jnp.concatenate([scene.tri_a, scene.quad_a, scene.quad_a], axis=0)
    vb = jnp.concatenate([scene.tri_b, scene.quad_b, scene.quad_c], axis=0)
    vc = jnp.concatenate([scene.tri_c, scene.quad_c, scene.quad_d], axis=0)
    mat = jnp.concatenate([scene.tri_mat, scene.quad_mat, scene.quad_mat], axis=0)
    valid = jnp.concatenate([scene.tri_valid(), scene.quad_valid(), scene.quad_valid()])
    return va, vb, vc, mat, valid


def _planes_t(ro, rd, normals, ds, valid, eps):
    """Channel-form plane intersection: -> t [P, R]
    (raytrace_shader.js:104-109)."""
    nx, ny, nz = normals[:, 0], normals[:, 1], normals[:, 2]
    denom = (nx[:, None] * rd.x[None, :] + ny[:, None] * rd.y[None, :]
             + nz[:, None] * rd.z[None, :])
    num = -(ds[:, None]) - (nx[:, None] * ro.x[None, :]
                            + ny[:, None] * ro.y[None, :]
                            + nz[:, None] * ro.z[None, :])
    t = num / jnp.where(jnp.abs(denom) < 1e-6, 1.0, denom)
    miss = (jnp.abs(denom) < 1e-6) | (t <= eps) | \
        jnp.logical_not(valid[:, None])
    return jnp.where(miss, pc.BIG, t)


def closest_hit(ro, rd, scene: SceneData):
    """Nearest hit over spheres / planes / tris(+quads), channel-form
    internals (rays on the lane axis — see backends/pt_core.py).

    ro/rd: f32 [..., 3]. Returns (t [..], mat [..], n [..,3], hit [..]).
    """
    shp = rd.shape[:-1]
    R = int(np.prod(shp)) if shp else 1
    rof = gi_V3(ro, R)
    rdf = gi_V3(rd, R)

    sph_c = pc.V3.of(scene.sph_pos)
    t_s = pc.spheres_t(rof, rdf, sph_c, scene.sph_rad, scene.sph_valid(), EPS)
    t_p = _planes_t(rof, rdf, scene.pln_n, scene.pln_d, scene.pln_valid(), EPS)
    va, vb, vc, tmat, tvalid = _all_tris(scene)
    pack = pc.TriPack.build(va, vb, vc, tvalid)
    t_t = pc.tris_t(rof, rdf, pack, EPS)

    t_all = jnp.concatenate([t_s, t_p, t_t], axis=0)  # [P, R]
    k = jnp.argmin(t_all, axis=0)  # first min: sphere < plane < tri
    t = jnp.take_along_axis(t_all, k[None], axis=0)[0]
    hit = t < pc.BIG * 0.5

    ns, np_ = t_s.shape[0], t_p.shape[0]
    is_s = k < ns
    is_p = (k >= ns) & (k < ns + np_)
    ks = jnp.clip(k, 0, ns - 1)
    kp = jnp.clip(k - ns, 0, np_ - 1)
    kt = jnp.clip(k - ns - np_, 0, t_t.shape[0] - 1)

    pos = pc.V3(rof.x + t * rdf.x, rof.y + t * rdf.y, rof.z + t * rdf.z)
    csel = pc.gather(sph_c, ks)
    rsel = jnp.maximum(scene.sph_rad[ks], 1e-6)
    n_sph = pc.V3((pos.x - csel.x) / rsel, (pos.y - csel.y) / rsel,
                  (pos.z - csel.z) / rsel)
    n_pln = pc.gather(pc.V3.of(scene.pln_n), kp)
    n_tri, _b0, _b1, _b2 = pc.tri_hit_info(
        rof, rdf, pc.gather(pack.a, kt), pc.gather(pack.e1, kt),
        pc.gather(pack.e2, kt))
    n = n_tri.where(jnp.logical_not(is_s | is_p),
                    n_sph.where(is_s, n_pln))
    mat = jnp.where(is_s, scene.sph_mat[ks],
                    jnp.where(is_p, scene.pln_mat[kp], tmat[kt]))
    return (t.reshape(shp), mat.reshape(shp),
            n.stack().reshape(shp + (3,)), hit.reshape(shp))


def occluded(ro, rd, tmax, scene: SceneData):
    """Any-hit within tmax over spheres + tris (planes skipped, matching
    raytrace_shader.js:152-166)."""
    shp = rd.shape[:-1]
    R = int(np.prod(shp)) if shp else 1
    rof = gi_V3(ro, R)
    rdf = gi_V3(rd, R)
    t_s = pc.spheres_t(rof, rdf, pc.V3.of(scene.sph_pos), scene.sph_rad,
                       scene.sph_valid(), EPS)
    va, vb, vc, _m, tvalid = _all_tris(scene)
    t_t = pc.tris_t(rof, rdf, pc.TriPack.build(va, vb, vc, tvalid), EPS)
    tm = tmax.reshape(R)[None, :]
    return (jnp.any(t_s < tm, axis=0)
            | jnp.any(t_t < tm, axis=0)).reshape(shp)


def gi_V3(arr, R):
    """[..., 3] -> flat V3 channels [R]."""
    return pc.V3.of(arr.reshape(R, 3))


def shade_diffuse(pos, n, albedo, scene: SceneData):
    """Direct lighting with hard shadows (raytrace_shader.js:168-196)."""
    lo = jnp.zeros_like(albedo)  # env * max(N.y*0, 0) == 0, verbatim

    # Directional lights: L = normalize(-dir) (uDLDir points TOWARDS light in
    # the uniform docs but the shader negates it; we replicate the shader).
    dl_valid = jnp.arange(scene.dl_dir.shape[0]) < scene.n_dl
    for i in range(scene.dl_dir.shape[0]):
        d = scene.dl_dir[i]
        L = -d / jnp.maximum(jnp.linalg.norm(d), 1e-20)
        ndl = jnp.maximum(jnp.sum(n * L, axis=-1), 0.0)
        occ = occluded(pos + n * EPS, jnp.broadcast_to(L, pos.shape),
                       jnp.full(ndl.shape, 1e5, jnp.float32), scene)
        w = jnp.where((ndl > 0.0) & jnp.logical_not(occ) & dl_valid[i], ndl, 0.0)
        lo = lo + albedo * scene.dl_col[i] * w[..., None]

    pl_valid = jnp.arange(scene.pt_pos.shape[0]) < scene.n_pt
    for i in range(scene.pt_pos.shape[0]):
        lvec = scene.pt_pos[i] - pos
        d2 = jnp.maximum(jnp.sum(lvec * lvec, axis=-1), 1e-6)
        L = lvec / jnp.sqrt(d2)[..., None]
        ndl = jnp.maximum(jnp.sum(n * L, axis=-1), 0.0)
        occ = occluded(pos + n * EPS, L, jnp.sqrt(d2) - 2.0 * EPS, scene)
        att = 1.0 / (1.0 + d2 * 0.05)
        w = jnp.where((ndl > 0.0) & jnp.logical_not(occ) & pl_valid[i],
                      ndl * att, 0.0)
        lo = lo + albedo * scene.pt_col[i] * w[..., None]
    return lo


def render_rgb(scene: SceneData, camera: Camera, rows: int, cols: int,
               pixel_aspect: float, row_lo=0,
               n_rows: int | None = None) -> jnp.ndarray:
    """Full deterministic trace -> linear RGB f32 [rows, cols, 3] in [0,1].

    row_lo/n_rows render only the band [row_lo, row_lo + n_rows) of the
    global grid (see core.camera.primary_ray_dirs): the shading is purely
    per-pixel, so concatenated bands are bit-identical to the full frame —
    the hook for row-band spatial sharding (parallel.mesh.
    render_rows_sharded, SURVEY §5 long-context analog)."""
    rd = primary_ray_dirs(camera, rows, cols, pixel_aspect,
                          row_lo=row_lo, n_rows=n_rows)
    ro = jnp.broadcast_to(camera.pos, rd.shape)
    env = jnp.clip(scene.env_color * scene.env_intensity, 0.0, 1.0)

    t, mat, n, hit = closest_hit(ro, rd, scene)
    pos = ro + t[..., None] * rd
    albedo = scene.mat_albedo[mat]
    refl = scene.mat_reflective[mat]

    col_diff = shade_diffuse(pos, n, albedo, scene)

    # One deterministic mirror bounce (raytrace_shader.js:228-239).
    rdir = gi.reflect(rd, n)
    ro2 = pos + n * EPS
    t2, mat2, n2, hit2 = closest_hit(ro2, rdir, scene)
    pos2 = ro2 + t2[..., None] * rdir
    alb2 = scene.mat_albedo[mat2]
    col_refl_hit = shade_diffuse(pos2, n2, alb2, scene)
    col_refl = jnp.where(hit2[..., None], col_refl_hit,
                         scene.env_color * scene.env_intensity)

    col = jnp.where(refl[..., None], col_refl, col_diff)
    col = jnp.where(hit[..., None], col, env)
    return jnp.clip(col, 0.0, 1.0)


class RaytraceBackend:
    """Backend-protocol wrapper: set_scene / render / dispose (contract 5)."""

    name = "raytrace"

    def __init__(self, cfg=None):
        self.cfg = cfg
        self._scene: SceneData | None = None
        self._fns = {}  # (rows, cols, pixel_aspect) -> jitted program

    def set_scene(self, scene: SceneData):
        self._scene = scene

    def render(self, time_sec, camera: Camera, rows: int, cols: int,
               pixel_aspect: float = 1.0) -> Frame:
        if self._scene is None:
            return Frame.blank(rows, cols)
        key = (rows, cols, float(pixel_aspect))
        fn = self._fns.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(render_rgb, rows=rows, cols=cols,
                                           pixel_aspect=pixel_aspect))
            self._fns[key] = fn
        rgb = fn(self._scene, camera)
        return Frame.from_float(rgb)

    def dispose(self):
        self._scene = None
        self._fns = {}
