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

from ascii_renderer_tpu.core.camera import Camera, primary_ray_dirs
from ascii_renderer_tpu.core.frame import Frame
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


def closest_hit(ro, rd, scene: SceneData):
    """Nearest hit over spheres / planes / tris(+quads).

    Returns (t [..], mat [..], n [..,3], hit_mask [..]).
    """
    sval = scene.sph_valid()
    t_s = gi.ray_spheres(ro, rd, scene.sph_pos, scene.sph_rad, sval, EPS)
    t_p = gi.ray_planes(ro, rd, scene.pln_n, scene.pln_d, scene.pln_valid(), EPS)
    va, vb, vc, tmat, tvalid = _all_tris(scene)
    t_t, n_t, _bc = gi.ray_triangles(ro, rd, va, vb, vc, tvalid, EPS)

    t_all = jnp.concatenate([t_s, t_p, t_t], axis=-1)
    k = jnp.argmin(t_all, axis=-1)  # first minimum wins: sphere < plane < tri
    t = jnp.take_along_axis(t_all, k[..., None], axis=-1)[..., 0]
    hit = t < gi.BIG * 0.5

    ns, np_, nt = t_s.shape[-1], t_p.shape[-1], t_t.shape[-1]
    del nt
    is_s = k < ns
    is_p = (k >= ns) & (k < ns + np_)
    ks = jnp.clip(k, 0, ns - 1)
    kp = jnp.clip(k - ns, 0, np_ - 1)
    kt = jnp.clip(k - ns - np_, 0, t_t.shape[-1] - 1)

    pos = ro + t[..., None] * rd
    n_sph = gi.sphere_normal(pos, scene.sph_pos[ks], scene.sph_rad[ks])
    n_pln = scene.pln_n[kp]
    n_tri = jnp.take_along_axis(n_t, kt[..., None, None], axis=-2)[..., 0, :]
    n = jnp.where(is_s[..., None], n_sph, jnp.where(is_p[..., None], n_pln, n_tri))

    mat = jnp.where(is_s, scene.sph_mat[ks],
                    jnp.where(is_p, scene.pln_mat[kp], tmat[kt]))
    return t, mat, n, hit


def occluded(ro, rd, tmax, scene: SceneData):
    """Any-hit within tmax over spheres + tris (planes skipped, matching
    raytrace_shader.js:152-166)."""
    t_s = gi.ray_spheres(ro, rd, scene.sph_pos, scene.sph_rad, scene.sph_valid(), EPS)
    va, vb, vc, _m, tvalid = _all_tris(scene)
    t_t, _n, _bc = gi.ray_triangles(ro, rd, va, vb, vc, tvalid, EPS)
    any_s = jnp.any(t_s < tmax[..., None], axis=-1)
    any_t = jnp.any(t_t < tmax[..., None], axis=-1)
    return any_s | any_t


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
               pixel_aspect: float) -> jnp.ndarray:
    """Full deterministic trace -> linear RGB f32 [rows, cols, 3] in [0,1]."""
    rd = primary_ray_dirs(camera, rows, cols, pixel_aspect)
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
