"""Monte-Carlo path tracer (ref: pathtrace.js + pathtrace_shader.js +
shader_utils.js) — the reference's default backend.

TPU re-design:
  - one program over the whole [rows, cols] cell grid; `lax.scan` over
    samples (bounded memory), python-unrolled fixed-trip bounce loop with
    live masks (TPU wants static shapes — GLSL's `break` becomes a mask);
  - counter-based RNG (threefry via jax.random, folded per sample/bounce/use)
    replaces the reference's order-dependent `fract(sin)` hash
    (shader_utils.js:8-17). MC output is stochastic; bit-parity with the
    GLSL stream is declared a non-goal, determinism under our own keys is
    guaranteed (SURVEY §7 "RNG parity decision");
  - the scene rides in padded SoA arrays; intersection is a brute-force
    argmin over all primitive candidates, mirroring the shader's
    loop-over-everything structure (shader_utils.js:164-203).

Semantics preserved (per the shader):
  - 64 spp batches x 5 bounces, NEE toward the (optionally auto-animated)
    spherical area light, Russian roulette after bounce 2;
  - glass/mirror Fresnel branch with the reference's exact n1/n2 choice and
    Schlick term (shader_utils.js:216-229);
  - sky/ground environment on miss (shader_utils.js:20-25);
  - ASCII-texture sampling: a PRIMARY ray hitting a glyph texel
    short-circuits — color passes through and the glyph code rides the
    output alpha (pathtrace_shader.js:141-149); secondary hits truncate the
    glyph to a solid texel; A==1 solid texels override material albedo;
  - the center-ray anti-aliasing rule: sample 0 shoots the pixel center and
    decides `fetchedTexel`; subsequent samples jitter only for pixels whose
    primary ray did NOT land on an atlas texel (pathtrace_shader.js:213-243);
  - material shading colors follow the shader's LUT semantics
    (shader_utils.js:61-76): diffuse materials shade with albedo * 0.7,
    specular with 1.0, and the light contributes LIGHT_COLOR * 1.3 —
    generalized from the hardcoded ID LUT to the packed material table
    (emissive -> light, reflective -> specular), identical for the
    conventional IDs 0..7;
  - non-override pixels write alpha byte 255 (the GL path's A=1.0), which
    the ASCII pass treats as no-override.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ascii_renderer_tpu.core.camera import Camera, camera_basis
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.core import quantize
from ascii_renderer_tpu.geom import intersect as gi
from ascii_renderer_tpu.scene.builder import SceneData

EPS = 1e-3  # shader_utils.js:5

KIND_NONE, KIND_SPHERE, KIND_TRI, KIND_QUAD, KIND_LIGHT = 0, 1, 3, 4, 5


def environment(rd):
    """Sky/ground gradient on miss (shader_utils.js:20-25)."""
    t = jnp.clip(rd[..., 1] * 0.5 + 0.5, 0.0, 1.0)
    sky = (jnp.asarray([0.90, 0.95, 1.00]) * (1 - t[..., None] ** 1.2)
           + jnp.asarray([0.45, 0.65, 0.95]) * (t[..., None] ** 1.2))
    grd = jnp.asarray([0.18, 0.15, 0.12]) * 0.35
    s = jnp.clip((rd[..., 1] + 0.05) / 0.1, 0.0, 1.0)
    s = s * s * (3.0 - 2.0 * s)  # smoothstep
    return grd * (1 - s[..., None]) + sky * s[..., None]


def get_light_sphere(scene: SceneData, time):
    """Animated-or-fixed light sphere (shader_utils.js:83-91)."""
    t = jnp.float32(time)
    auto_c = jnp.stack([3.0 + 2.0 * jnp.sin(t),
                        2.8 + 2.0 * jnp.sin(t * 0.9),
                        3.0 + 4.0 * jnp.cos(t * 0.7)])
    center = jnp.where(scene.area_auto, auto_c, scene.area_center)
    return center, scene.area_radius


def _mat_flags(scene: SceneData):
    """Generalized LUT semantics: is_light <- emissive, is_specular <-
    reflective; shading albedo = reflective ? 1 : albedo * 0.7."""
    is_light = scene.mat_emissive
    is_spec = scene.mat_reflective
    shade = jnp.where(is_spec[:, None], 1.0, scene.mat_albedo * 0.7)
    return is_light, is_spec, shade


def pt_intersect(ro, rd, scene: SceneData, light_center, light_radius):
    """Nearest hit over spheres / tris / quad-tris / light sphere.

    Returns dict(t, kind, index, mat, n, bc, tri_sel, hit). Candidate order
    (spheres, tris, quad-first-tris, quad-second-tris, light) preserves the
    shader's tie-breaks up to the quad t1/t2 interleave (measure-zero).
    """
    t_s = gi.ray_spheres(ro, rd, scene.sph_pos, scene.sph_rad,
                         scene.sph_valid(), EPS)
    t_t, n_t, bc_t = gi.ray_triangles(ro, rd, scene.tri_a, scene.tri_b,
                                      scene.tri_c, scene.tri_valid(), EPS)
    qv = scene.quad_valid()
    t_q1, n_q1, bc_q1 = gi.ray_triangles(ro, rd, scene.quad_a, scene.quad_b,
                                         scene.quad_c, qv, EPS)
    t_q2, n_q2, bc_q2 = gi.ray_triangles(ro, rd, scene.quad_a, scene.quad_c,
                                         scene.quad_d, qv, EPS)
    t_l = gi.ray_spheres(ro, rd, light_center[None, :], light_radius[None],
                         jnp.asarray([True]), EPS)

    t_all = jnp.concatenate([t_s, t_t, t_q1, t_q2, t_l], axis=-1)
    k = jnp.argmin(t_all, axis=-1)
    t = jnp.take_along_axis(t_all, k[..., None], axis=-1)[..., 0]
    hit = t < gi.BIG * 0.5

    ns, nt, nq = t_s.shape[-1], t_t.shape[-1], t_q1.shape[-1]
    is_s = k < ns
    is_t = (k >= ns) & (k < ns + nt)
    is_q1 = (k >= ns + nt) & (k < ns + nt + nq)
    is_q2 = (k >= ns + nt + nq) & (k < ns + nt + 2 * nq)
    is_l = k >= ns + nt + 2 * nq

    ks = jnp.clip(k, 0, ns - 1)
    kt = jnp.clip(k - ns, 0, nt - 1)
    kq1 = jnp.clip(k - ns - nt, 0, nq - 1)
    kq2 = jnp.clip(k - ns - nt - nq, 0, nq - 1)

    pos = ro + t[..., None] * rd
    n_sph = gi.sphere_normal(pos, scene.sph_pos[ks], scene.sph_rad[ks])
    n_lgt = (pos - light_center) / jnp.maximum(light_radius, 1e-6)
    take3 = lambda arr, idx: jnp.take_along_axis(  # noqa: E731
        arr, idx[..., None, None], axis=-2)[..., 0, :]
    n = jnp.where(is_s[..., None], n_sph,
        jnp.where(is_t[..., None], take3(n_t, kt),
        jnp.where(is_q1[..., None], take3(n_q1, kq1),
        jnp.where(is_q2[..., None], take3(n_q2, kq2), n_lgt))))
    bc = jnp.where(is_t[..., None], take3(bc_t, kt),
         jnp.where(is_q1[..., None], take3(bc_q1, kq1),
         jnp.where(is_q2[..., None], take3(bc_q2, kq2), 0.0)))

    mat = jnp.where(is_s, scene.sph_mat[ks],
          jnp.where(is_t, scene.tri_mat[kt],
          jnp.where(is_q1 | is_q2,
                    jnp.where(is_q1, scene.quad_mat[kq1], scene.quad_mat[kq2]),
                    0)))  # light uses MAT_LIGHT=0 (shader_utils.js:198)

    kind = jnp.where(is_s, KIND_SPHERE,
           jnp.where(is_t, KIND_TRI,
           jnp.where(is_q1 | is_q2, KIND_QUAD,
           jnp.where(is_l, KIND_LIGHT, KIND_NONE))))
    kind = jnp.where(hit, kind, KIND_NONE)
    index = jnp.where(is_s, ks, jnp.where(is_t, kt,
            jnp.where(is_q1, kq1, jnp.where(is_q2, kq2, -1))))
    tri_sel = jnp.where(is_q1, 0, jnp.where(is_q2, 1, -1))
    return dict(t=t, kind=kind, index=index, mat=mat, n=n, bc=bc,
                tri_sel=tri_sel, hit=hit)


def pt_shadow(ro, rd, dist, scene: SceneData):
    """Any-hit < dist over spheres/tris/quads (no light sphere)
    (shader_utils.js:205-213)."""
    t_s = gi.ray_spheres(ro, rd, scene.sph_pos, scene.sph_rad,
                         scene.sph_valid(), EPS)
    t_t, _, _ = gi.ray_triangles(ro, rd, scene.tri_a, scene.tri_b, scene.tri_c,
                                 scene.tri_valid(), EPS)
    qv = scene.quad_valid()
    t_q1, _, _ = gi.ray_triangles(ro, rd, scene.quad_a, scene.quad_b,
                                  scene.quad_c, qv, EPS)
    t_q2, _, _ = gi.ray_triangles(ro, rd, scene.quad_a, scene.quad_c,
                                  scene.quad_d, qv, EPS)
    d = dist[..., None]
    return (jnp.any(t_s < d, -1) | jnp.any(t_t < d, -1)
            | jnp.any(t_q1 < d, -1) | jnp.any(t_q2 < d, -1))


def sample_atlas(scene: SceneData, hit):
    """UV-interpolated nearest-texel atlas fetch for tri/quad hits
    (shader_utils.js:100-132). Returns (rgb [..,3], abyte [..], sampled [..]).

    The reference pre-flips atlas rows at load and flips Y again at fetch
    (js/main.js:161-163, shader_utils.js:98-105) — net effect is a direct
    top-left-origin lookup, which is exactly how our atlas planes are stored.
    """
    ah, aw = scene.atlas_a.shape
    enabled = ah > 1 and aw > 1  # atlasEnabled (static)
    if not enabled:
        z = jnp.zeros(hit["t"].shape)
        return jnp.zeros(hit["t"].shape + (3,)), z.astype(jnp.int32), z.astype(bool)

    bc = hit["bc"]
    idx = jnp.maximum(hit["index"], 0)
    # triangle UVs
    uv_tri = (bc[..., 0:1] * scene.tri_uva[idx] + bc[..., 1:2] * scene.tri_uvb[idx]
              + bc[..., 2:3] * scene.tri_uvc[idx])
    # quad UVs: tri 0 -> (uv0, uv1, uv2); tri 1 -> (uv0, uv2, uv3)
    q0 = scene.quad_uv0[idx]
    sel1 = (hit["tri_sel"] == 1)[..., None]
    qa = jnp.where(sel1, scene.quad_uv2[idx], scene.quad_uv1[idx])
    qb = jnp.where(sel1, scene.quad_uv3[idx], scene.quad_uv2[idx])
    uv_quad = bc[..., 0:1] * q0 + bc[..., 1:2] * qa + bc[..., 2:3] * qb
    # all-zero quad UVs mean "untextured" (shader_utils.js:125)
    quad_zero = (jnp.all(q0 == 0, -1) & jnp.all(qa == 0, -1) & jnp.all(qb == 0, -1))

    is_tri = hit["kind"] == KIND_TRI
    is_quad = hit["kind"] == KIND_QUAD
    uv = jnp.where(is_tri[..., None], uv_tri, uv_quad)
    tc = jnp.floor(uv + 0.5).astype(jnp.int32)
    inb = ((tc[..., 0] >= 0) & (tc[..., 0] < aw)
           & (tc[..., 1] >= 0) & (tc[..., 1] < ah))
    tx = jnp.clip(tc[..., 0], 0, aw - 1)
    ty = jnp.clip(tc[..., 1], 0, ah - 1)
    rgb = scene.atlas_rgb[ty, tx].astype(jnp.float32) / 255.0
    ab = scene.atlas_a[ty, tx].astype(jnp.int32)
    sampled = ((is_tri | (is_quad & jnp.logical_not(quad_zero)))
               & inb & (ab != 0))
    return rgb, jnp.where(sampled, ab, 0), sampled


def cos_hemisphere(n, key):
    """Cosine-weighted hemisphere sample (shader_utils.js:135-143)."""
    r = jax.random.uniform(key, n.shape[:-1] + (2,))
    phi = 2.0 * jnp.pi * r[..., 0]
    r2 = r[..., 1]
    s2 = jnp.sqrt(1.0 - r2)
    # basis branch: |n.y| < 0.999 ? cross(n, y) : cross(n, x)
    ny_ok = jnp.abs(n[..., 1]) < 0.999
    axis = jnp.where(ny_ok[..., None], jnp.asarray([0.0, 1.0, 0.0]),
                     jnp.asarray([1.0, 0.0, 0.0]))
    uu = jnp.cross(n, axis)
    uu = uu / jnp.maximum(jnp.linalg.norm(uu, axis=-1, keepdims=True), 1e-12)
    vv = jnp.cross(uu, n)
    d = (s2[..., None] * jnp.cos(phi)[..., None] * uu
         + s2[..., None] * jnp.sin(phi)[..., None] * vv
         + jnp.sqrt(r2)[..., None] * n)
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def sample_light_point(key, center, radius, shape):
    """Uniform point on the light sphere (shader_utils.js:144-149)."""
    h = jax.random.uniform(key, shape + (2,))
    hx = h[..., 0] * 2.0 - 1.0
    phi = h[..., 1] * 2.0 * jnp.pi
    s = jnp.sqrt(jnp.maximum(1.0 - hx * hx, 0.0))
    n = jnp.stack([s * jnp.sin(phi), s * jnp.cos(phi), hx], axis=-1)
    return center + radius * n


def next_direction(n, rd, is_spec, key):
    """BRDF sampling (shader_utils.js:216-229). Returns (ndir, specular)."""
    kd, kf = jax.random.split(key)
    diff = cos_hemisphere(n, kd)

    ndotr = jnp.sum(rd * n, axis=-1)
    flip = ndotr > 0.0
    n2_over_n1 = jnp.where(flip, 1.5 / 1.0, 1.0 / 1.5)
    nn = jnp.where(flip[..., None], -n, n)
    r0 = ((1.0 - 1.5) / (1.0 + 1.5)) ** 2
    fres = r0 + (1.0 - r0) * (1.0 - jnp.abs(ndotr)) ** 5
    ref, _tir = gi.refract(rd, nn, n2_over_n1)
    use_reflect = (jnp.linalg.norm(ref, axis=-1) < 1e-5) | \
        (jax.random.uniform(kf, fres.shape) < fres)
    spec_dir = jnp.where(use_reflect[..., None], gi.reflect(rd, nn), ref)
    spec_dir = spec_dir / jnp.maximum(
        jnp.linalg.norm(spec_dir, axis=-1, keepdims=True), 1e-12)

    ndir = jnp.where(is_spec[..., None], spec_dir, diff)
    return ndir, is_spec


def trace_eye_paths(scene: SceneData, ro, rd, key, light_center, light_radius,
                    *, bounces: int, light_color, nee: bool):
    """traceEyePath (pathtrace_shader.js:107-183), vectorized over pixels.

    Returns (Lo [..,3], override_byte [..] int32, primary_fetched [..] bool).
    """
    shp = rd.shape[:-1]
    is_light_m, is_spec_m, shade_m = _mat_flags(scene)
    lcol = jnp.asarray(light_color, jnp.float32)

    Lo = jnp.zeros(shp + (3,))
    T = jnp.ones(shp + (3,))
    alive = jnp.ones(shp, bool)
    specular_bounce = jnp.ones(shp, bool)  # starts true
    override = jnp.zeros(shp, jnp.int32)
    primary_fetched = jnp.zeros(shp, bool)

    for j in range(bounces):
        kj = jax.random.fold_in(key, j)
        k_bounce, k_nee, k_rr = jax.random.split(kj, 3)

        hit = pt_intersect(ro, rd, scene, light_center, light_radius)
        miss = alive & jnp.logical_not(hit["hit"])
        Lo = Lo + jnp.where(miss[..., None], T * environment(rd), 0.0)
        alive = alive & hit["hit"]

        hitpos = ro + hit["t"][..., None] * rd
        n = hit["n"]
        is_light = is_light_m[jnp.maximum(hit["mat"], 0)] | (hit["kind"] == KIND_LIGHT)
        light_term = alive & is_light
        Lo = Lo + jnp.where((light_term & specular_bounce)[..., None], T * lcol, 0.0)
        alive = alive & jnp.logical_not(is_light)

        rgb_tex, abyte, sampled = sample_atlas(scene, hit)
        sampled = sampled & alive
        if j == 0:
            primary_fetched = sampled

        glyph = sampled & (abyte >= quantize.ATLAS_GLYPH_MIN) & \
            (abyte <= quantize.ATLAS_GLYPH_MAX)
        if j == 0:
            # primary glyph hit: color passthrough + alpha override, stop
            Lo = jnp.where(glyph[..., None], rgb_tex, Lo)
            override = jnp.where(glyph, abyte, override)
            alive = alive & jnp.logical_not(glyph)
            solid = sampled & (abyte == quantize.ATLAS_SOLID)
        else:
            # secondary: truncate glyph to solid (aByte = 1)
            solid = sampled & ((abyte == quantize.ATLAS_SOLID) | glyph)

        is_spec = is_spec_m[jnp.maximum(hit["mat"], 0)]
        albedo = jnp.where(solid[..., None], rgb_tex,
                           shade_m[jnp.maximum(hit["mat"], 0)])

        ndir, spec_now = next_direction(n, rd, is_spec, k_bounce)
        absorb = jnp.logical_not(spec_now) | (jnp.sum(ndir * n, -1) < 0.0)
        T = jnp.where((alive & absorb)[..., None], T * albedo, T)

        # NEE on diffuse bounces (pathtrace_shader.js:159-169)
        if nee and j < bounces - 1:
            lpos = sample_light_point(k_nee, light_center, light_radius, shp)
            ldir = lpos - hitpos
            dist = jnp.linalg.norm(ldir, axis=-1)
            ldir = ldir / jnp.maximum(dist[..., None], 1e-12)
            shadowed = pt_shadow(hitpos + n * EPS, ldir, dist, scene)
            d2 = jnp.sum((light_center - hitpos) ** 2, axis=-1)
            cos_a_max = jnp.sqrt(1.0 - jnp.clip(
                light_radius * light_radius / jnp.maximum(d2, 1e-12), 0.0, 1.0))
            weight = 2.0 * (1.0 - cos_a_max)
            ndl = jnp.maximum(jnp.sum(ldir * n, -1), 0.0)
            contrib = alive & jnp.logical_not(spec_now) & jnp.logical_not(shadowed)
            Lo = Lo + jnp.where(contrib[..., None],
                                T * lcol * (weight * ndl)[..., None], 0.0)

        side = jnp.where(jnp.sum(ndir * n, -1) > 0.0, 1.0, -1.0)
        ro = jnp.where(alive[..., None], hitpos + n * side[..., None] * EPS, ro)
        rd = jnp.where(alive[..., None], ndir, rd)
        specular_bounce = jnp.where(alive, spec_now, specular_bounce)

        # Russian roulette from bounce 2 (pathtrace_shader.js:176-180)
        if j >= 2:
            p = jnp.clip(jnp.max(T, axis=-1), 0.05, 0.95)
            u = jax.random.uniform(k_rr, shp)
            killed = alive & (u > p)
            alive = alive & jnp.logical_not(killed)
            T = jnp.where(alive[..., None], T / p[..., None], T)

    return Lo, override, primary_fetched


def render_pt(scene: SceneData, cam: Camera, time, key, *, rows: int,
              cols: int, pixel_aspect: float, spp: int, bounces: int,
              light_color, nee: bool = True):
    """Full mainImage (pathtrace_shader.js:187-263): sample loop with the
    center-ray/fetched-texel AA rule + override short-circuit.

    Returns (rgb f32 [H,W,3] in [0,1], alpha byte u8 [H,W])."""
    uu, vv, ww, focal = camera_basis(cam.yaw, cam.pitch, cam.fov_y)
    aspect = jnp.float32(cols / rows) * jnp.float32(pixel_aspect)
    x = (jnp.arange(cols, dtype=jnp.float32) + 0.5) / jnp.float32(cols)
    y_gl = (jnp.arange(rows, dtype=jnp.float32)[::-1] + 0.5) / jnp.float32(rows)
    px = jnp.broadcast_to(((-1.0 + 2.0 * x) * aspect)[None, :], (rows, cols))
    py = jnp.broadcast_to((-1.0 + 2.0 * y_gl)[:, None], (rows, cols))
    ro0 = jnp.broadcast_to(cam.pos, (rows, cols, 3))

    light_center, light_radius = get_light_sphere(scene, time)
    lcol = jnp.asarray(light_color, jnp.float32) * 1.3  # the *1.3 in the define

    def sample_step(carry, s):
        tot, override, fetched, stopped = carry
        ks = jax.random.fold_in(key, s)
        k_jit, k_path = jax.random.split(ks)
        # jitter: center ray for sample 0 and for fetched-texel pixels
        r2 = jax.random.uniform(k_jit, (rows, cols, 2))
        rpof = 2.0 * (r2 - 0.5) / jnp.float32(rows)
        rpof = rpof.at[..., 0].multiply(aspect)
        use_jit = (s > 0) & jnp.logical_not(fetched)
        jx = jnp.where(use_jit, rpof[..., 0], 0.0)
        jy = jnp.where(use_jit, rpof[..., 1], 0.0)
        rd = ((px + jx)[..., None] * uu + (py + jy)[..., None] * vv + focal * ww)
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)

        col, ov, pf = trace_eye_paths(scene, ro0, rd, k_path, light_center,
                                      light_radius, bounces=bounces,
                                      light_color=lcol, nee=nee)
        fetched = jnp.where(s == 0, pf, fetched)
        new_stop = (ov > 0) & jnp.logical_not(stopped)
        tot = jnp.where(new_stop[..., None], col,
                        jnp.where(stopped[..., None], tot, tot + col))
        override = jnp.where(new_stop, ov, override)
        stopped = stopped | new_stop
        return (tot, override, fetched, stopped), None

    init = (jnp.zeros((rows, cols, 3)), jnp.zeros((rows, cols), jnp.int32),
            jnp.zeros((rows, cols), bool), jnp.zeros((rows, cols), bool))
    (tot, override, _f, stopped), _ = jax.lax.scan(
        sample_step, init, jnp.arange(spp))

    has_ov = override > 0
    rgb = jnp.where(has_ov[..., None], jnp.clip(tot, 0.0, 1.0),
                    jnp.clip(tot / jnp.float32(spp), 0.0, 1.0))
    a = jnp.where(has_ov, override, 255).astype(jnp.uint8)
    return rgb, a


class PathtraceBackend:
    """Backend-protocol wrapper (contract 5)."""

    name = "pathtrace"

    def __init__(self, cfg=None):
        from ascii_renderer_tpu.core.config import Config
        self.cfg = cfg or Config()
        self._scene: SceneData | None = None
        self._fns = {}
        self._frame_idx = 0

    def set_scene(self, scene: SceneData):
        self._scene = scene

    def render(self, time_sec, camera: Camera, rows: int, cols: int,
               pixel_aspect: float = 1.0) -> Frame:
        if self._scene is None:
            return Frame.blank(rows, cols)
        pt = self.cfg.path_tracer
        k = (rows, cols, float(pixel_aspect))
        fn = self._fns.get(k)
        if fn is None:
            fn = jax.jit(functools.partial(
                render_pt, rows=rows, cols=cols, pixel_aspect=pixel_aspect,
                spp=pt.samples_per_batch, bounces=pt.max_bounces,
                light_color=pt.light_color, nee=pt.direct_light_sampling))
            self._fns[k] = fn
        key = jax.random.key(self._frame_idx)
        self._frame_idx += 1
        rgb, a = fn(self._scene, camera, jnp.float32(time_sec), key)
        return Frame.from_float(rgb, a)

    def dispose(self):
        self._scene = None
        self._fns = {}
