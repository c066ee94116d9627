"""Monte-Carlo path tracer (ref: pathtrace.js + pathtrace_shader.js +
shader_utils.js) — the reference's default backend.

TPU re-design:
  - one program over the whole sample-batch x cell grid; rays ride the
    128-lane axis as FLAT channels (backends/pt_core.py) — primitive
    candidate matrices are [P, R], vectors are triples of scalar channels
    (a naive [..., P, 3] vectorization runs at 2% lane efficiency);
  - python-unrolled fixed-trip bounce loop with live masks (GLSL `break`
    becomes a mask);
  - counter-based RNG (threefry via jax.random) replaces the reference's
    order-dependent `fract(sin)` hash (shader_utils.js:8-17). MC output is
    stochastic; bit-parity with the GLSL stream is a declared non-goal,
    determinism under our own keys is guaranteed (SURVEY §7);
  - the sample loop batches samples into a leading array axis (see
    render_pt) with the center-ray/fetched-texel AA rule preserved.

Semantics preserved (per the shader):
  - 64 spp x 5 bounces, NEE toward the (optionally auto-animated)
    spherical area light, Russian roulette after bounce 2;
  - glass/mirror Fresnel branch with the reference's exact n1/n2 choice and
    Schlick term (shader_utils.js:216-229);
  - sky/ground environment on miss (shader_utils.js:20-25);
  - ASCII-texture sampling: a PRIMARY ray hitting a glyph texel
    short-circuits — color passes through and the glyph code rides the
    output alpha (pathtrace_shader.js:141-149); secondary hits truncate the
    glyph to a solid texel; A==1 solid texels override material albedo;
    triangles always fetch, quads with all-zero UVs are untextured
    (shader_utils.js:108-132);
  - candidate order spheres < tris < quad-tri1 < quad-tri2 < light
    preserves the shader's tie-breaks up to the quad t1/t2 interleave;
  - material shading colors follow the shader's LUT semantics
    (shader_utils.js:61-76): diffuse albedo * 0.7, specular 1.0, light
    emission LIGHT_COLOR * 1.3 — generalized from the hardcoded ID LUT to
    the packed material table (emissive -> light, reflective -> specular);
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
from ascii_renderer_tpu.backends import pt_core as pc
from ascii_renderer_tpu.backends.pt_core import V3, cross, dot, normalize
from ascii_renderer_tpu.scene.builder import SceneData

EPS = 1e-3  # shader_utils.js:5

KIND_NONE, KIND_SPHERE, KIND_TRI, KIND_LIGHT = 0, 1, 3, 5


def environment_ch(rd: V3) -> V3:
    """Sky/ground gradient on miss (shader_utils.js:20-25), channel form."""
    t = jnp.clip(rd.y * 0.5 + 0.5, 0.0, 1.0) ** 1.2
    sky = V3(0.90 * (1 - t) + 0.45 * t, 0.95 * (1 - t) + 0.65 * t,
             1.00 * (1 - t) + 0.95 * t)
    s = jnp.clip((rd.y + 0.05) / 0.1, 0.0, 1.0)
    s = s * s * (3.0 - 2.0 * s)  # smoothstep
    grd = (0.18 * 0.35, 0.15 * 0.35, 0.12 * 0.35)
    return V3(grd[0] * (1 - s) + sky.x * s, grd[1] * (1 - s) + sky.y * s,
              grd[2] * (1 - s) + sky.z * s)


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


class _ScenePack:
    """Per-trace precomputation: channelized primitive data."""

    def __init__(self, scene: SceneData):
        self.scene = scene
        self.sph_c = V3.of(scene.sph_pos)
        self.sph_r = scene.sph_rad
        self.sph_valid = scene.sph_valid()
        self.n_sph = scene.sph_pos.shape[0]

        # all tris = [scene tris, quad tri1 (a,b,c), quad tri2 (a,c,d)]
        va = jnp.concatenate([scene.tri_a, scene.quad_a, scene.quad_a])
        vb = jnp.concatenate([scene.tri_b, scene.quad_b, scene.quad_c])
        vc = jnp.concatenate([scene.tri_c, scene.quad_c, scene.quad_d])
        tvalid = jnp.concatenate([scene.tri_valid(), scene.quad_valid(),
                                  scene.quad_valid()])
        self.tri = pc.TriPack.build(va, vb, vc, tvalid)
        self.n_tris = va.shape[0]
        self.tri_mat = jnp.concatenate([scene.tri_mat, scene.quad_mat,
                                        scene.quad_mat])
        # atlas UVs per all-tris row; quad tri1 -> (uv0, uv1, uv2),
        # tri2 -> (uv0, uv2, uv3)
        self.uva = jnp.concatenate([scene.tri_uva, scene.quad_uv0,
                                    scene.quad_uv0])
        self.uvb = jnp.concatenate([scene.tri_uvb, scene.quad_uv1,
                                    scene.quad_uv2])
        self.uvc = jnp.concatenate([scene.tri_uvc, scene.quad_uv2,
                                    scene.quad_uv3])
        nq = scene.quad_a.shape[0]
        nt = scene.tri_a.shape[0]
        is_quad_row = jnp.concatenate([
            jnp.zeros((nt,), bool), jnp.ones((2 * nq,), bool)])
        quad_zero = (jnp.all(self.uva == 0, -1) & jnp.all(self.uvb == 0, -1)
                     & jnp.all(self.uvc == 0, -1))
        # texturable: tris always; quads only when some UV is nonzero
        self.texturable = jnp.logical_not(is_quad_row & quad_zero)

        self.is_light_m, self.is_spec_m, shade_m = _mat_flags(scene)
        self.shade_m = shade_m  # [M, 3]


def _intersect(ro: V3, rd: V3, pk: _ScenePack, light_center, light_radius):
    """Nearest hit. Returns dict of per-ray channels."""
    scene = pk.scene
    t_s = pc.spheres_t(ro, rd, pk.sph_c, pk.sph_r, pk.sph_valid, EPS)
    t_t = pc.tris_t(ro, rd, pk.tri, EPS)
    lc = V3(light_center[0][None], light_center[1][None],
            light_center[2][None])
    t_l = pc.spheres_t(ro, rd, lc, light_radius[None],
                       jnp.ones((1,), bool), EPS)
    t_all = jnp.concatenate([t_s, t_t, t_l], axis=0)  # [P, R]
    k = jnp.argmin(t_all, axis=0)  # [R], first-min tie-break = shader order
    t = jnp.take_along_axis(t_all, k[None], axis=0)[0]
    hit = t < pc.BIG * 0.5

    S, T = pk.n_sph, pk.n_tris
    is_s = k < S
    is_t = (k >= S) & (k < S + T)
    is_l = k >= S + T
    ks = jnp.clip(k, 0, S - 1)
    kt = jnp.clip(k - S, 0, T - 1)

    pos = V3(ro.x + t * rd.x, ro.y + t * rd.y, ro.z + t * rd.z)

    # winner hit info per class, cheap per-ray recompute
    csel = pc.gather(pk.sph_c, ks)
    rsel = pk.sph_r[ks]
    n_sph = V3((pos.x - csel.x) / jnp.maximum(rsel, 1e-6),
               (pos.y - csel.y) / jnp.maximum(rsel, 1e-6),
               (pos.z - csel.z) / jnp.maximum(rsel, 1e-6))
    n_lgt = V3((pos.x - light_center[0]) / jnp.maximum(light_radius, 1e-6),
               (pos.y - light_center[1]) / jnp.maximum(light_radius, 1e-6),
               (pos.z - light_center[2]) / jnp.maximum(light_radius, 1e-6))
    a_t = pc.gather(pk.tri.a, kt)
    e1_t = pc.gather(pk.tri.e1, kt)
    e2_t = pc.gather(pk.tri.e2, kt)
    n_tri, b0, b1, b2 = pc.tri_hit_info(ro, rd, a_t, e1_t, e2_t)

    n = n_tri.where(is_t, n_sph.where(is_s, n_lgt))
    mat = jnp.where(is_s, scene.sph_mat[ks],
                    jnp.where(is_t, pk.tri_mat[kt], 0))
    kind = jnp.where(is_s, KIND_SPHERE,
                     jnp.where(is_t, KIND_TRI,
                               jnp.where(is_l, KIND_LIGHT, KIND_NONE)))
    kind = jnp.where(hit, kind, KIND_NONE)
    return dict(t=t, hit=hit, kind=kind, mat=mat, n=n, pos=pos,
                tri_idx=kt, bc=(b0, b1, b2))


def _shadow(ro: V3, rd: V3, dist, pk: _ScenePack):
    """Any-hit < dist over spheres + all tris (no light sphere)."""
    t_s = pc.spheres_t(ro, rd, pk.sph_c, pk.sph_r, pk.sph_valid, EPS)
    t_t = pc.tris_t(ro, rd, pk.tri, EPS)
    return (jnp.any(t_s < dist[None], axis=0)
            | jnp.any(t_t < dist[None], axis=0))


def _sample_atlas(pk: _ScenePack, hinfo):
    """Atlas fetch for the winning triangle row (shader_utils.js:100-132).
    Returns (rgb V3 [R] in 0..1, abyte i32 [R], sampled bool [R])."""
    scene = pk.scene
    ah, aw = scene.atlas_a.shape
    if not (ah > 1 and aw > 1):  # atlasEnabled, static
        z = jnp.zeros_like(hinfo["t"])
        return V3(z, z, z), z.astype(jnp.int32), z.astype(bool)

    kt = hinfo["tri_idx"]
    b0, b1, b2 = hinfo["bc"]
    uva = pk.uva[kt]  # [R, 2]
    uvb = pk.uvb[kt]
    uvc = pk.uvc[kt]
    u = b0 * uva[:, 0] + b1 * uvb[:, 0] + b2 * uvc[:, 0]
    v = b0 * uva[:, 1] + b1 * uvb[:, 1] + b2 * uvc[:, 1]
    tx = jnp.floor(u + 0.5).astype(jnp.int32)
    ty = jnp.floor(v + 0.5).astype(jnp.int32)
    inb = (tx >= 0) & (tx < aw) & (ty >= 0) & (ty < ah)
    txc = jnp.clip(tx, 0, aw - 1)
    tyc = jnp.clip(ty, 0, ah - 1)
    lin = tyc * aw + txc
    flat_rgb = scene.atlas_rgb.reshape(-1, 3).astype(jnp.float32) / 255.0
    flat_a = scene.atlas_a.reshape(-1).astype(jnp.int32)
    rgb = V3(flat_rgb[:, 0][lin], flat_rgb[:, 1][lin], flat_rgb[:, 2][lin])
    ab = flat_a[lin]
    sampled = ((hinfo["kind"] == KIND_TRI) & pk.texturable[kt] & inb
               & (ab != 0))
    return rgb, jnp.where(sampled, ab, 0), sampled


def _cos_hemisphere(n: V3, key):
    """Cosine-weighted hemisphere sample (shader_utils.js:135-143)."""
    r = jax.random.uniform(key, n.x.shape + (2,))
    phi = 2.0 * jnp.pi * r[..., 0]
    r2 = r[..., 1]
    s2 = jnp.sqrt(1.0 - r2)
    ny_ok = jnp.abs(n.y) < 0.999
    axis = V3(jnp.where(ny_ok, 0.0, 1.0), jnp.where(ny_ok, 1.0, 0.0),
              jnp.zeros_like(n.x))
    uu = normalize(cross(n, axis))
    vv = cross(uu, n)
    cphi = s2 * jnp.cos(phi)
    sphi = s2 * jnp.sin(phi)
    sr2 = jnp.sqrt(r2)
    return normalize(V3(cphi * uu.x + sphi * vv.x + sr2 * n.x,
                        cphi * uu.y + sphi * vv.y + sr2 * n.y,
                        cphi * uu.z + sphi * vv.z + sr2 * n.z))


def _sample_light_point(key, center, radius, shape):
    """Uniform point on the light sphere (shader_utils.js:144-149)."""
    h = jax.random.uniform(key, shape + (2,))
    hx = h[..., 0] * 2.0 - 1.0
    phi = h[..., 1] * 2.0 * jnp.pi
    s = jnp.sqrt(jnp.maximum(1.0 - hx * hx, 0.0))
    return V3(center[0] + radius * s * jnp.sin(phi),
              center[1] + radius * s * jnp.cos(phi),
              center[2] + radius * hx)


def _next_direction(n: V3, rd: V3, is_spec, key):
    """BRDF sampling (shader_utils.js:216-229)."""
    kd, kf = jax.random.split(key)
    diff = _cos_hemisphere(n, kd)

    ndotr = dot(rd, n)
    flip = ndotr > 0.0
    eta = jnp.where(flip, 1.5, 1.0 / 1.5)
    nn = V3(jnp.where(flip, -n.x, n.x), jnp.where(flip, -n.y, n.y),
            jnp.where(flip, -n.z, n.z))
    r0 = ((1.0 - 1.5) / (1.0 + 1.5)) ** 2
    fres = r0 + (1.0 - r0) * (1.0 - jnp.abs(ndotr)) ** 5
    ref, _tir = pc.refract(rd, nn, eta)
    use_reflect = (pc.norm(ref) < 1e-5) | \
        (jax.random.uniform(kf, fres.shape) < fres)
    refl = pc.reflect(rd, nn)
    spec = normalize(refl.where(use_reflect, ref))
    return spec.where(is_spec, diff), is_spec


def trace_eye_paths(scene: SceneData, ro, rd, key, light_center, light_radius,
                    *, bounces: int, light_color, nee: bool,
                    with_stats: bool = False):
    """traceEyePath (pathtrace_shader.js:107-183), vectorized over rays.

    ro/rd: f32 [..., 3]. Returns (Lo [..., 3], override_byte [...] i32,
    primary_fetched [...] bool). with_stats=True appends a 4th element:
    {"segments": f32, "shadow_rays": f32} — the TRUE ray counts this
    wavefront traced (eye-path segments = rays alive at each bounce's
    intersect; shadow rays = alive diffuse lanes at the NEE test), for
    honest Mrays/s accounting in the bench."""
    shp = rd.shape[:-1]
    R = 1
    for s in shp:
        R *= s
    ro = V3.of(ro.reshape(R, 3))
    rd = V3.of(rd.reshape(R, 3))
    pk = _ScenePack(scene)
    lcol = jnp.asarray(light_color, jnp.float32)
    shade_r = pk.shade_m[:, 0]
    shade_g = pk.shade_m[:, 1]
    shade_b = pk.shade_m[:, 2]

    Lo = V3(*(jnp.zeros((R,)) for _ in range(3)))
    T = V3(*(jnp.ones((R,)) for _ in range(3)))
    alive = jnp.ones((R,), bool)
    specular_bounce = jnp.ones((R,), bool)
    override = jnp.zeros((R,), jnp.int32)
    primary_fetched = jnp.zeros((R,), bool)

    seg_count = jnp.zeros((), jnp.float32)
    shadow_count = jnp.zeros((), jnp.float32)
    for j in range(bounces):
        kj = jax.random.fold_in(key, j)
        k_bounce, k_nee, k_rr = jax.random.split(kj, 3)

        if with_stats:
            seg_count = seg_count + alive.sum().astype(jnp.float32)
        h = _intersect(ro, rd, pk, light_center, light_radius)
        miss = alive & jnp.logical_not(h["hit"])
        env = environment_ch(rd)
        Lo = V3(jnp.where(miss, Lo.x + T.x * env.x, Lo.x),
                jnp.where(miss, Lo.y + T.y * env.y, Lo.y),
                jnp.where(miss, Lo.z + T.z * env.z, Lo.z))
        alive = alive & h["hit"]

        n = h["n"]
        is_light = pk.is_light_m[jnp.maximum(h["mat"], 0)] | \
            (h["kind"] == KIND_LIGHT)
        lt = alive & is_light & specular_bounce
        Lo = V3(jnp.where(lt, Lo.x + T.x * lcol[0], Lo.x),
                jnp.where(lt, Lo.y + T.y * lcol[1], Lo.y),
                jnp.where(lt, Lo.z + T.z * lcol[2], Lo.z))
        alive = alive & jnp.logical_not(is_light)

        tex, abyte, sampled = _sample_atlas(pk, h)
        sampled = sampled & alive
        if j == 0:
            primary_fetched = sampled

        glyph = sampled & (abyte >= quantize.ATLAS_GLYPH_MIN) & \
            (abyte <= quantize.ATLAS_GLYPH_MAX)
        if j == 0:
            # primary glyph hit: color passthrough + alpha override, stop
            Lo = tex.where(glyph, Lo)
            override = jnp.where(glyph, abyte, override)
            alive = alive & jnp.logical_not(glyph)
            solid = sampled & (abyte == quantize.ATLAS_SOLID)
        else:
            solid = sampled & ((abyte == quantize.ATLAS_SOLID) | glyph)

        m = jnp.maximum(h["mat"], 0)
        is_spec = pk.is_spec_m[m]
        albedo = tex.where(solid, V3(shade_r[m], shade_g[m], shade_b[m]))

        ndir, spec_now = _next_direction(n, rd, is_spec, k_bounce)
        absorb = alive & (jnp.logical_not(spec_now) | (dot(ndir, n) < 0.0))
        T = (T * albedo).where(absorb, T)

        hitpos = h["pos"]
        if with_stats and nee and j < bounces - 1:
            shadow_count = shadow_count + (
                alive & jnp.logical_not(is_spec)).sum().astype(jnp.float32)
        if nee and j < bounces - 1:
            lpos = _sample_light_point(k_nee, light_center, light_radius,
                                       (R,))
            ldir = lpos - hitpos
            dist = pc.norm(ldir)
            ldir = ldir * (1.0 / jnp.maximum(dist, 1e-12))
            sro = V3(hitpos.x + n.x * EPS, hitpos.y + n.y * EPS,
                     hitpos.z + n.z * EPS)
            shadowed = _shadow(sro, ldir, dist, pk)
            dl = V3(light_center[0] - hitpos.x, light_center[1] - hitpos.y,
                    light_center[2] - hitpos.z)
            d2 = jnp.maximum(dot(dl, dl), 1e-12)
            cos_a_max = jnp.sqrt(1.0 - jnp.clip(
                light_radius * light_radius / d2, 0.0, 1.0))
            weight = 2.0 * (1.0 - cos_a_max)
            ndl = jnp.maximum(dot(ldir, n), 0.0)
            contrib = alive & jnp.logical_not(spec_now) & \
                jnp.logical_not(shadowed)
            wnd = weight * ndl
            Lo = V3(jnp.where(contrib, Lo.x + T.x * lcol[0] * wnd, Lo.x),
                    jnp.where(contrib, Lo.y + T.y * lcol[1] * wnd, Lo.y),
                    jnp.where(contrib, Lo.z + T.z * lcol[2] * wnd, Lo.z))

        side = jnp.where(dot(ndir, n) > 0.0, EPS, -EPS)
        new_ro = V3(hitpos.x + n.x * side, hitpos.y + n.y * side,
                    hitpos.z + n.z * side)
        ro = new_ro.where(alive, ro)
        rd = ndir.where(alive, rd)
        specular_bounce = jnp.where(alive, spec_now, specular_bounce)

        if j >= 2:  # Russian roulette (pathtrace_shader.js:176-180)
            p = jnp.clip(jnp.maximum(T.x, jnp.maximum(T.y, T.z)), 0.05, 0.95)
            u = jax.random.uniform(k_rr, (R,))
            alive = alive & jnp.logical_not(u > p)
            inv_p = 1.0 / p
            T = (T * inv_p).where(alive, T)

    Lo_arr = Lo.stack().reshape(shp + (3,))
    if with_stats:
        return (Lo_arr, override.reshape(shp), primary_fetched.reshape(shp),
                {"segments": seg_count, "shadow_rays": shadow_count})
    return Lo_arr, override.reshape(shp), primary_fetched.reshape(shp)

def primary_ray_grid(cam: Camera, rows: int, cols: int, pixel_aspect,
                     row_lo=0, n_rows: int | None = None):
    """Center-ray grid (ro, rd, px, py) for the PT camera mapping
    (pathtrace_shader.js:195-201). The single implementation shared by
    render_pt and bench.py's Mrays/s ray accounting, so the counted rays
    are bit-identical to the rays the timed render actually traces.

    row_lo/n_rows select the horizontal band of the GLOBAL grid (same
    contract as core.camera.primary_ray_dirs) for row-band sharding."""
    band = rows if n_rows is None else n_rows
    uu, vv, ww, focal = camera_basis(cam.yaw, cam.pitch, cam.fov_y)
    aspect = jnp.float32(cols / rows) * jnp.float32(pixel_aspect)
    x = (jnp.arange(cols, dtype=jnp.float32) + 0.5) / jnp.float32(cols)
    y_gl = (jnp.arange(rows, dtype=jnp.float32)[::-1] + 0.5) / jnp.float32(rows)
    if n_rows is not None:
        y_gl = jax.lax.dynamic_slice_in_dim(y_gl, row_lo, n_rows)
    px = jnp.broadcast_to(((-1.0 + 2.0 * x) * aspect)[None, :], (band, cols))
    py = jnp.broadcast_to((-1.0 + 2.0 * y_gl)[:, None], (band, cols))
    rd0 = (px[..., None] * uu + py[..., None] * vv + focal * ww)
    rd0 = rd0 / jnp.linalg.norm(rd0, axis=-1, keepdims=True)
    ro0 = jnp.broadcast_to(cam.pos, (band, cols, 3))
    return ro0, rd0, px, py


def _hash_unit(uid, seed, ctr: int):
    """jnp mirror of ops/pt_kernel._make_uniform's lowbias32 draw: U[0,1)
    as a pure function of (ray uid, seed, draw counter). Used for the
    kernel path's AA jitter so a pixel's jitter is placement-invariant
    under the adaptive compaction permutation. Counters 0x40000001+ keep
    the jitter stream disjoint from the kernel's in-path draw counters
    (small integers)."""
    x = uid.astype(jnp.uint32) ^ (
        seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
        + jnp.uint32(ctr) * jnp.uint32(0x85EBCA6B))
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> 16)
    mant = (x >> 9) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(mant, jnp.float32) - 1.0


def render_pt(scene: SceneData, cam: Camera, time, key, *, rows: int,
              cols: int, pixel_aspect: float, spp: int, bounces: int,
              light_color, nee: bool = True, sample_batch: int = 32,
              use_kernel: bool = False, row_lo=0,
              n_rows: int | None = None, pixel_active=None, packed=None):
    """Full mainImage (pathtrace_shader.js:187-263): the sample loop with
    the center-ray/fetched-texel AA rule + glyph override short-circuit.

    pixel_active: optional [band, cols] bool (adaptive sampling,
    sim/accum active mask). On the kernel path the frame is rendered in
    a COMPACTED pixel order: a cumsum permutation packs active pixels to
    the front of the ray stream, so the inactive tail is contiguous
    1024-ray device blocks that the megakernel's block gate skips — the
    per-frame work scales with the ACTIVE PIXEL COUNT (near the
    per-pixel ideal), not with how scattered convergence is (block
    gating on the natural row order measured 0.1% skippable blocks at
    26% active pixels, tools/exp_pt_mask_layout.py). Because the
    kernel's RNG and the AA jitter are pure functions of (pixel uid,
    seed) — not of stream placement — every live pixel's output is
    bit-identical to the unmasked render; inactive pixels read zero,
    which accumulate() never folds. The phase-1 probe is gated by the
    same mask: frozen pixels' alpha/override is owned by the caller's
    cache (sim/accum AccumState.alpha — deterministic per camera pose,
    so the cached value IS the full render's value). The XLA core
    ignores the mask (no block-skip structure to exploit).

    packed: optional pack_scene_entries(scene) result, precomputed ONCE
    per scene outside the frame jit (PathtraceBackend.set_scene does).
    Re-deriving the pack from a traced SceneData every frame makes the
    whole-frame program ~2x slower on TPU than the same frame with the
    pack as a ready input (the pack's scatter chain serializes ahead of
    the megakernel) — see tools/exp_pt_scenearg.py for the measured A/B.

    row_lo/n_rows render only the horizontal band [row_lo, row_lo+n_rows)
    of the global grid (row-band sharding hook, parallel.mesh.
    render_rows_sharded): the camera mapping and jitter NDC scale stay
    those of the full rows x cols frame. RNG note: a banded render draws
    different jitter/path noise than the same pixels in a full-frame
    render (keys are folded per batch, shapes differ) — deterministic
    under its own sharding, not bit-comparable across shardings (MC
    output is stochastic; SURVEY declares RNG bit-parity a non-goal).

    TPU structure: a sequential scan over spp samples starves the VPU at
    cell-grid sizes, so samples ride a leading BATCH axis ([B, H, W] rays),
    with a scan only over ceil(spp/B) batches:

      phase 1 — one center-ray probe decides `fetchedTexel` per pixel and
        captures primary glyph overrides (sample 0's decision role);
      phase 2 — sample batches: sample 0 re-traces the center ray (its
        contribution to the estimate), samples >0 jitter iff the pixel is
        not texel-fetched; the first overriding sample REPLACES the total,
        matching the shader's break-and-take.

    Returns (rgb f32 [H,W,3] in [0,1], alpha byte u8 [H,W])."""
    band = rows if n_rows is None else n_rows
    uu, vv, ww, focal = camera_basis(cam.yaw, cam.pitch, cam.fov_y)
    aspect = jnp.float32(cols / rows) * jnp.float32(pixel_aspect)
    ro0, rd0, px, py = primary_ray_grid(cam, rows, cols, pixel_aspect,
                                        row_lo=row_lo, n_rows=n_rows)

    light_center, light_radius = get_light_sphere(scene, time)
    lcol = jnp.asarray(light_color, jnp.float32) * 1.3  # the *1.3 in the define

    # kernel-path RNG: the megakernel's counter-based hash is seeded from
    # the frame key so every frame draws fresh bounce-sampling noise (the
    # reference reseeds per frame via its time uniform,
    # pathtrace_shader.js:187-201); a literal seed here would make
    # temporal accumulation over kernel frames barely converge.
    frame_seed = (jax.random.key_data(key).reshape(-1)[-1]
                  .astype(jnp.int32))

    pc = band * cols
    # GLOBAL pixel index (band offset included): the RNG uid a pixel
    # keeps under any placement — compaction, row-band sharding
    pix_uid = (jnp.arange(pc, dtype=jnp.int32)
               + jnp.asarray(row_lo, jnp.int32) * cols)
    pc_global = rows * cols

    # ---- adaptive compaction (kernel path): active pixels to the front
    # of the ray stream. Implemented as ONE key sort, not index gathers:
    # a stable partition by the active mask is a sort on the unique key
    # (1-active)*pc + index, and lax.sort's bitonic network moves whole
    # vector rows — the earlier cumsum/scatter + per-array [perm] gathers
    # lowered to element-rate kCustom ops costing ~48 ms/step at 960x540
    # (3.4-12.7 ms per 518k-element gather, profiled r4), vs ~1 ms for
    # the sorts. The carried pix_uid doubles as the inverse map: the
    # final unpack is a second key sort back to pixel order.
    compacted = use_kernel and pixel_active is not None
    mask_flat = None
    if compacted:
        mask_flat = pixel_active.reshape(-1)
        mi = mask_flat.astype(jnp.int32)
        n_act = jnp.sum(mi)
        key_part = (1 - mi) * pc + jnp.arange(pc, dtype=jnp.int32)
        (_, pix_uid) = jax.lax.sort((key_part, pix_uid), dimension=0,
                                    is_stable=False, num_keys=1)
        # px/py/rd0 are pure functions of the pixel index: recompute
        # them from the sorted uid with primary_ray_grid's exact
        # arithmetic (bit-identical; integer row/col are exact in f32)
        # instead of carrying 5 more payload arrays through the sort
        r_gl = (pix_uid // cols).astype(jnp.float32)
        c_gl = (pix_uid % cols).astype(jnp.float32)
        x_s = (c_gl + 0.5) / jnp.float32(cols)
        y_s = (jnp.float32(rows - 1) - r_gl + 0.5) / jnp.float32(rows)
        px = ((-1.0 + 2.0 * x_s) * aspect).reshape(band, cols)
        py = (-1.0 + 2.0 * y_s).reshape(band, cols)
        rd0 = (px[..., None] * uu + py[..., None] * vv + focal * ww)
        rd0 = rd0 / jnp.linalg.norm(rd0, axis=-1, keepdims=True)
        # actives occupy slots [0, n_act) by construction
        mask_flat = jnp.arange(pc, dtype=jnp.int32) < n_act

    # ---- phase 1: center-ray probe (fetched flag + primary glyph hits) ----
    if use_kernel:
        # packed channel layout end-to-end (see
        # trace_eye_paths_kernel_packed): phase-1/2 reductions run on
        # flat [pc]/[B, pc] arrays; ONE unpack to [band, cols(, 3)] at
        # the end of the frame
        lor0, log0, lob0, ov0f, fet0 = trace_eye_paths_kernel_packed(
            scene, ro0, rd0, frame_seed, light_center, light_radius,
            bounces=bounces, light_color=lcol, nee=nee,
            ray_active=mask_flat, ray_uid=pix_uid, packed=packed)
        ov0 = jnp.round(ov0f).astype(jnp.int32)        # [pc]
        fetched = (fet0 > 0.5).reshape(band, cols)     # jitter mask (image)
        col0 = None
    else:
        col0, ov0, fetched = trace_eye_paths(
            scene, ro0, rd0, jax.random.fold_in(key, 0xC0FFEE), light_center,
            light_radius, bounces=bounces, light_color=lcol, nee=nee)

    # ---- phase 2: batched samples ----
    B = max(1, min(sample_batch, spp))
    n_batches = -(-spp // B)
    ro_b = jnp.broadcast_to(cam.pos, (B, band, cols, 3))
    # per-(sample, pixel) RNG uid — pure function of the pixel, not of
    # stream placement (see _hash_unit / ops/pt_kernel._make_uniform)
    uid_sp = (jnp.arange(B, dtype=jnp.int32)[:, None]
              * jnp.int32(pc_global) + pix_uid[None, :])  # [B, pc]

    def batch_seed_of(b):
        # golden-ratio stride decorrelates batches under one frame key
        return frame_seed + (b + 1) * jnp.int32(-1640531527)

    def batch_rays(b):
        kb = jax.random.fold_in(key, b)
        k_jit, k_path = jax.random.split(kb)
        s_idx = b * B + jnp.arange(B)
        if use_kernel:
            # jitter from the placement-invariant hash stream (the
            # jax.random draw below is positional, which would tie a
            # pixel's jitter to its compacted slot)
            bs = batch_seed_of(b)
            jxu = _hash_unit(uid_sp, bs, 0x40000001)
            jyu = _hash_unit(uid_sp, bs, 0x40000002)
            r2 = jnp.stack([jxu, jyu], axis=-1).reshape(B, band, cols, 2)
        else:
            r2 = jax.random.uniform(k_jit, (B, band, cols, 2))
        rpof = 2.0 * (r2 - 0.5) / jnp.float32(rows)
        rpof = rpof.at[..., 0].multiply(aspect)
        use_jit = ((s_idx > 0)[:, None, None]
                   & jnp.logical_not(fetched)[None, :, :])
        jx = jnp.where(use_jit, rpof[..., 0], 0.0)
        jy = jnp.where(use_jit, rpof[..., 1], 0.0)
        rd = ((px[None] + jx)[..., None] * uu
              + (py[None] + jy)[..., None] * vv + focal * ww)
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        return rd, s_idx, k_path

    if use_kernel:
        ray_active = None
        if pixel_active is not None:
            # ray index = s*pc + p (batch_rays flattening order), so the
            # per-pixel (compacted) mask tiles across the sample axis
            ray_active = jnp.tile(mask_flat, B)

        def batch_step(carry, b):
            tr, tg, tb, override, ocr, ocg, ocb = carry
            rd, s_idx, _k = batch_rays(b)
            cr, cg, cb, ovf, _pf = trace_eye_paths_kernel_packed(
                scene, ro_b, rd, batch_seed_of(b), light_center,
                light_radius, bounces=bounces, light_color=lcol, nee=nee,
                ray_active=ray_active, ray_uid=uid_sp.reshape(-1),
                packed=packed)
            cr, cg, cb = (c.reshape(B, pc) for c in (cr, cg, cb))
            ov = jnp.round(ovf).astype(jnp.int32).reshape(B, pc)
            valid_s = (s_idx < spp)[:, None]
            tr = tr + jnp.sum(jnp.where(valid_s, cr, 0.0), axis=0)
            tg = tg + jnp.sum(jnp.where(valid_s, cg, 0.0), axis=0)
            tb = tb + jnp.sum(jnp.where(valid_s, cb, 0.0), axis=0)
            has_s = (ov > 0) & valid_s
            first = jnp.argmax(has_s, axis=0)  # [pc]
            has = jnp.any(has_s, axis=0)
            # select row `first` per column as a mask-sum: exactly one
            # nonzero term per column, so the sum IS the selected value
            # (take_along_axis lowers to [pc] scalar gathers at
            # descriptor rate — 34 us each here; this is a vector op)
            onehot = (jnp.arange(B, dtype=jnp.int32)[:, None]
                      == first[None])
            sel = lambda arr: jnp.sum(  # noqa: E731
                jnp.where(onehot, arr, jnp.zeros((), arr.dtype)), axis=0)
            new = has & (override == 0)
            override = jnp.where(new, sel(ov), override)
            ocr = jnp.where(new, sel(cr), ocr)
            ocg = jnp.where(new, sel(cg), ocg)
            ocb = jnp.where(new, sel(cb), ocb)
            return (tr, tg, tb, override, ocr, ocg, ocb), None

        zc = jnp.zeros((pc,), jnp.float32)
        init = (zc, zc, zc, jnp.zeros((pc,), jnp.int32), zc, zc, zc)
        if n_batches == 1:
            # NO scan for a single batch: XLA pessimizes the Pallas
            # megakernel inside a closed_call scan body — measured 50.4
            # vs 24.8 ms for the identical call at 960x540 spp8
            # (tools/profile_trace.py --pt). Same ops, same order —
            # bit-identical output, half the frame time.
            (tr, tg, tb, override_b, ocr, ocg, ocb), _ = batch_step(
                init, jnp.int32(0))
        else:
            (tr, tg, tb, override_b, ocr, ocg, ocb), _ = jax.lax.scan(
                batch_step, init, jnp.arange(n_batches))

        # phase-1 overrides (center ray) take precedence — sample 0
        has0 = ov0 > 0
        override = jnp.where(has0, ov0, override_b)
        ocr = jnp.where(has0, lor0, ocr)
        ocg = jnp.where(has0, log0, ocg)
        ocb = jnp.where(has0, lob0, ocb)
        has_ov = override > 0
        inv_spp = 1.0 / jnp.float32(spp)
        chans = [jnp.where(has_ov, jnp.clip(oc, 0.0, 1.0),
                           jnp.clip(t * inv_spp, 0.0, 1.0))
                 for oc, t in ((ocr, tr), (ocg, tg), (ocb, tb))]
        a_flat = jnp.where(has_ov, override, 255)
        if compacted:
            # undo the compaction: one key sort back to pixel order (the
            # carried pix_uid IS the original index, band-offset aside)
            uid_local = pix_uid - jnp.asarray(row_lo, jnp.int32) * cols
            (_, c0, c1, c2, a_flat) = jax.lax.sort(
                (uid_local, chans[0], chans[1], chans[2], a_flat),
                dimension=0, is_stable=False, num_keys=1)
            chans = [c0, c1, c2]
        rgb = jnp.stack(chans, axis=-1).reshape(band, cols, 3)
        a = a_flat.astype(jnp.uint8).reshape(band, cols)
        return rgb, a

    def batch_step(carry, b):
        tot, override, ovcol = carry
        rd, s_idx, k_path = batch_rays(b)
        col, ov, _pf = trace_eye_paths(scene, ro_b, rd, k_path,
                                       light_center, light_radius,
                                       bounces=bounces, light_color=lcol,
                                       nee=nee)
        valid_s = (s_idx < spp)[:, None, None]
        tot = tot + jnp.sum(jnp.where(valid_s[..., None], col, 0.0), axis=0)
        # first overriding sample in this batch (smallest s)
        has_s = (ov > 0) & valid_s
        first = jnp.argmax(has_s, axis=0)  # [H, W]
        has = jnp.any(has_s, axis=0)
        sel = lambda arr: jnp.take_along_axis(  # noqa: E731
            arr, first[None, ..., None] if arr.ndim == 4 else first[None],
            axis=0)[0]
        new = has & (override == 0)
        override = jnp.where(new, sel(ov), override)
        ovcol = jnp.where(new[..., None], sel(col), ovcol)
        return (tot, override, ovcol), None

    init = (jnp.zeros((band, cols, 3)), jnp.zeros((band, cols), jnp.int32),
            jnp.zeros((band, cols, 3)))
    if n_batches == 1:  # see the kernel path: no closed_call for 1 batch
        (tot, override_b, ovcol_b), _ = batch_step(init, jnp.int32(0))
    else:
        (tot, override_b, ovcol_b), _ = jax.lax.scan(
            batch_step, init, jnp.arange(n_batches))

    # phase-1 overrides (center ray) take precedence — they are sample 0
    has0 = ov0 > 0
    override = jnp.where(has0, ov0, override_b)
    ovcol = jnp.where(has0[..., None], col0, ovcol_b)
    has_ov = override > 0
    rgb = jnp.where(has_ov[..., None], jnp.clip(ovcol, 0.0, 1.0),
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
        self._packed = None
        self._fns = {}
        self._frame_idx = 0

    def set_scene(self, scene: SceneData):
        self._scene = scene
        # Precompute the kernel entry pack ONCE per scene: re-deriving it
        # from the traced SceneData inside the frame jit makes the whole
        # frame ~2x slower on TPU (tools/exp_pt_scenearg.py). The arrays
        # are passed as jit ARGUMENTS each frame (candidate fix B), so a
        # same-shape scene swap reuses the compiled program.
        self._packed = pack_scene_entries(scene)

    def render(self, time_sec, camera: Camera, rows: int, cols: int,
               pixel_aspect: float = 1.0) -> Frame:
        if self._scene is None:
            return Frame.blank(rows, cols)
        pt = self.cfg.path_tracer
        # Pallas megakernel on TPU; XLA path on CPU and for atlases larger
        # than the in-kernel one-hot gather budget.
        from ascii_renderer_tpu.ops.pt_kernel import MAX_ATLAS_TEXELS
        ah, aw = self._scene.atlas_a.shape
        atlas_ok = not (ah > 1 and aw > 1) or ah * aw <= MAX_ATLAS_TEXELS
        use_kernel = jax.default_backend() == "tpu" and atlas_ok
        pp, af, p_aw, p_ah, p_sr = self._packed
        # the pack's static shape params key the compiled program (they
        # are kernel shape args); the pack arrays themselves are traced
        k = (rows, cols, float(pixel_aspect), use_kernel, p_aw, p_ah, p_sr)
        fn = self._fns.get(k)
        if fn is None:
            def fn(scene, cam, t, key, pp, af, _aw=p_aw, _ah=p_ah,
                   _sr=p_sr):
                return render_pt(
                    scene, cam, t, key, rows=rows, cols=cols,
                    pixel_aspect=pixel_aspect, spp=pt.samples_per_batch,
                    bounces=pt.max_bounces, light_color=pt.light_color,
                    nee=pt.direct_light_sampling, use_kernel=use_kernel,
                    packed=(pp, af, _aw, _ah, _sr) if use_kernel else None)
            fn = jax.jit(fn)
            self._fns[k] = fn
        key = jax.random.key(self._frame_idx)
        self._frame_idx += 1
        rgb, a = fn(self._scene, camera, jnp.float32(time_sec), key, pp, af)
        return Frame.from_float(rgb, a)

    def dispose(self):
        self._scene = None
        self._packed = None
        self._fns = {}


# --------------------------------------------------------------------------
# Pallas megakernel path (ops/pt_kernel.py)
# --------------------------------------------------------------------------
def pack_scene_entries(scene: SceneData):
    """SceneData -> (prim_packed f32 [rows, 128], atlas_flat, atlas_w/h).

    Entry layout: ops/pt_kernel.py channels; spheres first, then all tris
    (scene tris + quad tri1 + quad tri2) — the XLA path's candidate order,
    preserving tie-break semantics."""
    from ascii_renderer_tpu.ops import pt_kernel as PK

    pk = _ScenePack(scene)
    S = pk.n_sph
    Tn = pk.n_tris
    S_pad = -(-S // PK.PACK) * PK.PACK  # spheres end on a row boundary
    n_pad = S_pad + (-(-Tn // PK.PACK) * PK.PACK)
    # Padding entries must satisfy the same bad-always invariant as
    # degenerate tris (C_BADS = 3e38 -> the kernel's guarded 1/ndotd
    # never sees a live infinity): an all-zero tail entry would compute
    # inv = 1/0 = inf and t = 0*inf = NaN, correct only by the grace of
    # the miss-combination order. Live blocks below overwrite full rows.
    ent = jnp.zeros((n_pad, PK.N_CHAN), jnp.float32).at[
        :, PK.C_BADS].set(3e38)

    m = jnp.maximum(scene.sph_mat, 0)
    sph_block = jnp.zeros((S, PK.N_CHAN), jnp.float32)
    sph_block = sph_block.at[:, PK.C_KIND].set(
        jnp.where(pk.sph_valid, 1.0, 0.0))
    sph_block = sph_block.at[:, PK.C_AX].set(pk.sph_c.x)
    sph_block = sph_block.at[:, PK.C_AY].set(pk.sph_c.y)
    sph_block = sph_block.at[:, PK.C_AZ].set(pk.sph_c.z)
    sph_block = sph_block.at[:, PK.C_E1X].set(pk.sph_r)
    sph_block = sph_block.at[:, PK.C_SHR].set(pk.shade_m[m, 0])
    sph_block = sph_block.at[:, PK.C_SHG].set(pk.shade_m[m, 1])
    sph_block = sph_block.at[:, PK.C_SHB].set(pk.shade_m[m, 2])
    sph_block = sph_block.at[:, PK.C_ISLIGHT].set(
        pk.is_light_m[m].astype(jnp.float32))
    sph_block = sph_block.at[:, PK.C_ISSPEC].set(
        pk.is_spec_m[m].astype(jnp.float32))

    tm = jnp.maximum(pk.tri_mat, 0)
    # world->barycentric transform per tri (ops/pt_kernel channel-layout
    # comment): unit normal n = (e1 x e2)/|e1 x e2|, plane offset d0 = n.a,
    # barycentric rows r1 = (e2 x n)/|e1 x e2| (u = r1.(p - a)) and
    # r2 = (n x e1)/|e1 x e2|; bad_scale = 1e-6/|e1 x e2| reproduces MT's
    # |det| < 1e-6 cutoff. Degenerate/inert tris get bad_scale = 3e38 so
    # the kernel's guarded 1/ndotd never sees a live infinity.
    a_ = jnp.stack([pk.tri.a.x, pk.tri.a.y, pk.tri.a.z], axis=-1)
    e1_ = jnp.stack([pk.tri.e1.x, pk.tri.e1.y, pk.tri.e1.z], axis=-1)
    e2_ = jnp.stack([pk.tri.e2.x, pk.tri.e2.y, pk.tri.e2.z], axis=-1)
    cn_ = jnp.cross(e1_, e2_)
    area2 = jnp.linalg.norm(cn_, axis=-1)
    ok = area2 > 1e-30
    inv_area = jnp.where(ok, 1.0 / jnp.where(ok, area2, 1.0), 0.0)
    n_ = cn_ * inv_area[:, None]
    d0_ = jnp.sum(n_ * a_, axis=-1)
    r1_ = jnp.cross(e2_, n_) * inv_area[:, None]
    r2_ = jnp.cross(n_, e1_) * inv_area[:, None]
    c1_ = -jnp.sum(r1_ * a_, axis=-1)
    c2_ = -jnp.sum(r2_ * a_, axis=-1)
    bads_ = jnp.where(ok, 1e-6 * inv_area, 3e38)

    tri_block = jnp.zeros((Tn, PK.N_CHAN), jnp.float32)
    tri_block = tri_block.at[:, PK.C_KIND].set(
        jnp.where(pk.tri.valid, 2.0, 0.0))
    tri_block = tri_block.at[:, PK.C_NX].set(n_[:, 0])
    tri_block = tri_block.at[:, PK.C_NY].set(n_[:, 1])
    tri_block = tri_block.at[:, PK.C_NZ].set(n_[:, 2])
    tri_block = tri_block.at[:, PK.C_D0].set(d0_)
    tri_block = tri_block.at[:, PK.C_R1X].set(r1_[:, 0])
    tri_block = tri_block.at[:, PK.C_R1Y].set(r1_[:, 1])
    tri_block = tri_block.at[:, PK.C_R1Z].set(r1_[:, 2])
    tri_block = tri_block.at[:, PK.C_C1].set(c1_)
    tri_block = tri_block.at[:, PK.C_R2X].set(r2_[:, 0])
    tri_block = tri_block.at[:, PK.C_R2Y].set(r2_[:, 1])
    tri_block = tri_block.at[:, PK.C_R2Z].set(r2_[:, 2])
    tri_block = tri_block.at[:, PK.C_C2].set(c2_)
    tri_block = tri_block.at[:, PK.C_BADS].set(bads_)
    tri_block = tri_block.at[:, PK.C_SHR].set(pk.shade_m[tm, 0])
    tri_block = tri_block.at[:, PK.C_SHG].set(pk.shade_m[tm, 1])
    tri_block = tri_block.at[:, PK.C_SHB].set(pk.shade_m[tm, 2])
    tri_block = tri_block.at[:, PK.C_ISLIGHT].set(
        pk.is_light_m[tm].astype(jnp.float32))
    tri_block = tri_block.at[:, PK.C_ISSPEC].set(
        pk.is_spec_m[tm].astype(jnp.float32))
    tri_block = tri_block.at[:, PK.C_TEXTURABLE].set(
        pk.texturable.astype(jnp.float32))
    tri_block = tri_block.at[:, PK.C_UVAX].set(pk.uva[:, 0])
    tri_block = tri_block.at[:, PK.C_UVAY].set(pk.uva[:, 1])
    tri_block = tri_block.at[:, PK.C_UVBX].set(pk.uvb[:, 0])
    tri_block = tri_block.at[:, PK.C_UVBY].set(pk.uvb[:, 1])
    tri_block = tri_block.at[:, PK.C_UVCX].set(pk.uvc[:, 0])
    tri_block = tri_block.at[:, PK.C_UVCY].set(pk.uvc[:, 1])

    ent = ent.at[:S].set(sph_block).at[S_pad:S_pad + Tn].set(tri_block)
    prim_packed = ent.reshape(n_pad // PK.PACK, PK.PACK * PK.N_CHAN)
    sph_rows = S_pad // PK.PACK

    ah, aw = scene.atlas_a.shape
    if ah > 1 and aw > 1 and ah * aw <= PK.MAX_ATLAS_TEXELS:
        texels = ah * aw
        rows_t = -(-texels // 128)
        pad = rows_t * 128 - texels
        if PK.use_gather_layout(texels):
            # slab-major bit-packed rgba layout for the kernel's hardware
            # dynamic-gather fast path (ops/pt_kernel.atlas_fetch):
            # atlas_flat[r, l] = i32 bitcast of rgba bytes of texel
            # r*128 + l ((r<<24)|(g<<16)|(b<<8)|a)
            rgb = scene.atlas_rgb.reshape(-1, 3).astype(jnp.uint32)
            au = scene.atlas_a.reshape(-1).astype(jnp.uint32)
            rgba = ((rgb[:, 0] << 24) | (rgb[:, 1] << 16)
                    | (rgb[:, 2] << 8) | au)
            if pad:
                rgba = jnp.concatenate([rgba,
                                        jnp.zeros((pad,), jnp.uint32)])
            atlas_flat = jax.lax.bitcast_convert_type(
                rgba.reshape(rows_t, 128), jnp.int32)
        else:
            # transposed two-channel layout for the one-hot two-level
            # gather: atlas_flat[l, r] = packed f32 texel r*128 + l
            # (r*65536 + g*256 + b), atlas_flat[128 + l, r] = its alpha
            rgb = scene.atlas_rgb.reshape(-1, 3).astype(jnp.float32)
            packed = rgb[:, 0] * 65536.0 + rgb[:, 1] * 256.0 + rgb[:, 2]
            abv = scene.atlas_a.reshape(-1).astype(jnp.float32)
            if pad:
                packed = jnp.concatenate(
                    [packed, jnp.zeros((pad,), jnp.float32)])
                abv = jnp.concatenate([abv,
                                       jnp.zeros((pad,), jnp.float32)])
            atlas_flat = jnp.concatenate(
                [packed.reshape(rows_t, 128).T,
                 abv.reshape(rows_t, 128).T], axis=0)
        return prim_packed, atlas_flat, aw, ah, sph_rows
    return prim_packed, jnp.zeros((256, 8), jnp.float32), 0, 0, sph_rows


def trace_eye_paths_kernel(scene: SceneData, ro, rd, seed_base, light_center,
                           light_radius, *, bounces: int, light_color,
                           nee: bool, interpret=None):
    """Megakernel twin of trace_eye_paths. ro/rd f32 [..., 3]; the RNG
    stream is hash(ray index, seed_base) per draw (ops/pt_kernel.
    _make_uniform). Returns (Lo, override i32, fetched)."""
    from ascii_renderer_tpu.ops import pt_kernel as PK

    shp = rd.shape[:-1]
    R = 1
    for s in shp:
        R *= s
    nblk = -(-R // (PK.BH * PK.BW))
    pad = nblk * PK.BH * PK.BW - R

    def blockify(a):
        flat = a.reshape(R, 3)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, 3), flat.dtype)], axis=0)
        return flat.reshape(nblk, PK.BH, PK.BW, 3)

    prim_packed, atlas_flat, aw, ah, sph_rows = pack_scene_entries(scene)
    lcol = jnp.asarray(light_color, jnp.float32)
    params = jnp.concatenate([
        light_center, light_radius[None], lcol,
        jnp.asarray([EPS], jnp.float32)])
    lo, ov, fet = PK.trace_blocks(
        params, prim_packed, blockify(ro), blockify(rd),
        jnp.int32(seed_base), atlas_flat,
        bounces=bounces, nee=nee, atlas_w=aw, atlas_h=ah, sph_rows=sph_rows,
        interpret=interpret)
    lo = lo.reshape(nblk * PK.BH * PK.BW, 3)[:R].reshape(shp + (3,))
    ov = ov.reshape(-1)[:R].reshape(shp)
    fet = fet.reshape(-1)[:R].reshape(shp)
    return lo, jnp.round(ov).astype(jnp.int32), fet > 0.5


def trace_eye_paths_kernel_packed(scene: SceneData, ro, rd, seed_base,
                                  light_center, light_radius, *,
                                  bounces: int, light_color, nee: bool,
                                  interpret=None, ray_active=None,
                                  ray_uid=None, packed=None):
    """trace_eye_paths_kernel staying in the kernel's packed channel
    layout: returns (lor, log, lob, ov, fet), each f32 FLAT [R] in ray
    order (R = prod(rd.shape[:-1])). Converting the kernel outputs to
    image-space [..., 3] arrays costs ~0.5 ms/frame of degenerate
    [B, H, W, 1] relayouts at the bench workload and the sample-reduce
    another ~0.5 ms in [..., 3] minor-dim-3 layout (tools/
    profile_trace.py --pt) — render_pt reduces over samples in THIS
    layout and unpacks once per frame.

    ray_active: optional flat [R] bool (adaptive sampling, sim/accum):
    a 1024-ray kernel block whose rays are ALL inactive is skipped on
    device and returns zeros — accumulate() never folds those pixels,
    so adaptive output is identical to a full trace for live pixels.

    ray_uid: optional flat [R] i32 per-ray RNG ids (default: stream
    position 0..R-1). The kernel's noise is a pure function of
    (uid, seed), so a caller that permutes rays (render_pt's adaptive
    compaction) passes the canonical ids to keep every pixel's noise
    bit-identical to the unpermuted render.

    packed: optional precomputed pack_scene_entries(scene) 5-tuple
    (prim rows / atlas arrays may be traced; aw/ah/sph_rows must be the
    Python ints the pack produced — they are static kernel shape args).
    See render_pt's docstring for why callers should precompute."""
    from ascii_renderer_tpu.ops import pt_kernel as PK

    shp = rd.shape[:-1]
    R = 1
    for s in shp:
        R *= s
    nblk = -(-R // (PK.BH * PK.BW))
    pad = nblk * PK.BH * PK.BW - R

    def blockify(a):
        flat = a.reshape(R, 3)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, 3), flat.dtype)], axis=0)
        return flat.reshape(nblk, PK.BH, PK.BW, 3)

    if packed is None:
        packed = pack_scene_entries(scene)
    prim_packed, atlas_flat, aw, ah, sph_rows = packed
    lcol = jnp.asarray(light_color, jnp.float32)
    params = jnp.concatenate([
        light_center, light_radius[None], lcol,
        jnp.asarray([EPS], jnp.float32)])
    block_active = None
    if ray_active is not None:
        flat = ray_active.reshape(-1).astype(jnp.int32)
        if pad:
            flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
        block_active = jnp.max(
            flat.reshape(nblk, PK.BH * PK.BW), axis=1)  # any() per block
    uid = None
    if ray_uid is not None:
        flat_u = ray_uid.reshape(-1).astype(jnp.int32)
        if pad:  # pad-ray uids are arbitrary (outputs discarded)
            flat_u = jnp.concatenate([flat_u, jnp.zeros((pad,), jnp.int32)])
        uid = flat_u.reshape(nblk, PK.BH, PK.BW)
    outs = PK.trace_blocks_raw(
        params, prim_packed, blockify(ro), blockify(rd),
        jnp.int32(seed_base), atlas_flat,
        bounces=bounces, nee=nee, atlas_w=aw, atlas_h=ah,
        sph_rows=sph_rows, interpret=interpret, block_active=block_active,
        uid=uid)
    # [nblk, 8, 128] -> [nblk*1024] -> [:R]: contiguous, no relayout
    return tuple(o.reshape(-1)[:R] for o in outs)
