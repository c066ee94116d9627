"""Path tracer: energy sanity, determinism, light paths, the ASCII-texture
glyph short-circuit + alpha protocol (SURVEY §4 property tests)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.backends import pathtrace as PT
from ascii_renderer_tpu.scene.builder import MaterialIds, SceneBuilder
from ascii_renderer_tpu.scene.demo import create_demo_scene
from ascii_renderer_tpu.atlas.io import demo_atlas


def _render(scene, cam, rows=12, cols=16, spp=4, bounces=3, seed=0, time=0.0):
    return PT.render_pt(scene, cam, jnp.float32(time), jax.random.key(seed),
                        rows=rows, cols=cols, pixel_aspect=1.0, spp=spp,
                        bounces=bounces, light_color=(16.86, 10.76, 8.2))


def test_energy_sanity_no_nan_no_negative():
    scene = create_demo_scene().build()
    rgb, a = _render(scene, scene.camera, spp=8, bounces=5)
    rgb = np.asarray(rgb)
    assert np.isfinite(rgb).all()
    assert (rgb >= 0).all() and (rgb <= 1).all()
    assert np.asarray(a).dtype == np.uint8


# NOT slow-marked: determinism is the cheap drift-detection layer — a
# semantics regression must fail the DEFAULT suite (ADVICE r4)
def test_deterministic_under_fixed_key():
    scene = create_demo_scene().build()
    r1, a1 = _render(scene, scene.camera, seed=7)
    r2, a2 = _render(scene, scene.camera, seed=7)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    r3, _ = _render(scene, scene.camera, seed=8)
    assert np.abs(np.asarray(r1) - np.asarray(r3)).max() > 0


@pytest.mark.slow  # compile long pole (r4 item 6)
def test_direct_light_hit_is_bright_and_env_on_miss():
    sb = SceneBuilder()
    sb.set_area_light([0, 0, 0], 1.0, auto=False)  # light dead ahead
    scene = sb.build()
    cam = Camera.create(pos=(0, 0, 5), yaw=-np.pi / 2)
    rgb, a = _render(scene, cam, rows=9, cols=9, spp=2, bounces=2)
    rgb = np.asarray(rgb)
    center = rgb[4, 4]
    assert center.min() == 1.0  # LIGHTCOLOR*1.3 clamps to white
    corner = rgb[0, 0]  # sky gradient env (miss)
    assert 0.3 < corner.mean() < 1.0
    assert (np.asarray(a) == 255).all()  # non-override alpha byte = 255


@pytest.mark.slow
def test_nee_lights_diffuse_floor():
    sb = SceneBuilder()
    sb.add_quad([-5, 0, -5], [5, 0, -5], [5, 0, 5], [-5, 0, 5], MaterialIds.WHITE)
    sb.set_area_light([0, 3, 0], 0.5, auto=False)
    scene = sb.build()
    cam = Camera.create(pos=(0, 2, 4), yaw=-np.pi / 2, pitch=-0.5)
    rgb, _ = _render(scene, cam, rows=17, cols=17, spp=16, bounces=3)
    rgb = np.asarray(rgb)
    # floor under the light is noticeably lit
    assert rgb[12:, :].mean() > 0.1


def _glyph_scene(abyte, rgb_tex=(255, 0, 0), solid_center=False):
    atlas = np.zeros((8, 8, 4), np.uint8)
    atlas[2, 2, :3] = rgb_tex
    atlas[2, 2, 3] = abyte
    sb = SceneBuilder()
    # quad facing the camera; UV texel coords put texel (2,2) at the center
    sb.add_quad([-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0],
                MaterialIds.WHITE, (0, 4), (4, 4), (4, 0), (0, 0))
    sb.set_area_light([50, 50, 50], 0.1, auto=False)  # out of the way
    sb.set_atlas(atlas)
    return sb.build()


def test_primary_glyph_hit_short_circuits_to_alpha_override():
    scene = _glyph_scene(ord("K"))
    cam = Camera.create(pos=(0, 0, 5), yaw=-np.pi / 2)
    rgb, a = _render(scene, cam, rows=9, cols=9, spp=4, bounces=3)
    a = np.asarray(a)
    rgb = np.asarray(rgb)
    assert a[4, 4] == ord("K")  # glyph code rides the alpha byte
    np.testing.assert_allclose(rgb[4, 4], [1.0, 0.0, 0.0], atol=1e-6)
    # neighbors off the glyph texel are not overridden
    assert a[0, 0] == 255


def test_solid_texel_becomes_albedo_not_override():
    scene = _glyph_scene(1, rgb_tex=(0, 255, 0))
    cam = Camera.create(pos=(0, 0, 5), yaw=-np.pi / 2)
    _rgb, a = _render(scene, cam, rows=9, cols=9, spp=2, bounces=2)
    assert np.asarray(a)[4, 4] == 255  # no override for solid texels


@pytest.mark.slow  # compile long pole (r4 item 6)
def test_demo_scene_with_atlas_renders_poster_glyphs():
    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build()
    # aim at the poster: camera looks -z from (0, 2.5, 6); poster at z=3
    cam = Camera.create(pos=(0, 2.5, 6), yaw=-np.pi / 2)
    rgb, a = PT.render_pt(scene, cam, jnp.float32(0), jax.random.key(0),
                          rows=24, cols=48, pixel_aspect=0.5, spp=2,
                          bounces=2, light_color=(16.86, 10.76, 8.2))
    a = np.asarray(a)
    ov = (a >= 2) & (a <= 254)
    assert ov.any(), "some poster texels must land as glyph overrides"
    # the override codes are visible ASCII from the atlas
    assert np.isin(a[ov], np.arange(32, 127)).all()


def _render_kernel(scene, cam, seed, rows=8, cols=16, spp=2, bounces=2):
    return PT.render_pt(scene, cam, jnp.float32(0.0), jax.random.key(seed),
                        rows=rows, cols=cols, pixel_aspect=1.0, spp=spp,
                        bounces=bounces, light_color=(16.86, 10.76, 8.2),
                        use_kernel=True)


@pytest.mark.slow
def test_kernel_path_rng_varies_per_frame_key():
    """The megakernel seeds from the frame key (ref reseeds per frame via
    its time uniform, pathtrace_shader.js:187-201): different keys must
    draw different bounce noise; the same key must reproduce exactly."""
    scene = create_demo_scene().build()
    rgb0, _ = _render_kernel(scene, scene.camera, seed=0)
    rgb0b, _ = _render_kernel(scene, scene.camera, seed=0)
    rgb1, _ = _render_kernel(scene, scene.camera, seed=1)
    np.testing.assert_array_equal(np.asarray(rgb0), np.asarray(rgb0b))
    assert np.abs(np.asarray(rgb0) - np.asarray(rgb1)).max() > 1e-4


@pytest.mark.slow
def test_progressive_accum_converges_on_kernel_path():
    """ProgressivePathTracer driven through the megakernel must actually
    refine: with per-frame kernel reseeding the sample-mean variance
    shrinks (a frame-constant seed would keep adding the same noise)."""
    from ascii_renderer_tpu.core.config import Config
    from ascii_renderer_tpu.sim.accum import ProgressivePathTracer

    cfg = Config(pixel_aspect=1.0)
    scene = create_demo_scene().build()
    prog = ProgressivePathTracer(cfg, scene, rows=8, cols=16,
                                 use_kernel=True)
    prog.step(scene.camera)
    prog.step(scene.camera)
    k2 = np.asarray(prog.state.count)
    m2_2 = np.asarray(prog.state.m2)
    for _ in range(4):
        prog.step(scene.camera)
    k6 = np.asarray(prog.state.count)
    m2_6 = np.asarray(prog.state.m2)
    assert k6.max() > k2.max()
    # per-frame reseeding must add NEW noise: m2 (sum of squared
    # deviations) grows, and the CI half-width 1.96*sigma/sqrt(k) shrinks
    assert m2_6.sum() > m2_2.sum() * 1.01, "no fresh noise across frames"

    def ci(m2, k):
        var = m2 / np.maximum(k[..., None] - 1, 1)
        return (1.96 * np.sqrt(np.maximum(var, 0))
                / np.sqrt(np.maximum(k[..., None], 1)))
    assert ci(m2_6, k6).mean() < ci(m2_2, k2).mean() * 0.9, "CI not shrinking"


@pytest.mark.slow
def test_trace_stats_ray_accounting():
    """with_stats returns the true wavefront ray counts: eye segments in
    [R, R*bounces] (R alive at bounce 0; termination only shrinks), NEE
    shadow rays bounded by diffuse-alive lanes, both finite."""
    sb = create_demo_scene()
    scene = sb.build(min_pad=1)
    cam = scene.camera
    from ascii_renderer_tpu.core.camera import camera_basis
    uu, vv, ww, focal = camera_basis(cam.yaw, cam.pitch, cam.fov_y)
    rows, cols = 12, 24
    x = (jnp.arange(cols, dtype=jnp.float32) + 0.5) / cols
    y = (jnp.arange(rows, dtype=jnp.float32)[::-1] + 0.5) / rows
    px = ((-1.0 + 2.0 * x))[None, :] * jnp.ones((rows, 1))
    py = (-1.0 + 2.0 * y)[:, None] * jnp.ones((1, cols))
    rd = px[..., None] * uu + py[..., None] * vv + focal * ww
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    ro = jnp.broadcast_to(cam.pos, (rows, cols, 3))
    lc, lr = PT.get_light_sphere(scene, jnp.float32(0.0))
    lo, ov, pf, stats = PT.trace_eye_paths(
        scene, ro, rd, jax.random.key(3), lc, lr, bounces=5,
        light_color=jnp.asarray([16.86, 10.76, 8.2]), nee=True,
        with_stats=True)
    R = rows * cols
    seg = float(stats["segments"])
    sh = float(stats["shadow_rays"])
    assert R <= seg <= 5 * R
    assert 0.0 <= sh <= seg
    # the stats variant must not change the estimate
    lo2, ov2, pf2 = PT.trace_eye_paths(
        scene, ro, rd, jax.random.key(3), lc, lr, bounces=5,
        light_color=jnp.asarray([16.86, 10.76, 8.2]), nee=True)
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(lo2))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ov2))


def test_pack_padding_entries_keep_bad_always_invariant():
    """Tail padding entries after the tri block must carry
    C_BADS = 3e38 (the degenerate-tri sentinel) so the kernel's guarded
    1/ndotd never sees a live infinity (advisor r3)."""
    from ascii_renderer_tpu.backends.pathtrace import pack_scene_entries
    from ascii_renderer_tpu.ops import pt_kernel as PK
    from ascii_renderer_tpu.scene.demo import create_demo_scene

    scene = create_demo_scene().build(min_pad=1)
    prim_packed, _af, _w, _h, sph_rows = pack_scene_entries(scene)
    ent = np.asarray(prim_packed).reshape(-1, PK.N_CHAN)
    kinds = ent[:, PK.C_KIND]
    tri_region = np.arange(len(ent)) >= sph_rows * PK.PACK
    pad_tris = tri_region & (kinds == 0.0)
    assert pad_tris.any(), "fixture needs a padded tri tail"
    assert (ent[pad_tris, PK.C_BADS] >= 1e30).all()


def test_bounce_skip_knob_bit_identical(monkeypatch):
    """BOUNCE_SKIP (per-bounce dead-block cond, default off — measured
    slower on the closed-room workload) must be bit-identical to the
    plain unrolled loop: dead lanes never change state and RNG draws are
    pure functions of (uid, seed, draw index)."""
    from ascii_renderer_tpu.ops import pt_kernel as K

    scene = create_demo_scene().build(min_pad=1)
    cam = Camera.create(pos=(0, 2.5, 6), yaw=-np.pi / 2)
    kw = dict(rows=8, cols=16, pixel_aspect=0.5, spp=2, bounces=4,
              light_color=(16.86, 10.76, 8.2), use_kernel=True)
    key = jax.random.key(3)

    outs = []
    for flag in (False, True):
        monkeypatch.setattr(K, "BOUNCE_SKIP", flag)
        rgb, a = jax.jit(lambda s, c: PT.render_pt(
            s, c, jnp.float32(0.0), key, **kw))(scene, cam)
        outs.append((np.asarray(rgb), np.asarray(a)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_precomputed_pack_bit_identical():
    """render_pt with the scene pack precomputed and passed as arrays
    (the production form: PathtraceBackend.set_scene / Progressive-
    PathTracer precompute once, tools/exp_pt_scenearg.py fix B) must be
    bit-identical to deriving the pack inside the jit."""
    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    cam = Camera.create(pos=(0, 2.5, 6), yaw=-np.pi / 2)
    kw = dict(rows=8, cols=16, pixel_aspect=0.5, spp=2, bounces=2,
              light_color=(16.86, 10.76, 8.2), use_kernel=True)
    key = jax.random.key(11)

    rgb_a, a_a = jax.jit(lambda s, c: PT.render_pt(
        s, c, jnp.float32(0.0), key, **kw))(scene, cam)
    pp, af, aw, ah, sr = PT.pack_scene_entries(scene)
    rgb_b, a_b = jax.jit(lambda s, c, pp, af: PT.render_pt(
        s, c, jnp.float32(0.0), key, packed=(pp, af, aw, ah, sr),
        **kw))(scene, cam, pp, af)
    np.testing.assert_array_equal(np.asarray(rgb_a), np.asarray(rgb_b))
    np.testing.assert_array_equal(np.asarray(a_a), np.asarray(a_b))


def test_backend_uses_precomputed_pack():
    """PathtraceBackend.set_scene precomputes the kernel entry pack and
    render() consumes it (the ~2x frame-cost fix must be LANDED in the
    production caller, not only available)."""
    from ascii_renderer_tpu.backends.pathtrace import PathtraceBackend
    from ascii_renderer_tpu.core.config import Config

    b = PathtraceBackend(Config(pixel_aspect=1.0))
    scene = create_demo_scene().build(min_pad=1)
    b.set_scene(scene)
    assert b._packed is not None and len(b._packed) == 5
    f = b.render(0.0, scene.camera, 6, 12)
    assert np.asarray(f.rgb).shape == (6, 12, 3)
    b.dispose()
    assert b._packed is None
