"""Channel-major raster fast path vs the bundle/scan reference path."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ascii_renderer_tpu.backends import raster as R
from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.scene.demo import create_demo_scene
from ascii_renderer_tpu.geom.tessellate import tessellate_scene
from ascii_renderer_tpu.geom import meshes


def test_channel_clip_matches_bundle_clip():
    """transform_clip_channels must reproduce transform_clip exactly,
    including rotation canonicalization and the x2 expansion — exercised
    with tris straddling the near plane."""
    rng = np.random.default_rng(5)
    p = rng.uniform(-2, 2, (60, 3)).astype(np.float32)
    p[:, 2] = rng.uniform(-0.5, 0.5, 60)  # straddle z ~ 0 near the camera
    cam = Camera.create(pos=(0, 0, 0.3), yaw=-np.pi / 2)
    mvp = R.camera_mvp(cam, 16, 16, 1.0)
    attrs = rng.uniform(0, 1, (60, 9)).astype(np.float32)

    clip, tattr, valid = R.transform_clip(jnp.asarray(p), jnp.asarray(attrs), mvp)
    ch = R.transform_clip_channels(jnp.asarray(p), mvp)
    clip2 = R.channels_clip_array(ch)
    tattr2 = R.clip_attrs_channels(jnp.asarray(attrs), ch)

    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ch["valid"]))
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(clip)[v], np.asarray(clip2)[v],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tattr)[v], np.asarray(tattr2)[v],
                               rtol=1e-6, atol=1e-6)


def test_channel_render_matches_scan_inside_room():
    """End-to-end rgb equality on the demo room (camera inside -> real
    clipping), channel/binned vs bundle/scan in one compiled program."""
    sb = create_demo_scene()
    sb.set_env_light([0.25, 0.27, 0.3], 1.0)
    scene = sb.build()
    p, n, c = tessellate_scene(scene)
    args = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c), scene, scene.camera)

    @jax.jit
    def both(p, n, c, scene, cam):
        a = R.render_soup(p, n, c, scene, cam, 36, 96, 0.5, method="scan")
        b = R.render_soup(p, n, c, scene, cam, 36, 96, 0.5, method="scatter")
        return a, b

    a, b = both(*args)
    diff = np.abs(np.asarray(a) - np.asarray(b))
    # identical up to ULP-level edge flips; allow a handful of edge pixels
    bad = (diff.max(-1) > 1e-4).sum()
    assert bad <= 5, f"{bad} differing pixels"


def test_channel_render_mesh_view():
    v, i = meshes.teapot_like(512)
    p, n, c = meshes.mesh_to_soup(v, i, (0.8, 0.6, 0.4))
    sb = create_demo_scene()
    scene = sb.build()
    cam = Camera.create(pos=(2.0, 1.2, 2.8), yaw=float(np.arctan2(-2.8, -2.0)),
                        pitch=-0.35)
    f = jax.jit(functools.partial(R.render_soup, rows=48, cols=96,
                                  pixel_aspect=0.5, method="scatter"))
    g = jax.jit(functools.partial(R.render_soup, rows=48, cols=96,
                                  pixel_aspect=0.5, method="scan"))
    a = np.asarray(f(jnp.asarray(p), jnp.asarray(n), jnp.asarray(c), scene, cam))
    b = np.asarray(g(jnp.asarray(p), jnp.asarray(n), jnp.asarray(c), scene, cam))
    bad = (np.abs(a - b).max(-1) > 1e-4).sum()
    assert bad <= 10, f"{bad} differing pixels"
    assert (a.sum(-1) > 0).mean() > 0.02  # something rendered


def test_mm_kernel_matches_loop_kernel():
    """The MXU array-form bin walk (default, method='scatter') and the
    sequential loop kernel ('scatter_loop') must agree bit-for-bit in
    interpret mode — same winner selection incl. depth-tie ordering."""
    sb = create_demo_scene()
    sb.set_env_light([0.25, 0.27, 0.3], 1.0)
    scene = sb.build()
    p, n, c = tessellate_scene(scene)
    args = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c), scene, scene.camera)

    @jax.jit
    def both(p, n, c, scene, cam):
        a = R.render_soup(p, n, c, scene, cam, 36, 96, 0.5,
                          method="scatter_loop")
        b = R.render_soup(p, n, c, scene, cam, 36, 96, 0.5, method="scatter")
        return a, b

    a, b = both(*args)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compacted_path_bit_matches_uncompacted():
    """The valid-compaction pipeline (compact_valid_ch + compacted bins +
    compacted shading table) must be BIT-identical to the uncompacted
    channel path — compaction preserves ascending original order, so
    winner selection and depth ties are unchanged. Exercised on the demo
    room (camera inside -> clip expansion active, n_valid=257)."""
    sb = create_demo_scene()
    sb.set_env_light([0.25, 0.27, 0.3], 1.0)
    scene = sb.build()
    p, n, c = tessellate_scene(scene)
    args = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c), scene,
            scene.camera)

    @jax.jit
    def both(p, n, c, scene, cam):
        a = R.render_soup(p, n, c, scene, cam, 36, 96, 0.5,
                          method="scatter")
        b = R.render_soup(p, n, c, scene, cam, 36, 96, 0.5,
                          method="scatter", v_cap=512)
        return a, b

    a, b = both(*args)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compacted_overflow_detected_and_retry_exact():
    """v_cap overflow must be reported via diag (true count, not clamped),
    and a retry at suggest_caps must reproduce the exact image."""
    import functools
    sb = create_demo_scene()
    sb.set_env_light([0.25, 0.27, 0.3], 1.0)
    scene = sb.build()
    p, n, c = tessellate_scene(scene)
    args = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c), scene,
            scene.camera)
    ref = jax.jit(functools.partial(R.render_soup, rows=36, cols=96,
                                    pixel_aspect=0.5, method="scatter"))(*args)
    small = jax.jit(functools.partial(R.render_soup_diag, rows=36, cols=96,
                                      pixel_aspect=0.5, v_cap=128))
    img, diag = small(*args)
    n_valid = int(diag["n_valid"])
    assert n_valid > 128  # demo room has 257 valid clipped tris
    v_cap, big_cap = R.suggest_caps(n_valid, int(diag["n_big"]))
    assert v_cap >= n_valid
    retry = jax.jit(functools.partial(R.render_soup_diag, rows=36, cols=96,
                                      pixel_aspect=0.5, v_cap=v_cap,
                                      big_cap=big_cap))
    img2, _ = retry(*args)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(img2))


def test_big_triangle_overflow_detected_and_retry_matches_oracle():
    """A scene with ~100 wall-scale triangles (over the default big_cap=64)
    must be DETECTED via diag n_big, and the retry at suggested caps must
    match the dense-scan oracle — no silent geometry loss (VERDICT r1 #7).
    Exercised on both the mm and subtile kernels."""
    import functools
    rng = np.random.default_rng(3)
    n_walls = 500  # ~50% backface-culled; comfortably >64 survive
    # large quads (two tris each would be fine; use single large tris)
    base = rng.uniform(-6, 6, (n_walls, 3)).astype(np.float32)
    p = np.zeros((n_walls * 3, 3), np.float32)
    for i in range(n_walls):
        a = base[i]
        b = a + [6.0, 0.2 * rng.standard_normal(), 0.0]
        c = a + [0.0, 5.0, 0.3 * rng.standard_normal()]
        p[3 * i:3 * i + 3] = [a, b, c]
    n = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n_walls * 3, 1))
    c_ = rng.uniform(0.2, 1.0, (n_walls * 3, 3)).astype(np.float32)
    sb = create_demo_scene()
    scene = sb.build()
    cam = Camera.create(pos=(0.0, 0.0, 12.0), yaw=-np.pi / 2, pitch=0.0)
    args = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c_), scene, cam)

    oracle = jax.jit(functools.partial(R.render_soup, rows=32, cols=64,
                                       pixel_aspect=0.5, method="scan"))(*args)
    for kern in ("mm", "subtile"):
        img, diag = jax.jit(functools.partial(
            R.render_soup_diag, rows=32, cols=64, pixel_aspect=0.5,
            kernel=kern, v_cap=1024, big_cap=64, r_cap=4096,
            pair_cap=8192))(*args)
        n_big = int(diag["n_big"])
        assert n_big > 64, f"fixture must overflow big_cap, got {n_big}"
        if kern == "subtile":
            caps = R.suggest_caps_subtile(int(diag["n_valid"]), n_big,
                                          int(diag["n_rows"]),
                                          int(diag["n_pairs"]))
            img2, diag2 = jax.jit(functools.partial(
                R.render_soup_diag, rows=32, cols=64, pixel_aspect=0.5,
                kernel=kern, v_cap=caps[0], big_cap=caps[1], r_cap=caps[2],
                pair_cap=caps[3]))(*args)
            assert int(diag2["n_rows"]) <= caps[2]
            assert int(diag2["n_pairs"]) <= caps[3]
        else:
            caps = R.suggest_caps(int(diag["n_valid"]), n_big)
            img2, _ = jax.jit(functools.partial(
                R.render_soup_diag, rows=32, cols=64, pixel_aspect=0.5,
                kernel=kern, v_cap=caps[0], big_cap=caps[1]))(*args)
        bad = (np.abs(np.asarray(oracle) - np.asarray(img2)).max(-1)
               > 1e-4).sum()
        assert bad <= 2, f"{kern}: {bad} pixels differ from scan oracle"


def test_blocked_cumsum_matches_numpy():
    rng = np.random.default_rng(11)
    for n in (1, 7, 512, 513, 5000, 70001):
        m = rng.random(n) < 0.3
        got = np.asarray(R._cumsum_i32(jnp.asarray(m)))
        np.testing.assert_array_equal(got, np.cumsum(m.astype(np.int64)))


def test_fused_shading_matches_scan():
    """The fused-shading Pallas path (binning + in-kernel interpolation +
    lighting) must match the scan + deferred-shading oracle."""
    sb = create_demo_scene()
    sb.set_env_light([0.25, 0.27, 0.3], 1.0)
    scene = sb.build()
    p, n, c = tessellate_scene(scene)
    args = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c), scene, scene.camera)
    f_scan = jax.jit(functools.partial(R.render_soup, rows=36, cols=96,
                                       pixel_aspect=0.5, method="scan"))
    f_fused = jax.jit(functools.partial(R.render_soup, rows=36, cols=96,
                                        pixel_aspect=0.5, method="fused"))
    a = np.asarray(f_scan(*args))
    b = np.asarray(f_fused(*args))
    assert (np.abs(a - b).max(-1) > 1e-4).sum() == 0


def test_transform_clip_channels9_matches_matmul_path():
    """The channel-major vertex stage (pre-transposed pos9, pure FMA
    chains) must agree with the matmul+transpose form on every channel
    (sum order differs -> allclose, not bit-equal)."""
    rng = np.random.default_rng(3)
    T = 257
    pos = rng.uniform(-3, 3, (3 * T, 3)).astype(np.float32)
    from ascii_renderer_tpu.core.camera import Camera
    cam = Camera.create(pos=(2.0, 1.5, 2.5), yaw=-2.3, pitch=-0.3)
    mvp = R.camera_mvp(cam, 64, 128, 0.5)
    a = R.transform_clip_channels(jnp.asarray(pos), mvp)
    b = R.transform_clip_channels9(R.positions_to_pos9(pos), mvp)
    assert set(a.keys()) == set(b.keys())
    np.testing.assert_array_equal(np.asarray(a["valid"]),
                                  np.asarray(b["valid"]))
    for k in a:
        av, bv = np.asarray(a[k]), np.asarray(b[k])
        if av.dtype == bool:
            np.testing.assert_array_equal(av, bv)
        else:
            # near-plane lerp params divide by (d_a - d_b): catastrophic
            # cancellation amplifies the two paths' f32 sum-order noise,
            # so channel tolerance is loose; the image-level test below
            # pins the agreement that matters
            np.testing.assert_allclose(av, bv, rtol=5e-3, atol=1e-3)


def test_render_soup_pos9_matches_positions_path():
    """The subtile pipeline with pre-transposed pos9 must produce the same
    image as the positions path (vertex-stage parity, end to end)."""
    rng = np.random.default_rng(5)
    T = 3000
    pos = rng.uniform(-2, 2, (3 * T, 3)).astype(np.float32)
    nrm = rng.normal(size=(3 * T, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = rng.uniform(0.2, 1.0, (3 * T, 3)).astype(np.float32)
    from ascii_renderer_tpu.scene.builder import SceneBuilder
    from ascii_renderer_tpu.core.camera import Camera
    scene = (SceneBuilder().set_env_light([0.2, 0.2, 0.25], 1.0)
             .add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9).build())
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene, cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, method="subtile",
              v_cap=2 * T, big_cap=64, r_cap=8192, pair_cap=4 * 2 * T)
    f_a = jax.jit(functools.partial(R.render_soup, **kw))
    f_b = jax.jit(functools.partial(R.render_soup, **kw))
    a = np.asarray(f_a(*args))
    b = np.asarray(f_b(*args, pos9=R.positions_to_pos9(pos)))
    # vertex sum-order noise can flip a winner on razor-thin edge ties:
    # allow a handful of differing pixels, none large in aggregate
    bad = (np.abs(a - b).max(-1) > 1e-3).sum()
    assert bad <= 5, f"{bad} pixels differ between pos9 and positions paths"


def _rand_scene():
    from ascii_renderer_tpu.scene.builder import SceneBuilder
    return (SceneBuilder().set_env_light([0.2, 0.2, 0.25], 1.0)
            .add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9).build())


def test_subtile2_2dh_matches_scan_oracle():
    """The 2DH (Olano-Greer homogeneous) subtile pipeline must reproduce
    the clip-expansion scan oracle pixel-for-pixel (within f32 edge-tie
    noise) on a dense random soup — including big triangles."""
    from ascii_renderer_tpu.core.camera import Camera
    rng = np.random.default_rng(5)
    scene = _rand_scene()
    T = 3000
    pos = rng.uniform(-2, 2, (3 * T, 3)).astype(np.float32)
    nrm = rng.normal(size=(3 * T, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = rng.uniform(0.2, 1.0, (3 * T, 3)).astype(np.float32)
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene, cam)
    f_scan = jax.jit(functools.partial(R.render_soup, rows=48, cols=96,
                                       pixel_aspect=0.5, method="scan"))
    f_2dh = jax.jit(functools.partial(
        R.render_soup, rows=48, cols=96, pixel_aspect=0.5,
        method="subtile2", v_cap=3072, big_cap=2048, r_cap=16384,
        pair_cap=8 * T + 2048 * 48 * 8))
    a = np.asarray(f_scan(*args))
    b = np.asarray(f_2dh(*args))
    bad = (np.abs(a - b).max(-1) > 2e-3).sum()
    assert bad <= 6, f"{bad} pixels differ from the scan oracle"


def test_subtile2_2dh_near_plane_crossers():
    """Geometry straddling the near plane (floor + wall under/behind the
    camera) renders identically to the scan oracle WITHOUT any clip
    expansion: the kernel's z >= 0 range test is the near clip, and the
    crossers' binning bboxes come from their eps-plane intersections."""
    from ascii_renderer_tpu.core.camera import Camera
    scene = _rand_scene()
    s = 5.0
    floor = [(-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s)]
    wall = [(-s, 0, -s), (-s, 4, -s), (s, 4, -s), (s, 0, -s)]

    def quad_tris(q):
        a, b, c, d = q
        return [a, b, c, a, c, d]

    pos = np.asarray(quad_tris(floor) + quad_tris(wall), np.float32)
    nrm = np.zeros_like(pos)
    nrm[:6] = (0, 1, 0)
    nrm[6:] = (0, 0, 1)
    col = np.tile(np.asarray([[0.7, 0.6, 0.5]], np.float32), (12, 1))
    cam = Camera.create(pos=(0.0, 1.0, 2.0), yaw=-1.57, pitch=-0.5)
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene, cam)
    f_scan = jax.jit(functools.partial(R.render_soup, rows=48, cols=96,
                                       pixel_aspect=0.5, method="scan"))
    f_2dh = jax.jit(functools.partial(
        R.render_soup, rows=48, cols=96, pixel_aspect=0.5,
        method="subtile2", v_cap=512, big_cap=16, r_cap=8192,
        pair_cap=16 * 48 * 8 + 64))
    a = np.asarray(f_scan(*args))
    b = np.asarray(f_2dh(*args))
    bad = (np.abs(a - b).max(-1) > 2e-3).sum()
    assert bad <= 6, f"{bad} pixels differ (near-plane crossing scene)"


def test_subtile2_2dh_point_light_scene():
    """Scenes with point lights carry A=9 attributes (world-pos planes);
    the 2DH pack must widen to 48 channels and match the scan oracle
    (regression: width-40 pack asserted on A=9)."""
    from ascii_renderer_tpu.scene.builder import SceneBuilder
    from ascii_renderer_tpu.core.camera import Camera
    rng = np.random.default_rng(9)
    scene = (SceneBuilder().set_env_light([0.15, 0.15, 0.2], 1.0)
             .add_point_light([1.0, 2.0, 1.0], [1.0, 0.9, 0.8], 1.0)
             .build())
    T = 2000
    pos = rng.uniform(-2, 2, (3 * T, 3)).astype(np.float32)
    nrm = rng.normal(size=(3 * T, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = rng.uniform(0.2, 1.0, (3 * T, 3)).astype(np.float32)
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene, cam)
    f_scan = jax.jit(functools.partial(R.render_soup, rows=48, cols=96,
                                       pixel_aspect=0.5, method="scan"))
    f_2dh = jax.jit(functools.partial(
        R.render_soup, rows=48, cols=96, pixel_aspect=0.5,
        method="subtile2", v_cap=2048, big_cap=1024, r_cap=16384,
        pair_cap=8 * T + 1024 * 48 * 8))
    a = np.asarray(f_scan(*args))
    b = np.asarray(f_2dh(*args))
    bad = (np.abs(a - b).max(-1) > 2e-3).sum()
    assert bad <= 6, f"{bad} pixels differ (point-light A=9 scene)"
