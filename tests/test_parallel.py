"""Device-mesh scale-out on the 8-device virtual CPU mesh (SURVEY §5)."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ascii_renderer_tpu.backends.raytrace import render_rgb
from ascii_renderer_tpu.parallel.mesh import (make_mesh, orbit_cameras,
                                              render_views_sharded)
from ascii_renderer_tpu.scene.demo import create_rt_demo_scene


@pytest.mark.slow
def test_render_views_sharded_matches_local_vmap():
    scene = create_rt_demo_scene().build()
    cams = orbit_cameras(8, center=(0, 1.0, 1.0), radius=6.0)
    mesh = make_mesh((8,), ("views",))
    one = functools.partial(render_rgb, rows=12, cols=32, pixel_aspect=0.5)

    sharded = render_views_sharded(one, scene, cams, mesh)
    assert sharded.shape == (8, 12, 32, 3)
    # result is actually sharded over the views axis
    shard_devs = {d for s in sharded.addressable_shards for d in [s.device]}
    assert len(shard_devs) == 8

    local = jax.vmap(one, in_axes=(None, 0))(scene, cams)
    # separately compiled programs: allow FMA-contraction-level noise
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               rtol=1e-4, atol=1e-4)


def test_render_rows_sharded_matches_local_frame():
    """Row-band spatial sharding (the SURVEY §5 long-context analog): each
    of 8 devices renders a horizontal band of ONE frame; the concatenation
    must match the unsharded render. render_rgb's shading is per-pixel, so
    the bands are bit-identical up to separate-compilation FMA noise."""
    from ascii_renderer_tpu.parallel.mesh import render_rows_sharded

    scene = create_rt_demo_scene().build()
    cam = orbit_cameras(1, center=(0, 1.0, 1.0), radius=6.0)
    cam = jax.tree.map(lambda x: x[0], cam)
    rows, cols = 48, 96
    mesh = make_mesh((8,), ("rows",))

    def band_fn(scene, camera, row_lo, n_rows):
        return render_rgb(scene, camera, rows, cols, 0.5,
                          row_lo=row_lo, n_rows=n_rows)

    sharded = render_rows_sharded(band_fn, scene, cam, mesh, rows, cols)
    assert sharded.shape == (rows, cols, 3)
    shard_devs = {s.device for s in sharded.addressable_shards}
    assert len(shard_devs) == 8

    local = jax.jit(functools.partial(render_rgb, rows=rows, cols=cols,
                                      pixel_aspect=0.5))(scene, cam)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(local),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_raster_rows_sharded_matches_full_frame():
    """Row-band sharding of the GROUPED raster pipeline (the headline
    path): 8 devices each rasterize one tile-row band of a single frame
    with band-local pair keys and walks.

    The band LOGIC is bit-exact: a direct (same-jit-context) band render
    equals the full frame bitwise, asserted below. Across the shard_map
    boundary on CPU, interpret-mode Pallas inlines into XLA and the
    different fusion shifts plane values by ulps, which can flip a
    razor-edge z-fight's winner — so the sharded-vs-local comparison
    allows FMA-level noise plus a tiny quota of flipped edge pixels (the
    same caveat as the separately-compiled views test above; on real TPU
    the Mosaic kernels are identical programs on both sides)."""
    from ascii_renderer_tpu.backends import raster as R
    from ascii_renderer_tpu.core.camera import Camera
    from ascii_renderer_tpu.geom import meshes
    from ascii_renderer_tpu.scene.builder import SceneBuilder

    v, i = meshes.uv_sphere(12, 16, radius=1.2, center=(0.0, 1.0, 0.0))
    p, n, c = meshes.mesh_to_soup(v, i, color=(0.8, 0.5, 0.4))
    sb = SceneBuilder().set_env_light([0.2, 0.22, 0.25], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    p, n, c = jnp.asarray(p), jnp.asarray(n), jnp.asarray(c)
    rows, cols = 64, 96
    T = p.shape[0] // 3
    caps = dict(big_cap=64, r_cap=64 * 32, pair_cap=8 * T + 4096)
    mesh = make_mesh((8,), ("rows",))

    full, _diag = jax.jit(lambda s, cm: R.render_soup_diag(
        p, n, c, s, cm, rows, cols, 0.5, v_cap=4096, kernel="subtile3",
        tile_cap=(rows // 8) * 1 * 8, **caps))(scene, cam)
    full = np.asarray(full)

    # band logic itself is bit-exact: direct band renders == full slices
    for b in (1, 2):
        band, _d = jax.jit(lambda s, cm, lo: R.render_soup_diag(
            p, n, c, s, cm, rows, cols, 0.5, v_cap=4096,
            kernel="subtile3", tile_cap=8, row_lo=lo, band_rows=8,
            **caps))(scene, cam, jnp.int32(b * 8))
        np.testing.assert_array_equal(np.asarray(band),
                                      full[b * 8:(b + 1) * 8])

    # subtile8 is the HEADLINE kernel — its sharded path must be CI-covered,
    # not just driver-dryrun-covered (VERDICT r3 weak #5)
    for kernel in ("subtile3", "subtile6", "subtile8"):
        rgb, over = R.render_soup_rows_sharded(
            p, n, c, scene, cam, rows, cols, 0.5, mesh, kernel=kernel,
            **caps)
        assert rgb.shape == (rows, cols, 3)
        shard_devs = {s.device for s in rgb.addressable_shards}
        assert len(shard_devs) == 8, kernel
        assert int(np.asarray(over).max()) == 0, (kernel, np.asarray(over))
        d = np.abs(np.asarray(rgb) - full).max(axis=-1)
        flipped = (d > 0.01).mean()  # razor-edge z winners (see docstring)
        assert flipped <= 2e-3, (kernel, flipped)
        assert (d <= 0.01).sum() >= d.size - 16, kernel
        np.testing.assert_allclose(np.asarray(rgb)[d <= 0.01],
                                   full[d <= 0.01], atol=2e-3)


def test_pathtrace_rows_sharded_band_overrides_match():
    """Row-band sharding of the path tracer: 8 devices each trace a band
    of one frame. MC radiance is stochastic (band RNG != full-frame RNG,
    a declared non-goal), but at spp=1 the alpha/override plane comes
    from the deterministic center-ray geometry (primary glyph
    short-circuit), so the sharded alpha plane must match the full
    render's — modulo FMA-noise silhouette flips under separate
    compilation (same caveat as the raster band test)."""
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.backends.pathtrace import render_pt
    from ascii_renderer_tpu.parallel.mesh import render_rows_sharded
    from ascii_renderer_tpu.scene.demo import create_demo_scene

    from ascii_renderer_tpu.core.camera import Camera

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    # the golden pose: poster glyphs in view (test_headline_goldens)
    cam = Camera.create(pos=(0, 2.5, 6), yaw=-np.pi / 2)
    rows, cols = 32, 96
    key = jax.random.key(5)
    kw = dict(pixel_aspect=0.5, spp=1, bounces=2,
              light_color=(16.86, 10.76, 8.2), sample_batch=1)

    _rgb, a_full = jax.jit(lambda s, c: render_pt(
        s, c, 0.0, key, rows=rows, cols=cols, **kw))(scene, cam)

    mesh = make_mesh((8,), ("rows",))

    def band_fn(scene, camera, row_lo, n_rows):
        rgb, a = render_pt(scene, camera, 0.0, key, rows=rows, cols=cols,
                           row_lo=row_lo, n_rows=n_rows, **kw)
        return a

    a_band = render_rows_sharded(band_fn, scene, cam, mesh, rows, cols)
    assert a_band.shape == (rows, cols)
    agree = (np.asarray(a_band) == np.asarray(a_full)).mean()
    assert agree >= 0.999, agree
    # the band render actually found the glyph overrides (2..254 codes)
    codes = np.unique(np.asarray(a_band))
    assert ((codes >= 2) & (codes <= 254)).any(), codes


def test_soft_raster_gradients_match_finite_differences():
    """The differentiable path must be MATHEMATICALLY differentiable, not
    just jax.grad-able: directional derivatives of the inverse-rendering
    loss w.r.t. vertex positions and colors must match central finite
    differences (the soft raster is smooth — sigmoid coverage, softmax
    occlusion and glyph assignment — so f32 central differences at a
    moderate eps are accurate)."""
    from ascii_renderer_tpu.core.camera import Camera
    from ascii_renderer_tpu.diff.soft_raster import (soft_luminance_loss,
                                                     soft_render)

    rng = np.random.default_rng(3)
    verts = jnp.asarray([[-0.8, -0.5, 0.0], [0.9, -0.4, 0.2],
                         [0.0, 0.8, -0.1],
                         [-0.5, -0.7, 0.6], [0.6, -0.6, 0.5],
                         [0.1, 0.6, 0.7]], jnp.float32)
    colors = jnp.asarray(rng.uniform(0.2, 0.9, (6, 3)), jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    cam = Camera.create(pos=(0.0, 0.0, 3.0), yaw=-np.pi / 2, pitch=0.0)
    target = jnp.asarray(rng.uniform(0.0, 1.0, (16, 24, 3)), jnp.float32)

    def loss(verts, colors):
        img = soft_render(verts, colors, faces, cam, 16, 24, 0.5,
                          sigma=3e-3, gamma=3e-2)
        return soft_luminance_loss(img, target)

    g_v, g_c = jax.jit(jax.grad(loss, argnums=(0, 1)))(verts, colors)
    assert np.isfinite(np.asarray(g_v)).all()
    assert float(jnp.abs(g_v).max()) > 0, "zero vertex gradient"

    f = jax.jit(loss)
    eps = 3e-3
    for name, g, x, arg in (("verts", g_v, verts, 0),
                            ("colors", g_c, colors, 1)):
        d = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
        d = d / jnp.linalg.norm(d)
        args_p = [verts, colors]
        args_m = [verts, colors]
        args_p[arg] = x + eps * d
        args_m[arg] = x - eps * d
        fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
        an = float(jnp.vdot(g, d))
        assert abs(fd - an) <= 0.05 * max(abs(fd), abs(an), 1e-3), (
            name, fd, an)


def test_orbit_cameras_look_at_center():
    cams = orbit_cameras(4, center=(1.0, 2.0, 3.0), radius=5.0, height=2.0)
    pos = np.asarray(cams.pos)
    # all cameras at the given radius in XZ around the center
    d = np.linalg.norm(pos[:, [0, 2]] - np.asarray([1.0, 3.0]), axis=1)
    np.testing.assert_allclose(d, 5.0, atol=1e-5)
    # look direction (from yaw/pitch) points at the center
    for i in range(4):
        yaw, pitch = float(cams.yaw[i]), float(cams.pitch[i])
        look = np.asarray([np.cos(pitch) * np.cos(yaw), np.sin(pitch),
                           np.cos(pitch) * np.sin(yaw)])
        to_c = np.asarray([1.0, 2.0, 3.0]) - pos[i]
        to_c /= np.linalg.norm(to_c)
        np.testing.assert_allclose(look, to_c, atol=1e-5)


@pytest.mark.slow  # compile long pole (r4 item 6)
def test_scanned_train_steps_match_repeated_single_steps():
    """make_train_steps (N optimizer steps per dispatch via lax.scan) must
    produce the same trajectory as N single make_train_step calls."""
    import optax
    from ascii_renderer_tpu.geom import meshes
    from ascii_renderer_tpu.parallel import train as T
    from ascii_renderer_tpu.diff.soft_raster import soft_render

    rows, cols = 16, 32
    v, f = meshes.uv_sphere(6, 8)
    mesh = make_mesh((len(jax.devices()), 1), ("dp", "sp"))
    dp = mesh.shape["dp"]
    cams = orbit_cameras(dp, center=(0, 0, 0), radius=2.5, height=0.0)
    gt = jnp.broadcast_to(jnp.asarray([0.9, 0.2, 0.1]), v.shape)
    targets = jax.vmap(lambda c: soft_render(
        jnp.asarray(v), gt, jnp.asarray(f), c, rows, cols))(cams)
    opt = optax.adam(5e-2)
    fj = jnp.asarray(f)

    s1 = T.init_train_state(v, np.full_like(v, 0.5), opt)
    step = T.make_train_step(mesh, fj, rows, cols, optimizer=opt)
    singles = []
    for _ in range(3):
        s1, l = step(s1, cams, targets)
        singles.append(float(l))

    s2 = T.init_train_state(v, np.full_like(v, 0.5), opt)
    steps3 = T.make_train_steps(mesh, fj, rows, cols, n_steps=3,
                                optimizer=opt)
    s2, losses = steps3(s2, cams, targets)
    np.testing.assert_allclose(np.asarray(losses), np.asarray(singles),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.verts), np.asarray(s1.verts),
                               rtol=1e-5, atol=1e-6)
