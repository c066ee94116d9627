"""Raster backend: vertex pipeline, clipping, z-buffer vs depth-sorted
oracle, cube golden (SURVEY §4 'raster z-buffer correctness')."""

import os

import numpy as np
import jax.numpy as jnp

from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.backends import raster as R
from ascii_renderer_tpu.backends.registry import Renderer
from ascii_renderer_tpu.geom import meshes
from ascii_renderer_tpu.scene.builder import SceneBuilder
from ascii_renderer_tpu.scene.demo import create_demo_scene
from ascii_renderer_tpu.ascii import AsciiPass, chars_to_strings

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _soup_to_setup(p, n, c, cam, rows, cols, aspect=1.0):
    attrs = jnp.concatenate([jnp.asarray(n), jnp.asarray(c), jnp.asarray(p)], axis=1)
    mvp = R.camera_mvp(cam, rows, cols, aspect)
    clip, tattr, valid = R.transform_clip(jnp.asarray(p), attrs, mvp)
    return clip, tattr, valid


def test_near_clip_cases():
    cam = Camera.create(pos=(0, 0, 0), yaw=-np.pi / 2)  # looking -z
    mk = lambda *vs: np.asarray(vs, np.float32)  # noqa: E731

    # fully in front (z < -near)
    p = mk([-1, -1, -2], [1, -1, -2], [0, 1, -2])
    clip, _, valid = _soup_to_setup(p, np.zeros_like(p), np.zeros_like(p),
                                    cam, 8, 8)
    assert valid.tolist() == [True, False]

    # fully behind
    p = mk([-1, -1, 2], [1, -1, 2], [0, 1, 2])
    _, _, valid = _soup_to_setup(p, np.zeros_like(p), np.zeros_like(p), cam, 8, 8)
    assert valid.tolist() == [False, False]

    # one vertex in front, two behind -> single clipped tri
    p = mk([0, 0, -2], [0, 0, 2], [1, 0, 2])
    clip, _, valid = _soup_to_setup(p, np.zeros_like(p), np.zeros_like(p), cam, 8, 8)
    assert valid.tolist() == [True, False]
    # clipped verts sit exactly on the near plane: z + w == 0
    d = np.asarray(clip[0, :, 2] + clip[0, :, 3])
    assert d[0] > 0 and abs(d[1]) < 1e-4 and abs(d[2]) < 1e-4

    # two in front, one behind -> two tris
    p = mk([-1, 0, -2], [1, 0, -2], [0, 0, 2])
    _, _, valid = _soup_to_setup(p, np.zeros_like(p), np.zeros_like(p), cam, 8, 8)
    assert valid.tolist() == [True, True]


def test_clip_attribute_interpolation():
    cam = Camera.create(pos=(0, 0, 0), yaw=-np.pi / 2)
    near = R.NEAR
    # Edge from z=-1 (attr 0) to z=+1 (attr 1); near plane at z=-near.
    p = np.asarray([[0, 0, -1], [0, 1, 1], [0, -1, 1]], np.float32)
    a = np.asarray([[0.0] * 9, [1.0] * 9, [1.0] * 9], np.float32)
    mvp = R.camera_mvp(cam, 8, 8, 1.0)
    clip, tattr, valid = R.transform_clip(jnp.asarray(p), jnp.asarray(a), mvp)
    # clip t along the edge: z_world from -1 to 1 crosses -near at
    # t = (-near - (-1)) / (1 - (-1)) = (1-near)/2
    t = (1 - near) / 2
    got = float(tattr[0, 1, 0])
    assert abs(got - t) < 1e-5


def test_zbuffer_nearer_wins_any_order():
    cam = Camera.create(pos=(0, 0, 5), yaw=-np.pi / 2)
    big = 3.0
    # CCW-in-window-coords (front) winding, facing +z toward the camera
    tri_near = np.asarray([[-big, -big, 1], [big, -big, 1], [0, big, 1]], np.float32)
    tri_far = np.asarray([[-big, -big, -1], [big, -big, -1], [0, big, -1]], np.float32)
    col_near = np.broadcast_to([1.0, 0.0, 0.0], (3, 3))
    col_far = np.broadcast_to([0.0, 1.0, 0.0], (3, 3))
    nrm = np.broadcast_to([0.0, 0.0, 1.0], (3, 3))
    scene = SceneBuilder().set_env_light([1, 1, 1], 1.0).build()
    for order in (0, 1):
        if order:
            p = np.concatenate([tri_near, tri_far])
            c = np.concatenate([col_near, col_far])
        else:
            p = np.concatenate([tri_far, tri_near])
            c = np.concatenate([col_far, col_near])
        n = np.concatenate([nrm, nrm])
        rgb = np.asarray(R.render_soup(jnp.asarray(p), jnp.asarray(n),
                                       jnp.asarray(c), scene, cam, 16, 16, 1.0))
        center = rgb[10, 8]
        assert center[0] > center[1], f"order={order}: near (red) must win"


def _np_oracle_visibility(clip, valid, rows, cols):
    """float64 depth-sorted reference: per-pixel winner tri + margin info."""
    clip = np.asarray(clip, np.float64)
    valid = np.asarray(valid)
    w = clip[..., 3]
    inv_w = 1.0 / np.where(np.abs(w) < 1e-12, 1e-12, w)
    ndc = clip[..., :3] * inv_w[..., None]
    x = (ndc[..., 0] + 1) * 0.5 * cols
    y = (1 - ndc[..., 1]) * 0.5 * rows
    z = (ndc[..., 2] + 1) * 0.5
    tid = np.full((rows, cols), -1, np.int64)
    zb = np.full((rows, cols), np.inf)
    margin = np.full((rows, cols), np.inf)  # min |edge| and depth gap
    for t in range(clip.shape[0]):
        if not valid[t]:
            continue
        e0 = (x[t, 1] - x[t, 0], y[t, 1] - y[t, 0])
        e1 = (x[t, 2] - x[t, 0], y[t, 2] - y[t, 0])
        area2 = e0[0] * e1[1] - e0[1] * e1[0]
        if area2 >= -1e-12:  # back-facing or degenerate
            continue
        for py in range(rows):
            for px in range(cols):
                pxc, pyc = px + 0.5, py + 0.5
                w0 = (x[t, 2] - x[t, 1]) * (pyc - y[t, 1]) - (y[t, 2] - y[t, 1]) * (pxc - x[t, 1])
                w1 = (x[t, 0] - x[t, 2]) * (pyc - y[t, 2]) - (y[t, 0] - y[t, 2]) * (pxc - x[t, 2])
                w2 = (x[t, 1] - x[t, 0]) * (pyc - y[t, 0]) - (y[t, 1] - y[t, 0]) * (pxc - x[t, 0])
                m = min(abs(w0), abs(w1), abs(w2)) / abs(area2)
                if w0 <= 0 and w1 <= 0 and w2 <= 0:
                    b0, b1, b2 = w0 / area2, w1 / area2, w2 / area2
                    zz = b0 * z[t, 0] + b1 * z[t, 1] + b2 * z[t, 2]
                    if 0 <= zz <= 1:
                        gap = abs(zz - zb[py, px])
                        if zz < zb[py, px]:
                            zb[py, px] = zz
                            tid[py, px] = t
                        margin[py, px] = min(margin[py, px], m, gap)
    return tid, zb, margin


def test_visibility_matches_depth_sorted_oracle():
    rng = np.random.default_rng(3)
    rows = cols = 24
    cam = Camera.create(pos=(0, 0, 4), yaw=-np.pi / 2)
    T = 30
    p = rng.uniform(-2, 2, size=(T, 3, 3)).astype(np.float32)
    p[..., 2] = rng.uniform(-2, 2, size=(T, 3))  # depths straddle
    p = p.reshape(-1, 3)
    attrs = np.zeros((T * 3, 9), np.float32)
    mvp = R.camera_mvp(cam, rows, cols, 1.0)
    clip, _, valid = R.transform_clip(jnp.asarray(p), jnp.asarray(attrs), mvp)
    setup = R.setup_screen(clip, valid, rows, cols)
    _zb, tid = R.visibility_scan(setup, rows, cols, chunk=7)

    otid, _ozb, margin = _np_oracle_visibility(np.asarray(clip),
                                               np.asarray(setup["valid"]),
                                               rows, cols)
    got = np.asarray(tid)
    # Compare away from edges/depth-ties where f32 vs f64 may legitimately flip
    stable = margin > 1e-3
    np.testing.assert_array_equal(got[stable], otid[stable])
    # and require the test to actually cover something
    assert (otid[stable] >= 0).sum() > 50


def test_cube_golden():
    cfg = Config(pixel_aspect=0.5, grid_width=80, grid_height=24,
                 ascii_mode_filter=False)
    v, i = meshes.cube(2.0)
    p, n, c = meshes.mesh_to_soup(v, i, color=(0.85, 0.85, 0.85), smooth=False)
    sb = SceneBuilder().set_env_light([0.2, 0.22, 0.25], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    b = R.RasterBackend(cfg)
    b.set_soup(p, n, c, scene)
    cam = Camera.create(pos=(2.2, 1.8, 3.2), yaw=float(np.arctan2(-3.2, -2.2)),
                        pitch=-0.42)
    f = b.render(0.0, cam, 24, 80, 0.5)
    rows = chars_to_strings(AsciiPass(cfg)(f)[0])
    path = os.path.join(GOLDEN_DIR, "raster_cube.txt")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as fh:
            fh.write("\n".join(rows) + "\n")
    with open(path) as fh:
        want = fh.read().splitlines()
    assert rows == want


def test_demo_room_fully_covered_from_inside():
    # Camera inside the closed box: every pixel must hit geometry (exercises
    # near clipping + double-sided quads).
    cfg = Config(pixel_aspect=0.5)
    r = Renderer(cfg, backend="raster")
    sb = create_demo_scene()
    sb.set_env_light([0.25, 0.27, 0.3], 1.0)
    scene = sb.build()
    r.set_scene(scene)
    f = r.render(0.0, scene.camera)
    # alpha plane: every pixel rendered (frame covered); rgb nonzero somewhere
    rgb = np.asarray(f.rgb)
    # no pure-black pixels (clear color) anywhere: full coverage
    assert (rgb.sum(-1) == 0).sum() == 0


def test_backface_culling():
    cam = Camera.create(pos=(0, 0, 5), yaw=-np.pi / 2)
    # CW winding (back-facing toward camera) -> culled -> all background
    p = np.asarray([[-1, -1, 0], [0, 1, 0], [1, -1, 0]], np.float32)
    n = np.broadcast_to([0.0, 0.0, 1.0], (3, 3))
    c = np.ones((3, 3), np.float32)
    scene = SceneBuilder().set_env_light([1, 1, 1], 1.0).build()
    rgb = np.asarray(R.render_soup(jnp.asarray(p), jnp.asarray(n),
                                   jnp.asarray(c), scene, cam, 8, 8, 1.0))
    assert rgb.max() == 0.0
    # flip winding -> visible
    p2 = p[[0, 2, 1]]
    rgb = np.asarray(R.render_soup(jnp.asarray(p2), jnp.asarray(n),
                                   jnp.asarray(c), scene, cam, 8, 8, 1.0))
    assert rgb.max() > 0.5
