import pytest
"""Raytrace backend semantics (ref: raytrace_shader.js) + golden."""

import os

import numpy as np
import jax.numpy as jnp

from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.backends import raytrace as rt
from ascii_renderer_tpu.backends.registry import Renderer
from ascii_renderer_tpu.scene.builder import MaterialIds, SceneBuilder
from ascii_renderer_tpu.scene.demo import create_rt_demo_scene
from ascii_renderer_tpu.ascii import AsciiPass, chars_to_strings

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _look_down_z():
    return Camera.create(pos=(0, 0, 5), yaw=-np.pi / 2, pitch=0.0)


@pytest.mark.slow  # compile long pole (r4 item 6)
def test_miss_gives_env_color():
    sb = SceneBuilder().set_env_light([0.2, 0.4, 0.6], 1.0)
    scene = sb.build()
    rgb = rt.render_rgb(scene, _look_down_z(), 4, 4, 1.0)
    np.testing.assert_allclose(np.asarray(rgb), np.broadcast_to(
        [0.2, 0.4, 0.6], (4, 4, 3)), atol=1e-6)


def test_diffuse_gets_no_ambient():
    # env contributes ZERO to diffuse surfaces (the verbatim N.y*0.0 term).
    sb = SceneBuilder().set_env_light([1, 1, 1], 1.0)
    sb.add_sphere([0, 0, 0], 1.0, MaterialIds.WHITE)
    scene = sb.build()
    rgb = rt.render_rgb(scene, _look_down_z(), 9, 9, 1.0)
    center = np.asarray(rgb)[4, 4]
    np.testing.assert_allclose(center, 0.0, atol=1e-7)  # unlit = black


def test_directional_light_lambert_and_shadow():
    sb = SceneBuilder()
    sb.add_plane([0, 1, 0], 0.0, MaterialIds.WHITE)
    sb.add_sphere([0, 1.5, 0], 0.5, MaterialIds.RED)
    sb.add_dir_light([0, -1, 0], [1, 1, 1], 1.0)  # straight down
    scene = sb.build()
    cam = Camera.create(pos=(0, 3, 4), yaw=-np.pi / 2, pitch=-0.6)
    rgb = np.asarray(rt.render_rgb(scene, cam, 33, 33, 1.0))
    # plane lambert = albedo * 1 * dot(N, up) = albedo -> bright except in
    # the sphere's shadow disc directly below it (center of view).
    mid = rgb[16, 16]
    edge = rgb[16, 2]
    assert mid.max() < 0.05  # shadowed (or sphere) at center
    np.testing.assert_allclose(edge, [0.7295, 0.7355, 0.7290], atol=1e-3)


@pytest.mark.slow  # compile long pole (r4 item 6)
def test_point_light_attenuation_formula():
    sb = SceneBuilder()
    sb.add_plane([0, 1, 0], 0.0, MaterialIds.WHITE)
    sb.add_point_light([0, 2, 0], [1, 1, 1], 1.0)
    scene = sb.build()
    cam = Camera.create(pos=(0, 4, 0.01), yaw=0.0, pitch=-np.pi / 2 + 0.1)
    rgb = np.asarray(rt.render_rgb(scene, cam, 17, 17, 1.0))
    # directly-below point: d2=4, ndl=1, att=1/(1+4*0.05)=1/1.2
    want = np.array([0.7295, 0.7355, 0.7290]) / 1.2
    got = rgb[8, 8]
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_mirror_single_bounce():
    sb = SceneBuilder()
    sb.add_plane([0, 1, 0], 0.0, MaterialIds.MIRROR)  # mirror floor
    sb.add_sphere([0, 2, -3], 1.0, MaterialIds.RED)
    sb.add_dir_light([0, -1, 0], [1, 1, 1], 1.0)
    sb.set_env_light([0.1, 0.2, 0.3], 1.0)
    scene = sb.build()
    cam = Camera.create(pos=(0, 1.0, 3), yaw=-np.pi / 2, pitch=-0.35)
    rgb = np.asarray(rt.render_rgb(scene, cam, 33, 33, 1.0))
    # mirror floor away from the sphere reflection shows env color
    corner = rgb[30, 2]
    np.testing.assert_allclose(corner, [0.1, 0.2, 0.3], atol=1e-5)
    # somewhere in the middle, the red sphere's lit top is reflected
    reds = rgb[..., 0] - rgb[..., 1]
    assert reds.max() > 0.2


def test_tie_break_prefers_sphere_over_tri():
    # Coincident sphere surface and triangle at the same t: the sphere is
    # listed first in the concatenated candidates, argmin keeps it.
    sb = SceneBuilder()
    sb.add_sphere([0, 0, 0], 1.0, MaterialIds.RED)
    sb.add_triangle([-1, -1, 1.0], [1, -1, 1.0], [0, 1, 1.0], MaterialIds.GREEN)
    scene = sb.build()
    ro = jnp.asarray([0.0, 0.0, 5.0])
    rd = jnp.asarray([0.0, 0.0, -1.0])
    _t, mat, _n, hit = rt.closest_hit(ro, rd, scene)
    assert bool(hit) and int(mat) == MaterialIds.RED


def test_rt_demo_golden_text():
    cfg = Config(pixel_aspect=0.5)
    r = Renderer(cfg, backend="rt")
    scene = create_rt_demo_scene().build()
    r.set_scene(scene)
    frame = r.render(0.0, scene.camera)
    rows = chars_to_strings(AsciiPass(cfg)(frame)[0])
    path = os.path.join(GOLDEN_DIR, "rt_demo.txt")
    if not os.path.exists(path):  # first run records the golden
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")
    with open(path) as f:
        want = f.read().splitlines()
    assert rows == want
