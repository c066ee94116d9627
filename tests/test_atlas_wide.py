import pytest
"""Non-square atlas fixture end-to-end (VERDICT r2 missing #3): the
checked-in 32x16 asset — the shape class of the reference's atlas3.bin
(js/main.js:226-232) — loads through the raw-RGBA loader and survives to
glyph output via the path tracer's primary-ray glyph short-circuit
(pathtrace_shader.js:141-149,256-257)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ascii_renderer_tpu.atlas.io import (demo_atlas_wide, load_atlas,
                                         valid_mask)
from ascii_renderer_tpu.backends import pathtrace as PT
from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.scene.builder import MaterialIds, SceneBuilder

ASSET = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "assets", "atlas_wide_32x16.bin")
GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "pt_wide_atlas_overrides.txt")


def test_wide_asset_matches_generator_and_validates():
    arr = load_atlas(ASSET, 32, 16, strict=True)
    assert arr.shape == (16, 32, 4)
    assert valid_mask(arr).all()
    np.testing.assert_array_equal(arr, demo_atlas_wide())
    glyphs = (arr[..., 3] >= 32) & (arr[..., 3] <= 126)
    assert glyphs.sum() >= 19  # the fish art


@pytest.mark.slow  # compile long pole (r4 item 6)
def test_wide_atlas_pt_glyph_short_circuit_golden():
    """Full-atlas quad viewed 1 texel ≈ 1 cell: the override map (which
    cells carry which glyph codes) is deterministic — primary center rays
    short-circuit on glyph texels regardless of MC sampling — and is
    pinned by a checked-in golden."""
    atlas = load_atlas(ASSET, 32, 16, strict=True)
    sb = SceneBuilder()
    sb.add_quad([-4, -2, 0], [4, -2, 0], [4, 2, 0], [-4, 2, 0],
                MaterialIds.WHITE, (0, 16), (32, 16), (32, 0), (0, 0))
    sb.set_area_light([50, 50, 50], 0.1, auto=False)
    sb.set_atlas(atlas)
    scene = sb.build()
    cam = Camera.create(pos=(0, 0, 2.385), yaw=-np.pi / 2)
    _rgb, a = PT.render_pt(scene, cam, jnp.float32(0), jax.random.key(0),
                           rows=16, cols=32, pixel_aspect=1.0, spp=2,
                           bounces=2, light_color=(16.86, 10.76, 8.2))
    a = np.asarray(a)
    ov = (a >= 2) & (a <= 254)
    lines = ["".join(chr(c) if (32 <= c <= 126 and o) else "."
                     for c, o in zip(row, orow))
             for row, orow in zip(a, ov)]
    with open(GOLDEN) as f:
        golden = f.read().rstrip("\n").split("\n")
    assert lines == golden
    assert ov.sum() == 27
