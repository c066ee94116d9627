import pytest
"""Golden pins for the HEADLINE-scale fast paths (VERDICT r2 weak #6):
a silent semantics drift in the 960x540 subtile3 pipeline or the PT
deterministic planes would previously only be caught relative to in-repo
oracles that could drift with it. These goldens freeze the actual output.

- bunny_960x540: full raster->glyph frame at the bench config-3 camera;
  pinned as (a) an exact checksum of all 518400 glyph codes and (b) a
  checked-in 27x48 downsample (drift shows WHERE it moved).
- pt_demo_override_plane: the demo scene's poster glyphs through the PT
  primary-ray short-circuit (pathtrace_shader.js:141-149) — the
  deterministic plane of the stochastic backend — at a fixed pose.
Quantization contract ref: /root/reference/js/ascii_pass_shader.js:62-68.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ascii_renderer_tpu.backends import raster as R
from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.ascii.ascii_pass import glyph_decide

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")
BUNNY_CHECKSUM = 32392648


def test_bunny_960x540_glyphs_golden():
    from ascii_renderer_tpu.geom import meshes
    from ascii_renderer_tpu.scene.builder import SceneBuilder

    cfg = Config(pixel_aspect=0.5)
    rows, cols = 540, 960
    v, i = meshes.bunny_like(69000)
    p, n, c = meshes.mesh_to_soup(v, i, color=(0.8, 0.78, 0.75))
    sb = SceneBuilder().set_env_light([0.22, 0.24, 0.28], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    cam = Camera.create(pos=(2.4, 1.4, 2.8),
                        yaw=float(np.arctan2(-2.8, -2.4)), pitch=-0.3)
    T = p.shape[0] // 3

    @jax.jit
    def full(p_, n_, c_, scene, cam):
        rgb = R.render_soup(
            p_, n_, c_, scene, cam, rows, cols, cfg.pixel_aspect,
            method="subtile3", v_cap=R._round_up(T, 4096), big_cap=0,
            r_cap=R._round_up(2 * T, 2048), pair_cap=8 * T, tile_cap=1024)
        chars, _tint = glyph_decide(
            Frame.from_float(rgb), ramp=cfg.ascii_ramp,
            mode_on=cfg.ascii_mode_filter, mode_radius=cfg.mode_radius,
            mode_thresh=cfg.ascii_mode_thresh, grayscale=cfg.use_grayscale)
        return chars

    chars = np.asarray(full(jnp.asarray(p), jnp.asarray(n), jnp.asarray(c),
                            scene, cam))
    assert chars.shape == (540, 960)
    assert int(chars.astype(np.uint64).sum()) == BUNNY_CHECKSUM
    ds = ["".join(chr(x) for x in row) for row in chars[10::20, 10::20]]
    with open(os.path.join(GOLDENS, "bunny_960x540_ds20.txt")) as f:
        golden = f.read().rstrip("\n").split("\n")
    assert ds == golden


# NOT slow-marked: the golden pins are the cheap early-warning layer —
# a PT semantics regression must fail the DEFAULT suite (ADVICE r4)
def test_pt_demo_override_plane_golden():
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.scene.demo import create_demo_scene

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    cam = Camera.create(pos=(0, 2.5, 6), yaw=-np.pi / 2)
    _rgb, a = PT.render_pt(scene, cam, jnp.float32(0), jax.random.key(0),
                           rows=36, cols=96, pixel_aspect=0.5, spp=2,
                           bounces=2, light_color=(16.86, 10.76, 8.2))
    a = np.asarray(a)
    ov = (a >= 2) & (a <= 254)
    lines = ["".join(chr(c) if (32 <= c <= 126 and o) else "."
                     for c, o in zip(row, orow))
             for row, orow in zip(a, ov)]
    with open(os.path.join(GOLDENS, "pt_demo_override_plane.txt")) as f:
        golden = f.read().rstrip("\n").split("\n")
    assert lines == golden
    assert ov.sum() == 117
