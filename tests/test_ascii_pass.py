"""ASCII pass tests: modal filter vs a literal per-pixel oracle of the GLSL
(ascii_pass_shader.js:77-138), glyph decision, text emission, pixel expansion."""

import numpy as np
import jax.numpy as jnp

from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.core import quantize
from ascii_renderer_tpu.ascii.modal import modal_filter
from ascii_renderer_tpu.ascii.ascii_pass import AsciiPass, glyph_decide, expand_pixels
from ascii_renderer_tpu.ascii.text import chars_to_strings, frame_to_strings


def _oracle_modal(idx, override, radius, thresh):
    """Per-pixel transcription of majorityNeighbor + the adopt rule."""
    H, W = idx.shape
    out = idx.copy()
    for y in range(H):
        for x in range(W):
            if override[y, x]:
                continue
            cand, cnt = -1, 0
            for dy in range(-3, 4):
                for dx in range(-3, 4):
                    if abs(dy) > radius or abs(dx) > radius:
                        continue
                    if dx == 0 and dy == 0:
                        continue
                    ny = min(max(y + dy, 0), H - 1)
                    nx = min(max(x + dx, 0), W - 1)
                    if override[ny, nx]:
                        continue
                    n = idx[ny, nx]
                    if cnt == 0:
                        cand, cnt = n, 1
                    elif n == cand:
                        cnt += 1
                    else:
                        cnt -= 1
            votes = 0
            if cand >= 0:
                for dy in range(-3, 4):
                    for dx in range(-3, 4):
                        if abs(dy) > radius or abs(dx) > radius:
                            continue
                        if dx == 0 and dy == 0:
                            continue
                        ny = min(max(y + dy, 0), H - 1)
                        nx = min(max(x + dx, 0), W - 1)
                        if override[ny, nx]:
                            continue
                        if idx[ny, nx] == cand:
                            votes += 1
            if cand >= 0 and votes >= thresh and cand != idx[y, x]:
                out[y, x] = cand
    return out


def test_modal_filter_matches_oracle():
    rng = np.random.default_rng(42)
    for radius, thresh in [(1, 5), (2, 12), (3, 24)]:
        idx = rng.integers(0, 4, size=(12, 17)).astype(np.int32)
        override = rng.random((12, 17)) < 0.15
        got = np.asarray(modal_filter(jnp.asarray(idx), jnp.asarray(override),
                                      radius, thresh))
        want = _oracle_modal(idx, override, radius, thresh)
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"radius={radius} thresh={thresh}")


def test_modal_edge_clamping_duplicates_votes():
    # A corner cell's clamped neighborhood revotes edge cells; a lone noisy
    # corner in a uniform field must be smoothed away even at the boundary.
    idx = np.zeros((6, 6), np.int32)
    idx[0, 0] = 3
    override = np.zeros((6, 6), bool)
    got = np.asarray(modal_filter(jnp.asarray(idx), jnp.asarray(override), 1, 5))
    assert got[0, 0] == 0
    np.testing.assert_array_equal(got, _oracle_modal(idx, override, 1, 5))


def test_overrides_never_smoothed_and_never_vote():
    idx = np.zeros((5, 5), np.int32)
    override = np.zeros((5, 5), bool)
    override[2, 2] = True
    idx[2, 2] = 7
    got = np.asarray(modal_filter(jnp.asarray(idx), jnp.asarray(override), 1, 1))
    assert got[2, 2] == 7  # untouched
    # neighbors of the override don't see its index as a vote
    want = _oracle_modal(idx, override, 1, 1)
    np.testing.assert_array_equal(got, want)


def test_glyph_decide_override_and_ramp():
    cfg = Config()
    rgb = np.zeros((3, 4, 3), np.uint8)
    rgb[0, 0] = [255, 255, 255]  # brightest -> last ramp char (space)
    a = np.ones((3, 4), np.uint8)
    a[1, 1] = ord("Z")  # override
    frame = Frame(rgb=jnp.asarray(rgb), a=jnp.asarray(a))
    chars, tint = glyph_decide(frame, ramp=cfg.ascii_ramp, mode_on=False,
                               mode_radius=1, mode_thresh=5, grayscale=False)
    chars = np.asarray(chars)
    assert chr(chars[1, 1]) == "Z"
    assert chr(chars[0, 0]) == " "  # intensity 255 -> ramp[-1]
    assert chr(chars[0, 1]) == "@"  # black -> ramp[0]
    np.testing.assert_array_equal(np.asarray(tint), rgb)


def test_text_emission_roundtrip():
    rgb = np.full((2, 3, 3), 255, np.uint8)
    a = np.ones((2, 3), np.uint8)
    a[0, 0] = ord("#")
    frame = Frame(rgb=jnp.asarray(rgb), a=jnp.asarray(a))
    rows = frame_to_strings(frame, Config(ascii_mode_filter=False))
    assert rows == ["#  ", "   "]


def test_expand_pixels_shapes_and_background():
    atlas = np.zeros((256, 4, 2), np.uint8)
    atlas[ord("X"), 1:3, :] = 255  # solid band
    chars = jnp.asarray(np.array([[ord("X"), ord(" ")]], np.uint8))
    tint = jnp.asarray(np.array([[[255, 0, 0], [0, 0, 0]]], np.uint8))
    img = np.asarray(expand_pixels(chars, tint, jnp.asarray(atlas), 1.0))
    assert img.shape == (4, 4, 3)
    # space glyph -> white background
    np.testing.assert_array_equal(img[:, 2:], 255)
    # X band -> pure red tint over white
    np.testing.assert_array_equal(img[1, 0], [255, 0, 0])
    np.testing.assert_array_equal(img[0, 0], [255, 255, 255])


def test_expand_pixels_transparent_background():
    """transparent_background reproduces the shader discard of
    zero-coverage pixels (ascii_pass_shader.js:224-230): output grows an
    alpha channel, A=0 exactly where glyph coverage is zero."""
    atlas = np.zeros((256, 4, 2), np.uint8)
    atlas[ord("X"), 1:3, :] = 255
    chars = jnp.asarray(np.array([[ord("X"), ord(" ")]], np.uint8))
    tint = jnp.asarray(np.array([[[255, 0, 0], [0, 0, 0]]], np.uint8))
    img = np.asarray(expand_pixels(chars, tint, jnp.asarray(atlas), 1.0,
                                   transparent_background=True))
    assert img.shape == (4, 4, 4)
    np.testing.assert_array_equal(img[1, 0], [255, 0, 0, 255])  # covered
    np.testing.assert_array_equal(img[0, 0, 3], 0)  # discarded
    np.testing.assert_array_equal(img[:, 2:, 3], 0)  # space glyph cell
    # RGB stays the white composite for alpha-blind viewers
    np.testing.assert_array_equal(img[0, 0, :3], [255, 255, 255])


def test_ascii_pass_end_to_end_jit():
    cfg = Config()
    p = AsciiPass(cfg)
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (cfg.grid_height, cfg.grid_width, 3), dtype=np.uint8)
    frame = Frame(rgb=jnp.asarray(rgb), a=jnp.ones((cfg.grid_height, cfg.grid_width), jnp.uint8))
    chars, tint = p(frame)
    assert chars.shape == (36, 96) and chars.dtype == jnp.uint8
    rows = chars_to_strings(chars)
    assert len(rows) == 36 and len(rows[0]) == 96
    img = p.pixels(frame)
    assert img.shape[0] == 36 * p.atlas.shape[1]
    assert img.shape[1] == 96 * p.atlas.shape[2]
