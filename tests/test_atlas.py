"""Atlas format IO round-trip vs the atlas_paint.py spec."""

import numpy as np
import pytest

from ascii_renderer_tpu.atlas import (AtlasImage, load_atlas, save_atlas,
                                      stamp_ascii_art, valid_mask)
from ascii_renderer_tpu.atlas.io import demo_atlas


def test_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(16, 8, 4), dtype=np.uint8)
    p = str(tmp_path / "a.bin")
    save_atlas(p, arr)
    # raw headerless bytes, length w*h*4
    import os
    assert os.path.getsize(p) == 16 * 8 * 4
    back = load_atlas(p, 8, 16)
    np.testing.assert_array_equal(back, arr)


def test_size_mismatch_raises(tmp_path):
    p = str(tmp_path / "a.bin")
    save_atlas(p, np.zeros((4, 4, 4), np.uint8))
    with pytest.raises(ValueError):
        load_atlas(p, 8, 8)


def test_row_major_top_left_origin(tmp_path):
    img = AtlasImage(4, 2)
    img.set_char(1, 0, "A", (9, 8, 7))
    p = str(tmp_path / "a.bin")
    img.save(p)
    raw = np.fromfile(p, dtype=np.uint8)
    # texel (x=1, y=0) lives at byte offset (0*4 + 1)*4
    base = (0 * 4 + 1) * 4
    assert raw[base:base + 4].tolist() == [9, 8, 7, ord("A")]


def test_alpha_semantics_and_validation():
    img = AtlasImage(4, 4)
    img.set_pixel(0, 0, (1, 2, 3))
    img.set_char(1, 0, "#", (4, 5, 6))
    img.clear(2, 0)
    assert img.arr[0, 0, 3] == 1
    assert img.arr[0, 1, 3] == ord("#")
    assert img.arr[0, 2, 3] == 0
    assert img.valid_mask().all()
    img.arr[3, 3, 3] = 200  # invalid alpha
    assert not img.valid_mask().all()
    with pytest.raises(ValueError):
        img.set_char(0, 0, "\n", (0, 0, 0))
    with pytest.raises(ValueError):
        img.set_char(0, 0, chr(7), (0, 0, 0))


def test_stamp_ascii_art():
    arr = np.zeros((4, 8, 4), np.uint8)
    stamp_ascii_art(arr, 1, 1, "AB\n D", (10, 20, 30))
    assert arr[1, 1, 3] == ord("A")
    assert arr[1, 2, 3] == ord("B")
    assert arr[2, 1, 3] == 0  # space skipped
    assert arr[2, 2, 3] == ord("D")
    assert arr[1, 1, :3].tolist() == [10, 20, 30]
    # clipping outside bounds is silent
    stamp_ascii_art(arr, 7, 3, "XYZ", (1, 1, 1))
    assert arr[3, 7, 3] == ord("X")


def test_demo_atlas_valid():
    arr = demo_atlas()
    assert arr.shape == (32, 32, 4)
    assert valid_mask(arr).all()
    assert (arr[..., 3] >= 32).any()  # has glyphs
    assert (arr[..., 3] == 1).any()  # has solids
