"""Native terminal blitter: build, encode, diffing, python-fallback parity."""

import numpy as np
import pytest

from ascii_renderer_tpu.app.termblit import TermBlitter


@pytest.fixture(scope="module")
def grids():
    rng = np.random.default_rng(0)
    chars = rng.integers(33, 127, (6, 20), dtype=np.uint8)
    rgb = rng.integers(0, 256, (6, 20, 3), dtype=np.uint8)
    return chars, rgb


def test_native_builds_and_encodes(grids):
    chars, rgb = grids
    tb = TermBlitter(6, 20, color=True)
    assert tb.native, "native termblit should build with g++"
    out = tb.encode(chars, rgb)
    assert out.startswith(b"\x1b[1;1H")
    assert out.endswith(b"\x1b[0m")
    assert b"\x1b[38;2;" in out
    # all printable glyphs present
    for c in chars[0][:5]:
        assert bytes([c]) in out


def test_diffing_skips_clean_rows(grids):
    chars, rgb = grids
    tb = TermBlitter(6, 20, color=True)
    full = tb.encode(chars, rgb)
    same = tb.encode(chars, rgb)  # identical frame -> only the SGR reset
    assert len(same) < len(full) / 4
    # single-cell change repaints only that row segment
    chars2 = chars.copy()
    chars2[3, 7] = ord("Z")
    delta = tb.encode(chars2, rgb)
    assert b"\x1b[4;8H" in delta  # 1-based cursor to row 4 col 8
    assert len(delta) < len(full) / 2


def test_python_fallback_matches_native_full_repaint(grids):
    chars, rgb = grids
    tb = TermBlitter(6, 20, color=True)
    native = tb.encode(chars, rgb)
    tb_py = TermBlitter(6, 20, color=True)
    tb_py._lib = None  # force fallback
    py = tb_py.encode(chars, rgb)
    assert native == py


def test_monochrome_mode(grids):
    chars, _ = grids
    tb = TermBlitter(6, 20, color=False)
    out = tb.encode(chars)
    assert b"\x1b[38;2;" not in out
