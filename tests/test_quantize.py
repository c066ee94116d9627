"""Bit-exactness tests for the quantization rule + alpha protocol
(SURVEY §2 contracts 2-3; the rule at ascii_pass_shader.js:62-68)."""

import numpy as np
import jax.numpy as jnp

from ascii_renderer_tpu.core import quantize


def _oracle_idx(r, g, b, ramp_len):
    """Literal transcription of the CPU oracle (text_overlay.js:141-144):
    Math.round with JS semantics (floor(x+0.5)) in float64."""
    intensity = (r + g + b) / 3.0
    idx = int(np.floor((intensity / 255.0) * (ramp_len - 1) + 0.5))
    return min(ramp_len - 1, max(0, idx))


def test_exhaustive_gray_levels_default_ramp():
    L = 10  # "@%#*+=-:. "
    vals = np.arange(256, dtype=np.uint8)
    rgb = np.stack([vals, vals, vals], axis=-1)
    got = np.asarray(quantize.quantize_index(jnp.asarray(rgb), L))
    want = np.array([_oracle_idx(int(v), int(v), int(v), L) for v in vals])
    np.testing.assert_array_equal(got, want)


def test_all_intensity_sums_all_ramp_lengths():
    # every possible integer sum r+g+b in 0..765, several ramp lengths
    for L in (2, 3, 5, 10, 16, 70):
        sums = np.arange(766)
        r = np.minimum(sums, 255)
        rem = sums - r
        g = np.minimum(rem, 255)
        b = rem - g
        rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
        got = np.asarray(quantize.quantize_index(jnp.asarray(rgb), L))
        want = np.array([_oracle_idx(int(rr), int(gg), int(bb), L)
                         for rr, gg, bb in rgb])
        np.testing.assert_array_equal(got, want, err_msg=f"ramp_len={L}")


def test_half_boundary_rounds_up():
    # With L=2 the bin boundary is at intensity 127.5 → x*(L-1)=0.5 exactly
    # must round UP (floor(x+0.5)), not banker's-round to 0.
    rgb = np.array([[127, 127, 128]], dtype=np.uint8)  # sum=382 -> 127.333
    assert int(quantize.quantize_index(jnp.asarray(rgb), 2)[0]) == 0
    rgb = np.array([[127, 128, 128]], dtype=np.uint8)  # sum=383 -> 127.666 -> 0.5004
    assert int(quantize.quantize_index(jnp.asarray(rgb), 2)[0]) == 1
    # exact .5: needs sum = 382.5 — unreachable with ints for L=2; use L=18:
    # boundary x*(17)=k+0.5 -> intensity = 255*(k+0.5)/17 = 15*(k+0.5)
    # k=1 -> 22.5 -> sum=67.5 unreachable; k=2 -> 37.5 -> sum 112.5; ints
    # can't hit .5 of intensity*3 odd... use L=52: x*51=k+0.5 -> i=5*(k+.5)
    # k=0 -> 2.5 -> sum 7.5 no. Exact ties only occur when 255*3 | pattern;
    # L=6: i=51*(k+0.5) -> k=1: 76.5, sum=229.5 — not integer either.
    # Ties at integer sums: need (sum/765)*(L-1) == k+0.5 with sum int:
    # L=18, sum=765*(k+0.5)/17 -> k=16: 742.5 no. L=35: (L-1)=34,
    # sum = 765(k+.5)/34 = 22.5(2k+1): odd*22.5 never integer. L=16:
    # sum=51(k+.5)=25.5(2k+1) no. L=52: 15(k+.5)=7.5(2k+1) no.
    # L=other: sum=765(k+.5)/(L-1); choose L-1=9 (L=10, the default!):
    # sum=85(k+.5)=42.5(2k+1) no. L-1=15: 51(k+.5) no. L-1=17: 45(k+.5) no.
    # Even (L-1): L-1=2 -> 382.5(2k+1)? no. So with /3 averaging, exact .5
    # ties only arise via float rounding. The exhaustive tests above pin that.


def test_top_bin_epsilon():
    # intensity 255 exactly must map to the LAST ramp index, not overflow.
    rgb = np.array([[255, 255, 255]], dtype=np.uint8)
    for L in (2, 10, 70):
        assert int(quantize.quantize_index(jnp.asarray(rgb), L)[0]) == L - 1


def test_numpy_twin_matches_jax():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    for L in (2, 10, 70):
        a = np.asarray(quantize.quantize_index(jnp.asarray(rgb), L))
        b = quantize.quantize_index_np(rgb, L)
        np.testing.assert_array_equal(a, b)


def test_override_protocol():
    a = np.array([0, 1, 2, 64, 254, 255], dtype=np.uint8)
    got = np.asarray(quantize.is_override(jnp.asarray(a)))
    np.testing.assert_array_equal(got, [False, False, True, True, True, False])


def test_ramp_codes():
    codes = quantize.ramp_codes("@%#*+=-:. ")
    assert codes.tolist() == [64, 37, 35, 42, 43, 61, 45, 58, 46, 32]
    assert codes.dtype == np.uint8


def test_float_to_u8_matches_gl_unorm():
    f = jnp.asarray([0.0, 1.0, 0.5, 0.49999997, 2.0, -1.0, 1 / 255.0, 0.0019607])
    got = np.asarray(quantize.float_rgb_to_u8(f))
    np.testing.assert_array_equal(got, [0, 255, 128, 127, 255, 0, 1, 0])
