"""The glyph quantization rule and the alpha-byte protocol.

This is the keystone data contract of the whole system (SURVEY §2 contracts
2-3). It must be bit-exact across every consumer: the device ASCII pass, the
text-emission path, and the UI compositor — mirroring the reference where the
identical rule appears in three places (js/ascii_pass_shader.js:62-68,
js/text_overlay.js:141-144, js/renderer.js:67-71).

Alpha-byte protocol:
  In a frame:   A in {0,1}    -> no override; quantize RGB through the ramp
                2 <= A <= 254 -> draw ASCII glyph chr(A) verbatim
                A == 255      -> treated as no-override (outside [2,254])
  In an atlas:  A == 0        -> clear texel
                A == 1        -> solid RGB texel
                32 <= A <= 126-> ASCII glyph texel (RGB = tint)
                otherwise     -> invalid
(ref: js/main.js:352-358, js/ascii_pass_shader.js:153-155, atlas_paint.py:18-23)

Quantization rule (positive-half-up rounding, NOT banker's rounding):
  intensity = (r + g + b) / 3            # r,g,b as 0..255 ints
  x   = clamp(intensity / 255, 0, 1 - 1e-6)
  idx = clamp(floor(x * (ramp_len - 1) + 0.5), 0, ramp_len - 1)
The 1e-6 clamp reproduces the GLSL top-bin epsilon (ascii_pass_shader.js:64);
floor(x+0.5) reproduces JS Math.round for non-negative x.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Frame alpha protocol (ref: js/main.js:352-358).
OVERRIDE_MIN = 2
OVERRIDE_MAX = 254

# Atlas alpha protocol (ref: atlas_paint.py:18-23).
ATLAS_CLEAR = 0
ATLAS_SOLID = 1
ATLAS_GLYPH_MIN = 32
ATLAS_GLYPH_MAX = 126

DEFAULT_RAMP = "@%#*+=-:. "


def ramp_codes(ramp: str) -> np.ndarray:
    """ASCII codes of a ramp string as a uint8 numpy array (host constant).

    The reference compiles the ramp into the shader as an index->code mapper
    (ascii_pass_shader.js:12-16); here it becomes a gather table baked into
    the jitted program as a constant.
    """
    if not ramp:
        ramp = DEFAULT_RAMP
    return np.frombuffer(ramp.encode("ascii"), dtype=np.uint8).copy()


def intensity_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Average-of-bytes intensity in 0..255 as float32.

    Canonical order of operations: integer sum first, single float divide —
    matching the CPU oracle (text_overlay.js:142) rather than the GLSL
    pre-normalized form, so .5 boundaries land identically everywhere.
    """
    s = rgb_u8.astype(jnp.int32).sum(axis=-1)
    return s.astype(jnp.float32) / jnp.float32(3.0)


def quantize_index(rgb_u8: jnp.ndarray, ramp_len: int) -> jnp.ndarray:
    """RGB bytes [..., 3] -> ramp index [...] (int32). Bit-exact contract 3."""
    n = jnp.float32(max(1, ramp_len) - 1)
    x = intensity_u8(rgb_u8) / jnp.float32(255.0)
    x = jnp.clip(x, 0.0, 1.0 - 1e-6)
    idx = jnp.floor(x * n + jnp.float32(0.5))
    return jnp.clip(idx, 0.0, n).astype(jnp.int32)


def is_override(a_u8: jnp.ndarray) -> jnp.ndarray:
    """Mask of cells whose alpha byte encodes an ASCII override."""
    a = a_u8.astype(jnp.int32)
    return (a >= OVERRIDE_MIN) & (a <= OVERRIDE_MAX)


def quantize_index_np(rgb_u8: np.ndarray, ramp_len: int) -> np.ndarray:
    """Pure-numpy twin of :func:`quantize_index` (the CPU oracle for tests,
    moral equivalent of text_overlay.js:128-148)."""
    n = np.float32(max(1, ramp_len) - 1)
    s = rgb_u8.astype(np.int64).sum(axis=-1)
    x = s.astype(np.float32) / np.float32(3.0) / np.float32(255.0)
    x = np.clip(x, 0.0, 1.0 - 1e-6)
    idx = np.floor(x * n + np.float32(0.5))
    return np.clip(idx, 0, n).astype(np.int32)


def float_rgb_to_u8(rgb: jnp.ndarray) -> jnp.ndarray:
    """Linear [0,1] float RGB -> bytes, matching GL RGBA8 UNORM conversion
    (round-half-up of clamp(v,0,1)*255, as produced by the reference's
    readPixels path)."""
    v = jnp.clip(rgb, 0.0, 1.0) * jnp.float32(255.0)
    return jnp.floor(v + jnp.float32(0.5)).astype(jnp.uint8)
