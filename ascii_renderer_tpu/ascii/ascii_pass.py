"""The ASCII pass: cell grid -> glyph grid (+ optional pixel expansion).

TPU re-design of js/ascii_pass.js + js/ascii_pass_shader.js. The reference
uploads the CPU cell grid to a texture and runs a fragment shader per OUTPUT
pixel (glyph decision recomputed for every pixel of a cell). Here the glyph
decision runs once per CELL as a dense array program, and pixel expansion is
a separate gather — strictly less work, identical results.

Outputs:
  chars u8 [H, W]   — the glyph grid (ASCII codes); this is the text overlay
                      capability (js/text_overlay.js) as a first-class output.
  tint  u8 [H, W, 3]— per-cell glyph color (cell color, or black if grayscale).
  pixels u8 [H*ch, W*cw, 3] — optional glyph-bitmap expansion over white,
                      the AsciiPass canvas capability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.core import quantize
from ascii_renderer_tpu.ascii import glyphs as glyphs_mod
from ascii_renderer_tpu.ascii.modal import modal_filter

# Trace-time perf knob (A/B'd by tools/ab_slope.py): run the ramp-code
# select chain in s32 lanes instead of packed u8. Bit-identical either way.
# MEASURED (ab_slope s8g32 vs s8g8, 9 reps over two runs, headline frame):
# the u8 chain is equal-or-faster in-context (medians 1.61 vs 1.66 ms) —
# the HLO cycle model's 16x packed-layout penalty for the ROOT fusion does
# not show up in wall time (the glyph stage overlaps the raster tail), so
# the packed-u8 default stands and the hypothesis is kept only as a knob.
GLYPH_SELECT_S32 = False

# Run the modal stencil as the Pallas kernel (ops/ascii_kernel) instead
# of the XLA jnp formulation when no explicit use_pallas is passed.
# TPU-only: interpret-mode Pallas would be slower on CPU and the XLA
# path is the cross-backend reference. Bit-identical either way
# (tests/test_pallas_kernels.py). MEASURED off: the device profile puts
# the Pallas kernel at 269 us vs 89 us for XLA's fused stencil+select
# at 960x540 (tools/profile_trace.py --set ...MODAL_PALLAS=True) — XLA
# fuses the whole vote into one pass; the manual band DMA loses.
MODAL_PALLAS = False


def glyph_decide(frame: Frame, *, ramp: str, mode_on: bool, mode_radius: int,
                 mode_thresh: int, grayscale: bool,
                 use_pallas: bool | None = None):
    """Per-cell glyph decision (ascii_pass_shader.js:140-188).

    Returns (chars u8 [H,W], tint u8 [H,W,3]). The modal stencil is also
    available as a Pallas kernel (ops/ascii_kernel.py, bit-exact twin,
    ``use_pallas=True``); XLA already fuses the jnp stencil to within noise
    of it on TPU (measured 4.9 vs 5.1 ms at 960x540), so jnp is the default.
    """
    ramp_len = len(ramp) if ramp else len(quantize.DEFAULT_RAMP)
    base_idx = quantize.quantize_index(frame.rgb, ramp_len)
    return glyph_from_index(base_idx, frame.a, frame.rgb, ramp=ramp,
                            mode_on=mode_on, mode_radius=mode_radius,
                            mode_thresh=mode_thresh, grayscale=grayscale,
                            use_pallas=use_pallas)


def glyph_from_index(base_idx: jnp.ndarray, a_plane: jnp.ndarray,
                     tint_rgb_u8, *, ramp: str, mode_on: bool,
                     mode_radius: int, mode_thresh: int, grayscale: bool,
                     use_pallas: bool | None = None):
    """Image-space tail of the glyph decision, starting from a
    pre-quantized ramp-index plane (i32 [H, W]).

    Split out so renderers can quantize in their own (e.g. grouped bin)
    layout and assemble the 1-plane index image instead of the f32 RGB
    image — bit-identical, 4x less assembled traffic (the quantize rule
    is per-cell; only the modal stencil needs image space)."""
    # Ramp codes as s32, not u8: XLA expands this tiny-table gather into a
    # compare+select chain, and on TPU a u8 chain runs in the packed
    # T(8,128)(4,1) byte layout that the compiler costs ~16x a native
    # 32-bit lane op (206k vs 13k estimated cycles for the 960x540 ROOT
    # fusion, tools/hlo_cycles.py). Selecting in s32 and converting once
    # at the end is exact (codes <= 255) and bit-identical.
    code_dtype = np.int32 if GLYPH_SELECT_S32 else np.uint8
    codes = jnp.asarray(np.asarray(quantize.ramp_codes(ramp), code_dtype))

    override = quantize.is_override(a_plane)
    idx = base_idx
    if mode_on:
        if use_pallas is None:
            use_pallas = MODAL_PALLAS and jax.default_backend() == "tpu"
        if use_pallas:
            from ascii_renderer_tpu.ops.ascii_kernel import modal_filter_pallas
            idx = modal_filter_pallas(base_idx, override, mode_radius,
                                      mode_thresh, interpret=False)
        else:
            idx = modal_filter(base_idx, override, mode_radius, mode_thresh)

    ramp_chars = codes[idx]  # compare+select chain (tiny table)
    chars = jnp.where(override, a_plane.astype(ramp_chars.dtype),
                      ramp_chars).astype(jnp.uint8)

    if tint_rgb_u8 is None:
        tint = None
    elif grayscale:
        tint = jnp.zeros_like(tint_rgb_u8)
    else:
        tint = tint_rgb_u8
    # Override cells tint with the cell color too (the UI compositor already
    # painted them black: js/main.js:351-355).
    return chars, tint


def expand_pixels(chars: jnp.ndarray, tint: jnp.ndarray, atlas: jnp.ndarray,
                  alpha_gamma: float,
                  transparent_background: bool = False) -> jnp.ndarray:
    """Glyph-bitmap expansion: composite tinted coverage over white
    (ascii_pass_shader.js:223-230). atlas: u8 [256, ch, cw].

    transparent_background reproduces the shader's
    `if (uTransparentBG && texelIsTransparent(cov)) discard;`
    (ascii_pass_shader.js:224-230): zero-coverage pixels are left
    unpainted. A discarded canvas pixel is transparent, so the output
    grows an alpha channel — u8 [H*ch, W*cw, 4] with A=0 exactly where
    coverage is zero (RGB stays the white composite for alpha-blind
    viewers); plain RGB [H*ch, W*cw, 3] otherwise.

    Note the atlas was already gamma-shaped at bake; applying alpha_gamma
    here again reproduces the reference's double application (glyphs.py).
    """
    h, w = chars.shape
    ch, cw = atlas.shape[1], atlas.shape[2]
    cov = atlas[chars.astype(jnp.int32)]  # [H, W, ch, cw] u8
    cov = (cov.astype(jnp.float32) / 255.0) ** jnp.float32(alpha_gamma)
    t = tint.astype(jnp.float32) / 255.0  # [H, W, 3]
    out = (1.0 - cov)[..., None] + cov[..., None] * t[:, :, None, None, :]
    out = quantize.float_rgb_to_u8(out)  # [H, W, ch, cw, 3]
    if transparent_background:
        a = jnp.where(cov > 0.0, jnp.uint8(255), jnp.uint8(0))[..., None]
        out = jnp.concatenate([out, a], axis=-1)
    n_chan = out.shape[-1]
    return out.transpose(0, 2, 1, 3, 4).reshape(h * ch, w * cw, n_chan)


class AsciiPass:
    """Config-specialized ASCII pass (the stateful counterpart of
    js/ascii_pass.js:130-373, holding the jitted program + glyph atlas)."""

    def __init__(self, cfg: Config | None = None, glyph_atlas: np.ndarray | None = None):
        self.cfg = cfg or Config()
        self.atlas = jnp.asarray(
            glyph_atlas if glyph_atlas is not None else glyphs_mod.load_default_atlas())
        c = self.cfg
        self._decide = jax.jit(functools.partial(
            glyph_decide,
            ramp=c.ascii_ramp,
            mode_on=c.ascii_mode_filter,
            mode_radius=c.mode_radius,
            mode_thresh=c.ascii_mode_thresh,
            grayscale=c.use_grayscale,
        ))
        self._expand = jax.jit(functools.partial(
            expand_pixels, alpha_gamma=c.alpha_gamma,
            transparent_background=c.transparent_background))

    def __call__(self, frame: Frame):
        return self._decide(frame)

    def pixels(self, frame: Frame) -> jnp.ndarray:
        chars, tint = self._decide(frame)
        return self._expand(chars, tint, self.atlas)
