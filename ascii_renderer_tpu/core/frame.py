"""Cell-grid frame pytree (SURVEY §2 contract 1).

The reference's framebuffer is a host-side ``Uint8ClampedArray`` of
``cols*rows*4`` RGBA bytes, row-major, top-left origin (js/main.js:243-248)
that makes three host<->GPU round trips per frame. Here the frame lives
on-device end-to-end as a struct-of-planes pytree:

  rgb : uint8 [rows, cols, 3]  — cell colors
  a   : uint8 [rows, cols]     — alpha byte carrying the override protocol

Row 0 is the TOP row (the reference reaches the same orientation via
flipAndCopy after readback, js/render/gl/context.js:117-124).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from ascii_renderer_tpu.core import quantize


@flax.struct.dataclass
class Frame:
    rgb: jnp.ndarray  # uint8 [H, W, 3]
    a: jnp.ndarray  # uint8 [H, W]

    @property
    def rows(self) -> int:
        return self.rgb.shape[0]

    @property
    def cols(self) -> int:
        return self.rgb.shape[1]

    @staticmethod
    def blank(rows: int, cols: int) -> "Frame":
        return Frame(
            rgb=jnp.zeros((rows, cols, 3), dtype=jnp.uint8),
            a=jnp.ones((rows, cols), dtype=jnp.uint8),  # A=1: "no override"
        )

    @staticmethod
    def from_float(rgb: jnp.ndarray, a: jnp.ndarray | None = None) -> "Frame":
        """Build from linear [0,1] float RGB (renderer output) with GL UNORM
        byte conversion; ``a`` may be a uint8 alpha plane or None (=1)."""
        rgb_u8 = quantize.float_rgb_to_u8(rgb)
        if a is None:
            a_u8 = jnp.ones(rgb.shape[:-1], dtype=jnp.uint8)
        else:
            a_u8 = a.astype(jnp.uint8)
        return Frame(rgb=rgb_u8, a=a_u8)

    def with_overrides(self, chars: jnp.ndarray, mask: jnp.ndarray) -> "Frame":
        """Burn a char plane into the frame where ``mask`` is set: RGB <- black,
        A <- char code (ref: applyUIToFrameRGBA, js/main.js:342-361)."""
        rgb = jnp.where(mask[..., None], jnp.uint8(0), self.rgb)
        a = jnp.where(mask, chars.astype(jnp.uint8), self.a)
        return Frame(rgb=rgb, a=a)

    def interleaved(self) -> jnp.ndarray:
        """RGBA-interleaved uint8 [H, W, 4] view (the reference's wire format,
        for IO/preview compatibility)."""
        return jnp.concatenate([self.rgb, self.a[..., None]], axis=-1)

    @staticmethod
    def from_interleaved(rgba: jnp.ndarray) -> "Frame":
        return Frame(rgb=rgba[..., :3].astype(jnp.uint8), a=rgba[..., 3].astype(jnp.uint8))
