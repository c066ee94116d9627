"""Text emission: glyph grids -> Python strings.

The selectable DOM text overlay (js/text_overlay.js:128-148) recomputes row
strings from the display buffer with the same quantization as the GPU pass.
Here the chars grid IS the source of truth, so text output is a pure
host-side decode of the device result — guaranteed in sync by construction.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.ascii import ascii_pass as _pass


def chars_to_strings(chars) -> List[str]:
    """u8 [H, W] ASCII codes -> list of row strings."""
    a = np.asarray(chars)
    # Non-ASCII bytes (>126) render as '?' placeholders; the protocol only
    # produces codes via ramp chars (printable) or overrides (2..254).
    return ["".join(chr(c) if 32 <= c <= 126 else "?" for c in row) for row in a]


def frame_to_strings(frame: Frame, cfg: Config | None = None) -> List[str]:
    """One-call convenience: frame -> glyph decision -> row strings
    (the TextOverlay capability, js/text_overlay.js:288-292)."""
    cfg = cfg or Config()
    chars, _ = _pass.glyph_decide(
        frame,
        ramp=cfg.ascii_ramp,
        mode_on=cfg.ascii_mode_filter,
        mode_radius=cfg.mode_radius,
        mode_thresh=cfg.ascii_mode_thresh,
        grayscale=cfg.use_grayscale,
    )
    return chars_to_strings(chars)
