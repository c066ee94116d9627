from ascii_renderer_tpu.diff.soft_raster import (  # noqa: F401
    soft_render, soft_glyph_probs, soft_luminance_loss,
)
