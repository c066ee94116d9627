from ascii_renderer_tpu.ascii.ascii_pass import AsciiPass, glyph_decide  # noqa: F401
from ascii_renderer_tpu.ascii.text import chars_to_strings, frame_to_strings  # noqa: F401
