from ascii_renderer_tpu.sim.ui import ui_char_plane  # noqa: F401
from ascii_renderer_tpu.sim.framestep import FrameState, make_frame_step  # noqa: F401
