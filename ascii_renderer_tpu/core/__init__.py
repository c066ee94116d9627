from ascii_renderer_tpu.core.config import Config, default_config  # noqa: F401
from ascii_renderer_tpu.core.frame import Frame  # noqa: F401
from ascii_renderer_tpu.core.camera import Camera, CameraInputs, update_camera  # noqa: F401
