from ascii_renderer_tpu.backends.registry import (  # noqa: F401
    Renderer, list_backends, register_backend,
)
