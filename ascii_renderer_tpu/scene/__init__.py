from ascii_renderer_tpu.scene.builder import (  # noqa: F401
    MaterialIds, SceneBuilder, SceneData, create_scene_builder, from_object,
)
