from ascii_renderer_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, render_views_sharded, batch_cameras,
)
