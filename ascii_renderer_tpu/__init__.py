"""ascii_renderer_tpu — a TPU-native ASCII rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
pritzza/ASCII-Renderer (a browser WebGL ASCII ray tracer): three render
backends (path trace / ray trace / raster), an ASCII glyph-quantization
pass with modal smoothing, a scene builder, ASCII-texture atlases, a UI
text layer, and a frame-loop app shell — all expressed as jitted array
programs over a dense on-device cell grid (no per-frame host round trips).

Layer map (mirrors the reference's five layers, re-architected for TPU):
  app/       - CLI driver + interactive frame loop        (ref: js/main.js)
  sim/       - UI effects, frame step, camera integration (ref: js/renderer.js, js/camera.js)
  scene/     - SceneBuilder + demo scene                  (ref: js/render/scene_api.js, js/scene.js)
  backends/  - pathtrace / raytrace / raster render cores (ref: js/render/backends/*)
  ascii/     - glyph quantization + modal filter + text   (ref: js/ascii_pass*.js, js/text_overlay.js)
  atlas/     - ASCII-texture RGBA atlas IO                 (ref: atlas_paint.py spec)
  core/      - frame/alpha protocol, quantize rule, camera, config
  geom/      - intersections, tessellation, procedural meshes
  ops/       - Pallas TPU kernels for the hot paths
  parallel/  - device-mesh sharding (many-view farm, tiled grids)
  diff/      - differentiable soft-raster variant
"""

__version__ = "0.1.0"

from ascii_renderer_tpu.core.config import Config, default_config  # noqa: F401
