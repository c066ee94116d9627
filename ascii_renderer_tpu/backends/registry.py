"""Backend registry + router (ref: js/gpu_renderer.js).

Named backend factories with friendly aliases, runtime hot-swap with scene
re-push, and a stable render facade. Swapping backends selects a different
jitted program; the cached last scene is re-pushed on swap
(gpu_renderer.js:68-88).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.core.config import Config
from ascii_renderer_tpu.core.frame import Frame
from ascii_renderer_tpu.scene.builder import SceneData

_factories: Dict[str, Callable[..., object]] = {}
_aliases = {
    "pt": "pathtrace", "path": "pathtrace", "pathtracer": "pathtrace",
    "r": "raster", "rasterizer": "raster",
    "rt": "raytrace", "ray": "raytrace",
}


def register_backend(name: str, factory: Callable[..., object]) -> None:
    """ref: gpu_renderer.js:52-57."""
    if not name or not callable(factory):
        raise ValueError("register_backend(name, factory): invalid args")
    _factories[str(name).lower()] = factory


def list_backends():
    _ensure_defaults()
    return list(_factories.keys())


def _canonical(name: str) -> Optional[str]:
    n = str(name or "").lower()
    if n in _factories:
        return n
    a = _aliases.get(n)
    return a if a in _factories else None


def _ensure_defaults():
    if _factories:
        return
    # Lazy imports to avoid cycles and to keep unused backends uncompiled.
    from ascii_renderer_tpu.backends.raytrace import RaytraceBackend
    register_backend("raytrace", RaytraceBackend)
    try:
        from ascii_renderer_tpu.backends.raster import RasterBackend
        register_backend("raster", RasterBackend)
    except ImportError:
        pass
    try:
        from ascii_renderer_tpu.backends.pathtrace import PathtraceBackend
        register_backend("pathtrace", PathtraceBackend)
    except ImportError:
        pass


class Renderer:
    """Instance-based router (the reference uses module singletons; an
    instance composes better with jit caches and tests)."""

    def __init__(self, cfg: Config | None = None, backend: str | None = None):
        _ensure_defaults()
        self.cfg = cfg or Config()
        self._active = None
        self._active_name = None
        self._last_scene: Optional[SceneData] = None
        self.set_backend(backend or self.cfg.default_backend)

    @property
    def backend_name(self) -> str:
        return self._active_name

    def set_backend(self, name: str) -> str:
        """Hot-swap with dispose + scene re-push (gpu_renderer.js:68-80)."""
        key = _canonical(name)
        if key is None:
            raise ValueError(
                f'Unknown backend "{name}". Known: {", ".join(list_backends())}')
        if self._active is not None and hasattr(self._active, "dispose"):
            try:
                self._active.dispose()
            except Exception:
                pass
        self._active = _factories[key](self.cfg)
        self._active_name = key
        if self._last_scene is not None:
            self._active.set_scene(self._last_scene)
        return key

    def set_scene(self, scene: SceneData) -> None:
        self._last_scene = scene
        self._active.set_scene(scene)

    def render(self, time_sec: float, camera: Camera, rows: int | None = None,
               cols: int | None = None) -> Frame:
        rows = rows or self.cfg.grid_height
        cols = cols or self.cfg.grid_width
        frame = self._active.render(time_sec, camera, rows, cols,
                                    pixel_aspect=self.cfg.pixel_aspect)
        self._last_frame = frame
        return frame

    def render_raw(self, args: dict) -> Optional[Frame]:
        """Dict-args facade (gpu_renderer.js renderRaw:97-100)."""
        if not args or "camera" not in args:
            return None
        return self.render(args.get("time", 0.0), args["camera"],
                           args.get("rows"), args.get("cols"))

    def get_pixels(self, flip_y: bool = False):
        """Last rendered frame as interleaved RGBA bytes (getPixels,
        gpu_renderer.js:102-105). flip_y returns bottom-up rows (the raw GL
        readback orientation)."""
        frame = getattr(self, "_last_frame", None)
        if frame is None:
            return None
        import numpy as np
        px = np.asarray(frame.interleaved())
        return px[::-1] if flip_y else px

    def dispose(self) -> None:
        if self._active is not None and hasattr(self._active, "dispose"):
            self._active.dispose()
        self._active = None
        self._active_name = None
