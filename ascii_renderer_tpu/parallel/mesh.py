"""Device-mesh scale-out (SURVEY §5 "distributed communication backend").

The reference is a single-GPU browser app with no distributed runtime; the
dimension that scales in this workload is cell-grid size x primitive count x
view count (SURVEY §5 long-context analog, BASELINE config 4: 1024-camera
many-view render farm). TPU-natively that is:

  - **views (dp)**: vmap the render over a camera batch and shard the batch
    axis across the mesh. Rendering is embarrassingly parallel per view, so
    XLA inserts zero collectives — the scene is replicated, each device
    renders its view shard locally (ICI only moves the initial broadcast).
  - **tiles (sp)**: shard the grid's row axis; each device renders its row
    band (per-tile-owned z-buffers; no cross-device reduction, per SURVEY
    §5's recommendation).

Collectives only appear in the training path (parallel/train.py), where
gradients psum over the mesh.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ascii_renderer_tpu.core.camera import Camera


def make_mesh(axis_sizes: Sequence[int] | None = None,
              axis_names: Sequence[str] = ("views",)) -> Mesh:
    """Build a Mesh over the available devices. Default: 1-D 'views' axis
    over all devices."""
    devs = np.asarray(jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devs),)
    devs = devs[: int(np.prod(axis_sizes))].reshape(tuple(axis_sizes))
    return Mesh(devs, tuple(axis_names))


def batch_cameras(positions, yaws, pitches, fov_y_deg=80.0) -> Camera:
    """Stack per-view camera parameters into a batched Camera pytree
    (leading axis = views)."""
    n = len(positions)
    f32 = jnp.float32
    return Camera(
        pos=jnp.asarray(positions, f32).reshape(n, 3),
        yaw=jnp.asarray(yaws, f32),
        pitch=jnp.asarray(pitches, f32),
        fov_y=jnp.full((n,), fov_y_deg * np.pi / 180.0, f32),
        speed=jnp.full((n,), 2.5, f32),
        sensitivity=jnp.full((n,), 1.5, f32),
    )


def orbit_cameras(n: int, center=(0.0, 1.5, 0.0), radius: float = 6.0,
                  height: float = 2.5, fov_y_deg: float = 80.0) -> Camera:
    """n cameras orbiting a point, looking inward — the many-view farm
    fixture for BASELINE config 4."""
    angles = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    pos = np.stack([center[0] + radius * np.cos(angles),
                    np.full(n, height),
                    center[2] + radius * np.sin(angles)], axis=1)
    look = np.asarray(center)[None, :] - pos
    yaw = np.arctan2(look[:, 2], look[:, 0])
    pitch = np.arcsin(np.clip(look[:, 1] / np.linalg.norm(look, axis=1),
                              -1, 1))
    return batch_cameras(pos, yaw, pitch, fov_y_deg)


def make_views_sharded_fn(render_one: Callable, mesh: Mesh,
                          axis: str = "views") -> Callable:
    """Compile-once form of render_views_sharded for hot loops: returns
    ``fn(scene, cameras) -> results`` (inputs are device_put to the right
    shardings on every call; the compiled program is reused)."""
    vr = jax.vmap(render_one, in_axes=(None, 0))
    cam_sharding = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    jfn = jax.jit(vr, in_shardings=(rep, cam_sharding),
                  out_shardings=cam_sharding)

    def fn(scene, cameras: Camera):
        cameras = jax.device_put(cameras, cam_sharding)
        scene = jax.device_put(scene, rep)
        return jfn(scene, cameras)

    return fn


def render_views_sharded(render_one: Callable, scene, cameras: Camera,
                         mesh: Mesh, axis: str = "views"):
    """Shard a camera batch across ``mesh[axis]`` and render all views.

    ``render_one(scene, camera) -> result pytree`` is vmapped over the
    camera batch; the batch axis is sharded, the scene replicated. Returns
    the batched result with its leading axis sharded over ``axis``.
    One-shot convenience: for repeated calls use make_views_sharded_fn
    (this form re-wraps/re-traces per call)."""
    return make_views_sharded_fn(render_one, mesh, axis)(scene, cameras)


def render_rows_sharded(render_rows_fn: Callable, scene, camera: Camera,
                        mesh: Mesh, rows: int, cols: int, axis: str = "rows"):
    """Row-band (spatial) sharding: each device computes its slice of the
    cell grid. ``render_rows_fn(scene, camera, row_lo, n_rows)`` must render
    the half-open row band [row_lo, row_lo+n_rows).
    """
    from jax import shard_map

    n = mesh.shape[axis]
    assert rows % n == 0, f"rows {rows} must divide over {n} devices"
    band = rows // n

    def shard_fn(scene, camera):
        i = jax.lax.axis_index(axis)
        return render_rows_fn(scene, camera, i * band, band)

    # check_vma=False: band renderers may scan with unvarying carries or
    # call pallas kernels (no vma annotation); the band is device-local
    # with no collectives to typecheck
    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(), P()), out_specs=P(axis), check_vma=False)
    return jax.jit(fn)(scene, camera)
