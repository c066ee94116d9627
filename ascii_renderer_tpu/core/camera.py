"""Camera state + controls as pure functional pytrees (ref: js/camera.js).

The reference keeps a mutable singleton ``camera`` {pos, yaw, pitch, speed,
sensitivity} plus a ``keysPressed`` set, integrated per frame by
``updateCamera(dt)`` (js/camera.js:7-53). Here camera state is an immutable
pytree and the integrator is a pure jittable function of (state, inputs, dt).

Camera convention (SURVEY §2 contract 4, identical across all backends):
  look = (cos p * cos y,  sin p,  cos p * sin y)      up = (0,1,0)
  focal = 1 / tan(fovY/2),  fovY default 80 deg
(ref: pathtrace_shader.js:195-201, raytrace_shader.js:70-74, raster.js:41-45)
"""

from __future__ import annotations

import math

import flax.struct
import jax
import jax.numpy as jnp

_PITCH_LIMIT = math.pi * 0.5 - 0.1  # just shy of +/-90 deg (js/camera.js:34)


@flax.struct.dataclass
class Camera:
    pos: jnp.ndarray  # f32 [3]
    yaw: jnp.ndarray  # f32 scalar
    pitch: jnp.ndarray  # f32 scalar
    fov_y: jnp.ndarray  # f32 scalar (radians)
    speed: jnp.ndarray  # f32 scalar, units/sec (js/camera.js:11)
    sensitivity: jnp.ndarray  # f32 scalar, rad/sec for arrow look (js/camera.js:12)

    @staticmethod
    def create(pos=(0.0, 0.0, 5.0), yaw=0.0, pitch=0.0, fov_y_deg=80.0,
               speed=2.5, sensitivity=1.5) -> "Camera":
        f32 = jnp.float32
        return Camera(
            pos=jnp.asarray(pos, dtype=f32),
            yaw=f32(yaw),
            pitch=f32(pitch),
            fov_y=f32(fov_y_deg * math.pi / 180.0),
            speed=f32(speed),
            sensitivity=f32(sensitivity),
        )


@flax.struct.dataclass
class CameraInputs:
    """Per-frame input snapshot: the functional stand-in for keysPressed plus
    pointer-look deltas (js/camera.js:15, js/main.js:108-118)."""

    forward: jnp.ndarray  # W
    back: jnp.ndarray  # S
    left: jnp.ndarray  # A
    right: jnp.ndarray  # D
    up: jnp.ndarray  # Space
    down: jnp.ndarray  # Shift
    look_up: jnp.ndarray  # ArrowUp
    look_down: jnp.ndarray  # ArrowDown
    look_left: jnp.ndarray  # ArrowLeft
    look_right: jnp.ndarray  # ArrowRight
    mouse_dx: jnp.ndarray  # pointer-look delta (pixels this frame)
    mouse_dy: jnp.ndarray

    @staticmethod
    def from_keys(keys=(), mouse_dx=0.0, mouse_dy=0.0) -> "CameraInputs":
        keys = {str(k).lower() for k in keys}
        b = lambda k: jnp.asarray(k in keys, dtype=jnp.float32)  # noqa: E731
        return CameraInputs(
            forward=b("w"), back=b("s"), left=b("a"), right=b("d"),
            up=b(" "), down=b("shift"),
            look_up=b("arrowup"), look_down=b("arrowdown"),
            look_left=b("arrowleft"), look_right=b("arrowright"),
            mouse_dx=jnp.float32(mouse_dx), mouse_dy=jnp.float32(mouse_dy),
        )


def update_camera(cam: Camera, inputs: CameraInputs, dt) -> Camera:
    """Pure integrator, semantics of js/camera.js:23-53 plus the pointer-look
    path of js/main.js:108-118.

    - Arrow keys look (sensitivity * dt); mouse look (sensitivity * 0.002/px).
    - Pitch clamped to +/-(pi/2 - 0.1); yaw wrapped to [-pi, pi].
    - WASD moves on the XZ plane relative to yaw ("Minecraft-style");
      note the reference's `right` basis is (sin yaw, 0, -cos yaw) and the
      A/D handed-ness follows it exactly (A adds `right`, D subtracts).
    - Space/Shift move on world Y.
    """
    dt = jnp.float32(dt)
    look_step = cam.sensitivity * dt
    mouse_sens = cam.sensitivity * jnp.float32(0.002)

    pitch = cam.pitch + look_step * (inputs.look_up - inputs.look_down)
    yaw = cam.yaw + look_step * (inputs.look_right - inputs.look_left)
    yaw = yaw + inputs.mouse_dx * mouse_sens
    pitch = pitch - inputs.mouse_dy * mouse_sens

    lim = jnp.float32(_PITCH_LIMIT)
    pitch = jnp.clip(pitch, -lim, lim)
    pi = jnp.float32(math.pi)
    yaw = jnp.where(yaw > pi, yaw - 2 * pi, yaw)
    yaw = jnp.where(yaw < -pi, yaw + 2 * pi, yaw)

    move = cam.speed * dt
    fwd = jnp.stack([jnp.cos(yaw), jnp.float32(0.0), jnp.sin(yaw)])
    right = jnp.stack([jnp.sin(yaw), jnp.float32(0.0), -jnp.cos(yaw)])
    pos = cam.pos
    pos = pos + fwd * (move * (inputs.forward - inputs.back))
    pos = pos + right * (move * (inputs.left - inputs.right))
    pos = pos.at[1].add(move * (inputs.up - inputs.down))

    return cam.replace(pos=pos, yaw=yaw, pitch=pitch)


def camera_basis(yaw, pitch, fov_y):
    """Orthonormal camera frame used by every backend (contract 4).

    Returns (uu, vv, ww, focal): ww = look dir, uu = right, vv = up,
    focal = 1/tan(fovY/2) (ref: pathtrace_shader.js:195-201)."""
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    ww = jnp.stack([cp * cy, sp, cp * sy])
    ww = ww / jnp.linalg.norm(ww)
    up = jnp.array([0.0, 1.0, 0.0], dtype=jnp.float32)
    uu = jnp.cross(ww, up)
    nu = jnp.linalg.norm(uu)
    # Degenerate straight-up/down guard (ref: `if (length(uu) < 1e-3)`).
    uu = jnp.where(nu < 1e-3, jnp.array([1.0, 0.0, 0.0], dtype=jnp.float32), uu / jnp.maximum(nu, 1e-20))
    vv = jnp.cross(uu, ww)
    vv = vv / jnp.linalg.norm(vv)
    focal = 1.0 / jnp.maximum(1e-6, jnp.tan(0.5 * fov_y))
    return uu, vv, ww, focal


def primary_ray_dirs(cam: Camera, rows: int, cols: int, pixel_aspect: float,
                     jitter: jnp.ndarray | None = None,
                     row_lo=0, n_rows: int | None = None):
    """Per-cell primary ray directions, f32 [rows, cols, 3], row 0 = top.

    Mirrors the tracers' NDC mapping (pathtrace_shader.js:187-201,
    raytrace_shader.js:198-210): GL fragCoord has y=0 at the bottom and the
    readback is Y-flipped, so top row r maps to gl y = rows-1-r.

      p = -1 + 2 * (pix + 0.5) / res;   p.x *= (cols/rows) * pixel_aspect
      rd = normalize(p.x*uu + p.y*vv + focal*ww)

    ``jitter`` (optional, [band, cols, 2]) is added to p (anti-aliasing
    offsets, already scaled by the caller).

    ``row_lo``/``n_rows`` select the horizontal band
    [row_lo, row_lo + n_rows) of the GLOBAL rows x cols grid (row-band
    spatial sharding, parallel.mesh.render_rows_sharded): the aspect and
    NDC mapping stay those of the full grid, so the concatenated bands
    are bit-identical to the unsharded render. n_rows must be static;
    row_lo may be traced (e.g. lax.axis_index). Default = full grid.
    """
    band = rows if n_rows is None else n_rows
    uu, vv, ww, focal = camera_basis(cam.yaw, cam.pitch, cam.fov_y)
    aspect = jnp.float32(cols / rows) * jnp.float32(pixel_aspect)
    x = (jnp.arange(cols, dtype=jnp.float32) + 0.5) / jnp.float32(cols)
    y_gl = (jnp.arange(rows, dtype=jnp.float32)[::-1] + 0.5) / jnp.float32(rows)
    if n_rows is not None:
        y_gl = jax.lax.dynamic_slice_in_dim(y_gl, row_lo, n_rows)
    px = (-1.0 + 2.0 * x)[None, :] * aspect
    py = (-1.0 + 2.0 * y_gl)[:, None]
    px = jnp.broadcast_to(px, (band, cols))
    py = jnp.broadcast_to(py, (band, cols))
    if jitter is not None:
        px = px + jitter[..., 0]
        py = py + jitter[..., 1]
    rd = (px[..., None] * uu + py[..., None] * vv + focal * ww)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return rd
