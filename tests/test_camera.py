"""Camera pytree + integrator semantics (ref: js/camera.js:23-53)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from ascii_renderer_tpu.core.camera import (
    Camera, CameraInputs, camera_basis, primary_ray_dirs, update_camera,
)


def test_wasd_xz_plane():
    cam = Camera.create(pos=(0, 0, 0), yaw=0.0, speed=2.0)
    out = update_camera(cam, CameraInputs.from_keys({"w"}), dt=0.5)
    # yaw=0 -> forward = (cos 0, 0, sin 0) = +x
    np.testing.assert_allclose(np.asarray(out.pos), [1.0, 0.0, 0.0], atol=1e-6)

    # A adds `right` = (sin yaw, 0, -cos yaw) — reference handed-ness.
    out = update_camera(cam, CameraInputs.from_keys({"a"}), dt=0.5)
    np.testing.assert_allclose(np.asarray(out.pos), [0.0, 0.0, -1.0], atol=1e-6)


def test_vertical_and_look_clamp_wrap():
    cam = Camera.create(pos=(0, 0, 0), pitch=1.4, sensitivity=1.0)
    out = update_camera(cam, CameraInputs.from_keys({"arrowup"}), dt=1.0)
    lim = math.pi / 2 - 0.1
    assert abs(float(out.pitch) - lim) < 1e-6  # clamped

    cam = Camera.create(yaw=3.1, sensitivity=1.0)
    out = update_camera(cam, CameraInputs.from_keys({"arrowright"}), dt=0.2)
    assert float(out.yaw) < math.pi  # wrapped to [-pi, pi]
    assert abs(float(out.yaw) - (3.3 - 2 * math.pi)) < 1e-5

    cam = Camera.create(pos=(0, 0, 0))
    out = update_camera(cam, CameraInputs.from_keys({" "}), dt=1.0)
    assert float(out.pos[1]) > 0


def test_update_is_jittable():
    cam = Camera.create()
    ins = CameraInputs.from_keys({"w", "arrowleft"})
    a = update_camera(cam, ins, 0.016)
    b = jax.jit(update_camera)(cam, ins, jnp.float32(0.016))
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-6)
    np.testing.assert_allclose(float(a.yaw), float(b.yaw), atol=1e-6)


def test_camera_basis_orthonormal():
    uu, vv, ww, focal = camera_basis(jnp.float32(0.7), jnp.float32(0.3),
                                     jnp.float32(80 * math.pi / 180))
    for v in (uu, vv, ww):
        assert abs(float(jnp.linalg.norm(v)) - 1.0) < 1e-6
    assert abs(float(jnp.dot(uu, ww))) < 1e-6
    assert abs(float(jnp.dot(vv, ww))) < 1e-6
    # look vector matches contract 4
    want = np.array([math.cos(0.3) * math.cos(0.7), math.sin(0.3),
                     math.cos(0.3) * math.sin(0.7)])
    np.testing.assert_allclose(np.asarray(ww), want, atol=1e-6)
    assert abs(float(focal) - 1 / math.tan(0.5 * 80 * math.pi / 180)) < 1e-6


def test_primary_rays_center_and_orientation():
    cam = Camera.create(pos=(0, 0, 0), yaw=0.0, pitch=0.0)
    rows, cols = 9, 16
    rd = primary_ray_dirs(cam, rows, cols, pixel_aspect=1.0)
    assert rd.shape == (rows, cols, 3)
    # top row must look UP relative to bottom row (row 0 = top).
    assert float(rd[0, cols // 2, 1]) > float(rd[-1, cols // 2, 1])
    # facing +x: uu = cross(ww,(0,1,0)) = (0,0,1) -> screen-right means +z.
    assert float(rd[rows // 2, -1, 2]) > float(rd[rows // 2, 0, 2])
    # all unit length
    n = jnp.linalg.norm(rd, axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-5)
