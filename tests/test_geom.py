"""Analytic intersection tests (geometry library shared by all backends;
reference routines at shader_utils.js:28-58, raytrace_shader.js:89-125)."""

import numpy as np
import jax.numpy as jnp

from ascii_renderer_tpu.geom import intersect as gi

EPS = 1e-4


def _one(x):
    return jnp.asarray([x], dtype=jnp.float32)


def test_sphere_hit_front_back_inside():
    ro = jnp.asarray([0.0, 0.0, 5.0])
    rd = jnp.asarray([0.0, 0.0, -1.0])
    centers = jnp.asarray([[0.0, 0.0, 0.0]])
    radii = jnp.asarray([1.0])
    valid = jnp.asarray([True])
    t = gi.ray_spheres(ro, rd, centers, radii, valid, EPS)
    assert abs(float(t[0]) - 4.0) < 1e-5  # near root

    # inside the sphere -> far root
    t = gi.ray_spheres(jnp.asarray([0.0, 0.0, 0.0]), rd, centers, radii, valid, EPS)
    assert abs(float(t[0]) - 1.0) < 1e-5

    # behind -> miss
    t = gi.ray_spheres(ro, jnp.asarray([0.0, 0.0, 1.0]), centers, radii, valid, EPS)
    assert float(t[0]) > 1e29

    # invalid slot -> miss even on a hit path
    t = gi.ray_spheres(ro, rd, centers, radii, jnp.asarray([False]), EPS)
    assert float(t[0]) > 1e29


def test_sphere_tangent_and_normal():
    ro = jnp.asarray([1.0, 0.0, 5.0])  # grazing x=1
    rd = jnp.asarray([0.0, 0.0, -1.0])
    t = gi.ray_spheres(ro, rd, jnp.asarray([[0.0, 0.0, 0.0]]),
                       jnp.asarray([1.0]), jnp.asarray([True]), EPS)
    assert abs(float(t[0]) - 5.0) < 1e-2  # tangent point at z=0
    n = gi.sphere_normal(jnp.asarray([0.0, 0.0, 1.0]),
                         jnp.asarray([[0.0, 0.0, 0.0]]), jnp.asarray([1.0]))
    np.testing.assert_allclose(np.asarray(n)[0], [0, 0, 1], atol=1e-6)


def test_plane():
    ro = jnp.asarray([0.0, 2.0, 0.0])
    rd = jnp.asarray([0.0, -1.0, 0.0])
    t = gi.ray_planes(ro, rd, jnp.asarray([[0.0, 1.0, 0.0]]),
                      jnp.asarray([0.0]), jnp.asarray([True]), EPS)
    assert abs(float(t[0]) - 2.0) < 1e-6
    # parallel -> miss
    t = gi.ray_planes(ro, jnp.asarray([1.0, 0.0, 0.0]),
                      jnp.asarray([[0.0, 1.0, 0.0]]), jnp.asarray([0.0]),
                      jnp.asarray([True]), EPS)
    assert float(t[0]) > 1e29


def test_triangle_moller_trumbore():
    va = jnp.asarray([[0.0, 0.0, 0.0]])
    vb = jnp.asarray([[2.0, 0.0, 0.0]])
    vc = jnp.asarray([[0.0, 2.0, 0.0]])
    valid = jnp.asarray([True])
    ro = jnp.asarray([0.5, 0.5, 3.0])
    rd = jnp.asarray([0.0, 0.0, -1.0])
    t, n, bc = gi.ray_triangles(ro, rd, va, vb, vc, valid, 1e-3)
    assert abs(float(t[0]) - 3.0) < 1e-5
    # normal faces the ray origin (flipped against rd)
    np.testing.assert_allclose(np.asarray(n)[0], [0, 0, 1], atol=1e-6)
    # barycentrics (1-u-v, u, v) at (0.5, 0.5): u=0.25, v=0.25
    np.testing.assert_allclose(np.asarray(bc)[0], [0.5, 0.25, 0.25], atol=1e-5)

    # outside -> miss
    t, _, _ = gi.ray_triangles(jnp.asarray([3.0, 3.0, 3.0]), rd, va, vb, vc,
                               valid, 1e-3)
    assert float(t[0]) > 1e29

    # edge-parallel (det ~ 0) -> miss, no NaN
    t, _, _ = gi.ray_triangles(jnp.asarray([0.5, 0.5, 3.0]),
                               jnp.asarray([1.0, 0.0, 0.0]), va, vb, vc,
                               valid, 1e-3)
    assert np.isfinite(float(t[0])) and float(t[0]) > 1e29


def test_reflect_refract():
    rd = jnp.asarray([[0.70710678, -0.70710678, 0.0]])
    n = jnp.asarray([[0.0, 1.0, 0.0]])
    r = gi.reflect(rd, n)
    np.testing.assert_allclose(np.asarray(r)[0], [0.70710678, 0.70710678, 0], atol=1e-6)

    # refraction air->glass bends toward normal; TIR case returns zero+flag
    out, tir = gi.refract(rd, n, jnp.float32(1.0 / 1.5))
    assert not bool(tir[0])
    assert abs(float(jnp.linalg.norm(out[0])) - 1.0) < 1e-5
    out, tir = gi.refract(jnp.asarray([[0.99, -0.141, 0.0]]), n, jnp.float32(1.5))
    assert bool(tir[0])
    np.testing.assert_allclose(np.asarray(out)[0], 0.0, atol=1e-7)
