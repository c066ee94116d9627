"""Vectorized ray-primitive intersections — the shared geometry library.

The reference carries three near-identical GLSL copies of these routines
(shader_utils.js:28-58, raytrace_shader.js:89-125, plus the dead
tracing_common.js). Here there is ONE batched implementation used by every
backend, exactly as the dead shared library intended (SURVEY §2 row 22).

Conventions (matching the GLSL):
  - rays:  ro [..., 3] origin, rd [..., 3] unit direction
  - prims: struct-of-arrays, padded; a `valid` mask disables padding slots
  - a miss is t = +inf (the GLSL uses -1 + `t > eps` guards; an inf-miss
    composes better with argmin selection and is behaviorally identical)
  - sphere hit: nearest root greater than eps, else the far root
    (shader_utils.js:28-40)
  - triangle: Moller-Trumbore with |det| < 1e-6 reject, normal flipped
    against the ray (shader_utils.js:43-58)
"""

from __future__ import annotations

import jax.numpy as jnp

BIG = jnp.float32(1e30)  # "no hit" sentinel (compares like the GLSL 1e20 init)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def ray_spheres(ro, rd, centers, radii, valid, eps):
    """ro,rd [...,3]; centers [S,3]; radii [S]; valid [S] -> t [...,S]."""
    oc = ro[..., None, :] - centers  # [..., S, 3]
    b = _dot(oc, rd[..., None, :])
    c = _dot(oc, oc) - radii * radii
    h = b * b - c
    s = jnp.sqrt(jnp.maximum(h, 0.0))
    t1 = -b - s
    t2 = -b + s
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, BIG))
    t = jnp.where((h >= 0.0) & valid, t, BIG)
    return t


def sphere_normal(pos, center, radius):
    """(pos - center)/max(r, 1e-6) (shader_utils.js:41)."""
    return (pos - center) / jnp.maximum(radius, 1e-6)[..., None]


def ray_planes(ro, rd, normals, ds, valid, eps):
    """Plane n.x + d = 0 (raytrace_shader.js:104-109). Returns t [..., P]."""
    denom = _dot(normals, rd[..., None, :])  # [..., P]
    t = (-ds - _dot(normals, ro[..., None, :])) / jnp.where(
        jnp.abs(denom) < 1e-6, 1.0, denom)
    miss = (jnp.abs(denom) < 1e-6) | (t <= eps) | jnp.logical_not(valid)
    return jnp.where(miss, BIG, t)


def ray_triangles(ro, rd, va, vb, vc, valid, eps):
    """Moller-Trumbore. va/vb/vc [T,3] -> (t [...,T], n [...,T,3], bc [...,T,3]).

    The returned geometric normal is unit length and flipped to face the ray
    origin side (dot(n, rd) <= 0), as in shader_utils.js:54-56.
    """
    e1 = vb - va  # [T, 3]
    e2 = vc - va
    rdx = rd[..., None, :]  # [..., 1->T, 3]
    p = jnp.cross(rdx, e2)  # [..., T, 3]
    det = _dot(e1, p)
    bad_det = jnp.abs(det) < 1e-6
    inv_det = 1.0 / jnp.where(bad_det, 1.0, det)
    tv = ro[..., None, :] - va
    u = _dot(tv, p) * inv_det
    q = jnp.cross(tv, e1)
    v = _dot(rdx, q) * inv_det
    tt = _dot(e2, q) * inv_det
    miss = (bad_det | (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
            | (tt <= eps) | jnp.logical_not(valid))
    t = jnp.where(miss, BIG, tt)

    n = jnp.cross(e1, e2)  # [T, 3]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    n = jnp.broadcast_to(n, t.shape + (3,))
    flip = _dot(n, rdx) > 0.0
    n = jnp.where(flip[..., None], -n, n)
    bc = jnp.stack([1.0 - u - v, u, v], axis=-1)
    return t, n, bc


def reflect(rd, n):
    return rd - 2.0 * _dot(rd, n)[..., None] * n


def refract(rd, n, eta):
    """GLSL refract(): returns zero vector on total internal reflection.
    ``eta`` may be a scalar or an array batched like the rays."""
    eta = jnp.asarray(eta)
    cosi = _dot(n, rd)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    out = (eta[..., None] * rd
           - (eta * cosi + jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n)
    return jnp.where(tir[..., None], 0.0, out), tir
