"""Channel-form path-tracing core: rays on the 128-lane axis.

The naive vectorization of shader_utils.js's intersection loops produces
[..., P, 3] intermediates whose size-3 minor dimension occupies the TPU's
128-wide lane axis at 2% efficiency. Here every quantity is a flat channel:
rays are a flat [R] axis (R = batch*rows*cols) riding the lanes, primitives
ride the sublanes ([P, R] candidate matrices), and vectors are triples of
scalar channels. Same math as geom/intersect.py (the readable reference
implementation), full VPU utilization.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

BIG = 1e30


class V3(NamedTuple):
    """A vector field as three scalar channels (any broadcastable shape)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @staticmethod
    def of(arr):  # arr [..., 3]
        return V3(arr[..., 0], arr[..., 1], arr[..., 2])

    def stack(self):
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        return V3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __mul__(self, s):
        if isinstance(s, V3):
            return V3(self.x * s.x, self.y * s.y, self.z * s.z)
        return V3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def where(self, mask, other):
        return V3(jnp.where(mask, self.x, other.x),
                  jnp.where(mask, self.y, other.y),
                  jnp.where(mask, self.z, other.z))


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def cross(a: V3, b: V3) -> V3:
    return V3(a.y * b.z - a.z * b.y,
              a.z * b.x - a.x * b.z,
              a.x * b.y - a.y * b.x)


def normalize(a: V3, eps=1e-20) -> V3:
    inv = jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))
    return a * inv


def norm(a: V3):
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def gather(v: V3, idx) -> V3:
    return V3(v.x[idx], v.y[idx], v.z[idx])


# --------------------------------------------------------------------------
# Candidate-t computations: prims on sublanes, rays on lanes
# --------------------------------------------------------------------------
def spheres_t(ro: V3, rd: V3, center: V3, radius, valid, eps) -> jnp.ndarray:
    """ro/rd channels [R]; center channels [S] -> t [S, R]
    (shader_utils.js:28-40 semantics: near root if > eps else far root)."""
    oc = V3(ro.x[None, :] - center.x[:, None],
            ro.y[None, :] - center.y[:, None],
            ro.z[None, :] - center.z[:, None])  # [S, R]
    rdb = V3(rd.x[None, :], rd.y[None, :], rd.z[None, :])
    b = dot(oc, rdb)
    c = dot(oc, oc) - (radius * radius)[:, None]
    h = b * b - c
    s = jnp.sqrt(jnp.maximum(h, 0.0))
    t1 = -b - s
    t2 = -b + s
    t = jnp.where(t1 > eps, t1, jnp.where(t2 > eps, t2, BIG))
    return jnp.where((h >= 0.0) & valid[:, None], t, BIG)


class TriPack(NamedTuple):
    """Per-triangle constants, channels [T] (precomputed once per trace)."""

    a: V3
    e1: V3
    e2: V3
    valid: jnp.ndarray

    @staticmethod
    def build(va, vb, vc, valid) -> "TriPack":
        a = V3.of(va)
        return TriPack(a, V3.of(vb) - a, V3.of(vc) - a, valid)


def tris_t(ro: V3, rd: V3, pack: TriPack, eps) -> jnp.ndarray:
    """Moller-Trumbore t-only: -> t [T, R]."""
    def b(ch):  # tri channel [T] -> [T, 1]
        return ch[:, None]

    def r(ch):  # ray channel [R] -> [1, R]
        return ch[None, :]

    e1 = V3(b(pack.e1.x), b(pack.e1.y), b(pack.e1.z))
    e2 = V3(b(pack.e2.x), b(pack.e2.y), b(pack.e2.z))
    av = V3(b(pack.a.x), b(pack.a.y), b(pack.a.z))
    rdb = V3(r(rd.x), r(rd.y), r(rd.z))
    rob = V3(r(ro.x), r(ro.y), r(ro.z))

    p = cross(rdb, e2)  # [T, R]
    det = dot(e1, p)
    bad = jnp.abs(det) < 1e-6
    inv = 1.0 / jnp.where(bad, 1.0, det)
    tv = rob - av
    u = dot(tv, p) * inv
    q = cross(tv, e1)
    v = dot(rdb, q) * inv
    tt = dot(e2, q) * inv
    miss = (bad | (u < 0.0) | (u > 1.0) | (v < 0.0) | (u + v > 1.0)
            | (tt <= eps) | jnp.logical_not(pack.valid[:, None]))
    return jnp.where(miss, BIG, tt)


def tri_hit_info(ro: V3, rd: V3, a: V3, e1: V3, e2: V3):
    """Per-ray hit info for a SINGLE (already-selected) triangle per ray:
    returns (n: V3 unit, flipped against rd; bc0, bc1, bc2). All inputs are
    per-ray channels [R]."""
    p = cross(rd, e2)
    det = dot(e1, p)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tv = ro - a
    u = dot(tv, p) * inv
    q = cross(tv, e1)
    v = dot(rd, q) * inv
    n = normalize(cross(e1, e2))
    flip = dot(n, rd) > 0.0
    n = V3(jnp.where(flip, -n.x, n.x), jnp.where(flip, -n.y, n.y),
           jnp.where(flip, -n.z, n.z))
    return n, 1.0 - u - v, u, v


def reflect(rd: V3, n: V3) -> V3:
    d = dot(rd, n)
    return V3(rd.x - 2.0 * d * n.x, rd.y - 2.0 * d * n.y, rd.z - 2.0 * d * n.z)


def refract(rd: V3, n: V3, eta):
    """GLSL refract: zero vector on TIR."""
    cosi = dot(n, rd)
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    tir = k < 0.0
    f = eta * cosi + jnp.sqrt(jnp.maximum(k, 0.0))
    out = V3(eta * rd.x - f * n.x, eta * rd.y - f * n.y, eta * rd.z - f * n.z)
    zero = V3(jnp.zeros_like(out.x), jnp.zeros_like(out.y),
              jnp.zeros_like(out.z))
    return out.where(jnp.logical_not(tir), zero), tir
