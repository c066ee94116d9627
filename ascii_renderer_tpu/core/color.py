"""Color packing + small math helpers (ref: js/utils.js)."""

from __future__ import annotations

import jax.numpy as jnp


def pack_color(r, g, b):
    """(r,g,b) bytes -> 0xRRGGBB int (ref: js/utils.js:2-4)."""
    r = jnp.asarray(r, dtype=jnp.int32)
    g = jnp.asarray(g, dtype=jnp.int32)
    b = jnp.asarray(b, dtype=jnp.int32)
    return (r << 16) | (g << 8) | b


def unpack_color(packed):
    """0xRRGGBB -> (r,g,b) bytes (ref: js/utils.js:5-11)."""
    p = jnp.asarray(packed, dtype=jnp.int32)
    return (p >> 16) & 255, (p >> 8) & 255, p & 255


def normalize(v, eps=1e-20):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)
