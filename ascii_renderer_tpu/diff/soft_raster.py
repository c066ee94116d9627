"""Differentiable soft rasterizer (BASELINE config 5): gradients through
luminance -> glyph assignment for inverse ASCII rendering.

The hard rasterizer (backends/raster.py) uses argmin z-tests and boolean
coverage — zero gradients. This variant replaces them with the standard
soft-rasterization relaxations:

  - coverage: sigmoid(signed_edge_distance^2 / sigma) per triangle
    (probability the pixel is inside);
  - occlusion: softmax aggregation over triangles weighted by coverage and
    inverse depth (temperature gamma), with a background slot;
  - glyph assignment: a temperature-softmax over ramp indices centered on
    the hard quantization rule, so "which glyph does this cell get" is
    differentiable (straight-through to the exact rule at tau -> 0).

No near clipping: the soft path assumes all vertices in front of the camera
(document: inverse-rendering scenes are authored that way). The hard
quantization this relaxes is core/quantize.py's contract-3 rule.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ascii_renderer_tpu.backends.raster import camera_mvp
from ascii_renderer_tpu.core.camera import Camera


def soft_render(verts, colors, faces, cam: Camera, rows: int, cols: int,
                pixel_aspect: float = 1.0, *, sigma: float = 1e-2,
                gamma: float = 1e-2, bg_color=(0.0, 0.0, 0.0)):
    """Render [rows, cols, 3] differentiably.

    Args:
      verts: f32 [V, 3] world positions (differentiable).
      colors: f32 [V, 3] per-vertex colors (differentiable).
      faces: i32 [T, 3] triangle indices (static).
      sigma: edge softness in NDC^2 units; gamma: depth softmax temperature.
    """
    mvp = camera_mvp(cam, rows, cols, pixel_aspect)
    v4 = jnp.concatenate([verts, jnp.ones_like(verts[:, :1])], axis=1)
    clip = v4 @ mvp.T  # [V, 4]
    w = jnp.maximum(clip[:, 3:4], 1e-6)
    ndc = clip[:, :3] / w  # [V, 3]

    tv = ndc[faces]  # [T, 3, 3] (x, y, z_ndc)
    tc = colors[faces]  # [T, 3, 3]

    # pixel centers in NDC
    xs = (jnp.arange(cols, dtype=jnp.float32) + 0.5) / cols * 2.0 - 1.0
    ys = 1.0 - (jnp.arange(rows, dtype=jnp.float32) + 0.5) / rows * 2.0
    px = xs[None, :]  # [1, W]
    py = ys[:, None]  # [H, 1]

    x0, y0 = tv[:, 0, 0], tv[:, 0, 1]
    x1, y1 = tv[:, 1, 0], tv[:, 1, 1]
    x2, y2 = tv[:, 2, 0], tv[:, 2, 1]

    def edge(ax, ay, bx, by):
        # cross(b-a, p-a) over the pixel grid -> [T, H, W]
        return ((bx - ax)[:, None, None] * (py - ay[:, None, None])
                - (by - ay)[:, None, None] * (px - ax[:, None, None]))

    w0 = edge(x1, y1, x2, y2)
    w1 = edge(x2, y2, x0, y0)
    w2 = edge(x0, y0, x1, y1)
    area = w0 + w1 + w2  # [T, H, W] constant per tri
    area_safe = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
    b0, b1, b2 = w0 / area_safe, w1 / area_safe, w2 / area_safe

    inside_margin = jnp.minimum(jnp.minimum(b0, b1), b2)  # >0 inside
    # signed squared distance surrogate (SoftRas-style): d = sign * margin^2
    cov = jax.nn.sigmoid(jnp.sign(inside_margin) * inside_margin ** 2 / sigma)

    # barycentric depth + color (screen-space interp; soft variant skips
    # perspective correction for smoothness — standard in SoftRas).
    # Outside a triangle raw barycentrics extrapolate unboundedly and would
    # leak huge colors through small-but-nonzero softmax weights; clamp to
    # the simplex (clip + renormalize) so attributes stay in the convex hull
    # of the vertex values while gradients still flow.
    c0 = jnp.clip(b0, 0.0, 1.0)
    c1 = jnp.clip(b1, 0.0, 1.0)
    c2 = jnp.clip(b2, 0.0, 1.0)
    norm = jnp.maximum(c0 + c1 + c2, 1e-6)
    c0, c1, c2 = c0 / norm, c1 / norm, c2 / norm
    zpix = (c0 * tv[:, 0, 2][:, None, None] + c1 * tv[:, 1, 2][:, None, None]
            + c2 * tv[:, 2, 2][:, None, None])  # [T, H, W] ndc z in [-1, 1]
    cpix = (c0[..., None] * tc[:, None, None, 0]
            + c1[..., None] * tc[:, None, None, 1]
            + c2[..., None] * tc[:, None, None, 2])  # [T, H, W, 3]

    # softmax aggregation over triangles + background slot
    zinv = (1.0 - jnp.clip(zpix, -1.0, 1.0)) * 0.5  # 1 = near, 0 = far
    logits = zinv / gamma + jnp.log(jnp.clip(cov, 1e-12, 1.0))
    bg_logit = jnp.zeros_like(logits[:1])  # background at far plane, cov ~ e^0
    all_logits = jnp.concatenate([logits, bg_logit], axis=0)  # [T+1, H, W]
    wgt = jax.nn.softmax(all_logits, axis=0)
    bg = jnp.asarray(bg_color, jnp.float32)
    all_colors = jnp.concatenate(
        [cpix, jnp.broadcast_to(bg, (1, rows, cols, 3))], axis=0)
    return jnp.einsum("thw,thwc->hwc", wgt, all_colors)


def soft_glyph_probs(rgb, ramp_len: int, tau: float = 0.05):
    """Differentiable glyph assignment: probabilities over ramp indices.

    Relaxes the hard rule idx = round(intensity/255*(L-1)) (core/quantize)
    into softmax(-(x*(L-1) - k)^2 / tau); argmax at any tau equals the hard
    rule away from bin boundaries."""
    lum = jnp.mean(rgb, axis=-1)  # [0, 1]
    x = jnp.clip(lum, 0.0, 1.0 - 1e-6) * (ramp_len - 1)
    k = jnp.arange(ramp_len, dtype=jnp.float32)
    d2 = (x[..., None] - k) ** 2
    return jax.nn.softmax(-d2 / tau, axis=-1)


def soft_luminance_loss(rgb, target_rgb, ramp_len: int = 10,
                        tau: float = 0.05, glyph_weight: float = 0.1):
    """Inverse-ASCII-rendering loss: pixel MSE + glyph-distribution
    cross-entropy against the target's HARD glyph assignment."""
    mse = jnp.mean((rgb - target_rgb) ** 2)
    probs = soft_glyph_probs(rgb, ramp_len, tau)
    tx = jnp.clip(jnp.mean(target_rgb, -1), 0.0, 1.0 - 1e-6) * (ramp_len - 1)
    tidx = jnp.clip(jnp.floor(tx + 0.5), 0, ramp_len - 1).astype(jnp.int32)
    onehot = jax.nn.one_hot(tidx, ramp_len)
    ce = -jnp.mean(jnp.sum(onehot * jnp.log(jnp.clip(probs, 1e-12, 1.0)), -1))
    return mse + glyph_weight * ce
