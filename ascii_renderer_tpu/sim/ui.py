"""UI text layer: pi-digit border, FPS readout, click ripples
(ref: js/renderer.js renderUI:125-159).

The reference rebuilds a char-or-null JS array grid per frame on the CPU.
Here the UI layer is a pure device program producing (chars u8 [H,W],
mask bool [H,W]) that the compositor burns into the frame's alpha plane
(`Frame.with_overrides`, the applyUIToFrameRGBA analog).

Draw order matches the reference exactly: border, then FPS (overwrites the
border bottom-right), then ripples on top.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ascii_renderer_tpu.core.config import Config

MAX_RIPPLES = 16
_MAX_BRESENHAM_STEPS = 128  # covers radius <= ~180 (max radius is 100)


def border_plane(cfg: Config, rows: int, cols: int):
    """Static pi-digit border (renderUI:130-137) — precomputed host-side
    once per grid size and baked into the jitted program as a constant."""
    chars = np.zeros((rows, cols), np.uint8)
    mask = np.zeros((rows, cols), bool)
    pi = cfg.pi_digits
    n = len(pi)
    for x in range(cols):
        c = ord(pi[x % n])
        chars[0, x] = c
        mask[0, x] = True
        chars[rows - 1, x] = c
        mask[rows - 1, x] = True
    for y in range(rows):
        c = ord(pi[y % n])
        chars[y, 0] = c
        mask[y, 0] = True
        chars[y, cols - 1] = c
        mask[y, cols - 1] = True
    return jnp.asarray(chars), jnp.asarray(mask)


def fps_plane(fps, rows: int, cols: int):
    """FPS counter bottom-right (renderUI:140-147): decimal digits of
    round(fps), right-aligned at x = cols - len - 1, y = rows - 1."""
    f = jnp.clip(jnp.round(fps).astype(jnp.int32), 0, 9999)
    digits = jnp.stack([f // 1000 % 10, f // 100 % 10, f // 10 % 10, f % 10])
    ndig = jnp.where(f >= 1000, 4, jnp.where(f >= 100, 3,
                     jnp.where(f >= 10, 2, 1)))
    start_x = cols - ndig - 1
    chars = jnp.zeros((rows, cols), jnp.uint8)
    mask = jnp.zeros((rows, cols), bool)
    xg = jnp.arange(cols)
    # digit at column x is digits[4 - ndig + (x - start_x)]
    di = 4 - ndig + (xg - start_x)
    sel = (xg >= start_x) & (xg < start_x + ndig)
    dchar = (jnp.asarray(ord("0"), jnp.uint8)
             + digits[jnp.clip(di, 0, 3)].astype(jnp.uint8))
    chars = chars.at[rows - 1].set(jnp.where(sel, dchar, 0))
    mask = mask.at[rows - 1].set(sel)
    return chars, mask


def _bresenham_circle_mask(cx, cy, r, rows: int, cols: int):
    """Midpoint-circle cells as a [rows, cols] mask — the exact integer
    Bresenham variant of drawCircleOnBuffer (renderer.js:108-123), run as a
    bounded fori_loop with 8-way scatter."""
    cx = jnp.round(cx).astype(jnp.int32)
    cy = jnp.round(cy).astype(jnp.int32)
    r = jnp.round(r).astype(jnp.int32)

    def body(_i, st):
        x, y, err, mask = st
        active = x >= y

        def put(m, px, py):
            ok = active & (px >= 0) & (px < cols) & (py >= 0) & (py < rows)
            return m.at[jnp.clip(py, 0, rows - 1),
                        jnp.clip(px, 0, cols - 1)].max(ok)

        for sx, sy, swap in ((1, 1, False), (1, 1, True), (-1, 1, True),
                             (-1, 1, False), (-1, -1, False), (-1, -1, True),
                             (1, -1, True), (1, -1, False)):
            dx, dy = (y, x) if swap else (x, y)
            mask = put(mask, cx + sx * dx, cy + sy * dy)

        # JS: if (err <= 0) { y++; err += 2*y+1; }  — err uses the NEW y
        #     if (err > 0)  { x--; err -= 2*x+1; }  — err uses the NEW x
        y2 = jnp.where(err <= 0, y + 1, y)
        err2 = jnp.where(err <= 0, err + 2 * y2 + 1, err)
        x2 = jnp.where(err2 > 0, x - 1, x)
        err3 = jnp.where(err2 > 0, err2 - 2 * x2 - 1, err2)
        x2 = jnp.where(active, x2, x)
        y2 = jnp.where(active, y2, y)
        err3 = jnp.where(active, err3, err)
        return x2, y2, err3, mask

    init = (r, jnp.int32(0), jnp.int32(0),
            jnp.zeros((rows, cols), bool))
    _x, _y, _e, mask = jax.lax.fori_loop(0, _MAX_BRESENHAM_STEPS, body, init)
    return mask


def ripples_plane(ripples, n_ripples, time_ms, ripple_speed, max_radius,
                  rows: int, cols: int):
    """Expanding '*' circles (renderUI:150-157): radius = age * speed.

    ripples: f32 [MAX_RIPPLES, 3] = (x, y, start_time_ms). Effects whose
    radius exceeds ``max_radius`` are skipped (the reference never expires
    effects and lets them grow forever — a leak we fix deliberately;
    config.MAX_RIPPLE_RADIUS existed for exactly this)."""
    mask = jnp.zeros((rows, cols), bool)
    for i in range(MAX_RIPPLES):
        age = time_ms - ripples[i, 2]
        radius = age * ripple_speed
        live = (i < n_ripples) & (radius >= 0.0) & (radius <= max_radius)
        m = _bresenham_circle_mask(ripples[i, 0], ripples[i, 1], radius,
                                   rows, cols)
        mask = mask | (m & live)
    chars = jnp.where(mask, jnp.uint8(ord("*")), jnp.uint8(0))
    return chars, mask


@functools.partial(jax.jit, static_argnames=("cfg", "rows", "cols"))
def ui_char_plane(cfg: Config, rows: int, cols: int, fps, ripples, n_ripples,
                  time_ms):
    """Full UI layer -> (chars u8 [H,W], mask bool [H,W])."""
    bc, bm = border_plane(cfg, rows, cols)
    fc, fm = fps_plane(fps, rows, cols)
    rc, rm = ripples_plane(ripples, n_ripples, time_ms, cfg.ripple_speed,
                           cfg.max_ripple_radius, rows, cols)
    chars = jnp.where(rm, rc, jnp.where(fm, fc, jnp.where(bm, bc, 0)))
    mask = bm | fm | rm
    return chars, mask
