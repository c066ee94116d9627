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


FPS_MAX_DIGITS = 7  # int32-safe; the reference prints String(fps) unbounded


def fps_plane(fps, rows: int, cols: int):
    """FPS counter bottom-right (renderUI:140-147): decimal digits of
    round(fps), right-aligned at x = cols - len - 1, y = rows - 1.

    Digit count follows the value like the reference's String(fps)
    (an earlier 4-digit clamp misreported this framework's own measured
    rates, e.g. >8000 FPS on the cube config). Values are clamped at
    10^FPS_MAX_DIGITS - 1 to stay int32-exact."""
    nd = FPS_MAX_DIGITS
    f = jnp.clip(jnp.round(fps).astype(jnp.int32), 0, 10 ** nd - 1)
    pows = 10 ** jnp.arange(nd - 1, -1, -1)  # [10^(nd-1) ... 1]
    digits = (f // pows) % 10
    ndig = 1 + jnp.sum((f >= pows[:-1]).astype(jnp.int32))
    start_x = cols - ndig - 1
    chars = jnp.zeros((rows, cols), jnp.uint8)
    mask = jnp.zeros((rows, cols), bool)
    xg = jnp.arange(cols)
    # digit at column x is digits[nd - ndig + (x - start_x)]
    di = nd - ndig + (xg - start_x)
    sel = (xg >= start_x) & (xg < start_x + ndig)
    dchar = (jnp.asarray(ord("0"), jnp.uint8)
             + digits[jnp.clip(di, 0, nd - 1)].astype(jnp.uint8))
    chars = chars.at[rows - 1].set(jnp.where(sel, dchar, 0))
    mask = mask.at[rows - 1].set(sel)
    return chars, mask


def _bresenham_circle_points(cx, cy, r):
    """Midpoint-circle cells as COORDINATE LISTS — the exact integer
    Bresenham variant of drawCircleOnBuffer (renderer.js:108-123).

    Marches ALL ripples together ([M] scalar carries) and collects the
    8-way symmetric points into a [steps, 8, M] buffer; the caller does
    ONE scatter. The earlier form scattered 8 cells into the full [H, W]
    mask per step per ripple — 26 ms/frame at 960x540 (the scatter copies
    dominate); point collection + one scatter is ~0.3 ms.

    cx/cy/r: i32 [M]. Returns (px, py, on) each i32/bool [steps, 8, M]
    (`on` = the cell was emitted while the march was active)."""
    M = cx.shape[0]
    steps = _MAX_BRESENHAM_STEPS

    def body(i, st):
        x, y, err, pxb, pyb, onb = st
        active = x >= y
        pxs, pys = [], []
        for sx, sy, swap in ((1, 1, False), (1, 1, True), (-1, 1, True),
                             (-1, 1, False), (-1, -1, False), (-1, -1, True),
                             (1, -1, True), (1, -1, False)):
            dx, dy = (y, x) if swap else (x, y)
            pxs.append(cx + sx * dx)
            pys.append(cy + sy * dy)
        pxb = jax.lax.dynamic_update_slice(pxb, jnp.stack(pxs)[None],
                                           (i, 0, 0))
        pyb = jax.lax.dynamic_update_slice(pyb, jnp.stack(pys)[None],
                                           (i, 0, 0))
        onb = jax.lax.dynamic_update_slice(
            onb, jnp.broadcast_to(active, (1, 8, M)), (i, 0, 0))

        # JS: if (err <= 0) { y++; err += 2*y+1; }  — err uses the NEW y
        #     if (err > 0)  { x--; err -= 2*x+1; }  — err uses the NEW x
        y2 = jnp.where(err <= 0, y + 1, y)
        err2 = jnp.where(err <= 0, err + 2 * y2 + 1, err)
        x2 = jnp.where(err2 > 0, x - 1, x)
        err3 = jnp.where(err2 > 0, err2 - 2 * x2 - 1, err2)
        x2 = jnp.where(active, x2, x)
        y2 = jnp.where(active, y2, y)
        err3 = jnp.where(active, err3, err)
        return x2, y2, err3, pxb, pyb, onb

    zero = jnp.zeros((M,), jnp.int32)
    init = (r, zero, zero,
            jnp.zeros((steps, 8, M), jnp.int32),
            jnp.zeros((steps, 8, M), jnp.int32),
            jnp.zeros((steps, 8, M), bool))
    _x, _y, _e, pxb, pyb, onb = jax.lax.fori_loop(0, steps, body, init)
    return pxb, pyb, onb


def ripples_plane(ripples, n_ripples, time_ms, ripple_speed, max_radius,
                  rows: int, cols: int):
    """Expanding '*' circles (renderUI:150-157): radius = age * speed.

    ripples: f32 [MAX_RIPPLES, 3] = (x, y, start_time_ms). Effects whose
    radius exceeds ``max_radius`` are skipped (the reference never expires
    effects and lets them grow forever — a leak we fix deliberately;
    config.MAX_RIPPLE_RADIUS existed for exactly this)."""
    cx = jnp.round(ripples[:, 0]).astype(jnp.int32)
    cy = jnp.round(ripples[:, 1]).astype(jnp.int32)
    age = time_ms - ripples[:, 2]
    radius = age * ripple_speed
    live = ((jnp.arange(MAX_RIPPLES) < n_ripples)
            & (radius >= 0.0) & (radius <= max_radius))
    r = jnp.round(radius).astype(jnp.int32)
    px, py, on = _bresenham_circle_points(cx, cy, r)
    ok = (on & live[None, None, :]
          & (px >= 0) & (px < cols) & (py >= 0) & (py < rows))
    mask = jnp.zeros((rows, cols), bool).at[
        jnp.clip(py, 0, rows - 1).reshape(-1),
        jnp.clip(px, 0, cols - 1).reshape(-1)].max(ok.reshape(-1))
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
