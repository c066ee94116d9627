"""Shared raster infrastructure: tile geometry, row shading, cumsum.

Split out of backends/raster.py so the live 2DH/grouped pipeline
(raster.py), the clip-expansion channel generation (raster_channels.py)
and the retired oracle generations (raster_oracles.py) can share these
without import cycles. Every name here is re-exported by
``ascii_renderer_tpu.backends.raster`` — import from there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ascii_renderer_tpu.ops import mxu

from ascii_renderer_tpu.scene.builder import SceneData

NEAR, FAR = 0.05, 100.0
_DEFAULT_AMBIENT = (0.15, 0.18, 0.22)  # raster.js:66-69
_DEFAULT_DIR = (0.25, -1.0, 0.15)
_DEFAULT_DIR_COL = (1.2, 1.15, 1.1)

TILE_H, TILE_W = 8, 128  # f32-native VPU tile of the cell grid

MAX_V_CAP = (1 << 19) - 4096  # packed sort key leaves 19 bits for tri ids


def _round_up(x, q):
    return -(-x // q) * q


def _cumsum_i32(mask: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum of a bool/0-1 [N] array as i32, MXU-blocked.

    XLA's native 1-D cumsum lowers poorly on TPU at raster scales (measured
    2.2 ms at N=589k — as expensive as a full sort). Blocking into [N/512,
    512] rows and multiplying by a constant upper-triangular matrix runs the
    whole scan on the MXU in ~0.1 ms. Exact: counts < 2^24 are exact in f32
    and 0/1-mask dots are exact at any precision (ops/mxu.count_dot)."""
    n = mask.shape[0]
    c = 512
    pad = (-n) % c
    x = jnp.concatenate([mask.astype(jnp.float32),
                         jnp.zeros((pad,), jnp.float32)]).reshape(-1, c)
    triu = jnp.triu(jnp.ones((c, c), jnp.float32))  # M[j,i]=1 for j<=i
    row_cum = mxu.count_dot(
        x, triu, (((1,), (0,)), ((), ())))  # [R, C] within-row inclusive
    offs = jnp.cumsum(row_cum[:, -1]) - row_cum[:, -1]  # exclusive row offset
    out = (row_cum + offs[:, None]).reshape(-1)[:n]
    return out.astype(jnp.int32)


def shade_from_table(tid, table, scene: SceneData, rows: int, cols: int,
                     n_attrs: int = 9):
    """Per-pixel plane evaluation + reference fragment lighting.

    tid i32 [rows, cols] indexes rows of `table` [N+1, W] (plane-table
    rows + one trailing all-zero background row); -1 = background.
    n_attrs = 6 when the table was built without world-pos planes
    (lightless-scene specialization; point lights require 9)."""
    R_ = rows * cols
    tidf = tid.reshape(R_)
    g = table[jnp.where(tidf >= 0, tidf, table.shape[0] - 1)]  # [R, W]
    hit = tid >= 0
    px = jnp.broadcast_to((jnp.arange(cols, dtype=jnp.float32) + 0.5)[None],
                          (rows, cols))
    py = jnp.broadcast_to((jnp.arange(rows, dtype=jnp.float32)
                           + 0.5)[:, None], (rows, cols))
    return _shade_rows(g, hit, px, py, scene, n_attrs)


def _shade_rows(g, hit, px, py, scene: SceneData, n_attrs: int):
    """Plane evaluation + lighting over gathered pixel rows: g [R, W]
    gathered plane rows; hit/px/py pixel predicates/centers of ANY shape
    S with prod(S) = R (pass 2-D/3-D tile-friendly shapes — flat 1-D or
    [1, R] operands get degenerate T(1,128) layouts on TPU). Returns
    rgb f32 [*S, 3].

    Channels are read from ONE explicit MXU transpose of the gathered
    block (rows of gT) instead of column slices of g: per-column reads of
    a row-major [R, W] make XLA materialize a column-major copy and then
    run every lighting op in a degenerate [R, 1]{0,1:T(1,128)} layout
    (1/128 lane utilization — 226k estimated cycles at headline scale,
    tools/hlo_cycles.py). A plain .T fuses into an even worse
    slice-reduce (1.57M cycles); the identity-matrix dot runs the
    relayout on the MXU and is exact (ops/mxu.select_dot)."""
    W = g.shape[1]
    gT = mxu.select_dot(                              # [W, R]
        g, jnp.eye(W, dtype=g.dtype), (((1,), (1,)), ((), ())),
        sel_on_left=True)
    gT = gT.reshape((W,) + px.shape)                  # [W, *S] (bitcast)
    dn = 3 * n_attrs
    d = gT[dn] * px + gT[dn + 1] * py + gT[dn + 2]
    inv_d = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)

    def attr(j):
        return (gT[3 * j] * px + gT[3 * j + 1] * py
                + gT[3 * j + 2]) * inv_d

    nx, ny, nz = attr(0), attr(1), attr(2)
    cr, cg, cb = attr(3), attr(4), attr(5)
    if n_attrs >= 9:
        wx, wy_, wz = attr(6), attr(7), attr(8)
    else:
        assert scene.pt_pos.shape[0] == 0, (
            "point lights require world-pos planes (n_attrs=9)")
        wx = wy_ = wz = jnp.zeros_like(nx)
    inv_nl = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-24))
    nx, ny, nz = nx * inv_nl, ny * inv_nl, nz * inv_nl

    ambient = scene.env_color * scene.env_intensity
    have_dl = scene.n_dl > 0
    ddir = jnp.where(have_dl, scene.dl_dir[0],
                     jnp.asarray(_DEFAULT_DIR, jnp.float32))
    dcol = jnp.where(have_dl, scene.dl_col[0],
                     jnp.asarray(_DEFAULT_DIR_COL, jnp.float32))
    ndl = jnp.maximum(-(nx * ddir[0] + ny * ddir[1] + nz * ddir[2]), 0.0)
    out_r = cr * (ambient[0] + dcol[0] * ndl)
    out_g = cg * (ambient[1] + dcol[1] * ndl)
    out_b = cb * (ambient[2] + dcol[2] * ndl)

    pl_valid = jnp.arange(scene.pt_pos.shape[0]) < scene.n_pt
    for i in range(scene.pt_pos.shape[0]):
        lx = scene.pt_pos[i, 0] - wx
        ly = scene.pt_pos[i, 1] - wy_
        lz = scene.pt_pos[i, 2] - wz
        d2 = jnp.maximum(lx * lx + ly * ly + lz * lz, 1e-4)
        inv_dd = jax.lax.rsqrt(d2)
        ndlp = jnp.maximum((nx * lx + ny * ly + nz * lz) * inv_dd, 0.0)
        att = 1.0 / (1.0 + d2 * 0.05)
        w_i = jnp.where(pl_valid[i], ndlp * att, 0.0)
        out_r = out_r + cr * scene.pt_col[i, 0] * w_i
        out_g = out_g + cg * scene.pt_col[i, 1] * w_i
        out_b = out_b + cb * scene.pt_col[i, 2] * w_i

    rgb = jnp.stack([jnp.clip(out_r, 0.0, 1.0), jnp.clip(out_g, 0.0, 1.0),
                     jnp.clip(out_b, 0.0, 1.0)], axis=-1)
    return jnp.where(hit[..., None], rgb, 0.0)
