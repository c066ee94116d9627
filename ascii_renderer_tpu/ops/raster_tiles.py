"""Pallas TPU kernel: per-tile triangle evaluation for the binned rasterizer.

The XLA scan formulation of this stage runs at ~10 GFLOP/s (unfused
broadcast/transpose traffic); this kernel keeps the whole tile resident in
VMEM and streams the slot table through registers:

  grid = (n_tiles,)
  in:   tri channels [n_tiles, slots, 16] f32  (x0 x1 x2 y0 y1 y2 z0 z1 z2
        valid, rest pad — slot-major so the dynamic slot index rides the
        sublane axis, which Mosaic supports for scalar loads)
  out:  zbuf [n_tiles, 8, 128] f32, slot index [n_tiles, 8, 128] i32

Per tile: fori over slots; each slot's edge functions evaluate on the
(8, 128) pixel block on the VPU; (z, slot) min-merge with smallest-slot
tie-breaks (matching the XLA path's argmin-first semantics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 8, 128
N_CHAN = 16  # 10 used; padded to a multiple of 8 sublanes

CH_X0, CH_X1, CH_X2 = 0, 1, 2
CH_Y0, CH_Y1, CH_Y2 = 3, 4, 5
CH_Z0, CH_Z1, CH_Z2 = 6, 7, 8
CH_VALID = 9


def _kernel(tri_ref, z_ref, s_ref, *, slots: int, tiles_x: int):
    i = pl.program_id(0)
    ty = i // tiles_x
    tx = i % tiles_x
    py = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
          .astype(jnp.float32) + ty.astype(jnp.float32) * TILE_H + 0.5)
    px = (jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
          .astype(jnp.float32) + tx.astype(jnp.float32) * TILE_W + 0.5)

    def body(s, carry):
        zbest, sbest = carry
        x0 = tri_ref[0, s, CH_X0]
        x1 = tri_ref[0, s, CH_X1]
        x2 = tri_ref[0, s, CH_X2]
        y0 = tri_ref[0, s, CH_Y0]
        y1 = tri_ref[0, s, CH_Y1]
        y2 = tri_ref[0, s, CH_Y2]
        z0 = tri_ref[0, s, CH_Z0]
        z1 = tri_ref[0, s, CH_Z1]
        z2 = tri_ref[0, s, CH_Z2]
        ok_t = tri_ref[0, s, CH_VALID] > 0.0

        w0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        w1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        w2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        area = w0 + w1 + w2
        inside = (w0 <= 0.0) & (w1 <= 0.0) & (w2 <= 0.0) & ok_t
        z = (w0 * z0 + w1 * z1 + w2 * z2) / area
        ok = inside & (z >= 0.0) & (z <= 1.0)
        z = jnp.where(ok, z, jnp.inf)
        better = z < zbest  # strict: earlier slot wins ties
        return (jnp.where(better, z, zbest),
                jnp.where(better, s, sbest))

    z0buf = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
    s0buf = jnp.full((TILE_H, TILE_W), slots, jnp.int32)
    zb, sb = jax.lax.fori_loop(0, slots, body, (z0buf, s0buf))
    z_ref[0, ...] = zb
    s_ref[0, ...] = sb


def tile_eval(tri_chan: jnp.ndarray, tiles_x: int,
              interpret: bool = False):
    """tri_chan f32 [n_tiles, slots, N_CHAN] -> (z [n_tiles, 8, 128] f32,
    slot [n_tiles, 8, 128] i32, slot == `slots` means background)."""
    n_tiles, slots, n_chan = tri_chan.shape
    assert n_chan == N_CHAN
    kernel = functools.partial(_kernel, slots=slots, tiles_x=tiles_x)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, slots, N_CHAN), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, TILE_H, TILE_W), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, TILE_H, TILE_W), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.int32)),
        interpret=interpret,
    )(tri_chan)
