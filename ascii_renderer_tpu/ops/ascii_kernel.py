"""Pallas TPU kernel: the modal (majority-vote) glyph smoothing stencil.

The ASCII pass's only expensive stage is the Boyer-Moore neighborhood vote
(ascii_pass_shader.js:77-138): ~48 shifted reads + sequential voting per
cell. The XLA formulation round-trips HBM at every unfused shift; this
kernel streams row bands through VMEM (manual DMA with a 3-row/col halo)
and runs the entire two-pass vote on-chip.

Layout: inputs are pre-padded in XLA to (n_bands*BAND + 2*PAD, Wp) with
edge-clamped halos (PAD = 3 = the shader's MAX_MODE_RADIUS, Wp = W+2*PAD
rounded up to 128 lanes). grid = (n_bands,); each step DMAs its
(BAND + 2*PAD)-row slab, computes, and writes a (BAND, Wp) block (the
caller crops to W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 3  # MAX_MODE_RADIUS (ascii_pass_shader.js:83)
BAND = 64


def _offsets(radius: int):
    out = []
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            if abs(dy) > radius or abs(dx) > radius:
                continue
            if dy == 0 and dx == 0:
                continue
            out.append((dy, dx))
    return out


def _kernel(idx_hbm, ovr_hbm, out_ref, idx_s, ovr_s, sem, *, radius: int,
            thresh: int, wc: int):
    i = pl.program_id(0)
    rows_slab = BAND + 8  # 2*PAD=6 halo rounded up to the 8-row tiling

    cp1 = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(i * BAND, rows_slab)], idx_s, sem.at[0])
    cp2 = pltpu.make_async_copy(
        ovr_hbm.at[pl.ds(i * BAND, rows_slab)], ovr_s, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    def win(arr_ref, dy, dx):
        return jax.lax.slice(arr_ref[...], (PAD + dy, PAD + dx),
                             (PAD + dy + BAND, PAD + dx + wc))

    base = win(idx_s, 0, 0)
    ovr_c = win(ovr_s, 0, 0) != 0

    offs = _offsets(radius)
    neigh = [(win(idx_s, dy, dx), win(ovr_s, dy, dx) == 0)
             for dy, dx in offs]

    cand = jnp.full(base.shape, -1, jnp.int32)
    cnt = jnp.zeros(base.shape, jnp.int32)
    for ni, valid in neigh:
        zero = cnt == 0
        match = ni == cand
        new_cand = jnp.where(valid & zero, ni, cand)
        new_cnt = jnp.where(
            valid, jnp.where(zero, 1, jnp.where(match, cnt + 1, cnt - 1)),
            cnt)
        cand, cnt = new_cand, new_cnt

    votes = jnp.zeros(base.shape, jnp.int32)
    for ni, valid in neigh:
        votes = votes + (valid & (ni == cand)).astype(jnp.int32)

    adopt = (cand >= 0) & (votes >= thresh) & (cand != base) & \
        jnp.logical_not(ovr_c)
    out_ref[...] = jnp.where(adopt, cand, base)


def modal_filter_pallas(idx: jnp.ndarray, override: jnp.ndarray, radius: int,
                        thresh: int, interpret: bool | None = None):
    """Drop-in twin of ascii.modal.modal_filter backed by the Pallas kernel.
    idx i32 [H, W]; override bool [H, W]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    h, w = idx.shape
    n_bands = -(-h // BAND)
    wc = -(-w // 128) * 128            # compute/output width (lane-aligned)
    w_in = -(-(wc + 2 * PAD) // 128) * 128  # DMA slab width

    def prep(a, dtype):
        a = a.astype(dtype)
        # edge-clamp pad: PAD on top/left, enough on bottom/right to cover
        # the last band slab + the aligned compute width
        bottom = n_bands * BAND - h + (8 - PAD)  # slab is BAND+8 rows
        return jnp.pad(a, ((PAD, bottom), (PAD, w_in - w - PAD)), mode="edge")

    idx_p = prep(idx, jnp.int32)
    ovr_p = prep(override, jnp.int32)

    kernel = functools.partial(_kernel, radius=radius, thresh=thresh, wc=wc)
    out = pl.pallas_call(
        kernel,
        grid=(n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((BAND, wc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bands * BAND, wc), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BAND + 8, w_in), jnp.int32),
            pltpu.VMEM((BAND + 8, w_in), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(idx_p, ovr_p)
    return out[:h, :w]
