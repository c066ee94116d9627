"""Channel-major -> row-major packing as a Pallas MXU transpose.

TPU-native layout bridge: the raster pipeline computes everything as
contiguous [N] channel arrays (lane-friendly), but row-gather consumers
(the deferred-shade table, the bin-walk entry rows) need row-major
[N, C]. XLA lowers ``jnp.stack(chs, axis=-1)`` to per-channel strided
updates whose minor dim C << 128 wastes most of every vector store
(measured ~0.8 ms for [49k, 24] at bunny scale). This kernel instead
lets XLA fuse the channel producers into ONE efficient channel-major
[C, N] materialization, then transposes 512-lane blocks on the MXU via
an identity dot (f32-exact at HIGHEST precision).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLK = 512


def _pack_kernel(cm_ref, out_ref):
    x = cm_ref[...]  # [C, BLK]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1))
    # Y = I . X^T contraction: Y[n, c] = sum_k I[n, k] X[c, k] = X[c, n]
    out_ref[...] = jax.lax.dot_general(
        eye.astype(jnp.float32), x, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def pack_channels(channels, width: int | None = None,
                  interpret: bool | None = None) -> jnp.ndarray:
    """[C] f32 channel arrays (each [N]) — or one pre-stacked [C, N]
    array — -> row-major [N, W] with W = width or C rounded up to 8;
    extra columns zero. N is padded to a 512 multiple internally (the pad
    rows are dropped from the output)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cm = (channels if isinstance(channels, jnp.ndarray)
          else jnp.stack(channels, axis=0))
    c, n = cm.shape
    w = width or -(-c // 8) * 8
    assert w >= c, (c, w)
    if w > c:
        cm = jnp.concatenate([cm, jnp.zeros((w - c, n), jnp.float32)],
                             axis=0)
    n_pad = -(-n // BLK) * BLK
    if n_pad > n:
        cm = jnp.concatenate([cm, jnp.zeros((w, n_pad - n), jnp.float32)],
                             axis=1)
    out = pl.pallas_call(
        _pack_kernel,
        grid=(n_pad // BLK,),
        in_specs=[pl.BlockSpec((w, BLK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((BLK, w), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, w), jnp.float32),
        interpret=interpret,
    )(cm)
    return out[:n] if n_pad > n else out


def _pack_split_kernel(cm_ref, *out_refs, spans):
    x = cm_ref[...]  # [w, BLK]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1))
    y = jax.lax.dot_general(
        eye.astype(jnp.float32), x, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # [BLK, w]
    for ref, (a, b) in zip(out_refs, spans):
        ref[...] = y[:, a:b]


def pack_channels_split(cm: jnp.ndarray, spans,
                        interpret: bool | None = None):
    """Like pack_channels but emits one CONTIGUOUS row-major array per
    (start, stop) channel span (spans may overlap). Row-gather consumers
    need contiguous source rows: gathering from a lane-slice of a wider
    packed array reads strided rows and falls off the fast gather path
    (measured ~20x at headline scale, tools/exp_rows.py)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, n = cm.shape
    w = max(b for _, b in spans)
    assert w >= c, (c, w, spans)
    if w > c:
        cm = jnp.concatenate([cm, jnp.zeros((w - c, n), jnp.float32)],
                             axis=0)
    n_pad = -(-n // BLK) * BLK
    if n_pad > n:
        cm = jnp.concatenate([cm, jnp.zeros((w, n_pad - n), jnp.float32)],
                             axis=1)
    outs = pl.pallas_call(
        functools.partial(_pack_split_kernel, spans=tuple(spans)),
        grid=(n_pad // BLK,),
        in_specs=[pl.BlockSpec((w, BLK), lambda i: (0, i))],
        out_specs=tuple(pl.BlockSpec((BLK, b - a), lambda i: (i, 0))
                        for a, b in spans),
        out_shape=tuple(jax.ShapeDtypeStruct((n_pad, b - a), jnp.float32)
                        for a, b in spans),
        interpret=interpret,
    )(cm)
    if n_pad > n:
        outs = tuple(o[:n] for o in outs)
    return outs
