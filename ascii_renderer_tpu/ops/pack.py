"""Channel-major -> row-major packing as a Pallas MXU transpose.

TPU-native layout bridge: the raster pipeline computes everything as
contiguous [N] channel arrays (lane-friendly), but row-gather consumers
(the deferred-shade table, the bin-walk entry rows) need row-major
[N, C]. XLA lowers ``jnp.stack(chs, axis=-1)`` to per-channel strided
updates whose minor dim C << 128 wastes most of every vector store
(measured ~0.8 ms for [49k, 24] at bunny scale). This kernel instead
lets XLA fuse the channel producers into ONE efficient channel-major
[C, N] materialization, then transposes 512-lane blocks on the MXU via
an identity dot.

The identity dot is exact but its cost is set by the f32 matmul
algorithm: Precision.HIGHEST is a 6-pass bf16 emulation. A manual
3-way bf16 split (hi/mid/lo, 3x8 = 24 mantissa bits) with one DEFAULT
(single-pass) dot per part is bit-exact for every finite f32 — the
identity operand is exactly bf16, each part is exactly bf16, each
product accumulates in f32, and x = hi + (mid + lo) holds exactly by
construction — at half the MXU passes (device profile: the HIGHEST
pack was ~44% of the pack kernel's 305 us at 960x540/69k;
tools/profile_trace.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLK = 512


def _split3_kernel(x):
    from ascii_renderer_tpu.ops.mxu import _split3
    return _split3(x, in_kernel=True)


PACK_EXACT3 = True  # trace-time perf knob (tools/ab_slope "packhi"):
# False restores the single HIGHEST-precision identity dot.


def _mxu_transpose(x: jnp.ndarray, blk: int) -> jnp.ndarray:
    """[C, blk] f32 -> [blk, C] f32, bit-exact, via identity dots.

    The identity spans TEYE = 128 rows, not the whole block: eye-dot
    MACs scale as blk * TEYE * C, so transposing a 512-lane block as
    four 128-row sub-dots does 4x less MXU work than one 512x512 eye
    (the MXU is fully occupied either way — M = 128 fills its rows).
    Measured: the split pack kernel 168 -> 62 us at 960x540/69k."""
    TEYE = 128
    eye = (jax.lax.broadcasted_iota(jnp.int32, (TEYE, TEYE), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (TEYE, TEYE), 1))
    # Y = I . X^T contraction: Y[n, c] = sum_k I[n, k] X[c, k] = X[c, n]
    if not PACK_EXACT3:
        return jnp.concatenate([
            jax.lax.dot_general(
                eye.astype(jnp.float32), x[:, j * TEYE:(j + 1) * TEYE],
                (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            for j in range(blk // TEYE)], axis=0)
    # exact 3-way bf16 split: hi = bf16(x) leaves r1 = x - hi exactly
    # representable (same-exponent cancellation); two more steps leave
    # r3 == 0 (24-bit mantissa = 3 bf16 mantissas). bf16 spans f32's
    # full exponent range, so no overflow. Caveat: residues below
    # bf16's subnormal floor (2^-133) are lost, so inputs with
    # |x| < ~1e-33 may drop their last mantissa bits — such magnitudes
    # do not occur in meaningful channel values (they are beyond any
    # z/edge/attr resolution), and every kernel generation shares this
    # pack, so cross-generation bit-equivalence is unaffected. The
    # HIGHEST fallback (PACK_EXACT3=False) keeps strict IEEE behavior.
    eye_bf = eye.astype(jnp.bfloat16)

    def tdot(part):
        return jax.lax.dot_general(
            eye_bf, part, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    # the pack transpose only runs inside Pallas kernels: Mosaic does
    # not run XLA's excess-precision fold, so the split needs no
    # barriers here (and optimization_barrier cannot lower in Mosaic) —
    # see ops/mxu._split3 + the on-TPU exactness canary
    hi, mid, lo = _split3_kernel(x)
    # associate as hi + (mid + lo): mid + lo == r1 and hi + r1 == x are
    # exact by construction, so the transposed sum is bit-equal to x
    return jnp.concatenate([
        tdot(hi[:, j * TEYE:(j + 1) * TEYE])
        + (tdot(mid[:, j * TEYE:(j + 1) * TEYE])
           + tdot(lo[:, j * TEYE:(j + 1) * TEYE]))
        for j in range(blk // TEYE)], axis=0)


def _pack_kernel(cm_ref, out_ref):
    out_ref[...] = _mxu_transpose(cm_ref[...], BLK)


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
    y = _mxu_transpose(cm_ref[...], BLK)  # [BLK, w]
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


def _pack_split_kernel_blk(cm_ref, *out_refs, spans, w, sb):
    # slice the [w, sb, 128] block per 128-lane sub-block instead of
    # reshaping to [w, sb*128]: the reshape is a sublane->lane relayout
    # inside the kernel; slices are free
    y = jnp.concatenate(
        [_mxu_transpose(cm_ref[:, j, :], 128) for j in range(sb)],
        axis=0)  # [sb*128, w]
    for ref, (a, b) in zip(out_refs, spans):
        ref[...] = y[:, a:b]


def pack_channels_split_blocked(cm3: jnp.ndarray, spans,
                                interpret: bool | None = None):
    """pack_channels_split over a BLOCKED channel-major input
    [C, R, 128] (R*128 = N), reading (BLK/128)-row slabs of the setup
    kernel's native output tiling directly. Keeping the operand in the
    producer's layout removes the two interface relayout copies XLA
    inserted between setup_2dh_fused and the flat [C, N] view (38 us at
    960x540/69k, tools/profile_trace.py). Bit-identical to
    pack_channels_split(cm3.reshape(C, -1), spans)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    c, r, l = cm3.shape
    # Mosaic requires the block's last two dims divisible by (8, 128):
    # slabs are 8 sublane-rows = 1024 triangles per grid step
    rb = 8
    assert l == 128 and r % rb == 0, (c, r, l)
    w = max(b for _, b in spans)
    assert w >= c, (c, w, spans)
    if w > c:
        cm3 = jnp.concatenate(
            [cm3, jnp.zeros((w - c, r, l), jnp.float32)], axis=0)
    n = r * l
    outs = pl.pallas_call(
        functools.partial(_pack_split_kernel_blk, spans=tuple(spans),
                          w=w, sb=rb),
        grid=(r // rb,),
        in_specs=[pl.BlockSpec((w, rb, 128), lambda i: (0, i, 0))],
        out_specs=tuple(pl.BlockSpec((rb * 128, b - a), lambda i: (i, 0))
                        for a, b in spans),
        out_shape=tuple(jax.ShapeDtypeStruct((n, b - a), jnp.float32)
                        for a, b in spans),
        interpret=interpret,
    )(cm3)
    return outs
