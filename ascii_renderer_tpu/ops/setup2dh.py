"""Fused 2-D homogeneous triangle setup as ONE Pallas kernel.

`backends/raster.setup_2dh` is pure channel math (~60 elementwise chains
over [T]), but XLA materializes many of the intermediate channels in HBM
(measured ~0.9 ms + 0.1 ms pack at the 69k-tri headline — ~10x the
bandwidth floor). This kernel computes the whole setup in VMEM with one
HBM read of the static geometry and one write of the outputs:

  in : pos9 f32 [9, Tp], attrs_t f32 [3A, Tp], mvp f32 [4,4] (SMEM)
  out: f32 [C, Tp] channel-major, rows =
       0..11   kernel entry planes e0a..e2c, zx, zy, zc
       12      triangle id (iota, f32)
       13..15  zeros (entry-row padding)
       16..16+3A+2  shade planes p{j}{a,b,c} + dna,dnb,dnc
       then    bx0, bx1, by0, by1, valid (binning bbox + validity)

The T axis is processed in [8, 128]-tile blocks (1024 triangles per grid
step); Tp must be a 1024 multiple (callers pad with zeros — an all-zero
triangle has det == 0 and never validates). Semantics are identical to
setup_2dh (same formulas; float op order differs only where Mosaic fuses
FMAs, covered by the oracle-tolerance tests in test_raster_channels).

Ref: the vertex/raster contract this feeds is raster.js:15-45 +
raster_shader.js:42-62 (see backends/raster.py for the full mapping).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ascii_renderer_tpu.ops import mxu

BT = 1024           # triangles per padding quantum, as an [8, 128] tile
BT_STEP = 8192      # triangles per grid step (BT multiple; [64, 128] rows)
EPS_W = 1e-4        # near-guard for bbox projections (= raster.EPS_W)


def _setup_kernel(mvp_ref, pos_ref, attr_ref, out_ref, *, n_attrs: int,
                  rows: int, cols: int, ts: int):
    A = n_attrs
    m = [[mvp_ref[i, j] for j in range(4)] for i in range(4)]
    step = pl.program_id(0)

    def pos(i):
        return pos_ref[i, 0]  # [ts, 128]

    # viewport-folded clip coords per slot
    vs = {}
    for i, s in enumerate("abc"):
        px, py, pz = pos(3 * i), pos(3 * i + 1), pos(3 * i + 2)
        xc = m[0][0] * px + m[0][1] * py + m[0][2] * pz + m[0][3]
        yc = m[1][0] * px + m[1][1] * py + m[1][2] * pz + m[1][3]
        zc = m[2][0] * px + m[2][1] * py + m[2][2] * pz + m[2][3]
        wc = m[3][0] * px + m[3][1] * py + m[3][2] * pz + m[3][3]
        vs[f"x{s}"] = (xc + wc) * (0.5 * cols)
        vs[f"y{s}"] = (wc - yc) * (0.5 * rows)
        vs[f"z{s}"] = (zc + wc) * 0.5
        vs[f"w{s}"] = wc

    def cross3(s1, s2):
        x1, y1, w1 = vs[f"x{s1}"], vs[f"y{s1}"], vs[f"w{s1}"]
        x2, y2, w2 = vs[f"x{s2}"], vs[f"y{s2}"], vs[f"w{s2}"]
        return (y1 * w2 - w1 * y2, w1 * x2 - x1 * w2, x1 * y2 - y1 * x2)

    e0 = cross3("b", "c")
    e1 = cross3("c", "a")
    e2 = cross3("a", "b")
    det = vs["xa"] * e0[0] + vs["ya"] * e0[1] + vs["wa"] * e0[2]
    det_safe = jnp.where(jnp.abs(det) < 1e-30, -1e-30, det)
    ninv = 1.0 / det_safe
    inv = -ninv

    for k, e in enumerate((e0, e1, e2)):
        out_ref[3 * k + 0, 0] = e[0] * inv
        out_ref[3 * k + 1, 0] = e[1] * inv
        out_ref[3 * k + 2, 0] = e[2] * inv
    for ch, j in ((9, 0), (10, 1), (11, 2)):
        out_ref[ch, 0] = (vs["za"] * e0[j] + vs["zb"] * e1[j]
                          + vs["zc"] * e2[j]) * ninv

    # id iota + zero padding rows
    iota = (jax.lax.broadcasted_iota(jnp.int32, (ts, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (ts, 128), 1))
    out_ref[12, 0] = (iota.astype(jnp.float32)
                      + step.astype(jnp.float32) * (ts * 128))
    zero = jnp.zeros((ts, 128), jnp.float32)
    out_ref[13, 0] = zero
    out_ref[14, 0] = zero
    out_ref[15, 0] = zero

    # shade planes
    for jj in range(A):
        aa = attr_ref[jj, 0]
        ab = attr_ref[A + jj, 0]
        ac = attr_ref[2 * A + jj, 0]
        for c_i in range(3):
            out_ref[16 + 3 * jj + c_i, 0] = (
                aa * e0[c_i] + ab * e1[c_i] + ac * e2[c_i]) * ninv
    dn_base = 16 + 3 * A
    for c_i in range(3):
        out_ref[dn_base + c_i, 0] = (e0[c_i] + e1[c_i] + e2[c_i]) * ninv

    # ---- binning bbox over projectable candidates ----
    big = jnp.float32(1e9)
    x0 = jnp.full((ts, 128), big)
    x1 = jnp.full((ts, 128), -big)
    y0 = jnp.full((ts, 128), big)
    y1 = jnp.full((ts, 128), -big)

    def fold(mask, xq, yq, x0, x1, y0, y1):
        return (jnp.where(mask, jnp.minimum(x0, xq), x0),
                jnp.where(mask, jnp.maximum(x1, xq), x1),
                jnp.where(mask, jnp.minimum(y0, yq), y0),
                jnp.where(mask, jnp.maximum(y1, yq), y1))

    front = {}
    for s in "abc":
        w = vs[f"w{s}"]
        front[s] = w > EPS_W
        iw = 1.0 / jnp.where(front[s], w, 1.0)
        x0, x1, y0, y1 = fold(front[s], vs[f"x{s}"] * iw, vs[f"y{s}"] * iw,
                              x0, x1, y0, y1)
    inv_eps = 1.0 / EPS_W
    for s1, s2 in (("a", "b"), ("b", "c"), ("c", "a")):
        w1, w2 = vs[f"w{s1}"], vs[f"w{s2}"]
        crossing = front[s1] != front[s2]
        t = (w1 - EPS_W) / jnp.where(crossing, w1 - w2, 1.0)
        xq = (vs[f"x{s1}"] + t * (vs[f"x{s2}"] - vs[f"x{s1}"])) * inv_eps
        yq = (vs[f"y{s1}"] + t * (vs[f"y{s2}"] - vs[f"y{s1}"])) * inv_eps
        x0, x1, y0, y1 = fold(crossing, xq, yq, x0, x1, y0, y1)

    bb = dn_base + 3
    out_ref[bb + 0, 0] = x0
    out_ref[bb + 1, 0] = x1
    out_ref[bb + 2, 0] = y0
    out_ref[bb + 3, 0] = y1

    # ---- validity ----
    all_front = front["a"] & front["b"] & front["c"]
    iw3 = tuple(1.0 / jnp.where(front[s], vs[f"w{s}"], 1.0) for s in "abc")
    a2h = det * iw3[0] * iw3[1] * iw3[2]
    sz = tuple(vs[f"z{s}"] * iw3[i] for i, s in enumerate("abc"))
    szmin = jnp.minimum(jnp.minimum(sz[0], sz[1]), sz[2])
    szmax = jnp.maximum(jnp.maximum(sz[0], sz[1]), sz[2])
    valid_front = ((a2h < 0.0) & (jnp.abs(a2h) > 1e-12)
                   & (szmax >= 0.0) & (szmin <= 1.0))
    valid_cross = det < -1e-20
    # no jnp.where on i1 vectors (Mosaic rejects the i8->i1 truncation)
    valid = (all_front & valid_front) | (~all_front & valid_cross)
    out_ref[bb + 4, 0] = valid.astype(jnp.float32)


def setup_2dh_fused(pos9: jnp.ndarray, attrs_t: jnp.ndarray,
                    mvp: jnp.ndarray, rows: int, cols: int,
                    interpret: bool | None = None):
    """Fused setup: (pos9 [9, T], attrs_t [3A, T], mvp [4,4]) ->
    (cm f32 [16+3A+3, Tp] g-channel rows, bbox dict of [Tp] channels
    bx0/bx1/by0/by1/valid). Tp = T padded to a 1024 multiple; pad slots
    have valid=False and ids >= T (they emit no pairs downstream)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    A3, T = attrs_t.shape
    A = A3 // 3
    tp = -(-T // BT) * BT
    if tp > T:
        pos9 = jnp.concatenate(
            [pos9, jnp.zeros((9, tp - T), jnp.float32)], axis=1)
        attrs_t = jnp.concatenate(
            [attrs_t, jnp.zeros((A3, tp - T), jnp.float32)], axis=1)
    # grid-step size: biggest BT multiple <= BT_STEP dividing tp (fewer,
    # fatter steps amortize per-step overhead; measured 0.54 -> see
    # tools/exp_setup.py)
    S = BT
    while S * 2 <= BT_STEP and tp % (S * 2) == 0:
        S *= 2
    ts = S // 128
    nb = tp // S
    n_g = 16 + 3 * A + 3
    c_out = n_g + 5
    out = pl.pallas_call(
        functools.partial(_setup_kernel, n_attrs=A, rows=rows, cols=cols,
                          ts=ts),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((9, 1, ts, 128), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((A3, 1, ts, 128), lambda i: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c_out, 1, ts, 128), lambda i: (0, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((c_out, nb, ts, 128), jnp.float32),
        interpret=interpret,
    )(mvp, pos9.reshape(9, nb, ts, 128), attrs_t.reshape(A3, nb, ts, 128))
    # [c, nb, ts, 128] -> [c, tp//128, 128] is a free (contiguous)
    # reshape; callers that need the flat [c, tp] view reshape again.
    # Keeping the channel block 3-D lets ops/pack consume the setup
    # kernel's native tiling directly (pack_channels_split_blocked),
    # avoiding the 38 us of relayout copies XLA inserts for the flat
    # [c, N] operand view (tools/profile_trace.py).
    out3 = out.reshape(c_out, tp // 128, 128)
    bbox = {"bx0": out3[n_g].reshape(tp), "bx1": out3[n_g + 1].reshape(tp),
            "by0": out3[n_g + 2].reshape(tp),
            "by1": out3[n_g + 3].reshape(tp),
            "valid": out3[n_g + 4].reshape(tp) > 0.5}
    return out3[:n_g], bbox


def _setup_kernel_packed(mvp_ref, pos_ref, attr_ref, bbox_ref, src_ref,
                         tbl_ref, *, n_attrs: int, rows: int, cols: int,
                         ts: int, tw: int):
    """_setup_kernel with the pack transpose FUSED: instead of a [C, Tp]
    channel-major block (whose only consumer was ops/pack — the
    interface cost XLA pays to re-slice and re-pad it was ~260k
    estimated cycles at headline scale, tools/hlo_cycles.py), this
    kernel emits the two row-major tables the grouped pipeline actually
    gathers from, transposed in VMEM by 512-column eye-dots:

      bbox_ref [5, 1, ts, 128]  bx0/bx1/by0/by1/valid (channel-major)
      src_ref  [ts*128, 16]     walk entry rows (channel c of tri t)
      tbl_ref  [ts*128, tw]     shade-plane rows (tw >= 3A+3, zero pad)

    Same formulas as _setup_kernel (raster.setup_2dh semantics)."""
    A = n_attrs
    m = [[mvp_ref[i, j] for j in range(4)] for i in range(4)]
    step = pl.program_id(0)

    def pos(i):
        return pos_ref[i, 0]  # [ts, 128]

    vs = {}
    for i, s in enumerate("abc"):
        px, py, pz = pos(3 * i), pos(3 * i + 1), pos(3 * i + 2)
        xc = m[0][0] * px + m[0][1] * py + m[0][2] * pz + m[0][3]
        yc = m[1][0] * px + m[1][1] * py + m[1][2] * pz + m[1][3]
        zc = m[2][0] * px + m[2][1] * py + m[2][2] * pz + m[2][3]
        wc = m[3][0] * px + m[3][1] * py + m[3][2] * pz + m[3][3]
        vs[f"x{s}"] = (xc + wc) * (0.5 * cols)
        vs[f"y{s}"] = (wc - yc) * (0.5 * rows)
        vs[f"z{s}"] = (zc + wc) * 0.5
        vs[f"w{s}"] = wc

    def cross3(s1, s2):
        x1, y1, w1 = vs[f"x{s1}"], vs[f"y{s1}"], vs[f"w{s1}"]
        x2, y2, w2 = vs[f"x{s2}"], vs[f"y{s2}"], vs[f"w{s2}"]
        return (y1 * w2 - w1 * y2, w1 * x2 - x1 * w2, x1 * y2 - y1 * x2)

    e0 = cross3("b", "c")
    e1 = cross3("c", "a")
    e2 = cross3("a", "b")
    det = vs["xa"] * e0[0] + vs["ya"] * e0[1] + vs["wa"] * e0[2]
    det_safe = jnp.where(jnp.abs(det) < 1e-30, -1e-30, det)
    ninv = 1.0 / det_safe
    inv = -ninv

    iota = (jax.lax.broadcasted_iota(jnp.int32, (ts, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (ts, 128), 1))
    tri_id = (iota.astype(jnp.float32)
              + step.astype(jnp.float32) * (ts * 128))
    zero = jnp.zeros((ts, 128), jnp.float32)

    ch16 = []
    for e in (e0, e1, e2):
        ch16 += [e[0] * inv, e[1] * inv, e[2] * inv]
    for j in range(3):
        ch16.append((vs["za"] * e0[j] + vs["zb"] * e1[j]
                     + vs["zc"] * e2[j]) * ninv)
    ch16 += [tri_id, zero, zero, zero]

    cht = []
    for jj in range(A):
        aa = attr_ref[jj, 0]
        ab = attr_ref[A + jj, 0]
        ac = attr_ref[2 * A + jj, 0]
        for c_i in range(3):
            cht.append((aa * e0[c_i] + ab * e1[c_i]
                        + ac * e2[c_i]) * ninv)
    for c_i in range(3):
        cht.append((e0[c_i] + e1[c_i] + e2[c_i]) * ninv)
    while len(cht) < tw:
        cht.append(zero)

    # transpose [C, ts*128] -> [ts*128, C] in 512-column sub-blocks on
    # the MXU (the pack kernel's eye-dot, now VMEM-local to the setup)
    S = ts * 128
    BLKT = 512
    eye = (jax.lax.broadcasted_iota(jnp.int32, (BLKT, BLKT), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (BLKT, BLKT), 1)
           ).astype(jnp.float32)
    x16 = jnp.concatenate([c.reshape(1, S) for c in ch16], axis=0)
    xt = jnp.concatenate([c.reshape(1, S) for c in cht], axis=0)
    for j in range(S // BLKT):
        sl = slice(j * BLKT, (j + 1) * BLKT)
        src_ref[sl, :] = mxu.select_dot(
            x16[:, sl], eye, (((1,), (1,)), ((), ())), sel_on_left=True)
        tbl_ref[sl, :] = mxu.select_dot(
            xt[:, sl], eye, (((1,), (1,)), ((), ())), sel_on_left=True)

    # ---- binning bbox + validity (channel-major, 5 rows) ----
    big = jnp.float32(1e9)
    x0 = jnp.full((ts, 128), big)
    x1 = jnp.full((ts, 128), -big)
    y0 = jnp.full((ts, 128), big)
    y1 = jnp.full((ts, 128), -big)

    def fold(mask, xq, yq, x0, x1, y0, y1):
        return (jnp.where(mask, jnp.minimum(x0, xq), x0),
                jnp.where(mask, jnp.maximum(x1, xq), x1),
                jnp.where(mask, jnp.minimum(y0, yq), y0),
                jnp.where(mask, jnp.maximum(y1, yq), y1))

    front = {}
    for s in "abc":
        w = vs[f"w{s}"]
        front[s] = w > EPS_W
        iw = 1.0 / jnp.where(front[s], w, 1.0)
        x0, x1, y0, y1 = fold(front[s], vs[f"x{s}"] * iw, vs[f"y{s}"] * iw,
                              x0, x1, y0, y1)
    inv_eps = 1.0 / EPS_W
    for s1, s2 in (("a", "b"), ("b", "c"), ("c", "a")):
        w1, w2 = vs[f"w{s1}"], vs[f"w{s2}"]
        crossing = front[s1] != front[s2]
        t = (w1 - EPS_W) / jnp.where(crossing, w1 - w2, 1.0)
        xq = (vs[f"x{s1}"] + t * (vs[f"x{s2}"] - vs[f"x{s1}"])) * inv_eps
        yq = (vs[f"y{s1}"] + t * (vs[f"y{s2}"] - vs[f"y{s1}"])) * inv_eps
        x0, x1, y0, y1 = fold(crossing, xq, yq, x0, x1, y0, y1)

    bbox_ref[0, 0] = x0
    bbox_ref[1, 0] = x1
    bbox_ref[2, 0] = y0
    bbox_ref[3, 0] = y1

    all_front = front["a"] & front["b"] & front["c"]
    iw3 = tuple(1.0 / jnp.where(front[s], vs[f"w{s}"], 1.0) for s in "abc")
    a2h = det * iw3[0] * iw3[1] * iw3[2]
    sz = tuple(vs[f"z{s}"] * iw3[i] for i, s in enumerate("abc"))
    szmin = jnp.minimum(jnp.minimum(sz[0], sz[1]), sz[2])
    szmax = jnp.maximum(jnp.maximum(sz[0], sz[1]), sz[2])
    valid_front = ((a2h < 0.0) & (jnp.abs(a2h) > 1e-12)
                   & (szmax >= 0.0) & (szmin <= 1.0))
    valid_cross = det < -1e-20
    valid = (all_front & valid_front) | (~all_front & valid_cross)
    bbox_ref[4, 0] = valid.astype(jnp.float32)


def setup_2dh_fused_packed(pos9: jnp.ndarray, attrs_t: jnp.ndarray,
                           mvp: jnp.ndarray, rows: int, cols: int,
                           tw: int, interpret: bool | None = None):
    """Fused setup + pack: -> (bbox dict of [Tp] channels, src16 f32
    [Tp, 16] walk entry rows, table f32 [Tp, tw] shade rows). Replaces
    setup_2dh_fused + ops/pack for the grouped kernels: the channel-major
    intermediate (and its slice/pad interface) never exists."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    A3, T = attrs_t.shape
    A = A3 // 3
    assert tw >= 3 * A + 3, (tw, A)
    tp = -(-T // BT) * BT
    if tp > T:
        pos9 = jnp.concatenate(
            [pos9, jnp.zeros((9, tp - T), jnp.float32)], axis=1)
        attrs_t = jnp.concatenate(
            [attrs_t, jnp.zeros((A3, tp - T), jnp.float32)], axis=1)
    S = BT
    while S * 2 <= BT_STEP and tp % (S * 2) == 0:
        S *= 2
    ts = S // 128
    nb = tp // S
    bbox_arr, src16, table = pl.pallas_call(
        functools.partial(_setup_kernel_packed, n_attrs=A, rows=rows,
                          cols=cols, ts=ts, tw=tw),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((9, 1, ts, 128), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((A3, 1, ts, 128), lambda i: (0, i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((5, 1, ts, 128), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((S, 16), lambda i: (i, 0)),
            pl.BlockSpec((S, tw), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((5, nb, ts, 128), jnp.float32),
            jax.ShapeDtypeStruct((tp, 16), jnp.float32),
            jax.ShapeDtypeStruct((tp, tw), jnp.float32),
        ),
        interpret=interpret,
    )(mvp, pos9.reshape(9, nb, ts, 128), attrs_t.reshape(A3, nb, ts, 128))
    b = bbox_arr.reshape(5, tp)
    bbox = {"bx0": b[0], "bx1": b[1], "by0": b[2], "by1": b[3],
            "valid": b[4] > 0.5}
    return bbox, src16, table
