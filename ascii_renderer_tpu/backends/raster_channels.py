"""Clip-expansion channel raster generation (live at small/mid scale).

The [2T]-domain pipeline that preceded the 2-D homogeneous (Olano-Greer)
setup in backends/raster.py: branchless near-clip expansion into
channel-major screen triangles, order-preserving valid compaction, exact
per-tile binning, and the mm/loop Pallas bin walks with deferred
plane-table shading. Production still routes small and mid-size scenes
here (RasterBackend: the 2DH subtile prep overhead doesn't pay below
~32k clipped tris), and the chunked `visibility_scan` path is the
oracle-tested reference rasterizer every faster generation is
bit-compared against (tests/test_raster_channels.py).

Ref semantics (raster.js + raster_shader.js) are documented in
backends/raster.py, which re-exports every public name here — external
code should keep importing through ``backends.raster``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ascii_renderer_tpu.backends.raster_common import (
    _DEFAULT_DIR, _DEFAULT_DIR_COL, MAX_V_CAP, TILE_H, TILE_W,
    shade_from_table)
from ascii_renderer_tpu.scene.builder import SceneData


def transform_clip_channels(positions: jnp.ndarray, mvp: jnp.ndarray):
    """Channel-major vertex stage: positions f32 [V=3T, 3] -> dict of
    [2T]-shaped per-component arrays for the near-clipped triangles.

    Why: [T, 3]-shaped intermediates put a size-3 dimension on the TPU's
    128-lane axis (2% VPU efficiency, 42x padded memory). Every op here
    runs on flat [T] channels instead; only the initial transform is a
    matmul. Semantically identical to :func:`transform_clip` (same rotation
    canonicalization and x2 expansion); attribute lerping for clipped
    vertices is returned as (rot, t_ab, t_ac, t_bc, case) so the caller can
    apply it to attribute arrays lazily.

    Returns dict with keys:
      x/y/z/w per vertex slot a,b,c  -> 'xa','ya','za','wa', ... [2T]
      'valid' [2T] bool
      'lerp' info dict for attribute reconstruction.
    """
    V = positions.shape[0]
    T = V // 3
    clip = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])],
                           axis=1) @ mvp.T  # [V, 4] (MXU)
    # per-vertex-slot channels [T], via ONE channel-major transpose —
    # slicing cv[:, i, j] from a [T, 3, 4] view reads with stride 12 on
    # the minor axis (wastes 11/12 of every vector load); rows of the
    # [12, T] transpose are contiguous (same fix as clip_attrs).
    cv_t = clip.reshape(T, 12).T
    ch = {f"{c}{s}": cv_t[4 * i + j]
          for i, s in enumerate("abc")
          for j, c in enumerate("xyzw")}
    return _clip_channels_core(ch)


def transform_clip_channels9(pos9: jnp.ndarray, mvp: jnp.ndarray):
    """transform_clip_channels on pre-transposed geometry (see
    positions_to_pos9): 16 four-term FMA chains over contiguous [T]
    channels replace the matmul + minor-axis transpose."""
    ch = {}
    for i, s in enumerate("abc"):
        px, py, pz = pos9[3 * i], pos9[3 * i + 1], pos9[3 * i + 2]
        for j, c in enumerate("xyzw"):
            ch[f"{c}{s}"] = (mvp[j, 0] * px + mvp[j, 1] * py
                             + mvp[j, 2] * pz + mvp[j, 3])
    return _clip_channels_core(ch)


def _clip_channels_core(ch):
    """Shared near-clip channel math: per-slot clip channels x/y/z/w{a,b,c}
    [T] -> the [2T] clipped-triangle channel dict (see
    transform_clip_channels)."""
    d = {s: ch[f"z{s}"] + ch[f"w{s}"] for s in "abc"}
    ins = {s: d[s] >= 0.0 for s in "abc"}
    n_in = (ins["a"].astype(jnp.int32) + ins["b"].astype(jnp.int32)
            + ins["c"].astype(jnp.int32))

    # rotation r in {0,1,2}: 1-in -> first inside vertex first;
    # 2-in -> outside vertex last (matches transform_clip)
    first_in = jnp.where(ins["a"], 0, jnp.where(ins["b"], 1, 2))
    first_out = jnp.where(~ins["a"], 0, jnp.where(~ins["b"], 1, 2))
    rot = jnp.where(n_in == 1, first_in,
                    jnp.where(n_in == 2, (first_out + 1) % 3, 0))

    def rot_sel(ca, cb, cc, r):
        return jnp.where(r == 0, ca, jnp.where(r == 1, cb, cc))

    rch = {}
    names = "abc"
    for k, s in enumerate("abc"):
        # rotated slot s takes original slot (rot + k) % 3
        srcs = [names[(i + k) % 3] for i in range(3)]  # for rot=0,1,2
        for c in "xyzw":
            rch[f"{c}{s}"] = rot_sel(ch[f"{c}{srcs[0]}"], ch[f"{c}{srcs[1]}"],
                                     ch[f"{c}{srcs[2]}"], rot)
    rd = {}
    for k, s in enumerate("abc"):
        srcs = [names[(i + k) % 3] for i in range(3)]
        rd[s] = rot_sel(d[srcs[0]], d[srcs[1]], d[srcs[2]], rot)

    ta = rd["a"] / jnp.where(rd["a"] == rd["b"], 1.0, rd["a"] - rd["b"])  # a->b
    tc = rd["a"] / jnp.where(rd["a"] == rd["c"], 1.0, rd["a"] - rd["c"])  # a->c
    tb = rd["b"] / jnp.where(rd["b"] == rd["c"], 1.0, rd["b"] - rd["c"])  # b->c

    def lerp(c0, c1, t):
        return c0 + t * (c1 - c0)

    one_in = n_in == 1
    two_in = n_in == 2
    out = {}
    for c in "xyzw":
        a0, b0, c0 = rch[f"{c}a"], rch[f"{c}b"], rch[f"{c}c"]
        ab = lerp(a0, b0, ta)
        ac = lerp(a0, c0, tc)
        bc = lerp(b0, c0, tb)
        # tri1: 3-in (a,b,c); 1-in (a, ab, ac); 2-in (a, b, bc)
        t1a = a0
        t1b = jnp.where(one_in, ab, b0)
        t1c = jnp.where(one_in, ac, jnp.where(two_in, bc, c0))
        # tri2 (only 2-in): (a, bc, ac)
        t2a, t2b, t2c = a0, bc, ac
        out[f"{c}a"] = jnp.concatenate([t1a, t2a])
        out[f"{c}b"] = jnp.concatenate([t1b, t2b])
        out[f"{c}c"] = jnp.concatenate([t1c, t2c])
    out["valid"] = jnp.concatenate([n_in >= 1, two_in])
    out["rot"] = rot
    out["t_ab"], out["t_ac"], out["t_bc"] = ta, tc, tb
    out["n_in"] = n_in
    return out


def setup_screen_channels(ch, rows: int, cols: int):
    """Channel-major screen setup: adds screen-space sx/sy/sz per slot and
    the facing/degenerate cull to ``ch`` (in place) and returns it."""
    for s in "abc":
        w = ch[f"w{s}"]
        inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
        ch[f"sx{s}"] = (ch[f"x{s}"] * inv_w + 1.0) * 0.5 * cols
        ch[f"sy{s}"] = (1.0 - ch[f"y{s}"] * inv_w) * 0.5 * rows
        ch[f"sz{s}"] = (ch[f"z{s}"] * inv_w + 1.0) * 0.5
        ch[f"iw{s}"] = inv_w
    e0x = ch["sxb"] - ch["sxa"]
    e0y = ch["syb"] - ch["sya"]
    e1x = ch["sxc"] - ch["sxa"]
    e1y = ch["syc"] - ch["sya"]
    area2 = e0x * e1y - e0y * e1x
    ch["valid"] = ch["valid"] & (area2 < 0.0) & (jnp.abs(area2) > 1e-12)
    ch["area2"] = area2
    return ch


def channels_to_setup(ch):
    """Adapter: channel dict -> the [T,3,...] setup dict the scan/oracle
    paths consume (materializes the small-lane layout; test use only)."""
    xy = jnp.stack([jnp.stack([ch["sxa"], ch["sya"]], axis=-1),
                    jnp.stack([ch["sxb"], ch["syb"]], axis=-1),
                    jnp.stack([ch["sxc"], ch["syc"]], axis=-1)], axis=1)
    z01 = jnp.stack([ch["sza"], ch["szb"], ch["szc"]], axis=1)
    return {"xy": xy, "z01": z01, "valid": ch["valid"], "area2": ch["area2"]}


def transform_clip(positions: jnp.ndarray, attrs: jnp.ndarray,
                   mvp: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """positions f32 [V=3T, 3], attrs f32 [V, A] -> near-clipped triangles.

    Returns (clip [2T, 3, 4], tattr [2T, 3, A], valid [2T]): each input
    triangle emits up to two output triangles (static expansion — the
    two-in/one-out clip case genuinely needs both).
    """
    v4 = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=1)
    clip = v4 @ mvp.T  # [V, 4] — the MXU does the whole vertex stage
    T = positions.shape[0] // 3
    A = attrs.shape[1]
    bundle = jnp.concatenate([clip, attrs], axis=1).reshape(T, 3, 4 + A)

    d = bundle[..., 2] + bundle[..., 3]  # z + w >= 0 is inside (near plane)
    inside = d >= 0.0
    n_in = inside.sum(axis=1)  # [T]

    # Rotate each triangle so the pattern is canonical:
    #   1-in  -> the inside vertex first;  2-in -> the OUTSIDE vertex last.
    idx_first_in = jnp.argmax(inside, axis=1)
    idx_out = jnp.argmax(jnp.logical_not(inside), axis=1)
    rot = jnp.where(n_in == 1, idx_first_in,
                    jnp.where(n_in == 2, (idx_out + 1) % 3, 0))
    # rotation as roll+select (static slices) — a take_along_axis gather
    # here costs ~30 ms at bunny scale on TPU, the selects are free
    b1 = jnp.roll(bundle, -1, axis=1)
    b2 = jnp.roll(bundle, -2, axis=1)
    r = rot[:, None, None]
    vb = jnp.where(r == 0, bundle, jnp.where(r == 1, b1, b2))
    d1 = jnp.roll(d, -1, axis=1)
    d2 = jnp.roll(d, -2, axis=1)
    rd = rot[:, None]
    db = jnp.where(rd == 0, d, jnp.where(rd == 1, d1, d2))

    a, b, c = vb[:, 0], vb[:, 1], vb[:, 2]
    da, db_, dc = db[:, 0], db[:, 1], db[:, 2]

    def lerp(p, q, dp, dq):
        t = dp / (dp - dq)
        return p + t[:, None] * (q - p)

    ab = lerp(a, b, da, db_)
    ac = lerp(a, c, da, dc)
    bc = lerp(b, c, db_, dc)

    # case 3-in: (a, b, c) ; case 1-in: (a, ab, ac) ; case 2-in: (a, b, bc)
    one_in = (n_in == 1)[:, None, None]
    two_in = (n_in == 2)[:, None, None]
    tri1 = jnp.where(one_in, jnp.stack([a, ab, ac], axis=1),
                     jnp.where(two_in, jnp.stack([a, b, bc], axis=1),
                               jnp.stack([a, b, c], axis=1)))
    # second output exists only in the 2-in case: (a, bc, ca')
    tri2 = jnp.stack([a, bc, ac], axis=1)

    valid1 = n_in >= 1
    valid2 = n_in == 2
    tris = jnp.concatenate([tri1, tri2], axis=0)  # [2T, 3, 4+A]
    valid = jnp.concatenate([valid1, valid2], axis=0)
    return tris[..., :4], tris[..., 4:], valid


def setup_screen(clip: jnp.ndarray, valid: jnp.ndarray, rows: int, cols: int):
    """clip [T,3,4] -> screen-space setup.

    Returns dict of xy [T,3,2] (x right, y DOWN from the top row), z01 [T,3],
    inv_w [T,3], area2 [T] (y-down signed area*2), valid [T] after degenerate
    + facing cull. Front faces (GL CCW in y-up window coords) have NEGATIVE
    y-down area; back-face culling keeps area2 < 0 (raster.js:100-102).
    """
    w = clip[..., 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = clip[..., :3] * inv_w[..., None]
    x = (ndc[..., 0] + 1.0) * 0.5 * cols
    y = (1.0 - ndc[..., 1]) * 0.5 * rows
    z01 = (ndc[..., 2] + 1.0) * 0.5
    xy = jnp.stack([x, y], axis=-1)

    e0 = xy[:, 1] - xy[:, 0]
    e1 = xy[:, 2] - xy[:, 0]
    area2 = e0[..., 0] * e1[..., 1] - e0[..., 1] * e1[..., 0]
    front = area2 < 0.0  # see docstring
    valid = valid & front & (jnp.abs(area2) > 1e-12)
    return {"xy": xy, "z01": z01, "inv_w": inv_w, "area2": area2, "valid": valid}


def _edge(ax, ay, bx, by, px, py):
    """Edge function: cross(b-a, p-a)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def visibility_scan(setup, rows: int, cols: int, chunk: int = 64):
    """Chunked z-buffer pass producing the visibility buffer.

    Returns (zbuf f32 [H,W], tid i32 [H,W], -1 = background). Each scan step
    rasterizes `chunk` triangles as a dense [C,H,W] program and min-merges.
    """
    xy, z01, valid = setup["xy"], setup["z01"], setup["valid"]
    T = xy.shape[0]
    C = min(chunk, max(T, 1))
    pad = (-T) % C
    if pad:
        padf = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)
        xy, z01 = padf(xy), padf(z01)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    n_chunks = (T + pad) // C

    px = jnp.arange(cols, dtype=jnp.float32) + 0.5
    py = jnp.arange(rows, dtype=jnp.float32) + 0.5
    pxg = px[None, :]  # [1, W]
    pyg = py[:, None]  # [H, 1]

    xs = xy[..., 0].reshape(n_chunks, C, 3)
    ys = xy[..., 1].reshape(n_chunks, C, 3)
    zs = z01.reshape(n_chunks, C, 3)
    vs = valid.reshape(n_chunks, C)
    tids = jnp.arange(T + pad, dtype=jnp.int32).reshape(n_chunks, C)

    def step(carry, inp):
        zbuf, tbuf = carry
        x, y, z, v, tid = inp
        # edge functions at all pixel centers: [C, H, W]
        w0 = _edge(x[:, 1, None, None], y[:, 1, None, None],
                   x[:, 2, None, None], y[:, 2, None, None], pxg, pyg)
        w1 = _edge(x[:, 2, None, None], y[:, 2, None, None],
                   x[:, 0, None, None], y[:, 0, None, None], pxg, pyg)
        w2 = _edge(x[:, 0, None, None], y[:, 0, None, None],
                   x[:, 1, None, None], y[:, 1, None, None], pxg, pyg)
        # front faces have negative orientation: inside = all edges <= 0
        inside = (w0 <= 0) & (w1 <= 0) & (w2 <= 0) & v[:, None, None]
        area = w0 + w1 + w2  # = area2 (negative)
        b0 = w0 / area
        b1 = w1 / area
        b2 = w2 / area
        zpix = b0 * z[:, 0, None, None] + b1 * z[:, 1, None, None] + b2 * z[:, 2, None, None]
        ok = inside & (zpix >= 0.0) & (zpix <= 1.0)
        zpix = jnp.where(ok, zpix, jnp.inf)
        kmin = jnp.argmin(zpix, axis=0)  # [H, W]
        zmin = jnp.min(zpix, axis=0)
        tmin = jnp.take_along_axis(tid[:, None, None] * jnp.ones_like(zpix, jnp.int32),
                                   kmin[None], axis=0)[0]
        better = zmin < zbuf
        return (jnp.where(better, zmin, zbuf),
                jnp.where(better, tmin, tbuf)), None

    z0 = jnp.full((rows, cols), jnp.inf, jnp.float32)
    t0 = jnp.full((rows, cols), -1, jnp.int32)
    (zbuf, tbuf), _ = jax.lax.scan(step, (z0, t0), (xs, ys, zs, vs, tids))
    return zbuf, tbuf


_COMPACT_KEYS = ("sxa", "sxb", "sxc", "sya", "syb", "syc",
                 "sza", "szb", "szc", "iwa", "iwb", "iwc", "area2")


def compact_valid_ch(ch, v_cap: int):
    """Order-preserving compaction of the valid clipped triangles.

    The clip expansion + culling leaves ~70% of the [2T] channel slots dead
    on real meshes (bunny headline: 41k valid of 137k), yet binning, the
    pair sort, and the shading-plane table all paid for every slot. This
    compacts the 13 screen channels to a static [v_cap] via one blocked
    cumsum + one unique-index scatter + one wide row gather (~0.5 ms at
    bunny scale vs ~2+ ms saved downstream).

    Returns (cch, cidx, n_valid): cch is a channel dict like ``ch`` but
    [v_cap]-shaped (slots past n_valid are inert zeros with valid=False),
    cidx [v_cap] i32 maps compacted slot -> original [2T] index (fill = 2T),
    n_valid is the dynamic count. **If n_valid > v_cap the overflow
    triangles are dropped** — callers must check the returned count
    (see `render_soup_diag` / `suggest_caps`) and re-render with a larger
    cap; compaction preserves ascending original order, so winner selection
    and depth-tie behavior are bit-identical to the uncompacted path."""
    keys = _COMPACT_KEYS
    valid = ch["valid"]
    n2t = valid.shape[0]
    assert v_cap <= MAX_V_CAP, f"v_cap {v_cap} exceeds {MAX_V_CAP}"
    n_valid = jnp.sum(valid.astype(jnp.int32))
    ids = jnp.arange(n2t, dtype=jnp.int32)
    key = jnp.where(valid, ids, n2t + ids)  # invalid sort after all valid
    skey = jax.lax.sort(key)
    if v_cap > n2t:  # [T]-domain callers may pass caps sized for [2T]
        skey = jnp.concatenate(
            [skey, jnp.full((v_cap - n2t,), n2t, jnp.int32)])
    cidx = jnp.where(skey[:v_cap] < n2t, skey[:v_cap], n2t)
    packed = jnp.stack([ch[k] for k in keys], axis=-1)  # [N, C]
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, len(keys)), jnp.float32)], axis=0)
    g = packed[cidx].T  # one wide row gather, then channel-major unpack
    cch = {k: g[i] for i, k in enumerate(keys)}
    cch["valid"] = cidx < n2t
    return cch, cidx, n_valid


def clip_attrs_compact_lists(attrs: jnp.ndarray, ch, cidx: jnp.ndarray):
    """clip_attrs_channel_lists, evaluated only at the compacted slots.

    attrs f32 [V=3T, A]; ch carries the per-source-triangle lerp records
    (rot, t_ab/t_ac/t_bc, n_in — all [T]); cidx [v_cap] holds original
    [2T]-space ids (o < T = first clip output of tri o, o >= T = second).
    Returns 3 slot lists of A channels, each [v_cap]."""
    V, A = attrs.shape
    T = V // 3
    n2t = 2 * T
    attr27 = attrs.reshape(T, 3 * A)  # row-major: v0 | v1 | v2 — a free view
    info = jnp.stack([
        ch["rot"].astype(jnp.float32), ch["t_ab"], ch["t_ac"], ch["t_bc"],
        (ch["n_in"] == 1).astype(jnp.float32),
        (ch["n_in"] == 2).astype(jnp.float32),
    ], axis=-1)  # [T, 6]
    src_tri = jnp.where(cidx < n2t, cidx % T, 0)
    is2 = cidx >= T  # dump slots land here too; their values are never read
    ai = attr27[src_tri].T   # [27, v_cap]
    fo = info[src_tri].T     # [6, v_cap]
    rot, ta, tc, tb = fo[0], fo[1], fo[2], fo[3]
    one_in = fo[4] > 0.5
    two_in = fo[5] > 0.5

    out_slots = [[], [], []]
    for j in range(A):
        base = [ai[0 * A + j], ai[1 * A + j], ai[2 * A + j]]
        r = [jnp.where(rot == 0.0, base[(0 + k) % 3],
                       jnp.where(rot == 1.0, base[(1 + k) % 3],
                                 base[(2 + k) % 3])) for k in range(3)]
        ab = r[0] + ta * (r[1] - r[0])
        ac = r[0] + tc * (r[2] - r[0])
        bc = r[1] + tb * (r[2] - r[1])
        t1b = jnp.where(one_in, ab, r[1])
        t1c = jnp.where(one_in, ac, jnp.where(two_in, bc, r[2]))
        out_slots[0].append(r[0])  # tri1 and tri2 share vertex a
        out_slots[1].append(jnp.where(is2, bc, t1b))
        out_slots[2].append(jnp.where(is2, ac, t1c))
    return out_slots


def count_big_small(ch, rows: int, cols: int, tile_window: int = 2):
    """Classify valid tris by bbox tile span (duplicates the binning
    classification; XLA CSEs it away when both live in one program).
    Returns (n_small, n_big) i32 scalars."""
    xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
    ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
    xmin = jnp.minimum(jnp.minimum(xa, xb), xc)
    xmax = jnp.maximum(jnp.maximum(xa, xb), xc)
    ymin = jnp.minimum(jnp.minimum(ya, yb), yc)
    ymax = jnp.maximum(jnp.maximum(ya, yb), yc)
    tx0 = jnp.floor(xmin / TILE_W).astype(jnp.int32)
    ty0 = jnp.floor(ymin / TILE_H).astype(jnp.int32)
    tx1 = jnp.floor(xmax / TILE_W).astype(jnp.int32)
    ty1 = jnp.floor(ymax / TILE_H).astype(jnp.int32)
    onscreen = (xmax > 0) & (xmin < cols) & (ymax > 0) & (ymin < rows)
    fits = ((tx1 - tx0) < tile_window) & ((ty1 - ty0) < tile_window)
    small = ch["valid"] & onscreen & fits
    big = ch["valid"] & onscreen & jnp.logical_not(fits)
    return small.sum().astype(jnp.int32), big.sum().astype(jnp.int32)


def clip_attrs_channel_lists(attrs: jnp.ndarray, ch):
    """Apply the clip rotation + lerp recorded by transform_clip_channels to
    per-vertex attributes, channel-wise. attrs f32 [V=3T, A] ->
    3 lists (one per output vertex slot) of A channels, each [2T]."""
    V, A = attrs.shape
    T = V // 3
    # One channel-major transpose up front: [V, A] -> [3*A, T]. Every
    # per-channel read below is then a contiguous [T] row instead of a
    # stride-A minor-axis slice (which wastes 1-1/A of every vector load;
    # measured 10.6 ms -> ~1 ms/frame on the 69k-tri headline).
    av_t = attrs.reshape(T, 3 * A).T
    rot = ch["rot"]
    n_in = ch["n_in"]
    one_in = n_in == 1
    two_in = n_in == 2
    ta, tc, tb = ch["t_ab"], ch["t_ac"], ch["t_bc"]

    def rot_sel(c0, c1, c2, r):
        return jnp.where(r == 0, c0, jnp.where(r == 1, c1, c2))

    out_slots = [[], [], []]  # per output slot: list of [2T] channels
    for j in range(A):
        base = [av_t[0 * A + j], av_t[1 * A + j], av_t[2 * A + j]]
        r = [rot_sel(base[(0 + k) % 3], base[(1 + k) % 3], base[(2 + k) % 3],
                     rot) for k in range(3)]
        ab = r[0] + ta * (r[1] - r[0])
        ac = r[0] + tc * (r[2] - r[0])
        bc = r[1] + tb * (r[2] - r[1])
        t1a = r[0]
        t1b = jnp.where(one_in, ab, r[1])
        t1c = jnp.where(one_in, ac, jnp.where(two_in, bc, r[2]))
        out_slots[0].append(jnp.concatenate([t1a, r[0]]))
        out_slots[1].append(jnp.concatenate([t1b, bc]))
        out_slots[2].append(jnp.concatenate([t1c, ac]))
    return out_slots


def clip_attrs_channels(attrs: jnp.ndarray, ch) -> jnp.ndarray:
    """Array-layout view of clip_attrs_channel_lists: tattr [2T, 3, A]
    (used by the scan/oracle paths and tests)."""
    out_slots = clip_attrs_channel_lists(attrs, ch)
    slot_arr = [jnp.stack(s, axis=-1) for s in out_slots]  # 3 x [2T, A]
    return jnp.stack(slot_arr, axis=1)  # [2T, 3, A]


def channels_clip_array(ch) -> jnp.ndarray:
    """Materialize the [2T, 3, 4] clip array from channels (one stack; used
    only by the deferred shading gather)."""
    rowsv = []
    for s in "abc":
        rowsv.append(jnp.stack([ch[f"x{s}"], ch[f"y{s}"], ch[f"z{s}"],
                                ch[f"w{s}"]], axis=-1))
    return jnp.stack(rowsv, axis=1)


def build_plane_table(ch, attr_slots) -> jnp.ndarray:
    """Per-triangle shading-plane table [N, 3*(A+1) padded to 8] (see
    shade_planes_ch): A attribute planes + the perspective denominator,
    3 coeffs each. A = 9 (nx ny nz cr cg cb wx wy wz) normally; 6 when
    the scene has no point lights (world-pos planes feed only the
    point-light terms — a static specialization worth ~25% of the
    table-build math at bunny scale)."""
    A = len(attr_slots[0])
    sx = [ch[f"sx{s}"] for s in "abc"]
    sy = [ch[f"sy{s}"] for s in "abc"]
    iw = [ch[f"iw{s}"] for s in "abc"]
    # edge-function coefficients: w_k = alpha_k*px + beta_k*py + gamma_k
    alpha, beta, gamma = [], [], []
    for k in range(3):
        x1, y1 = sx[(k + 1) % 3], sy[(k + 1) % 3]
        x2, y2 = sx[(k + 2) % 3], sy[(k + 2) % 3]
        alpha.append(-(y2 - y1))
        beta.append(x2 - x1)
        gamma.append((y2 - y1) * x1 - (x2 - x1) * y1)
    area = ch["area2"]  # w0+w1+w2 is constant per tri (set in setup)
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)

    planes = []  # 10 x (a, b, c) channels [2T]
    for j in range(A):
        av = [attr_slots[k][j] for k in range(3)]
        pa = sum(alpha[k] * iw[k] * av[k] for k in range(3)) * inv_area
        pb = sum(beta[k] * iw[k] * av[k] for k in range(3)) * inv_area
        pc = sum(gamma[k] * iw[k] * av[k] for k in range(3)) * inv_area
        planes.append((pa, pb, pc))
    da = sum(alpha[k] * iw[k] for k in range(3)) * inv_area
    db = sum(beta[k] * iw[k] for k in range(3)) * inv_area
    dc = sum(gamma[k] * iw[k] for k in range(3)) * inv_area
    planes.append((da, db, dc))

    chans = [c for p in planes for c in p]
    n = chans[0].shape[0]
    if n % 512 == 0:  # MXU-transpose pack (see ops/pack.py)
        from ascii_renderer_tpu.ops.pack import pack_channels
        return pack_channels(chans)
    table = jnp.stack(chans, axis=-1)
    pad = (-table.shape[1]) % 8
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((table.shape[0], pad), jnp.float32)], axis=-1)
    return table


def shade_planes_ch(tid, ch, attr_slots, scene: SceneData, rows: int,
                    cols: int):
    """Deferred shading via per-triangle screen-space PLANE coefficients.

    Perspective-correct interpolation of attribute A is N_A(p)/D(p) where
    both N_A = sum_k w_k(p) iw_k A_k / area and D = sum_k w_k(p) iw_k / area
    are LINEAR in the pixel coords (the edge functions w_k are). So each
    triangle precomputes 10 planes (9 attrs + denominator, 3 coeffs each)
    as cheap channel math, and the per-pixel stage is ONE 32-wide
    gather + ~40 FMAs — replacing the two wide vertex gathers (clip +
    attrs, ~80 MB of random access) the rederivation needed."""
    table = build_plane_table(ch, attr_slots)
    table = jnp.concatenate(
        [table, jnp.zeros((1, table.shape[1]), jnp.float32)], axis=0)  # bg
    return shade_from_table(tid, table, scene, rows, cols,
                            n_attrs=len(attr_slots[0]))


def visibility_binned_ch(ch, rows: int, cols: int, *, kernel: str = "mm",
                         big_cap: int = 64,
                         tile_window: int = 2):
    """Channel-major tile-binned visibility with EXACT per-tile bins.

    1. small triangles (bbox within a 2x2 tile window) emit up to 4
       (tile, tri) pairs; big triangles (up to ``big_cap``, compacted) emit
       one pair per bbox-overlapped tile — so walls/floors cost pairs, not
       a full-screen scan pass;
    2. one packed (tile << 19 | tri) i32 sort + searchsorted builds exact
       per-tile bin ranges;
    3. triangle channel data is pre-gathered into sorted-pair order and the
       Pallas kernel (ops/raster_bins.py) walks each tile's bin with a
       DYNAMIC chunk loop — nothing is capped or dropped, work scales with
       actual bin sizes.

    Only triangles beyond ``big_cap`` *screen-huge* ones are dropped (a
    scene with more than 64 wall-scale triangles on screen should raise
    the cap)."""
    from ascii_renderer_tpu.ops import raster_bins as RB

    xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
    ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
    za, zb, zc = ch["sza"], ch["szb"], ch["szc"]
    valid = ch["valid"]
    T = xa.shape[0]
    assert T < (1 << 19), "packed sort key supports < 524288 clipped tris"
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    wy = wx = tile_window

    xmin = jnp.minimum(jnp.minimum(xa, xb), xc)
    xmax = jnp.maximum(jnp.maximum(xa, xb), xc)
    ymin = jnp.minimum(jnp.minimum(ya, yb), yc)
    ymax = jnp.maximum(jnp.maximum(ya, yb), yc)
    tx0 = jnp.floor(xmin / TILE_W).astype(jnp.int32)
    ty0 = jnp.floor(ymin / TILE_H).astype(jnp.int32)
    tx1 = jnp.floor(xmax / TILE_W).astype(jnp.int32)
    ty1 = jnp.floor(ymax / TILE_H).astype(jnp.int32)
    onscreen = (xmax > 0) & (xmin < cols) & (ymax > 0) & (ymin < rows)
    fits = ((tx1 - tx0) < wx) & ((ty1 - ty0) < wy)
    small = valid & onscreen & fits
    big = valid & onscreen & jnp.logical_not(fits)

    # ---- small pairs: static 2x2 window ----
    # Built as wy*wx flat [T] channels, NOT a [T, wy, wx] array: minor dims
    # of size 2 put 2 of 128 vector lanes to work. The pre-sort pair order
    # differs from the array layout but the multiset of (tile, tri) keys is
    # identical, and the packed sort canonicalizes it.
    tri_ids = jnp.arange(T, dtype=jnp.int32)
    tile_small_parts = []
    for k in range(wy * wx):
        ty = ty0 + (k // wx)
        tx = tx0 + (k % wx)
        ok = (small & (ty >= 0) & (ty < tiles_y) & (tx >= 0) & (tx < tiles_x)
              & (ty <= ty1) & (tx <= tx1))
        tile_small_parts.append(jnp.where(ok, ty * tiles_x + tx, n_tiles))
    tile_small = jnp.concatenate(tile_small_parts)
    tri_small = jnp.tile(tri_ids, wy * wx)

    # ---- big pairs: per-overlapped-tile emission for <= big_cap tris ----
    # top_k on a 0/1 score instead of jnp.nonzero: one fused op vs the
    # ~50-op cumsum+scatter decomposition. XLA top_k is stable, so equal
    # scores keep ascending index order — same result as nonzero.
    scores, idxs = jax.lax.top_k(big.astype(jnp.int32), big_cap)
    big_idx = jnp.where(scores > 0, idxs, T)

    def padi(c, fill):
        return jnp.concatenate([c, jnp.asarray([fill], c.dtype)])[big_idx]

    btx0 = padi(tx0, 1)
    btx1 = padi(tx1, 0)  # fill slots get an empty range
    bty0 = padi(ty0, 1)
    bty1 = padi(ty1, 0)
    tids_grid = jnp.arange(n_tiles, dtype=jnp.int32)
    g_ty = tids_grid // tiles_x
    g_tx = tids_grid % tiles_x
    overlap = ((g_tx[None, :] >= btx0[:, None]) & (g_tx[None, :] <= btx1[:, None])
               & (g_ty[None, :] >= bty0[:, None]) & (g_ty[None, :] <= bty1[:, None])
               & (big_idx < T)[:, None])
    tile_big = jnp.where(overlap, tids_grid[None, :], n_tiles).reshape(-1)
    tri_big = jnp.broadcast_to(big_idx[:, None],
                               (big_cap, n_tiles)).reshape(-1).astype(jnp.int32)
    tri_big = jnp.minimum(tri_big, T - 1)  # fill slots point anywhere (dumped)

    tile_id = jnp.concatenate([tile_small, tile_big])
    pair_tri = jnp.concatenate([tri_small, tri_big])

    packed = jax.lax.sort((tile_id << 19) | pair_tri)
    tile_s = packed >> 19
    tri_s = packed & ((1 << 19) - 1)
    offsets = jnp.searchsorted(tile_s, jnp.arange(n_tiles + 1,
                                                  dtype=jnp.int32)
                               ).astype(jnp.int32)

    # ---- pre-gather channel data into sorted-pair order ----
    # ONE [P, 16] row gather instead of nine 1-D gathers: TPU gather cost
    # is dominated by rows/sec, not bytes, so packing all entry channels
    # into 64 B rows first is ~9x cheaper (measured: 35 ms -> 4 ms/frame
    # on the 69k-tri headline). Channel 10 is prefilled with arange(T) so
    # the gathered value IS the source triangle id; tri_s is always in
    # [0, T) (small pairs carry real ids, big fill slots are min'd to T-1)
    # so no fill row is needed.
    P = tri_s.shape[0]
    # entries in PLANE form (see ops/raster_bins.py): per-edge coefficients
    # w_k = A_k*px + B_k*py + G_k plus the screen-linear depth plane
    # z = ZX*px + ZY*py + ZC — the kernel then runs pure FMAs with no
    # per-pixel divide. Computed as [2T] channel math, negligible next to
    # the per-pixel work it removes from the kernel.
    sxv, syv, szv = (xa, xb, xc), (ya, yb, yc), (za, zb, zc)
    acs, bcs, gcs = [], [], []
    for k in range(3):
        x1, y1 = sxv[(k + 1) % 3], syv[(k + 1) % 3]
        x2, y2 = sxv[(k + 2) % 3], syv[(k + 2) % 3]
        acs.append(-(y2 - y1))
        bcs.append(x2 - x1)
        gcs.append((y2 - y1) * x1 - (x2 - x1) * y1)
    area = (xb - xa) * (yc - ya) - (yb - ya) * (xc - xa)  # == w0+w1+w2
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    zpx = (acs[0] * za + acs[1] * zb + acs[2] * zc) * inv_area
    zpy = (bcs[0] * za + bcs[1] * zb + bcs[2] * zc) * inv_area
    zpc = (gcs[0] * za + gcs[1] * zb + gcs[2] * zc) * inv_area
    src = jnp.stack([
        acs[0], bcs[0], gcs[0], acs[1], bcs[1], gcs[1],
        acs[2], bcs[2], gcs[2], zpx, zpy, zpc,
        jnp.ones_like(xa),
        jnp.arange(xa.shape[0], dtype=jnp.float32),
    ], axis=-1)
    src = jnp.concatenate(
        [src, jnp.zeros((src.shape[0], RB.N_CHAN - 14), jnp.float32)],
        axis=-1)
    # inert tail so any aligned slab read past the last bin stays in bounds,
    # rounded so the packed layout divides evenly. Folded into the gather:
    # row T of src is all-zero and the padded tail of tri_s points at it,
    # so the single row gather emits the padded table directly.
    if kernel == "mm":
        tail = 2 * RB.MM_CHUNK
        quantum = RB.MM_CHUNK
    else:
        tail = RB.CHUNK + 8 * RB.PACK
        quantum = RB.PACK
    total = P + tail
    pad_rows = (-total) % quantum + tail
    src = jnp.concatenate([src, jnp.zeros((1, RB.N_CHAN), jnp.float32)])
    tri_sp = jnp.concatenate(
        [tri_s, jnp.full((pad_rows,), src.shape[0] - 1, jnp.int32)])
    data = src[tri_sp]
    if kernel == "mm":
        mm = data.reshape(-1, RB.MM_CHUNK, RB.N_CHAN).transpose(0, 2, 1)
        ztile, tidf = RB.tile_eval_bins_mm(mm, offsets, tiles_x, n_tiles)
    else:
        packed = RB.pack_entries(data)
        ztile, tidf = RB.tile_eval_bins(packed, offsets, tiles_x, n_tiles)
    tt = tidf.astype(jnp.int32)

    zimg = (ztile.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W))
    timg = (tt.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W))
    zbuf = zimg[:rows, :cols]
    tid = jnp.where(timg[:rows, :cols] < 0, -1, timg[:rows, :cols])
    return zbuf, tid


def visibility_binned(setup, rows: int, cols: int, slots: int = 256,
                      tile_window: int = 2, big_cap: int = 64,
                      slot_chunk: int = 16):
    """Setup-dict adapter over visibility_binned_ch (kept for tests and
    API compatibility; `slots`/`slot_chunk` are obsolete no-ops from the
    fixed-slot-table design)."""
    xy, z01 = setup["xy"], setup["z01"]
    ch = {
        "sxa": xy[:, 0, 0], "sya": xy[:, 0, 1],
        "sxb": xy[:, 1, 0], "syb": xy[:, 1, 1],
        "sxc": xy[:, 2, 0], "syc": xy[:, 2, 1],
        "sza": z01[:, 0], "szb": z01[:, 1], "szc": z01[:, 2],
        "valid": setup["valid"],
    }
    return visibility_binned_ch(ch, rows, cols, big_cap=big_cap,
                                tile_window=tile_window)


def shade_visibility(tid, clip, attrs, scene: SceneData, rows: int, cols: int):
    """Deferred pass: gather winner-triangle data per pixel, reconstruct
    perspective-correct barycentrics, run the fragment lighting."""
    hit = tid >= 0
    safe = jnp.maximum(tid, 0)
    tri_clip = clip[safe]  # [H, W, 3, 4]
    tri_attr = attrs[safe]  # [H, W, 3, A]

    w = tri_clip[..., 3]
    inv_w = 1.0 / jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    ndc = tri_clip[..., :2] * inv_w[..., None]
    x = (ndc[..., 0] + 1.0) * 0.5 * cols
    y = (1.0 - ndc[..., 1]) * 0.5 * rows

    px = jnp.arange(cols, dtype=jnp.float32)[None, :] + 0.5
    py = jnp.arange(rows, dtype=jnp.float32)[:, None] + 0.5
    w0 = _edge(x[..., 1], y[..., 1], x[..., 2], y[..., 2], px, py)
    w1 = _edge(x[..., 2], y[..., 2], x[..., 0], y[..., 0], px, py)
    w2 = _edge(x[..., 0], y[..., 0], x[..., 1], y[..., 1], px, py)
    area = w0 + w1 + w2
    area = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    b = jnp.stack([w0, w1, w2], axis=-1) / area[..., None]  # [H, W, 3]

    # perspective-correct interpolation (GL default for varyings)
    bw = b * inv_w
    denom = jnp.sum(bw, axis=-1, keepdims=True)
    bpc = bw / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    interp = jnp.einsum("hwk,hwka->hwa", bpc, tri_attr)  # [H, W, A]

    nrm = interp[..., 0:3]
    col = interp[..., 3:6]
    pos = interp[..., 6:9]
    n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)

    ambient = scene.env_color * scene.env_intensity
    # default directional light when the scene has none (raster.js:66-69)
    have_dl = scene.n_dl > 0
    ddir = jnp.where(have_dl, scene.dl_dir[0],
                     jnp.asarray(_DEFAULT_DIR, jnp.float32))
    dcol = jnp.where(have_dl, scene.dl_col[0],
                     jnp.asarray(_DEFAULT_DIR_COL, jnp.float32))
    out = col * ambient
    ndl = jnp.maximum(jnp.sum(n * (-ddir), axis=-1), 0.0)
    out = out + col * dcol * ndl[..., None]

    pl_valid = jnp.arange(scene.pt_pos.shape[0]) < scene.n_pt
    for i in range(scene.pt_pos.shape[0]):
        lvec = scene.pt_pos[i] - pos
        d2 = jnp.maximum(jnp.sum(lvec * lvec, axis=-1), 1e-4)
        L = lvec / jnp.sqrt(d2)[..., None]
        ndlp = jnp.maximum(jnp.sum(n * L, axis=-1), 0.0)
        att = 1.0 / (1.0 + d2 * 0.05)
        w_i = jnp.where(pl_valid[i], ndlp * att, 0.0)
        out = out + col * scene.pt_col[i] * w_i[..., None]

    out = jnp.clip(out, 0.0, 1.0)
    return jnp.where(hit[..., None], out, 0.0)  # clear color black


def render_channels_diag(positions, attrs, scene: SceneData, mvp,
                         rows: int, cols: int, *, v_cap: int,
                         big_cap: int = 64, kernel: str = "mm",
                         r_cap: int = 16384, pair_cap: int = 65536,
                         tile_cap: int | None = None, pos9=None):
    """Clip-expansion generations of render_soup_diag (kernels 'mm',
    'loop', 'subtile'): compacted channel pipeline + binned bin-walk.
    See backends.raster.render_soup_diag for the returned contract."""
    from ascii_renderer_tpu.backends.raster import transform_clip_channels9

    ch = (transform_clip_channels9(pos9, mvp) if pos9 is not None
          else transform_clip_channels(positions, mvp))
    ch = setup_screen_channels(ch, rows, cols)
    cch, cidx, n_valid = compact_valid_ch(ch, v_cap)
    attr_slots = clip_attrs_compact_lists(attrs, ch, cidx)
    if kernel == "subtile":
        from ascii_renderer_tpu.backends import raster_oracles as RO

        tiles_y = -(-rows // TILE_H)
        tiles_x = -(-cols // TILE_W)
        if tile_cap is None:
            tile_cap = tiles_y * tiles_x  # safe default: no compaction win
        etile, nonempty, n_rows, n_pairs = RO.visibility_subtile_tiles(
            cch, rows, cols, big_cap=big_cap, r_cap=r_cap,
            pair_cap=pair_cap)
        # kernel emits triangle ids -> shade indexes the per-triangle
        # plane table directly (one trailing all-zero background row)
        table = build_plane_table(cch, attr_slots)  # [v_cap, W]
        table = jnp.concatenate(
            [table, jnp.zeros((1, table.shape[1]), jnp.float32)], axis=0)
        rgb = RO.shade_tiles_compact(etile, nonempty, table, scene, rows,
                                     cols, tile_cap=tile_cap,
                                     n_attrs=len(attr_slots[0]))
        _n_small, n_big = count_big_small(cch, rows, cols)
        n_tiles_nz = nonempty.sum().astype(jnp.int32)
        return rgb, {"n_valid": n_valid, "n_big": n_big,
                     "n_rows": n_rows, "n_pairs": n_pairs,
                     "n_tiles_nz": n_tiles_nz}
    _zbuf, tid = visibility_binned_ch(cch, rows, cols, kernel=kernel,
                                      big_cap=big_cap)
    rgb = shade_planes_ch(tid, cch, attr_slots, scene, rows, cols)
    _n_small, n_big = count_big_small(cch, rows, cols)
    zero = jnp.zeros((), jnp.int32)
    return rgb, {"n_valid": n_valid, "n_big": n_big,
                 "n_rows": zero, "n_pairs": zero, "n_tiles_nz": zero}
