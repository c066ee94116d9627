"""Retired raster pipeline generations, kept as bit-equivalence oracles.

Each generation here was once the live path and is superseded by a
faster one, but stays load-bearing as a test oracle: the equivalence
suites (tests/test_raster_channels.py, tests/test_raster_group.py)
assert the current headline pipeline produces bit-identical winner ids
against these.

  - `visibility_subtile` / `visibility_subtile_tiles` — generation-1
    subtile-packed walk over the compacted [v_cap] channel domain.
  - `render_subtile2_diag` — generation-2: 2DH setup (no clip
    expansion, [T] domain) + tile-ordered packed rows + tile-compacted
    shading. The live subtile3 path replaced its rows build with
    depth-sorted grouped bins (ops/raster_group).
  - `render_fused_ch` — fused rasterize+shade kernel (no visibility
    buffer); measured slower than deferred shading at bunny scale.

Every name here is re-exported by ``ascii_renderer_tpu.backends.raster``
— external code should keep importing through there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ascii_renderer_tpu.backends.raster_common import (
    _DEFAULT_DIR, _DEFAULT_DIR_COL, TILE_H, TILE_W, _round_up,
    _shade_rows)
from ascii_renderer_tpu.scene.builder import SceneData


def _build_bins(ch, rows: int, cols: int, big_cap: int = 64,
                tile_window: int = 2):
    """Shared binning prep: (tile, tri) pairs -> packed sort -> offsets.
    Returns (tri_s [P] i32 sorted pair tri-ids, offsets [n_tiles+1] i32,
    tiles_y, tiles_x)."""
    xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
    ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
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

    oy = jnp.arange(wy, dtype=jnp.int32)
    ox = jnp.arange(wx, dtype=jnp.int32)
    ty = ty0[:, None, None] + oy[None, :, None]
    tx = tx0[:, None, None] + ox[None, None, :]
    pair_ok = (small[:, None, None]
               & (ty >= 0) & (ty < tiles_y) & (tx >= 0) & (tx < tiles_x)
               & (ty <= ty1[:, None, None]) & (tx <= tx1[:, None, None]))
    tile_small = jnp.where(pair_ok, ty * tiles_x + tx, n_tiles).reshape(-1)
    tri_small = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[:, None, None], (T, wy, wx)).reshape(-1)

    (big_idx,) = jnp.nonzero(big, size=big_cap, fill_value=T)

    def padi(c, fill):
        return jnp.concatenate([c, jnp.asarray([fill], c.dtype)])[big_idx]

    btx0 = padi(tx0, 1)
    btx1 = padi(tx1, 0)
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
    tri_big = jnp.minimum(tri_big, T - 1)

    tile_id = jnp.concatenate([tile_small, tile_big])
    pair_tri = jnp.concatenate([tri_small, tri_big])
    packed = jax.lax.sort((tile_id << 19) | pair_tri)
    tile_s = packed >> 19
    tri_s = packed & ((1 << 19) - 1)
    offsets = jnp.searchsorted(tile_s, jnp.arange(n_tiles + 1,
                                                  dtype=jnp.int32)
                               ).astype(jnp.int32)
    return tri_s, offsets, tiles_y, tiles_x


def render_fused_ch(ch, attr_slots, scene: SceneData, rows: int, cols: int,
                    big_cap: int = 64):
    """Fully fused rasterization: binning + the shaded Pallas kernel
    (ops/raster_bins.tile_eval_bins_shaded) — no visibility buffer, no
    deferred gathers. attr_slots: 3 lists of 9 channels [2T] each
    (nx ny nz cr cg cb wx wy wz per output vertex slot)."""
    from ascii_renderer_tpu.ops import raster_bins as RB

    tri_s, offsets, tiles_y, tiles_x = _build_bins(ch, rows, cols, big_cap)
    n_tiles = tiles_y * tiles_x
    P = tri_s.shape[0]

    def padg(c, fill=0.0):
        return jnp.concatenate([c, jnp.asarray([fill], c.dtype)])[tri_s]

    chans = [jnp.ones((P,), jnp.float32)]  # S_VALID
    for key in ("sxa", "sxb", "sxc", "sya", "syb", "syc"):
        chans.append(padg(ch[key]))
    for key in ("sza", "szb", "szc"):
        chans.append(padg(ch[key], jnp.inf))
    for key in ("iwa", "iwb", "iwc"):
        chans.append(padg(ch[key]))
    for slot in range(3):
        for a in range(9):
            chans.append(padg(attr_slots[slot][a]))
    data = jnp.stack(chans, axis=-1)  # [P, 40]
    data = jnp.concatenate(
        [data, jnp.zeros((P, RB.NS_CHAN - data.shape[1]), jnp.float32)],
        axis=-1)
    tail = RB.S_CHUNK + 8 * RB.NS_PACK
    total = P + tail
    pad_rows = (-total) % RB.NS_PACK + tail
    data = jnp.concatenate(
        [data, jnp.zeros((pad_rows, RB.NS_CHAN), jnp.float32)], axis=0)
    packed = data.reshape(data.shape[0] // RB.NS_PACK,
                          RB.NS_PACK * RB.NS_CHAN)

    # light params (matches shade_visibility's semantics)
    ambient = scene.env_color * scene.env_intensity
    have_dl = scene.n_dl > 0
    ddir = jnp.where(have_dl, scene.dl_dir[0],
                     jnp.asarray(_DEFAULT_DIR, jnp.float32))
    dcol = jnp.where(have_dl, scene.dl_col[0],
                     jnp.asarray(_DEFAULT_DIR_COL, jnp.float32))
    n_pl = jnp.minimum(scene.n_pt, RB.L_MAX_PL).astype(jnp.float32)
    lp = jnp.zeros((64,), jnp.float32)
    lp = lp.at[0:3].set(ambient).at[3:6].set(ddir).at[6:9].set(dcol)
    lp = lp.at[9].set(n_pl)
    for i in range(min(RB.L_MAX_PL, scene.pt_pos.shape[0])):
        lp = lp.at[10 + 6 * i: 13 + 6 * i].set(scene.pt_pos[i])
        lp = lp.at[13 + 6 * i: 16 + 6 * i].set(scene.pt_col[i])

    rgbt = RB.tile_eval_bins_shaded(packed, offsets, lp, tiles_x, n_tiles)
    img = (rgbt.reshape(tiles_y, tiles_x, 3, TILE_H, TILE_W)
           .transpose(0, 3, 1, 4, 2)
           .reshape(tiles_y * TILE_H, tiles_x * TILE_W, 3))
    return img[:rows, :cols]


def _entry_planes_src(ch) -> jnp.ndarray:
    """Per-triangle GLOBAL-coordinate plane channels for the subtile kernel:
    src f32 [T+1, 16] with A/B/G per edge + ZX/ZY/ZC depth plane (pixel-
    center form: w_k = A_k*px + B_k*py + G_k evaluated at px+0.5 handled by
    the per-pair fold in build_subtile_rows). Row T is the all-zero dump."""
    xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
    ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
    za, zb, zc = ch["sza"], ch["szb"], ch["szc"]
    sxv, syv = (xa, xb, xc), (ya, yb, yc)
    acs, bcs, gcs = [], [], []
    for k in range(3):
        x1, y1 = sxv[(k + 1) % 3], syv[(k + 1) % 3]
        x2, y2 = sxv[(k + 2) % 3], syv[(k + 2) % 3]
        acs.append(-(y2 - y1))
        bcs.append(x2 - x1)
        gcs.append((y2 - y1) * x1 - (x2 - x1) * y1)
    area = (xb - xa) * (yc - ya) - (yb - ya) * (xc - xa)
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    zpx = (acs[0] * za + acs[1] * zb + acs[2] * zc) * inv_area
    zpy = (bcs[0] * za + bcs[1] * zb + bcs[2] * zc) * inv_area
    zpc = (gcs[0] * za + gcs[1] * zb + gcs[2] * zc) * inv_area
    zero = jnp.zeros_like(xa)
    src = jnp.stack([
        acs[0], bcs[0], gcs[0], acs[1], bcs[1], gcs[1],
        acs[2], bcs[2], gcs[2], zpx, zpy, zpc,
        zero, zero, zero, zero,
    ], axis=-1)
    # dump row (dead bin slots): G0 = +1 -> w0 > 0 never inside; ZC = 2
    # as belt-and-braces (z > 1 also fails the depth-range test)
    dump = jnp.zeros((1, 16), jnp.float32).at[0, 2].set(1.0).at[0, 11].set(2.0)
    return jnp.concatenate([src, dump], axis=0)


def _subtile_pair_keys(cch, rows: int, cols: int, *, big_cap: int):
    """Sorted (bin << SUB_SHIFT | tri) pair keys for the subtile pipeline
    (see visibility_subtile for the binning rules)."""
    from ascii_renderer_tpu.ops import raster_subtile as RS
    from ascii_renderer_tpu.backends.raster import _pair_keys_core

    xa, xb, xc = cch["sxa"], cch["sxb"], cch["sxc"]
    ya, yb, yc = cch["sya"], cch["syb"], cch["syc"]
    xmin = jnp.minimum(jnp.minimum(xa, xb), xc)
    xmax = jnp.maximum(jnp.maximum(xa, xb), xc)
    ymin = jnp.minimum(jnp.minimum(ya, yb), yc)
    ymax = jnp.maximum(jnp.maximum(ya, yb), yc)
    return _pair_keys_core(xmin, xmax, ymin, ymax, cch["valid"], rows, cols,
                           big_cap=big_cap)


def visibility_subtile(cch, rows: int, cols: int, *, big_cap: int = 64,
                       r_cap: int = 16384, pair_cap: int = 1 << 30):
    """Subtile-binned visibility via ops/raster_subtile (see its docstring).

    Bins are per (8-row tile, 16-px column subtile); small tris (bbox
    within a 2x2 tile-row x subtile-col window) emit up to 4 pairs, big
    tris (up to big_cap, compacted) one pair per overlapped subtile.
    Returns (zbuf f32 [rows, cols], pair_idx i32 [rows, cols] (-1 = bg),
    tri_s i32 [P] pair->triangle map, n_rows, n_pairs) — callers must
    check n_rows <= r_cap (aligned-layout capacity) for exactness."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    assert r_cap % RS.CHUNK_R == 0
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    keys = _subtile_pair_keys(cch, rows, cols, big_cap=big_cap)
    tri_s = (keys & (RS.MAX_TRI - 1)).astype(jnp.int32)

    src = _entry_planes_src(cch)
    rows_data, rowptr, n_rows, n_pairs = RS.build_subtile_rows(
        src, keys, tiles_x, n_tiles, r_cap, pair_cap, entry="pair")
    ztile, etile = RS.tile_eval_subtile(rows_data, rowptr, tiles_x, n_tiles)

    zimg = (ztile.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W))
    eimg = (etile.reshape(tiles_y, tiles_x, TILE_H, TILE_W)
            .transpose(0, 2, 1, 3).reshape(tiles_y * TILE_H, tiles_x * TILE_W))
    zbuf = zimg[:rows, :cols]
    eidx = eimg[:rows, :cols].astype(jnp.int32)
    eidx = jnp.where(eidx < 0, -1, eidx)
    return zbuf, eidx, tri_s, n_rows, n_pairs


def visibility_subtile_tiles(cch, rows: int, cols: int, *, big_cap: int,
                             r_cap: int, pair_cap: int):
    """Tiled-form twin of visibility_subtile for the tile-compacted shade:
    returns (etile f32 [n_tiles, 8, 128] winning TRIANGLE ids (-1 = bg),
    nonempty bool [n_tiles], n_rows, n_pairs). Emitting tri ids (not pair
    ids) lets shading index the per-triangle plane table directly — no
    [pair_cap]-row pair-table gather. A tile is nonempty iff it owns
    aligned rows (its bins hold at least one pair)."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    assert r_cap % RS.CHUNK_RP == 0
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    keys = _subtile_pair_keys(cch, rows, cols, big_cap=big_cap)
    src = _entry_planes_src(cch)
    rows128, rowptr, n_rows, n_pairs = RS.build_packed_rows(
        src, keys, tiles_x, n_tiles, r_cap, pair_cap, entry="tri")
    _ztile, etile = RS.tile_eval_packed(rows128, rowptr, tiles_x, n_tiles)
    nonempty = rowptr[1:] > rowptr[:-1]
    return etile, nonempty, n_rows, n_pairs


def shade_tiles_compact(etile, nonempty, ptable, scene: SceneData,
                        rows: int, cols: int, tile_cap: int, n_attrs: int):
    """Tile-compacted deferred shading: only NONEMPTY tiles' pixels run the
    plane-table gather + lighting (the bunny headline covers ~14% of the
    screen; the full-image gather paid for every background pixel).

    etile f32 [n_tiles, 8, 128] winning pair ids; ptable [P+1, W] with the
    trailing background row; returns rgb f32 [rows, cols, 3]. Tiles beyond
    ``tile_cap`` are dropped — callers check diag n_tiles_nz and retry."""
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    (nz_ids,) = jnp.nonzero(nonempty, size=tile_cap, fill_value=n_tiles)
    pad_tile = jnp.full((1, TILE_H, TILE_W), -1.0, jnp.float32)
    et = jnp.concatenate([etile, pad_tile], axis=0)[nz_ids]  # [tc, 8, 128]

    idx = et.reshape(-1).astype(jnp.int32)
    hit = idx >= 0
    g = ptable[jnp.where(hit, idx, ptable.shape[0] - 1)]  # [tc*1024, W]

    t_ids = jnp.minimum(nz_ids, n_tiles - 1)
    ty = (t_ids // tiles_x).astype(jnp.float32)
    tx = (t_ids % tiles_x).astype(jnp.float32)
    sub = jnp.arange(TILE_H, dtype=jnp.float32)
    lane = jnp.arange(TILE_W, dtype=jnp.float32)
    px = jnp.broadcast_to(
        tx[:, None, None] * TILE_W + lane[None, None, :] + 0.5,
        (tile_cap, TILE_H, TILE_W))
    py = jnp.broadcast_to(
        ty[:, None, None] * TILE_H + sub[None, :, None] + 0.5,
        (tile_cap, TILE_H, TILE_W))
    rgb_flat = _shade_rows(g, hit, px.reshape(-1), py.reshape(-1), scene,
                           n_attrs)
    rgb_tiles = rgb_flat.reshape(tile_cap, TILE_H, TILE_W, 3)
    full = jnp.zeros((n_tiles + 1, TILE_H, TILE_W, 3), jnp.float32)
    full = full.at[nz_ids].set(rgb_tiles, mode="drop")
    img = (full[:n_tiles].reshape(tiles_y, tiles_x, TILE_H, TILE_W, 3)
           .transpose(0, 2, 1, 3, 4)
           .reshape(tiles_y * TILE_H, tiles_x * TILE_W, 3))
    return img[:rows, :cols]


def render_subtile2_diag(attrs, scene: SceneData, mvp, rows: int,
                         cols: int, *, big_cap: int, r_cap: int,
                         pair_cap: int, tile_cap: int | None,
                         pos9=None, attrs_t=None, positions=None):
    """Generation-2 (kernel='subtile2') body of render_soup_diag: 2DH
    setup — no clip expansion, [T] domain — with tile-ordered packed
    rows and tile-compacted shading. No compaction either: T < 2^18
    fits the pair-key id budget directly, invalid triangles simply emit
    no pairs, and the sort order over original ids equals the compacted
    order (compaction preserved ascending ids) — so the whole
    valid-sort + 37-channel gather stage is deleted."""
    from ascii_renderer_tpu.backends import raster as R
    from ascii_renderer_tpu.ops import raster_subtile as RS
    from ascii_renderer_tpu.ops.pack import pack_channels

    if pos9 is None:
        pos9 = R.positions_to_pos9(positions)
    A = attrs.shape[1]
    if attrs_t is None:
        attrs_t = attrs.reshape(-1, 3 * A).T
    ach = R.setup_2dh(pos9, attrs_t, mvp, rows, cols)
    n_valid = jnp.sum(ach["valid"].astype(jnp.int32))
    tiles_y = -(-rows // TILE_H)
    tiles_x = -(-cols // TILE_W)
    n_tiles = tiles_y * tiles_x
    if tile_cap is None:
        tile_cap = n_tiles
    keys = R._subtile_pair_keys_bbox(ach, rows, cols, big_cap=big_cap)
    # ONE row-major pack serves both consumers by slicing: cols 0..11
    # kernel entry planes, col 12 the triangle id (an iota channel —
    # baking it here saves build_packed_rows a full [pair_cap, 32]
    # set-column copy pass), 13..15 don't-care (the expand matrix
    # zeroes them), cols 16..16+3A+2 the shade plane table.
    T_ = ach["e0a"].shape[0]
    src_ch = [ach[k] for k in
              ("e0a", "e0b", "e0c", "e1a", "e1b", "e1c",
               "e2a", "e2b", "e2c", "zx", "zy", "zc")]
    ids_ch = [jnp.arange(T_, dtype=jnp.float32), jnp.zeros((T_,)),
              jnp.zeros((T_,)), jnp.zeros((T_,))]
    plane_ch = [ach[k] for k in R._plane_keys_2dh(A)]
    # width 40 at A=6 (no point lights), 48 at A=9 (world-pos planes)
    g40 = pack_channels(src_ch + ids_ch + plane_ch,
                        width=-(-(16 + 3 * A + 3) // 8) * 8)
    rows128, rowptr, depth, n_rows, n_pairs = RS.build_packed_rows_pre_id(
        g40[:, :32], keys, tiles_x, n_tiles, r_cap, pair_cap)
    _ztile, etile = RS.tile_eval_packed_d(rows128, rowptr, depth,
                                          tiles_x, n_tiles)
    nonempty = rowptr[1:] > rowptr[:-1]
    # bg hits index the last row; _shade_rows selects 0 for non-hits,
    # so its content is irrelevant (no appended bg row needed)
    table = g40[:, 16:16 + 3 * A + 3]
    rgb = shade_tiles_compact(etile, nonempty, table, scene, rows,
                              cols, tile_cap=tile_cap, n_attrs=A)
    _n_small, n_big = R.count_big_small_bbox(ach, rows, cols)
    n_tiles_nz = nonempty.sum().astype(jnp.int32)
    return rgb, {"n_valid": n_valid, "n_big": n_big,
                 "n_rows": n_rows, "n_pairs": n_pairs,
                 "n_tiles_nz": n_tiles_nz}


def suggest_caps_subtile(n_valid: int, n_big: int, n_rows: int,
                         n_pairs: int, n_tiles_nz: int = 0):
    """Adaptive capacities for the subtile pipeline: (v_cap, big_cap,
    r_cap, pair_cap, tile_cap). Same margin policy as suggest_caps; r_cap
    stays a CHUNK_R multiple (kernel DMA granularity)."""
    from ascii_renderer_tpu.ops import raster_subtile as RS

    max_sub_v = RS.MAX_TRI - 4096
    v_cap = min(max_sub_v, _round_up(int(n_valid * 1.15) + 512, 4096))
    # n_big == 0 -> static big_cap = 0: the big key part drops out of the
    # compiled program entirely (see _subtile_pair_keys_bbox); the retry
    # loop re-caps if a big tri ever appears
    big_cap = 0 if n_big == 0 else max(16, _round_up(int(n_big * 1.5) + 8,
                                                     16))
    r_cap = _round_up(int(n_rows * 1.08) + 256, max(RS.CHUNK_R, 1024))
    pair_cap = _round_up(int(n_pairs * 1.15) + 512, 4096)
    tile_cap = _round_up(int(n_tiles_nz * 1.15) + 8, 32)
    return v_cap, big_cap, r_cap, pair_cap, tile_cap
