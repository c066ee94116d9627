#!/usr/bin/env python
"""Per-stage device timing of the 960x540/69k-tri headline raster pipeline
(the compacted subtile path — the one RasterBackend and bench.py config 3
actually run at this scale).

Times each pipeline stage as its own jitted program with the amortized
dispatch method (bench.py `_time_fn`): N back-to-back dispatches,
materialize only the last, divide by N. Stage inputs are precomputed and
materialized so each timing covers only that stage. The sum of stages
overstates the fused frame (XLA fuses across stage boundaries) — use it
for RELATIVE budget, the FULL row for truth.

Usage: python tools/profile_raster.py [--rows 540 --cols 960 --tris 69000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _materialize(out):
    import jax
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def _time_fn(fn, args, warmup=2, iters=32):
    for _ in range(warmup):
        _materialize(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _materialize(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=540)
    ap.add_argument("--cols", type=int, default=960)
    ap.add_argument("--tris", type=int, default=69000)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from ascii_renderer_tpu.core.config import Config
    from ascii_renderer_tpu.geom import meshes
    from ascii_renderer_tpu.scene.builder import SceneBuilder
    from ascii_renderer_tpu.core.camera import Camera
    from ascii_renderer_tpu.backends import raster as R
    from ascii_renderer_tpu.ops import raster_subtile as RS
    from ascii_renderer_tpu.core.frame import Frame
    from ascii_renderer_tpu.ascii.ascii_pass import glyph_decide
    import functools

    cfg = Config(pixel_aspect=0.5)
    rows, cols = args.rows, args.cols
    v, i = meshes.bunny_like(args.tris)
    p, n, c = meshes.mesh_to_soup(v, i, color=(0.8, 0.78, 0.75))
    sb = SceneBuilder().set_env_light([0.22, 0.24, 0.28], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    cam_pos = (2.4, 1.4, 2.8)
    cam = Camera.create(pos=cam_pos,
                        yaw=float(np.arctan2(-cam_pos[2], -cam_pos[0])),
                        pitch=-0.3)
    p, n, c = jnp.asarray(p), jnp.asarray(n), jnp.asarray(c)
    # mirror render_soup_diag's lightless-scene attr specialization
    if scene.pt_pos.shape[0] == 0:
        attrs = jnp.concatenate([n, c], axis=1)
    else:
        attrs = jnp.concatenate([n, c, p], axis=1)
    n_attrs = attrs.shape[1]
    mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)
    tiles_y = -(-rows // R.TILE_H)
    tiles_x = -(-cols // R.TILE_W)
    n_tiles = tiles_y * tiles_x

    # ---- adaptive caps exactly as bench/_probe_caps sizes them ----
    n2t = p.shape[0] // 3 * 2
    probe = jax.jit(functools.partial(
        R.render_soup_diag, rows=rows, cols=cols,
        pixel_aspect=cfg.pixel_aspect, kernel="subtile", v_cap=n2t,
        big_cap=64, r_cap=R._round_up(n2t, 2048), pair_cap=4 * n2t))
    _, diag = probe(p, n, c, scene, cam)
    counts = tuple(int(diag[k]) for k in
                   ("n_valid", "n_big", "n_rows", "n_pairs", "n_tiles_nz"))
    v_cap, big_cap, r_cap, pair_cap, tile_cap = R.suggest_caps_subtile(*counts)
    print(f"counts={counts} caps={(v_cap, big_cap, r_cap, pair_cap, tile_cap)}",
          file=sys.stderr)

    # ---- stage functions ----
    # Each stage is timed via a ONE-SCALAR reducer twin: the axon tunnel
    # charges ~30 ms RTT per materialized output leaf, so multi-output
    # stage timings are garbage (PARITY.md "measurement gotchas"). The
    # reducer must also defeat DCE: plain sums are permutation-invariant,
    # so the sort stage uses an order-dependent weighting.
    def _red(out):
        s = jnp.zeros((), jnp.float32)
        for leaf in jax.tree.leaves(out):
            s = s + jnp.sum(leaf.astype(jnp.float32) if leaf.dtype != jnp.float32
                            else leaf)
        return s

    def s_vertex_f(p, mvp):
        ch = R.transform_clip_channels(p, mvp)
        return R.setup_screen_channels(ch, rows, cols)

    def s_compact_f(ch):
        return R.compact_valid_ch(ch, v_cap)

    def s_attrs_f(attrs, ch, cidx):
        return R.clip_attrs_compact_lists(attrs, ch, cidx)

    def s_keys_f(cch):
        return R._subtile_pair_keys(cch, rows, cols, big_cap=big_cap)

    def s_src_f(cch):
        return R._entry_planes_src(cch)

    def s_rows_f(src, keys):
        return RS.build_packed_rows(src, keys, tiles_x, n_tiles, r_cap,
                                    pair_cap)

    def s_rows_old_f(src, keys):
        return RS.build_subtile_rows(src, keys, tiles_x, n_tiles, r_cap,
                                     pair_cap)

    def s_kernel_f(rows128, rowptr):
        return RS.tile_eval_packed(rows128, rowptr, tiles_x, n_tiles)

    def s_table_f(cch, attr_slots, keys):
        table = R.build_plane_table(cch, attr_slots)
        return jnp.concatenate(
            [table, jnp.zeros((1, table.shape[1]), jnp.float32)], axis=0)

    def s_shade_f(etile, nonempty, ptable):
        return R.shade_tiles_compact(etile, nonempty, ptable, scene, rows,
                                     cols, tile_cap=tile_cap, n_attrs=n_attrs)

    def s_glyph_f(rgb):
        frame = Frame.from_float(rgb)
        chars, _t = glyph_decide(
            frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
            mode_radius=cfg.mode_radius, mode_thresh=cfg.ascii_mode_thresh,
            grayscale=cfg.use_grayscale)
        return chars

    s_vertex = jax.jit(s_vertex_f)
    s_compact = jax.jit(s_compact_f)
    s_attrs = jax.jit(s_attrs_f)
    s_keys = jax.jit(s_keys_f)
    s_src = jax.jit(s_src_f)
    s_rows = jax.jit(s_rows_f)
    s_kernel = jax.jit(s_kernel_f)
    s_table = jax.jit(s_table_f)
    s_shade = jax.jit(s_shade_f)
    s_glyph = jax.jit(s_glyph_f)

    # one-scalar timing twins
    t_vertex = jax.jit(lambda p, mvp: _red(s_vertex_f(p, mvp)))
    t_compact = jax.jit(lambda ch: _red(s_compact_f(ch)))
    t_attrs = jax.jit(lambda a, ch, ci: _red(s_attrs_f(a, ch, ci)))
    # order-dependent reduction or the sort is DCE'd (sum is perm-invariant)
    def _t_keys(cch):
        keys = s_keys_f(cch)
        w = jnp.arange(keys.shape[0], dtype=jnp.float32) % 7.0
        return jnp.sum(keys.astype(jnp.float32) * w)
    t_keys = jax.jit(_t_keys)
    t_src = jax.jit(lambda cch: _red(s_src_f(cch)))
    t_rows = jax.jit(lambda src, keys: _red(s_rows_f(src, keys)))
    t_rows_old = jax.jit(lambda src, keys: _red(s_rows_old_f(src, keys)))
    t_kernel = jax.jit(lambda rd, rp: _red(s_kernel_f(rd, rp)))
    t_table = jax.jit(lambda cch, a, k: _red(s_table_f(cch, a, k)))
    t_shade = jax.jit(lambda e, ne, pt: _red(s_shade_f(e, ne, pt)))
    t_glyph = jax.jit(lambda rgb: _red(s_glyph_f(rgb)))

    full_diag = jax.jit(functools.partial(
        R.render_soup_diag, rows=rows, cols=cols,
        pixel_aspect=cfg.pixel_aspect, kernel="subtile", v_cap=v_cap,
        big_cap=big_cap, r_cap=r_cap, pair_cap=pair_cap, tile_cap=tile_cap))

    @jax.jit
    def s_full(p, n, c, scene, cam):
        rgb, _d = full_diag(p, n, c, scene, cam)
        frame = Frame.from_float(rgb)
        chars, _t = glyph_decide(
            frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
            mode_radius=cfg.mode_radius, mode_thresh=cfg.ascii_mode_thresh,
            grayscale=cfg.use_grayscale)
        return chars

    # ---- materialize stage inputs ----
    ch = s_vertex(p, mvp)
    _materialize(ch)
    cch, cidx, n_valid = s_compact(ch)
    _materialize((cch, cidx))
    attr_slots = s_attrs(attrs, ch, cidx)
    _materialize(attr_slots)
    keys = s_keys(cch)
    _materialize(keys)
    src = s_src(cch)
    _materialize(src)
    rows_data, rowptr, n_rows, n_pairs = s_rows(src, keys)
    _materialize((rows_data, rowptr))
    ztile, etile = s_kernel(rows_data, rowptr)
    _materialize((ztile, etile))
    nonempty = jax.jit(lambda rp: rp[1:] > rp[:-1])(rowptr)
    ptable = s_table(cch, attr_slots, keys)
    _materialize(ptable)
    rgb = s_shade(etile, nonempty, ptable)
    _materialize(rgb)
    _materialize(s_glyph(rgb))
    _materialize(s_full(p, n, c, scene, cam))

    @jax.jit
    def t_full(p, n, c, scene, cam):
        return jnp.sum(s_full(p, n, c, scene, cam).astype(jnp.float32))

    it = args.iters
    stages = [
        ("vertex+setup      ", t_vertex, (p, mvp)),
        ("compact valid     ", t_compact, (ch,)),
        ("attr clip/lerp    ", t_attrs, (attrs, ch, cidx)),
        ("pair keys + sort  ", t_keys, (cch,)),
        ("entry planes src  ", t_src, (cch,)),
        ("packed row build  ", t_rows, (src, keys)),
        ("OLD row build     ", t_rows_old, (src, keys)),
        ("packed kernel     ", t_kernel, (rows_data, rowptr)),
        ("plane table+pgath ", t_table, (cch, attr_slots, keys)),
        ("tile-compact shade", t_shade, (etile, nonempty, ptable)),
        ("glyph decide      ", t_glyph, (rgb,)),
        ("FULL fused        ", t_full, (p, n, c, scene, cam)),
    ]
    total = 0.0
    for name, fn, a in stages:
        dt = _time_fn(fn, a, warmup=2, iters=it)
        if not (name.startswith("FULL") or name.startswith("OLD")):
            total += dt
        print(f"{name}: {dt*1e3:8.3f} ms")
    print(f"sum of stages     : {total*1e3:8.3f} ms")
    print(f"rows buffer: {r_cap}x16x128 f32 = "
          f"{r_cap*16*128*4/1e6:.0f} MB; true rows {counts[2]} "
          f"({counts[2]*16*128*4/1e6:.0f} MB)")


if __name__ == "__main__":
    main()
