#!/usr/bin/env python
"""Prefix-cumulative device timing of the headline raster pipeline.

Times jitted PREFIXES of the real fused frame program, each reduced to one
f32 scalar (single host round-trip; see PARITY.md measurement gotchas).
Successive differences give each stage's marginal cost IN CONTEXT — with
XLA fusion across the stage boundary, unlike per-stage standalone timing.

Sort-prefix reductions are order-weighted so the sort can't be DCE'd.

Usage: python tools/profile_prefix.py [--rows 540 --cols 960 --tris 69000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_scalar(fn, args, warmup=2, iters=48):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=540)
    ap.add_argument("--cols", type=int, default=960)
    ap.add_argument("--tris", type=int, default=69000)
    ap.add_argument("--iters", type=int, default=48)
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
    if scene.pt_pos.shape[0] == 0:
        attrs_full = jnp.concatenate([n, c], axis=1)
    else:
        attrs_full = jnp.concatenate([n, c, p], axis=1)
    tiles_y = -(-rows // R.TILE_H)
    tiles_x = -(-cols // R.TILE_W)
    n_tiles = tiles_y * tiles_x

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

    def sm(x):
        return jnp.sum(x.astype(jnp.float32))

    # ---- prefix bodies (mirror render_soup_diag's subtile branch) ----
    pos9 = np.asarray(R.positions_to_pos9(p))
    pos9 = jnp.asarray(pos9)

    def pre_vertex(p, cam):
        mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)
        ch = R.transform_clip_channels9(pos9, mvp)
        return R.setup_screen_channels(ch, rows, cols)

    def pre_compact(p, cam):
        ch = pre_vertex(p, cam)
        return ch, R.compact_valid_ch(ch, v_cap)

    def pre_attrs(p, cam, attrs):
        ch, (cch, cidx, n_valid) = pre_compact(p, cam)
        slots = R.clip_attrs_compact_lists(attrs, ch, cidx)
        return cch, slots

    def pre_keys(p, cam, attrs):
        cch, slots = pre_attrs(p, cam, attrs)
        keys = R._subtile_pair_keys(cch, rows, cols, big_cap=big_cap)
        return cch, slots, keys

    def pre_rows(p, cam, attrs):
        cch, slots, keys = pre_keys(p, cam, attrs)
        src = R._entry_planes_src(cch)
        built = RS.build_packed_rows(src, keys, tiles_x, n_tiles, r_cap,
                                     pair_cap, entry="tri")
        return cch, slots, built

    def pre_kernel(p, cam, attrs):
        cch, slots, (rows128, rowptr, n_rows, n_pairs) = pre_rows(
            p, cam, attrs)
        z, e = RS.tile_eval_packed(rows128, rowptr, tiles_x, n_tiles)
        return cch, slots, rowptr, e

    def pre_table(p, cam, attrs):
        cch, slots, rowptr, e = pre_kernel(p, cam, attrs)
        table = R.build_plane_table(cch, slots)
        table = jnp.concatenate(
            [table, jnp.zeros((1, table.shape[1]), jnp.float32)], axis=0)
        return cch, slots, rowptr, e, table

    def pre_shade(p, cam, attrs, scene):
        cch, slots, rowptr, e, table = pre_table(p, cam, attrs)
        nonempty = rowptr[1:] > rowptr[:-1]
        rgb = R.shade_tiles_compact(e, nonempty, table, scene, rows, cols,
                                    tile_cap=tile_cap,
                                    n_attrs=len(slots[0]))
        return rgb

    def pre_glyph(p, cam, attrs, scene):
        rgb = pre_shade(p, cam, attrs, scene)
        frame = Frame.from_float(rgb)
        chars, _t = glyph_decide(
            frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
            mode_radius=cfg.mode_radius, mode_thresh=cfg.ascii_mode_thresh,
            grayscale=cfg.use_grayscale)
        return chars

    wkeys = None  # order weight, defined per-shape below

    def red_keys(keys):
        w = jnp.arange(keys.shape[0], dtype=jnp.float32) % 7.0
        return jnp.sum(keys.astype(jnp.float32) * w)

    prefixes = [
        ("vertex+setup ", jax.jit(lambda p, cam: sm(pre_vertex(p, cam)["sxa"])
                                  + sm(pre_vertex(p, cam)["valid"]))),
        ("+compact     ", jax.jit(lambda p, cam: sm(
            pre_compact(p, cam)[1][0]["sxa"]))),
        ("+attr lists  ", jax.jit(lambda p, cam, a: sum(
            sm(ch) for s in pre_attrs(p, cam, a)[1] for ch in s))),
        ("+keys sort   ", jax.jit(lambda p, cam, a: red_keys(
            pre_keys(p, cam, a)[2]))),
        ("+packed rows ", jax.jit(lambda p, cam, a: sm(
            pre_rows(p, cam, a)[2][0]))),
        ("+kernel      ", jax.jit(lambda p, cam, a: sm(
            pre_kernel(p, cam, a)[3]))),
        ("+plane table ", jax.jit(lambda p, cam, a: sm(
            pre_table(p, cam, a)[4]) + sm(pre_table(p, cam, a)[3]))),
        ("+shade       ", jax.jit(lambda p, cam, a, s: sm(
            pre_shade(p, cam, a, s)))),
        ("+glyph (FULL)", jax.jit(lambda p, cam, a, s: sm(
            pre_glyph(p, cam, a, s)))),
    ]

    prev = 0.0
    for name, fn in prefixes:
        nargs = fn.__wrapped__.__code__.co_argcount
        a = (p, cam, attrs_full, scene)[:nargs]
        dt = _time_scalar(fn, a, warmup=2, iters=args.iters)
        print(f"{name}: {dt*1e3:8.3f} ms   (+{(dt-prev)*1e3:7.3f})")
        prev = dt


if __name__ == "__main__":
    main()
