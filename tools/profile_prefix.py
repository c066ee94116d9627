#!/usr/bin/env python
"""Prefix-cumulative device timing of the headline raster pipeline.

Times jitted PREFIXES of the real fused frame program, each reduced to one
f32 scalar (single host round-trip; see PARITY.md measurement gotchas).
Successive differences give each stage's marginal cost IN CONTEXT — with
XLA fusion across the stage boundary, unlike per-stage standalone timing.

Sort-prefix reductions are order-weighted so the sort can't be DCE'd.

Usage: python tools/profile_prefix.py [--rows 540 --cols 960 --tris 69000]
       [--gen subtile3|subtile2]   (default subtile3, the live generation)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_scalar(fn, args, warmup=2, iters=48, reps=3):
    """Queue-depth SLOPE timing: per-call cost as the slope of total time
    between two async dispatch depths, one trailing readback each — the
    fixed ~30 ms tunnel RTT cancels exactly (at plain iters=48
    amortization it inflated every row by ~0.6 ms). Best of `reps`."""
    n1, n2 = max(8, iters // 4), iters
    for _ in range(warmup):
        np.asarray(fn(*args))
    best = None
    for _ in range(reps):
        tot = []
        for n in (n1, n2):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            np.asarray(out)
            tot.append(time.perf_counter() - t0)
        s = (tot[1] - tot[0]) / (n2 - n1)
        best = s if best is None else min(best, s)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=540)
    ap.add_argument("--cols", type=int, default=960)
    ap.add_argument("--tris", type=int, default=69000)
    ap.add_argument("--iters", type=int, default=48)
    ap.add_argument("--gen", choices=["subtile3", "subtile2"],
                    default="subtile3")
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
    from ascii_renderer_tpu.ops.pack import pack_channels
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
    pos9, attrs_t = R.soup_static_prep(p, n, c, scene)
    pos9 = jnp.asarray(np.asarray(pos9))
    attrs_t = jnp.asarray(np.asarray(attrs_t))
    A = attrs_t.shape[0] // 3
    tiles_y = -(-rows // R.TILE_H)
    tiles_x = -(-cols // R.TILE_W)
    n_tiles = tiles_y * tiles_x

    T = p.shape[0] // 3
    probe = jax.jit(functools.partial(
        R.render_soup_diag, rows=rows, cols=cols,
        pixel_aspect=cfg.pixel_aspect, kernel=args.gen,
        v_cap=-(-T // 4096) * 4096, big_cap=64,
        r_cap=R._round_up(2 * T, 2048), pair_cap=8 * T, pos9=pos9))
    _, diag = probe(p, n, c, scene, cam)
    counts = tuple(int(diag[k]) for k in
                   ("n_valid", "n_big", "n_rows", "n_pairs", "n_tiles_nz"))
    suggest = (R.suggest_caps_grouped if args.gen == "subtile3"
               else R.suggest_caps_subtile)
    v_cap, big_cap, r_cap, pair_cap, tile_cap = suggest(*counts)
    print(f"counts={counts} caps={(v_cap, big_cap, r_cap, pair_cap, tile_cap)}",
          file=sys.stderr)

    def sm(x):
        return jnp.sum(x.astype(jnp.float32))

    pkeys = R._plane_keys_2dh(A)
    src_names = ("e0a", "e0b", "e0c", "e1a", "e1b", "e1c",
                 "e2a", "e2b", "e2c", "zx", "zy", "zc")

    if args.gen == "subtile3":
        from ascii_renderer_tpu.ops import raster_group as RG
        from ascii_renderer_tpu.ops.setup2dh import setup_2dh_fused

        grp_cap = max(1, tile_cap // 8)

        def pre_setup3(cam):
            mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)
            return setup_2dh_fused(pos9, attrs_t, mvp, rows, cols)

        def pre_keys3(cam):
            cm, bbox = pre_setup3(cam)
            keys = R._subtile_pair_keys_bbox(bbox, rows, cols,
                                             big_cap=big_cap)
            return cm, keys

        def pre_pack3(cam):
            cm, keys = pre_keys3(cam)
            g40 = pack_channels(cm, width=-(-cm.shape[0] // 8) * 8)
            return g40, keys

        def pre_rows3(cam):
            g40, keys = pre_pack3(cam)
            built = RG.build_packed_rows_grouped(
                g40[:, :32], keys, tiles_x, n_tiles, r_cap, pair_cap,
                grp_cap)
            return g40, built

        def pre_kernel3(cam):
            g40, built = pre_rows3(cam)
            rows128, rowptr, gdepth, xl, yl, gbins, *_ = built
            z, e = RG.tile_eval_grouped(rows128, rowptr, gdepth, xl, yl,
                                        grp_cap)
            return g40, e, xl, yl, gbins

        def pre_shade3(cam, scene):
            g40, e, xl, yl, gbins = pre_kernel3(cam)
            table = g40[:, 16:16 + 3 * A + 3]
            rgbg = R.shade_groups(e, xl, yl, table, scene, A)
            return RG.assemble_group_image(rgbg, gbins, n_tiles, tiles_y,
                                           tiles_x, rows, cols, 0.0)

        def pre_glyph3(cam, scene):
            rgb = pre_shade3(cam, scene)
            frame = Frame.from_float(rgb)
            chars, _t = glyph_decide(
                frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
                mode_radius=cfg.mode_radius,
                mode_thresh=cfg.ascii_mode_thresh,
                grayscale=cfg.use_grayscale)
            return chars

        def red_keys(keys):
            w = jnp.arange(keys.shape[0], dtype=jnp.float32) % 7.0
            return jnp.sum(keys.astype(jnp.float32) * w)

        def sm(x):
            return jnp.sum(x.astype(jnp.float32))

        def red_setup(cam):
            # ONE call: pallas_call is not CSE'd, so calling pre_setup3
            # twice in the reduction would run the kernel twice and
            # double-count the stage
            cm, bbox = pre_setup3(cam)
            return sm(cm) + sm(bbox["valid"])

        prefixes = [
            ("fused setup  ", jax.jit(red_setup)),
            ("+keys sort   ", jax.jit(lambda cam: red_keys(
                pre_keys3(cam)[1]))),
            ("+pack40      ", jax.jit(lambda cam: sm(pre_pack3(cam)[0]))),
            ("+grouped rows", jax.jit(lambda cam: sm(pre_rows3(cam)[1][0]))),
            ("+kernel      ", jax.jit(lambda cam: sm(pre_kernel3(cam)[1]))),
            ("+shade       ", jax.jit(lambda cam, s: sm(pre_shade3(cam, s)))),
            ("+glyph (FULL)", jax.jit(lambda cam, s: sm(pre_glyph3(cam, s)))),
        ]
        prev = 0.0
        for name, fn in prefixes:
            nargs = fn.__wrapped__.__code__.co_argcount
            a = (cam, scene)[:nargs]
            dt = _time_scalar(fn, a, warmup=2, iters=args.iters)
            print(f"{name}: {dt*1e3:8.3f} ms   (+{(dt-prev)*1e3:7.3f})")
            prev = dt
        return

    # ---- prefix bodies (mirror render_soup_diag's subtile2 branch) ----
    def pre_setup(cam):
        mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)
        return R.setup_2dh(pos9, attrs_t, mvp, rows, cols)

    def pre_keys(cam):
        ach = pre_setup(cam)
        keys = R._subtile_pair_keys_bbox(ach, rows, cols, big_cap=big_cap)
        return ach, keys

    def pre_pack(cam):
        ach, keys = pre_keys(cam)
        T_ = ach["e0a"].shape[0]
        ids_ch = [jnp.arange(T_, dtype=jnp.float32), jnp.zeros((T_,)),
                  jnp.zeros((T_,)), jnp.zeros((T_,))]
        g40 = pack_channels([ach[k] for k in src_names] + ids_ch
                            + [ach[k] for k in pkeys], width=40)
        return ach, keys, g40

    def pre_rows(cam):
        ach, keys, g40 = pre_pack(cam)
        built = RS.build_packed_rows_pre_id(g40[:, :32], keys, tiles_x,
                                            n_tiles, r_cap, pair_cap)
        return g40, built

    def pre_kernel(cam):
        g40, (rows128, rowptr, depth, n_rows, n_pairs) = pre_rows(cam)
        z, e = RS.tile_eval_packed_d(rows128, rowptr, depth, tiles_x,
                                     n_tiles)
        return g40, rowptr, e

    def pre_shade(cam, scene):
        g40, rowptr, e = pre_kernel(cam)
        nonempty = rowptr[1:] > rowptr[:-1]
        table = g40[:, 16:16 + 3 * A + 3]
        rgb = R.shade_tiles_compact(e, nonempty, table, scene, rows, cols,
                                    tile_cap=tile_cap, n_attrs=A)
        return rgb

    def pre_glyph(cam, scene):
        rgb = pre_shade(cam, scene)
        frame = Frame.from_float(rgb)
        chars, _t = glyph_decide(
            frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
            mode_radius=cfg.mode_radius, mode_thresh=cfg.ascii_mode_thresh,
            grayscale=cfg.use_grayscale)
        return chars

    def red_keys(keys):
        w = jnp.arange(keys.shape[0], dtype=jnp.float32) % 7.0
        return jnp.sum(keys.astype(jnp.float32) * w)

    prefixes = [
        ("2dh setup    ", jax.jit(lambda cam: sm(pre_setup(cam)["e0a"])
                                  + sm(pre_setup(cam)["valid"]))),
        ("+keys sort   ", jax.jit(lambda cam: red_keys(pre_keys(cam)[1]))),
        ("+pack40      ", jax.jit(lambda cam: sm(pre_pack(cam)[2]))),
        ("+packed rows ", jax.jit(lambda cam: sm(pre_rows(cam)[1][0]))),
        ("+kernel      ", jax.jit(lambda cam: sm(pre_kernel(cam)[2]))),
        ("+shade       ", jax.jit(lambda cam, s: sm(pre_shade(cam, s)))),
        ("+glyph (FULL)", jax.jit(lambda cam, s: sm(pre_glyph(cam, s)))),
    ]

    prev = 0.0
    for name, fn in prefixes:
        nargs = fn.__wrapped__.__code__.co_argcount
        a = (cam, scene)[:nargs]
        dt = _time_scalar(fn, a, warmup=2, iters=args.iters)
        print(f"{name}: {dt*1e3:8.3f} ms   (+{(dt-prev)*1e3:7.3f})")
        prev = dt


if __name__ == "__main__":
    main()
