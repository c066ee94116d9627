#!/usr/bin/env python
"""Per-stage device timing of the 960x540/69k-tri headline raster pipeline.

Times each pipeline stage as its own jitted program with the amortized
dispatch method (bench.py `_time_fn`): N back-to-back dispatches,
materialize only the last, divide by N. Stage inputs are precomputed and
materialized so each timing covers only that stage.

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
    from ascii_renderer_tpu.core.frame import Frame
    from ascii_renderer_tpu.ascii.ascii_pass import glyph_decide

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
    attrs = jnp.concatenate([n, c, p], axis=1)
    mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)

    # ---- stage functions ----
    @jax.jit
    def s_vertex(p, mvp):
        ch = R.transform_clip_channels(p, mvp)
        return R.setup_screen_channels(ch, rows, cols)

    @jax.jit
    def s_attrs(attrs, ch):
        return R.clip_attrs_channel_lists(attrs, ch)

    @jax.jit
    def s_bins(ch):
        return R._build_bins(ch, rows, cols)[:2]

    ch = jax.jit(lambda p, mvp: s_vertex(p, mvp))(p, mvp)
    _materialize(ch)
    attr_slots = s_attrs(attrs, ch)
    _materialize(attr_slots)
    tri_s, offsets = s_bins(ch)
    _materialize((tri_s, offsets))

    from ascii_renderer_tpu.ops import raster_bins as RB
    tiles_y = -(-rows // R.TILE_H)
    tiles_x = -(-cols // R.TILE_W)
    n_tiles = tiles_y * tiles_x

    @jax.jit
    def s_gather_mm(ch, tri_s):
        xa, xb, xc = ch["sxa"], ch["sxb"], ch["sxc"]
        ya, yb, yc = ch["sya"], ch["syb"], ch["syc"]
        za, zb, zc = ch["sza"], ch["szb"], ch["szc"]
        P = tri_s.shape[0]
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
        src = jnp.stack([
            acs[0], bcs[0], gcs[0], acs[1], bcs[1], gcs[1],
            acs[2], bcs[2], gcs[2], zpx, zpy, zpc,
            jnp.ones_like(xa),
            jnp.arange(xa.shape[0], dtype=jnp.float32),
        ], axis=-1)
        src = jnp.concatenate(
            [src, jnp.zeros((src.shape[0], RB.N_CHAN - 14), jnp.float32)],
            axis=-1)
        tail = 2 * RB.MM_CHUNK
        quantum = RB.MM_CHUNK
        total = P + tail
        pad_rows = (-total) % quantum + tail
        src = jnp.concatenate([src, jnp.zeros((1, RB.N_CHAN), jnp.float32)])
        tri_sp = jnp.concatenate(
            [tri_s, jnp.full((pad_rows,), src.shape[0] - 1, jnp.int32)])
        data = src[tri_sp]
        return data.reshape(-1, RB.MM_CHUNK, RB.N_CHAN).transpose(0, 2, 1)

    mm = s_gather_mm(ch, tri_s)
    _materialize(mm)

    @jax.jit
    def s_kernel(mm, offsets):
        return RB.tile_eval_bins_mm(mm, offsets, tiles_x, n_tiles)

    ztile, tidf = s_kernel(mm, offsets)
    _materialize((ztile, tidf))

    @jax.jit
    def s_unpack(tidf):
        tt = tidf.astype(jnp.int32)
        timg = (tt.reshape(tiles_y, tiles_x, R.TILE_H, R.TILE_W)
                .transpose(0, 2, 1, 3)
                .reshape(tiles_y * R.TILE_H, tiles_x * R.TILE_W))
        return jnp.where(timg[:rows, :cols] < 0, -1, timg[:rows, :cols])

    tid = s_unpack(tidf)
    _materialize(tid)

    @jax.jit
    def s_shade(tid, ch, attr_slots):
        return R.shade_planes_ch(tid, ch, attr_slots, scene, rows, cols)

    rgb = s_shade(tid, ch, attr_slots)
    _materialize(rgb)

    @jax.jit
    def s_glyph(rgb):
        frame = Frame.from_float(rgb)
        chars, _t = glyph_decide(
            frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
            mode_radius=cfg.mode_radius, mode_thresh=cfg.ascii_mode_thresh,
            grayscale=cfg.use_grayscale)
        return chars

    chars = s_glyph(rgb)
    _materialize(chars)

    @jax.jit
    def s_full(p, n, c, scene, cam):
        rgb = R.render_soup(p, n, c, scene, cam, rows, cols, cfg.pixel_aspect)
        frame = Frame.from_float(rgb)
        chars, _t = glyph_decide(
            frame, ramp=cfg.ascii_ramp, mode_on=cfg.ascii_mode_filter,
            mode_radius=cfg.mode_radius, mode_thresh=cfg.ascii_mode_thresh,
            grayscale=cfg.use_grayscale)
        return chars

    _materialize(s_full(p, n, c, scene, cam))

    it = args.iters
    stages = [
        ("vertex+setup      ", s_vertex, (p, mvp)),
        ("attr clip/lerp    ", s_attrs, (attrs, ch)),
        ("binning(sort)     ", s_bins, (ch,)),
        ("entry gather/plane", s_gather_mm, (ch, tri_s)),
        ("bins kernel (mm)  ", s_kernel, (mm, offsets)),
        ("tid unpack        ", s_unpack, (tidf,)),
        ("deferred shade    ", s_shade, (tid, ch, attr_slots)),
        ("glyph decide      ", s_glyph, (rgb,)),
        ("FULL fused        ", s_full, (p, n, c, scene, cam)),
    ]
    total = 0.0
    for name, fn, a in stages:
        dt = _time_fn(fn, a, warmup=2, iters=it)
        if not name.startswith("FULL"):
            total += dt
        print(f"{name}: {dt*1e3:8.3f} ms")
    print(f"sum of stages     : {total*1e3:8.3f} ms")
    # diagnostics: pair count, bin stats
    offs = np.asarray(offsets)
    depth = np.diff(offs)
    print(f"pairs P={offs[-1]}, tiles={n_tiles}, "
          f"bin depth mean={depth.mean():.1f} p50={np.percentile(depth, 50):.0f} "
          f"p95={np.percentile(depth, 95):.0f} max={depth.max()}")
    chunks = np.where(depth > 0, (depth + RB.MM_CHUNK - 1) // RB.MM_CHUNK, 0)
    print(f"mm chunks: total={chunks.sum()} (ideal {depth.sum()/RB.MM_CHUNK:.0f}),"
          f" nonempty tiles={(depth>0).sum()}")


if __name__ == "__main__":
    main()
