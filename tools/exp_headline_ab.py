#!/usr/bin/env python
"""Headline A/B: config-3 workload (bunny 69k tris @ 960x540, full
raster->glyph pipeline) across raster kernel generations. Times exactly
what bench_config3 times (amortized back-to-back dispatches, one trailing
host readback) so numbers are comparable with BENCH JSON figures.

Usage: python tools/exp_headline_ab.py [--kernels subtile3,subtile4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_all(fns, args, warmup=2, iters=64, reps=3):
    """Round-robin timing of several jitted fns IN ONE PROCESS: process-
    level drift (tunnel/device clock state) is +-0.4 ms run to run, far
    above the effects under test, so only same-process comparisons are
    valid; interleaving reps cancels within-process drift too."""
    best = [None] * len(fns)
    for fn in fns:
        for _ in range(warmup):
            np.asarray(fn(*args))
    for _ in range(reps):
        for k, fn in enumerate(fns):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = fn(*args)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / iters
            best[k] = dt if best[k] is None else min(best[k], dt)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", default="subtile3,subtile4")
    ap.add_argument("--rows", type=int, default=540)
    ap.add_argument("--cols", type=int, default=960)
    ap.add_argument("--tris", type=int, default=69000)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--caps", default=None,
                    help="override v,big,r,pair,bin")
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
    cam = Camera.create(pos=(2.4, 1.4, 2.8),
                        yaw=float(np.arctan2(-2.8, -2.4)), pitch=-0.3)
    soup = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c))
    pos9, attrs_t = R.soup_static_prep(*soup, scene)
    tris = p.shape[0] // 3

    # probe caps once with the grouped pipeline (shared by both variants)
    probe = jax.jit(lambda cam: R.render_soup_diag(
        *soup, scene, cam, rows=rows, cols=cols,
        pixel_aspect=cfg.pixel_aspect, kernel="subtile3",
        v_cap=R.MAX_V_CAP, big_cap=64, r_cap=262144, pair_cap=262144,
        pos9=pos9, attrs_t=attrs_t)[1])
    d = {k: int(v) for k, v in probe(cam).items()}
    caps = R.suggest_caps_grouped(d["n_valid"], d["n_big"], d["n_rows"],
                                  d["n_pairs"], d["n_tiles_nz"])
    caps_list = [caps]
    if args.caps:
        caps_list = [tuple(int(x) for x in t.split(","))
                     for t in args.caps.split(";")]
    print(f"diag={d} caps={caps_list}", file=sys.stderr)

    from ascii_renderer_tpu.ascii.ascii_pass import glyph_from_index

    variants = []
    for kern in args.kernels.split(","):
        use_idx = not kern.endswith("-rgb")
        kern_base = kern[:-4] if kern.endswith("-rgb") else kern
        for cp in caps_list:
            v_cap, big_cap, r_cap, pair_cap, bin_cap = cp

            def run(p_, n_, c_, scene, cam, kern_base=kern_base,
                    use_idx=use_idx, v_cap=v_cap, big_cap=big_cap,
                    r_cap=r_cap, pair_cap=pair_cap, bin_cap=bin_cap):
                if use_idx:
                    (idx_img, _rgb8), _ = R.render_soup_diag(
                        p_, n_, c_, scene, cam, rows=rows, cols=cols,
                        pixel_aspect=cfg.pixel_aspect, kernel=kern_base,
                        v_cap=v_cap, big_cap=big_cap, r_cap=r_cap,
                        pair_cap=pair_cap, tile_cap=bin_cap,
                        pos9=pos9, attrs_t=attrs_t, emit="idx",
                        ramp_len=len(cfg.ascii_ramp))
                    a_plane = jnp.ones((rows, cols), jnp.uint8)
                    chars, _tint = glyph_from_index(
                        idx_img, a_plane, None, ramp=cfg.ascii_ramp,
                        mode_on=cfg.ascii_mode_filter,
                        mode_radius=cfg.mode_radius,
                        mode_thresh=cfg.ascii_mode_thresh,
                        grayscale=cfg.use_grayscale)
                    return chars
                rgb, _ = R.render_soup_diag(
                    p_, n_, c_, scene, cam, rows=rows, cols=cols,
                    pixel_aspect=cfg.pixel_aspect, kernel=kern_base,
                    v_cap=v_cap, big_cap=big_cap, r_cap=r_cap,
                    pair_cap=pair_cap, tile_cap=bin_cap,
                    pos9=pos9, attrs_t=attrs_t)
                chars, _tint = glyph_decide(
                    Frame.from_float(rgb), ramp=cfg.ascii_ramp,
                    mode_on=cfg.ascii_mode_filter,
                    mode_radius=cfg.mode_radius,
                    mode_thresh=cfg.ascii_mode_thresh,
                    grayscale=cfg.use_grayscale)
                return chars

            variants.append((f"{kern} caps={cp}", jax.jit(run)))

    ref = None
    for name, fn in variants:
        out = np.asarray(fn(*soup, scene, cam))
        if ref is None:
            ref = out
        elif not np.array_equal(ref, out):
            print(f"{name}: GLYPHS DIFFER ndiff={np.sum(ref != out)}")
    dts = _time_all([f for _, f in variants], (*soup, scene, cam),
                    iters=args.iters)
    for (name, _), dt in zip(variants, dts):
        print(f"{name}: {dt*1e3:7.3f} ms  {1.0/dt:7.1f} FPS  "
              f"{tris/dt/1e6:6.1f} Mtris/s")


if __name__ == "__main__":
    main()
