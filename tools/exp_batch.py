#!/usr/bin/env python
"""Multi-frame batching A/B with slope timing (VERDICT r2 item 2).

Compares per-frame streaming cost of:
  single   — one frame per dispatch (headline mode)
  scan N   — lax.scan of the frame body over N cameras per dispatch
  unroll N — N frame bodies unrolled in one jitted program (no while
             loop around the Pallas calls)

All measured as the slope of total time between two async queue depths
(fixed tunnel RTT cancels; see bench.py:_time_fn_slope).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _slope(fn, args, n1, n2, reps=3):
    for _ in range(2):
        np.asarray(fn(*args))
    slopes = []
    for _ in range(reps):
        tot = []
        for n in (n1, n2):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            np.asarray(out)
            tot.append(time.perf_counter() - t0)
        slopes.append((tot[1] - tot[0]) / (n2 - n1))
    slopes.sort()
    return slopes[len(slopes) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--modes", default="single,scan,unroll")
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
    from ascii_renderer_tpu.ascii.ascii_pass import glyph_from_index

    cfg = Config(pixel_aspect=0.5)
    rows, cols = 540, 960
    v, i = meshes.bunny_like(69000)
    p, n, c3 = meshes.mesh_to_soup(v, i, color=(0.8, 0.78, 0.75))
    sb = SceneBuilder().set_env_light([0.22, 0.24, 0.28], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    yaw0 = float(np.arctan2(-2.8, -2.4))
    cam = Camera.create(pos=(2.4, 1.4, 2.8), yaw=yaw0, pitch=-0.3)
    p, n, c3 = jnp.asarray(p), jnp.asarray(n), jnp.asarray(c3)
    pos9, attrs_t = R.soup_static_prep(p, n, c3, scene)
    pos9 = jnp.asarray(np.asarray(pos9))
    attrs_t = jnp.asarray(np.asarray(attrs_t))

    T = p.shape[0] // 3
    probe = jax.jit(lambda cam: R.render_soup_diag(
        p, n, c3, scene, cam, rows=rows, cols=cols,
        pixel_aspect=cfg.pixel_aspect, kernel="subtile3",
        v_cap=-(-T // 4096) * 4096, big_cap=64,
        r_cap=R._round_up(2 * T, 2048), pair_cap=8 * T, pos9=pos9)[1])
    diag = probe(cam)
    counts = tuple(int(diag[k]) for k in
                   ("n_valid", "n_big", "n_rows", "n_pairs", "n_tiles_nz"))
    v_cap, big_cap, r_cap, pair_cap, tile_cap = R.suggest_caps_grouped(
        *counts)
    # caps must hold over the orbit: widen by the usual margin
    r_cap = R._round_up(int(r_cap * 1.25), 2048)
    pair_cap = R._round_up(int(pair_cap * 1.25), 2048)
    tile_cap = R._round_up(int(tile_cap * 1.25), 32)
    print(f"caps={(v_cap, big_cap, r_cap, pair_cap, tile_cap)}",
          file=sys.stderr)

    def frame_chars(cam):
        (idx_img, _), _ = R.render_soup_diag(
            p, n, c3, scene, cam, rows=rows, cols=cols,
            pixel_aspect=cfg.pixel_aspect, kernel="subtile3",
            v_cap=v_cap, big_cap=big_cap, r_cap=r_cap, pair_cap=pair_cap,
            tile_cap=tile_cap, pos9=pos9, attrs_t=attrs_t, emit="idx",
            ramp_len=len(cfg.ascii_ramp))
        a_plane = jnp.ones((rows, cols), jnp.uint8)
        chars, _t = glyph_from_index(idx_img, a_plane, None,
                                     ramp=cfg.ascii_ramp,
                                     mode_on=cfg.ascii_mode_filter,
                                     mode_radius=cfg.mode_radius,
                                     mode_thresh=cfg.ascii_mode_thresh,
                                     grayscale=cfg.use_grayscale)
        return chars

    N = args.batch
    yaws = jnp.float32(yaw0) + jnp.arange(N, dtype=jnp.float32) * 0.02
    cams = jax.vmap(lambda y: Camera.create(pos=(2.4, 1.4, 2.8), yaw=y,
                                            pitch=-0.3))(yaws)
    cam_list = [Camera.create(pos=(2.4, 1.4, 2.8), yaw=yaw0 + 0.02 * k,
                              pitch=-0.3) for k in range(N)]

    modes = args.modes.split(",")
    if "single" in modes:
        f1 = jax.jit(frame_chars)
        dt = _slope(f1, (cam,), 32, 128)
        print(f"single    : {dt*1e3:7.3f} ms/frame ({1/dt:6.1f} FPS)")

    # every frame must stay live: per-frame checksums (a [-1] index would
    # let XLA DCE all but the last unrolled frame body)
    if "scan" in modes:
        @jax.jit
        def run_scan(cams):
            _, sums = jax.lax.scan(
                lambda _, cam: (None, frame_chars(cam).astype(
                    jnp.int32).sum()), None, cams)
            return sums
        dt = _slope(run_scan, (cams,), 8, 32) / N
        print(f"scan   x{N}: {dt*1e3:7.3f} ms/frame ({1/dt:6.1f} FPS)")

    if "unroll" in modes:
        @jax.jit
        def run_unroll(*cl):
            return jnp.stack([frame_chars(c).astype(jnp.int32).sum()
                              for c in cl])
        dt = _slope(run_unroll, tuple(cam_list), 8, 32) / N
        print(f"unroll x{N}: {dt*1e3:7.3f} ms/frame ({1/dt:6.1f} FPS)")


if __name__ == "__main__":
    main()
