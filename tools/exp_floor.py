#!/usr/bin/env python
"""Fit the tunnel dispatch model: total(N) = N * per_dispatch + RTT.

Times a trivial scalar program and the full headline frame program at
several async-dispatch depths N with ONE final sync, several reps each;
reports per-rep totals so slope (per-dispatch amortized cost) and
intercept (sync RTT) can be read off and run-to-run spread is visible.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    x = jnp.asarray(np.ones((4, 4), np.float32))
    f0 = jax.jit(lambda m: jnp.sum(m) * 2.0)
    np.asarray(f0(x))

    def sweep(name, fn, args, depths=(1, 8, 32, 128, 512), reps=5):
        print(f"--- {name}")
        for n in depths:
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = None
                for _ in range(n):
                    out = fn(*args)
                np.asarray(out)
                ts.append((time.perf_counter() - t0) * 1e3)
            ts = np.asarray(ts)
            print(f"  N={n:4d}: total p50 {np.median(ts):8.2f} ms  "
                  f"per-iter {np.median(ts)/n:7.3f} ms  "
                  f"spread [{ts.min():.2f}, {ts.max():.2f}]")

    sweep("trivial scalar", f0, (x,))

    # full headline frame (emit='idx' glyph path), same as exp_headline_ab
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
    cam = Camera.create(pos=(2.4, 1.4, 2.8),
                        yaw=float(np.arctan2(-2.8, -2.4)), pitch=-0.3)
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
    print(f"caps={(v_cap, big_cap, r_cap, pair_cap, tile_cap)}",
          file=sys.stderr)

    def frame(cam):
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
        return jnp.sum(chars.astype(jnp.int32))

    ffull = jax.jit(frame)
    np.asarray(ffull(cam))
    sweep("headline frame", ffull, (cam,), depths=(1, 8, 32, 128))


if __name__ == "__main__":
    main()
