#!/usr/bin/env python
"""Mid-scale A/B: config-2-class workload (teapot ~1k tris, 240x135)
through the compacted mm bin-walk (the current mid-scale path) vs the
grouped subtile3 pipeline. Decides whether mm stays live or becomes an
oracle-only generation (VERDICT r2 next #7)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, warmup=2, iters=512):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ascii_renderer_tpu.core.config import Config
    from ascii_renderer_tpu.geom import meshes
    from ascii_renderer_tpu.scene.builder import SceneBuilder
    from ascii_renderer_tpu.core.camera import Camera
    from ascii_renderer_tpu.backends import raster as R
    from ascii_renderer_tpu.core.frame import Frame
    from ascii_renderer_tpu.ascii.ascii_pass import glyph_decide

    cfg = Config(pixel_aspect=0.5)
    rows, cols = 135, 240
    v, i = meshes.teapot_like(1024)
    p, n, c = meshes.mesh_to_soup(v, i, color=(0.9, 0.9, 0.9))
    sb = SceneBuilder().set_env_light([0.22, 0.24, 0.28], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    cam = Camera.create(pos=(1.9, 1.3, 2.7),
                        yaw=float(np.arctan2(-2.7, -1.9)), pitch=-0.4)
    soup = (jnp.asarray(p), jnp.asarray(n), jnp.asarray(c))
    T = p.shape[0] // 3

    def mk(method, caps):
        def run(p_, n_, c_, scene, cam):
            if method == "mm":
                rgb = R.render_soup(p_, n_, c_, scene, cam, rows, cols,
                                    cfg.pixel_aspect, v_cap=caps[0],
                                    big_cap=caps[1])
            else:
                rgb = R.render_soup(p_, n_, c_, scene, cam, rows, cols,
                                    cfg.pixel_aspect, method=method,
                                    v_cap=caps[0], big_cap=caps[1],
                                    r_cap=caps[2], pair_cap=caps[3],
                                    tile_cap=caps[4])
            chars, _ = glyph_decide(
                Frame.from_float(rgb), ramp=cfg.ascii_ramp,
                mode_on=cfg.ascii_mode_filter, mode_radius=cfg.mode_radius,
                mode_thresh=cfg.ascii_mode_thresh,
                grayscale=cfg.use_grayscale)
            return chars
        return jax.jit(run)

    # probe subtile3 counts for lean caps
    probe = jax.jit(functools.partial(
        R.render_soup_diag, rows=rows, cols=cols,
        pixel_aspect=cfg.pixel_aspect, kernel="subtile3", v_cap=2 * T,
        big_cap=64, r_cap=R._round_up(2 * T, 2048), pair_cap=8 * T))
    _, diag = probe(*soup, scene, cam)
    counts = tuple(int(diag[k]) for k in
                   ("n_valid", "n_big", "n_rows", "n_pairs", "n_tiles_nz"))
    caps3 = R.suggest_caps_grouped(*counts)
    print(f"counts={counts} caps3={caps3}", flush=True)

    f_mm = mk("mm", R.suggest_caps(counts[0], counts[1]) )
    f_3 = mk("subtile3", caps3)
    a = np.asarray(f_mm(*soup, scene, cam))
    b = np.asarray(f_3(*soup, scene, cam))
    print("glyph diff px:", int((a != b).sum()), "of", a.size, flush=True)
    for nm, f in (("mm      ", f_mm), ("subtile3", f_3),
                  ("mm      b", f_mm), ("subtile3b", f_3)):
        print(nm, f"{_time(f, (*soup, scene, cam))*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
