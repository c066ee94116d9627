#!/usr/bin/env python
"""A/B the deferred-shade table gather width at headline scale, plus a
decomposition of the shade stage (gather / lighting / assembly).

The plane table is 3A+3 = 21 channels (A=6). The TPU gather emitter is
pathological at width 16 and fine at 32 (see ops/raster_subtile docs);
21 sits between — this measures whether padding the gathered rows to 32
(pack width 48, slice [16:48]) beats the current 21-wide slice.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


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
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ascii_renderer_tpu.core.config import Config
    from ascii_renderer_tpu.geom import meshes
    from ascii_renderer_tpu.scene.builder import SceneBuilder
    from ascii_renderer_tpu.core.camera import Camera
    from ascii_renderer_tpu.backends import raster as R
    from ascii_renderer_tpu.ops import raster_group as RG
    from ascii_renderer_tpu.ops.setup2dh import setup_2dh_fused
    from ascii_renderer_tpu.ops.pack import pack_channels

    cfg = Config(pixel_aspect=0.5)
    rows, cols = 540, 960
    v, i = meshes.bunny_like(69000)
    p, n, c = meshes.mesh_to_soup(v, i, color=(0.8, 0.78, 0.75))
    sb = SceneBuilder().set_env_light([0.22, 0.24, 0.28], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    cam = Camera.create(pos=(2.4, 1.4, 2.8),
                        yaw=float(np.arctan2(-2.8, -2.4)), pitch=-0.3)
    pos9, attrs_t = R.soup_static_prep(jnp.asarray(p), jnp.asarray(n),
                                       jnp.asarray(c), scene)
    A = attrs_t.shape[0] // 3
    tiles_y = -(-rows // 8)
    tiles_x = -(-cols // 128)
    n_tiles = tiles_y * tiles_x
    caps = (45056, 0, 11264, 69632, 576)
    v_cap, big_cap, r_cap, pair_cap, bin_cap = caps
    grp_cap = bin_cap // 8

    def upto_kernel(cam, width):
        mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)
        cm, bbox = setup_2dh_fused(pos9, attrs_t, mvp, rows, cols)
        cm = cm.reshape(cm.shape[0], -1)
        keys = R._subtile_pair_keys_bbox(bbox, rows, cols, big_cap=big_cap)
        g = pack_channels(cm, width=width)
        built = RG.build_packed_rows_grouped(
            g[:, :32], keys, tiles_x, n_tiles, r_cap, pair_cap, grp_cap)
        rows128, rowptr, gdepth, xl, yl, gbins, *_ = built
        z, e = RG.tile_eval_grouped(rows128, rowptr, gdepth, xl, yl,
                                    grp_cap)
        return g, e, xl, yl, gbins

    def sm(x):
        return jnp.sum(x.astype(jnp.float32))

    def f_kernel(cam):
        _g, e, *_ = upto_kernel(cam, 40)
        return sm(e)

    def f_gather21(cam):
        g, e, xl, yl, gbins = upto_kernel(cam, 40)
        table = g[:, 16:16 + 3 * A + 3]
        idx = e.reshape(-1).astype(jnp.int32)
        rowsg = table[jnp.maximum(idx, 0)]
        return sm(rowsg)

    def f_gather32(cam):
        g, e, xl, yl, gbins = upto_kernel(cam, 48)
        table = g[:, 16:48]
        idx = e.reshape(-1).astype(jnp.int32)
        rowsg = table[jnp.maximum(idx, 0)]
        return sm(rowsg)

    def f_shade21(cam, scene):
        g, e, xl, yl, gbins = upto_kernel(cam, 40)
        table = g[:, 16:16 + 3 * A + 3]
        rgbg = R.shade_groups(e, xl, yl, table, scene, A)
        return sm(rgbg)

    def f_full21(cam, scene):
        g, e, xl, yl, gbins = upto_kernel(cam, 40)
        table = g[:, 16:16 + 3 * A + 3]
        rgbg = R.shade_groups(e, xl, yl, table, scene, A)
        img = RG.assemble_group_image(rgbg, gbins, n_tiles, tiles_y,
                                      tiles_x, rows, cols, 0.0)
        return sm(img)

    def f_full32(cam, scene):
        g, e, xl, yl, gbins = upto_kernel(cam, 48)
        table = g[:, 16:48]
        rgbg = R.shade_groups(e, xl, yl, table, scene, A)
        img = RG.assemble_group_image(rgbg, gbins, n_tiles, tiles_y,
                                      tiles_x, rows, cols, 0.0)
        return sm(img)

    tests = [
        ("kernel prefix ", jax.jit(f_kernel), (cam,)),
        ("+gather w21   ", jax.jit(f_gather21), (cam,)),
        ("+gather w32   ", jax.jit(f_gather32), (cam,)),
        ("+shade w21    ", jax.jit(f_shade21), (cam, scene)),
        ("+assembly w21 ", jax.jit(f_full21), (cam, scene)),
        ("+assembly w32 ", jax.jit(f_full32), (cam, scene)),
    ]
    for name, fn, a in tests:
        dt = _time_scalar(fn, a)
        print(f"{name}: {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
