#!/usr/bin/env python
"""Probe: where does the fused-setup kernel's ~0.5 ms go?

Hypotheses: (a) output DMA layout — channel-major [C, nb, ts, 128]
blocks are nb*ts*128-strided per channel vs step-major [nb, C, ts, 128]
one contiguous region per grid step; (b) output volume (channels);
(c) compute (divides).

Measures trivial write-only kernels across layouts and channel counts,
plus the real setup kernel, all at the 69k-tri headline scale.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, warmup=3, iters=128):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    tp = 69632            # headline Tp (= 17 * 4096)
    S = 4096              # grid-step triangles (matches setup2dh pick)
    ts = S // 128
    nb = tp // S
    x = jnp.ones((nb, ts, 128), jnp.float32)

    def k_chmajor(x_ref, o_ref, *, c):
        v = x_ref[0]
        for i in range(c):
            o_ref[i, 0] = v * (1.0 + i)

    def k_stepmajor(x_ref, o_ref, *, c):
        v = x_ref[0]
        for i in range(c):
            o_ref[0, i] = v * (1.0 + i)

    for c in (8, 16, 32, 48):
        f1 = jax.jit(lambda x, c=c: pl.pallas_call(
            functools.partial(k_chmajor, c=c),
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, ts, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((c, 1, ts, 128), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((c, nb, ts, 128), jnp.float32),
        )(x))
        f2 = jax.jit(lambda x, c=c: pl.pallas_call(
            functools.partial(k_stepmajor, c=c),
            grid=(nb,),
            in_specs=[pl.BlockSpec((1, ts, 128), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, c, ts, 128), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, c, ts, 128), jnp.float32),
        )(x))
        mb = c * tp * 4 / 1e6
        t1 = _time(f1, (x,)) * 1e3
        t2 = _time(f2, (x,)) * 1e3
        print(f"c={c:2d} ({mb:6.1f} MB): ch-major {t1:7.3f} ms "
              f"({mb / t1:6.1f} GB/s)   step-major {t2:7.3f} ms "
              f"({mb / t2:6.1f} GB/s)")

    # the real setup kernel for reference
    from ascii_renderer_tpu.core.config import Config
    from ascii_renderer_tpu.geom import meshes
    from ascii_renderer_tpu.scene.builder import SceneBuilder
    from ascii_renderer_tpu.core.camera import Camera
    from ascii_renderer_tpu.backends import raster as R
    from ascii_renderer_tpu.ops.setup2dh import setup_2dh_fused

    cfg = Config(pixel_aspect=0.5)
    rows, cols = 540, 960
    v, i = meshes.bunny_like(69000)
    p, n, c3 = meshes.mesh_to_soup(v, i, color=(0.8, 0.78, 0.75))
    sb = SceneBuilder().set_env_light([0.22, 0.24, 0.28], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    cam = Camera.create(pos=(2.4, 1.4, 2.8),
                        yaw=float(np.arctan2(-2.8, -2.4)), pitch=-0.3)
    pos9, attrs_t = R.soup_static_prep(jnp.asarray(p), jnp.asarray(n),
                                       jnp.asarray(c3), scene)
    pos9 = jnp.asarray(np.asarray(pos9))
    attrs_t = jnp.asarray(np.asarray(attrs_t))
    mvp = np.asarray(R.camera_mvp(cam, rows, cols, cfg.pixel_aspect))

    f_real = jax.jit(lambda m: setup_2dh_fused(pos9, attrs_t, m, rows, cols))
    cm, bbox = f_real(jnp.asarray(mvp))
    cch = cm.shape[0] + 5
    mb = cch * tp * 4 / 1e6
    t = _time(f_real, (jnp.asarray(mvp),)) * 1e3
    print(f"real setup (c={cch}, {mb:.1f} MB out): {t:7.3f} ms "
          f"({mb / t:6.1f} GB/s out)")


if __name__ == "__main__":
    main()
