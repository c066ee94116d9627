#!/usr/bin/env python
"""Decompose the profiler's 0.78 ms 'fused setup' row into:
dispatch floor, camera-arg transfer, camera_mvp math, kernel, reduce.

All timings single-scalar (one host round trip), matching
tools/profile_prefix.py methodology.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_scalar(fn, args, warmup=3, iters=48):
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
    print(f"devices: {jax.devices()}", file=sys.stderr)

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
    mvp_h = np.asarray(R.camera_mvp(cam, rows, cols, cfg.pixel_aspect))
    mvp_d = jnp.asarray(mvp_h)

    def sm(x):
        return jnp.sum(x.astype(jnp.float32))

    # 0. dispatch floor: trivial scalar program on a device arg
    f0 = jax.jit(lambda m: jnp.sum(m) * 2.0)
    # 1. floor + camera pytree arg (host leaves each call)
    f1 = jax.jit(lambda cam: sm(R.camera_mvp(cam, rows, cols,
                                             cfg.pixel_aspect)))
    # 2. kernel from device mvp + reduce cm only
    f2 = jax.jit(lambda m: sm(setup_2dh_fused(pos9, attrs_t, m, rows,
                                              cols)[0]))
    # 3. kernel + reduce cm + valid (profiler's exact stage)
    def red(m):
        cm, bbox = setup_2dh_fused(pos9, attrs_t, m, rows, cols)
        cm = cm.reshape(cm.shape[0], -1)
        return sm(cm) + sm(bbox["valid"])
    f3 = jax.jit(red)
    # 4. same but cam arg + camera_mvp inside (= profiler exactly)
    def red_cam(cam):
        mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)
        cm, bbox = setup_2dh_fused(pos9, attrs_t, mvp, rows, cols)
        cm = cm.reshape(cm.shape[0], -1)
        return sm(cm) + sm(bbox["valid"])
    f4 = jax.jit(red_cam)
    # 5. reduce-only over a materialized same-size array
    big = jnp.asarray(np.random.default_rng(0).standard_normal(
        (42, 69632)).astype(np.float32))
    f5 = jax.jit(lambda x: sm(x))

    for name, f, a in (("floor (trivial)      ", f0, (mvp_d,)),
                       ("cam arg + mvp math   ", f1, (cam,)),
                       ("kernel+reduce(cm)    ", f2, (mvp_d,)),
                       ("kernel+reduce(cm+val)", f3, (mvp_d,)),
                       ("PROFILER stage (cam) ", f4, (cam,)),
                       ("reduce-only 42x69632 ", f5, (big,))):
        t = _time_scalar(f, a) * 1e3
        print(f"{name}: {t:7.3f} ms")


if __name__ == "__main__":
    main()
