#!/usr/bin/env python
"""Isolate the fused-setup stage cost at headline scale: standalone
kernel timing (its output IS materialized in the real pipeline, so
standalone is representative here), reduction-only cost, and an XLA
twin comparison."""

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
    p, n, c = meshes.mesh_to_soup(v, i, color=(0.8, 0.78, 0.75))
    sb = SceneBuilder().set_env_light([0.22, 0.24, 0.28], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    cam = Camera.create(pos=(2.4, 1.4, 2.8),
                        yaw=float(np.arctan2(-2.8, -2.4)), pitch=-0.3)
    pos9, attrs_t = R.soup_static_prep(jnp.asarray(p), jnp.asarray(n),
                                       jnp.asarray(c), scene)
    pos9 = jnp.asarray(np.asarray(pos9))
    attrs_t = jnp.asarray(np.asarray(attrs_t))

    def sm(x):
        return jnp.sum(x.astype(jnp.float32))

    # 1. fused kernel, full outputs materialized (donate nothing)
    f_full = jax.jit(lambda cam: setup_2dh_fused(
        pos9, attrs_t, R.camera_mvp(cam, rows, cols, cfg.pixel_aspect),
        rows, cols))
    # 2. fused kernel + scalar reduce (what the profiler times)
    f_red = jax.jit(lambda cam: (lambda o: sm(o[0]) + sm(o[1]["valid"]))(
        setup_2dh_fused(pos9, attrs_t,
                        R.camera_mvp(cam, rows, cols, cfg.pixel_aspect),
                        rows, cols)))
    # 3. XLA (non-fused) twin + reduce
    f_xla = jax.jit(lambda cam: (lambda ach: sum(
        sm(ach[k]) for k in ach) )(
        R.setup_2dh(pos9, attrs_t,
                    R.camera_mvp(cam, rows, cols, cfg.pixel_aspect),
                    rows, cols)))
    # 4. reduction floor: sum a materialized [53, 69632] array
    cm, bbox = f_full(cam)
    cm = jnp.asarray(np.asarray(cm))
    f_sum = jax.jit(lambda x: sm(x))

    print(f"fused full out : {_time(f_full, (cam,))*1e3:7.3f} ms")
    print(f"fused + reduce : {_time(f_red, (cam,))*1e3:7.3f} ms")
    print(f"xla   + reduce : {_time(f_xla, (cam,))*1e3:7.3f} ms")
    print(f"sum cm only    : {_time(f_sum, (cm,))*1e3:7.3f} ms")


if __name__ == "__main__":
    main()


def probe_trivial():
    """Same grid/block structure as the setup kernel, trivial compute:
    isolates DMA/layout cost from formula cost."""
    global jax
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tp = 69632
    c_out, a3 = 53, 18
    for S in (1024, 4096):
        ts = S // 128
        nb = tp // S

        def kern(pos_ref, attr_ref, out_ref):
            x = pos_ref[0, 0]
            y = attr_ref[0, 0]
            for ch in range(c_out):
                out_ref[ch, 0] = x * float(ch) + y

        f = pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[pl.BlockSpec((9, 1, ts, 128), lambda i: (0, i, 0, 0)),
                      pl.BlockSpec((a3, 1, ts, 128),
                                   lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((c_out, 1, ts, 128),
                                   lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((c_out, nb, ts, 128),
                                           jnp.float32),
        )
        pos = jnp.ones((9, nb, ts, 128), jnp.float32)
        att = jnp.ones((a3, nb, ts, 128), jnp.float32)
        g = jax.jit(lambda p, a: f(p, a))
        dt = _time(g, (pos, att))
        print(f"trivial S={S:5d}: {dt*1e3:7.3f} ms")

        # contiguous-output variant: (nb, c_out, ts, 128)
        f2 = pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[pl.BlockSpec((9, 1, ts, 128), lambda i: (0, i, 0, 0)),
                      pl.BlockSpec((a3, 1, ts, 128),
                                   lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((1, c_out, ts, 128),
                                   lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, c_out, ts, 128),
                                           jnp.float32),
        )

        def kern2(pos_ref, attr_ref, out_ref):
            x = pos_ref[0, 0]
            y = attr_ref[0, 0]
            for ch in range(c_out):
                out_ref[0, ch] = x * float(ch) + y

        f2 = pl.pallas_call(
            kern2, grid=(nb,),
            in_specs=[pl.BlockSpec((9, 1, ts, 128), lambda i: (0, i, 0, 0)),
                      pl.BlockSpec((a3, 1, ts, 128),
                                   lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((1, c_out, ts, 128),
                                   lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, c_out, ts, 128),
                                           jnp.float32),
        )
        g2 = jax.jit(lambda p, a: f2(p, a))
        dt2 = _time(g2, (pos, att))
        print(f"trivial S={S:5d} contiguous-out: {dt2*1e3:7.3f} ms")


if __name__ == "__main__" and os.environ.get("PROBE_TRIVIAL"):
    probe_trivial()
    sys.exit(0)
