#!/usr/bin/env python
"""A/B the bin-offsets build at headline scale IN CONTEXT: searchsorted
(n_bins+1 queries over the sorted pair prefix) vs scatter-max + cummax.
Both prefixes end at the same reduction over (offsets, depth) so XLA
can't DCE either; difference vs the keys-only prefix isolates the stage.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_scalar(fn, args, warmup=2, iters=64):
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
    from ascii_renderer_tpu.ops import raster_subtile as RS
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
    tiles_y = -(-rows // 8)
    tiles_x = -(-cols // 128)
    n_tiles = tiles_y * tiles_x
    n_bins = n_tiles * 8
    pair_cap = 69632

    def keys_of(cam):
        mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)
        _cm, bbox = setup_2dh_fused(pos9, attrs_t, mvp, rows, cols)
        return R._subtile_pair_keys_bbox(bbox, rows, cols, big_cap=0)

    def red_keys(keys):
        w = jnp.arange(keys.shape[0], dtype=jnp.float32) % 7.0
        return jnp.sum(keys.astype(jnp.float32) * w)

    def off_search(bin_s):
        return jnp.searchsorted(
            bin_s[:pair_cap], jnp.arange(n_bins + 1, dtype=jnp.int32)
        ).astype(jnp.int32)

    def off_scatter(bin_s):
        io = jnp.arange(pair_cap, dtype=jnp.int32) + 1
        end = jnp.zeros((n_bins,), jnp.int32).at[bin_s[:pair_cap]].max(
            io, mode="drop")
        end = jax.lax.cummax(end)
        return jnp.concatenate([jnp.zeros((1,), jnp.int32), end])

    def off_2level(bin_s):
        # bin_s[:pair_cap] is SORTED: sample every S-th element, locate
        # each query's window with a tiny searchsorted, then count within
        # one gathered [n_bins+1, S] window. offsets[q] = #elements < q.
        S = 64
        d = jnp.concatenate([bin_s[:pair_cap],
                             jnp.full((S,), n_bins, jnp.int32)])
        samp = d[:pair_cap:S]
        q = jnp.arange(n_bins + 1, dtype=jnp.int32)
        j = jnp.searchsorted(samp, q).astype(jnp.int32)  # first samp >= q
        base = (j - 1) * S
        win = d[jnp.maximum(base, 0)[:, None]
                + jnp.arange(1, S + 1, dtype=jnp.int32)[None, :]]
        cnt = jnp.sum((win < q[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(j == 0, 0, base + 1 + cnt)

    def off_2level_v2(bin_s):
        # Row-aligned windows: d2[r] = sorted elements 64r..64r+63; row
        # starts samp[r] = d2[r, 0]. j[q] = #samples < q via a SMALL
        # scatter+cummax (1088 inputs); elements < q then = 64*(j-1) +
        # count in row j-1 — ONE leading-index row gather (the fast
        # gather form), no batched 2-D indices anywhere.
        S = 64
        d = bin_s[:pair_cap]
        M = pair_cap // S
        d2 = d.reshape(M, S)
        samp = d2[:, 0]
        io = jnp.arange(M, dtype=jnp.int32) + 1
        ends = jnp.zeros((n_bins + 1,), jnp.int32).at[
            jnp.minimum(samp, n_bins)].max(io)
        j = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jax.lax.cummax(ends)[:-1]])  # #samples < q
        q = jnp.arange(n_bins + 1, dtype=jnp.int32)
        row = d2[jnp.maximum(j - 1, 0)]                   # [n_bins+1, S]
        cnt = jnp.sum((row < q[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(j == 0, 0, S * (j - 1) + cnt)

    def pre(cam, off_fn):
        keys = keys_of(cam)
        bin_s = (keys >> RS.SUB_SHIFT).astype(jnp.int32)
        offsets = off_fn(bin_s)
        depth = offsets[1:] - offsets[:-1]
        w = jnp.arange(n_bins + 1, dtype=jnp.float32) % 5.0
        return (jnp.sum(offsets.astype(jnp.float32) * w)
                + jnp.sum(depth.astype(jnp.float32)))

    base = jax.jit(lambda cam: red_keys(keys_of(cam)))
    f_s = jax.jit(functools.partial(pre, off_fn=off_search))
    f_x = jax.jit(functools.partial(pre, off_fn=off_scatter))
    f_2 = jax.jit(functools.partial(pre, off_fn=off_2level))
    f_2b = jax.jit(functools.partial(pre, off_fn=off_2level_v2))

    # correctness first
    ks = jax.jit(keys_of)(cam)
    bs = (np.asarray(ks) >> RS.SUB_SHIFT).astype(np.int32)
    a = np.asarray(jax.jit(off_search)(jnp.asarray(bs)))
    b = np.asarray(jax.jit(off_scatter)(jnp.asarray(bs)))
    c2 = np.asarray(jax.jit(off_2level)(jnp.asarray(bs)))
    c3 = np.asarray(jax.jit(off_2level_v2)(jnp.asarray(bs)))
    assert np.array_equal(a, b), (a[:20], b[:20])
    assert np.array_equal(a, c2), (a[:20], c2[:20])
    assert np.array_equal(a, c3), (np.nonzero(a != c3)[0][:10], a[:20],
                                   c3[:20])
    print("offsets equal: True", file=sys.stderr)

    t0 = _time_scalar(base, (cam,))
    t1 = _time_scalar(f_s, (cam,))
    t2 = _time_scalar(f_x, (cam,))
    t3 = _time_scalar(f_2, (cam,))
    t4 = _time_scalar(f_2b, (cam,))
    print(f"keys only      : {t0*1e3:7.3f} ms")
    print(f"+searchsorted  : {t1*1e3:7.3f} ms  (+{(t1-t0)*1e3:6.3f})")
    print(f"+scatter+cummax: {t2*1e3:7.3f} ms  (+{(t2-t0)*1e3:6.3f})")
    print(f"+2level window : {t3*1e3:7.3f} ms  (+{(t3-t0)*1e3:6.3f})")
    print(f"+2level rowwise: {t4*1e3:7.3f} ms  (+{(t4-t0)*1e3:6.3f})")


if __name__ == "__main__":
    main()
