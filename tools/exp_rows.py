#!/usr/bin/env python
"""Fine-grained in-context prefix timing INSIDE the grouped rows build
(build_packed_rows_grouped) at headline scale: pinpoints which op carries
the +0.66 ms the stage shows in tools/profile_prefix.py, given that the
same gathers are ~14 us standalone (tools/exp_gather.py)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, warmup=2, iters=64):
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
    from ascii_renderer_tpu.ops import raster_subtile as RS
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
    tiles_y = -(-rows // RS.TILE_H)
    tiles_x = -(-cols // RS.TILE_W)
    n_tiles = tiles_y * tiles_x
    n_bins = n_tiles * RS.N_SUB
    r_cap, pair_cap, grp_cap = 11264, 69632, 72
    A = attrs_t.shape[0] // 3

    def sm(x):
        return jnp.sum(x.astype(jnp.float32))

    def base(cam):
        mvp = R.camera_mvp(cam, rows, cols, cfg.pixel_aspect)
        cm, bbox = setup_2dh_fused(pos9, attrs_t, mvp, rows, cols)
        cm = cm.reshape(cm.shape[0], -1)
        keys = R._subtile_pair_keys_bbox(bbox, rows, cols, big_cap=0)
        g40 = pack_channels(cm, width=-(-cm.shape[0] // 8) * 8)
        return g40, keys

    def stage(cam, upto):
        g40, keys = base(cam)
        src32 = g40[:, :32]
        bin_s = (keys >> RS.SUB_SHIFT).astype(jnp.int32)
        tri_s = (keys & (RS.MAX_TRI - 1)).astype(jnp.int32)
        P = keys.shape[0]
        p_eff = min(pair_cap, P)
        if upto == "keys":
            w = jnp.arange(P, dtype=jnp.float32) % 7.0
            return sm(keys.astype(jnp.float32) * w) + sm(src32)
        offsets = RG._bin_offsets(bin_s, p_eff, n_bins)
        if upto == "offsets":
            return sm(offsets) + sm(src32) + sm(tri_s)
        depth_bins = offsets[1:] - offsets[:-1]
        negd, binperm = jax.lax.sort(
            (-depth_bins, jnp.arange(n_bins, dtype=jnp.int32)), num_keys=1)
        gbins = binperm[:grp_cap * 8]
        gdepth = -negd[:grp_cap * 8]
        if upto == "binsort":
            return sm(gbins) + sm(gdepth) + sm(src32) + sm(tri_s) \
                + sm(offsets)
        gmax = gdepth[0::8]
        d_pad = ((gmax + RG.CHUNK_RG - 1) // RG.CHUNK_RG) * RG.CHUNK_RG
        rowptr = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(d_pad).astype(jnp.int32)])
        r_ids = jnp.arange(r_cap, dtype=jnp.int32)
        marks = jnp.zeros((r_cap,), jnp.float32).at[rowptr[1:]].add(
            1.0, mode="drop")
        t_r = jnp.clip(R._cumsum_i32(marks), 0, grp_cap - 1)
        d_r = r_ids - rowptr[:-1][t_r]
        goffsets = offsets[:n_bins][gbins].reshape(grp_cap, 8)
        off_rows = goffsets[t_r]
        pidx = jnp.clip((off_rows + d_r[:, None]).reshape(-1), 0,
                        p_eff - 1)
        if upto == "pidx":
            return sm(pidx) + sm(src32) + sm(tri_s)
        src_pair = src32[tri_s[:p_eff]]
        if upto == "srcgather":
            return sm(src_pair) + sm(pidx)
        g = src_pair[pidx]
        if upto == "slotgather":
            return sm(g)
        rows128 = g[:, :RS.N_CHAN].reshape(r_cap, 8 * RS.N_CHAN)
        if upto == "reshape":
            return sm(rows128)
        # composed variant: skip src_pair materialization
        if upto == "composed":
            tri_r = tri_s[pidx]
            g2 = src32[tri_r]
            rows128b = g2[:, :RS.N_CHAN].reshape(r_cap, 8 * RS.N_CHAN)
            return sm(rows128b)
        raise ValueError(upto)

    prev = 0.0
    for name in ("keys", "offsets", "binsort", "pidx", "srcgather",
                 "slotgather", "reshape", "composed"):
        f = jax.jit(functools.partial(stage, upto=name))
        dt = _time(f, (cam,))
        print(f"{name:11s}: {dt*1e3:7.3f} ms  (+{(dt-prev)*1e3:6.3f})")
        prev = dt


if __name__ == "__main__":
    main()
