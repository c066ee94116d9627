#!/usr/bin/env python
"""In-process A/B of headline-frame variants with queue-depth SLOPE timing.

Variants are named sets of trace-time module flags; each variant's frame
fn is traced under its flags, then all variants are interleave-timed in
one process (tunnel drift cancels) with the slope of total time between
two async queue depths (fixed RTT cancels; see bench.py:_time_fn_slope).

Usage: python tools/ab_slope.py compose nocompose
       python tools/ab_slope.py --list
"""

import argparse
import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# name -> list of (module, attr, value) applied at trace time
VARIANTS = {
    "base": [],
    "compose": [("ascii_renderer_tpu.ops.raster_group",
                 "COMPOSE_SLOT_GATHER", True)],
    "nocompose": [("ascii_renderer_tpu.ops.raster_group",
                   "COMPOSE_SLOT_GATHER", False)],
    "t24": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 24)],
    "t32": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 32)],
    # wrong-output probes: measure a stage's in-context cost by skipping it
    "skipslot": [("ascii_renderer_tpu.ops.raster_group",
                  "PROBE_SKIP_SLOT_GATHER", True)],
    "skipshade": [("ascii_renderer_tpu.backends.raster",
                   "PROBE_SKIP_SHADE_GATHER", True)],
    "skipboth": [("ascii_renderer_tpu.ops.raster_group",
                  "PROBE_SKIP_SLOT_GATHER", True),
                 ("ascii_renderer_tpu.backends.raster",
                  "PROBE_SKIP_SHADE_GATHER", True)],
    "skipksort": [("ascii_renderer_tpu.backends.raster",
                   "PROBE_SKIP_KEYSORT", True)],
    "skipwalk": [("ascii_renderer_tpu.backends.raster",
                  "PROBE_SKIP_WALK", True)],
    "skipdsort": [("ascii_renderer_tpu.ops.raster_group",
                   "PROBE_SKIP_DEPTHSORT", True)],
    "skiptr": [("ascii_renderer_tpu.ops.raster_group",
                "PROBE_SKIP_TR", True)],
    "s4": [],  # name prefix "s4" switches the walk to kernel=subtile4
    "s5": [],  # name prefix "s5" switches the walk to kernel=subtile5 (K2)
    "s5t24": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 24)],
    "s5c16": [("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 16)],
    "s5c64": [("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 64)],
    "s6": [],  # name prefix "s6" switches the walk to kernel=subtile6 (K4)
    "s7": [],  # name prefix "s7": kernel=subtile7 (K4 gather -> base walk)
    "s8": [],  # name prefix "s8": kernel=subtile8 (K8 gather -> base walk)
    "s8bucket": [("ascii_renderer_tpu.ops.raster_group",
                  "DEPTH_GROUPING", "bucket")],
    # "ro" in a variant name renders the MORTON-REORDERED soup
    # (geom/reorder): same mesh, spatial table order -> pair-gather
    # locality. Output can differ from the logical order at z-tie pixels
    # (the harness prints != — expected; timing is the point).
    "s8ro": [],
    "s8robucket": [("ascii_renderer_tpu.ops.raster_group",
                    "DEPTH_GROUPING", "bucket")],
    "s8barrier": [("ascii_renderer_tpu.ops.raster_group",
                   "GATHER_BARRIER", True)],
    "s8ibar": [("ascii_renderer_tpu.ops.raster_group",
                "GATHER_INPUT_BARRIER", True)],
    "s8srccopy": [("ascii_renderer_tpu.ops.raster_group",
                   "GATHER_SRC_COPY", True)],
    "s8full32": [("ascii_renderer_tpu.ops.raster_group",
                  "GATHER_FULL_ROWS", True)],
    "s8oldsetup": [("ascii_renderer_tpu.backends.raster",
                    "SETUP_PACKED", False)],
    "s8oldsrccopy": [("ascii_renderer_tpu.backends.raster",
                      "SETUP_PACKED", False),
                     ("ascii_renderer_tpu.ops.raster_group",
                      "GATHER_SRC_COPY", True)],
    "s8split16": [("ascii_renderer_tpu.backends.raster",
                   "PACK_SPLIT16", True)],
    "s8split16bar": [("ascii_renderer_tpu.backends.raster",
                      "PACK_SPLIT16", True),
                     ("ascii_renderer_tpu.ops.raster_group",
                      "GATHER_BARRIER", True)],
    # wrong-output stage probes under the s8 (subtile8) headline kernel
    "s8skipslot": [("ascii_renderer_tpu.ops.raster_group",
                    "PROBE_SKIP_SLOT_GATHER", True)],
    "s8skippair": [("ascii_renderer_tpu.ops.raster_group",
                    "PROBE_SKIP_PAIR_GATHER", True)],
    "s8skipshade": [("ascii_renderer_tpu.backends.raster",
                     "PROBE_SKIP_SHADE_GATHER", True)],
    "s8skipksort": [("ascii_renderer_tpu.backends.raster",
                     "PROBE_SKIP_KEYSORT", True)],
    "s8skipwalk": [("ascii_renderer_tpu.backends.raster",
                    "PROBE_SKIP_WALK", True)],
    "s8skipdsort": [("ascii_renderer_tpu.ops.raster_group",
                     "PROBE_SKIP_DEPTHSORT", True)],
    "s6t24": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 24)],
    "s6c16": [("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 16)],
    "s6c64": [("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 64)],
    "chunk16": [("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 16)],
    "chunk64": [("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 64)],
    "t24c16": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 24),
               ("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 16)],
    "t32c16": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 32),
               ("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 16)],
    # combined candidates — what we'd actually land if singles each win
    "s5t32": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 32)],
    "s6t32": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 32)],
    "s5t24c16": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 24),
                 ("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 16)],
    "s6t24c16": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 24),
                 ("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 16)],
    "s6t24c64": [("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 24),
                 ("ascii_renderer_tpu.ops.raster_group", "CHUNK_RG", 64)],
    # contiguous split-pack: src32 + shade table from one Pallas kernel
    # (ops/pack.pack_channels_split) instead of lane-slices of one pack
    "split": [("ascii_renderer_tpu.backends.raster", "PACK_SPLIT", True)],
    "split24": [("ascii_renderer_tpu.backends.raster", "PACK_SPLIT", True),
                ("ascii_renderer_tpu.backends.raster", "SHADE_TABLE_W", 24)],
    "s5split": [("ascii_renderer_tpu.backends.raster", "PACK_SPLIT", True)],
    "s6split": [("ascii_renderer_tpu.backends.raster", "PACK_SPLIT", True)],
    "s6split24": [("ascii_renderer_tpu.backends.raster", "PACK_SPLIT", True),
                  ("ascii_renderer_tpu.backends.raster",
                   "SHADE_TABLE_W", 24)],
    # glyph-select lane width: s32 chain (native lanes) vs packed u8 chain
    "s8g32": [("ascii_renderer_tpu.ascii.ascii_pass",
               "GLYPH_SELECT_S32", True)],
    "s8g8": [("ascii_renderer_tpu.ascii.ascii_pass",
              "GLYPH_SELECT_S32", False)],
    # pack transpose precision: exact 3-pass bf16 split vs HIGHEST (6-pass)
    "s8packx3": [("ascii_renderer_tpu.ops.pack", "PACK_EXACT3", True)],
    "s8packhi": [("ascii_renderer_tpu.ops.pack", "PACK_EXACT3", False)],
    # setup path: fused single kernel vs two-kernel setup+pack (profile
    # winner: two-kernel; see backends/raster.SETUP_PACKED)
    "s8fusedsetup": [("ascii_renderer_tpu.backends.raster",
                      "SETUP_PACKED", True)],
    # 0/1-matrix dots (walk expand, shade transpose, counting masks):
    # exact 1/3-pass bf16 vs Precision.HIGHEST 6-pass (ops/mxu)
    "s8mxux3": [("ascii_renderer_tpu.ops.mxu", "EXACT3", True)],
    "s8mxuhi": [("ascii_renderer_tpu.ops.mxu", "EXACT3", False)],
    # walk expand: VPU lane-group broadcasts vs MXU selection dot
    "s8bc": [("ascii_renderer_tpu.ops.raster_group", "WALK_BCAST", True)],
    "s8bcdot": [("ascii_renderer_tpu.ops.raster_group",
                 "WALK_BCAST", False)],
}


_DEFAULTS = {}


def _apply(flags):
    # reset every flag any variant touches to its import-time default,
    # then apply this variant's values (variants don't accumulate)
    for v in VARIANTS.values():
        for mod, attr, _ in v:
            m = importlib.import_module(mod)
            if (mod, attr) not in _DEFAULTS:
                _DEFAULTS[(mod, attr)] = getattr(m, attr)
            setattr(m, attr, _DEFAULTS[(mod, attr)])
    for mod, attr, val in flags:
        setattr(importlib.import_module(mod), attr, val)


def _slope(fn, args, n1=32, n2=128):
    tot = []
    for n in (n1, n2):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        np.asarray(out)
        tot.append(time.perf_counter() - t0)
    return (tot[1] - tot[0]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["base"])
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n1", type=int, default=32)
    ap.add_argument("--n2", type=int, default=128)
    ap.add_argument("--small", action="store_true",
                    help="tiny grid/mesh smoke mode: verifies every "
                         "variant traces, runs, and matches base on CPU "
                         "before an unattended TPU run")
    args = ap.parse_args()
    if args.list:
        for k, v in VARIANTS.items():
            print(k, v)
        return

    import jax
    import jax.numpy as jnp
    # the axon plugin ignores the JAX_PLATFORMS env var in subprocesses
    # (registration re-routes get_backend); the config knob always works
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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
    if args.small:
        rows, cols = 64, 128
        args.n1, args.n2, args.reps = 1, 3, 1
    else:
        rows, cols = 540, 960
    v, i = meshes.bunny_like(2000 if args.small else 69000)
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
    caps = R.suggest_caps_grouped(*counts)
    v_cap, big_cap, r_cap, pair_cap, tile_cap = caps
    print(f"caps={caps}", file=sys.stderr)

    # Morton-reordered twin of the soup for "ro" variants (same mesh,
    # spatial table order; z-tie pixels may differ — see geom/reorder)
    from ascii_renderer_tpu.geom.reorder import reorder_soup
    p_ro, n_ro, c_ro, _perm = reorder_soup(p, n, c3)
    p_ro, n_ro, c_ro = jnp.asarray(p_ro), jnp.asarray(n_ro), \
        jnp.asarray(c_ro)
    pos9_ro, attrs_t_ro = R.soup_static_prep(p_ro, n_ro, c_ro, scene)
    pos9_ro = jnp.asarray(np.asarray(pos9_ro))
    attrs_t_ro = jnp.asarray(np.asarray(attrs_t_ro))

    def frame(cam, kern="subtile3", ro=False):
        pp, nn, cc = (p_ro, n_ro, c_ro) if ro else (p, n, c3)
        p9, at = (pos9_ro, attrs_t_ro) if ro else (pos9, attrs_t)
        (idx_img, _), _ = R.render_soup_diag(
            pp, nn, cc, scene, cam, rows=rows, cols=cols,
            pixel_aspect=cfg.pixel_aspect, kernel=kern,
            v_cap=v_cap, big_cap=big_cap, r_cap=r_cap, pair_cap=pair_cap,
            tile_cap=tile_cap, pos9=p9, attrs_t=at, emit="idx",
            ramp_len=len(cfg.ascii_ramp))
        a_plane = jnp.ones((rows, cols), jnp.uint8)
        chars, _t = glyph_from_index(idx_img, a_plane, None,
                                     ramp=cfg.ascii_ramp,
                                     mode_on=cfg.ascii_mode_filter,
                                     mode_radius=cfg.mode_radius,
                                     mode_thresh=cfg.ascii_mode_thresh,
                                     grayscale=cfg.use_grayscale)
        return chars

    fns = []
    ref_out = None
    for name in args.variants:
        _apply(VARIANTS[name])
        # distinct function object per variant: jax.jit shares its trace
        # cache across wrappers of the SAME callable, which would silently
        # reuse the first variant's trace for all of them
        kern = ("subtile4" if name.startswith("s4")
                else "subtile5" if name.startswith("s5")
                else "subtile6" if name.startswith("s6")
                else "subtile7" if name.startswith("s7")
                else "subtile8" if name.startswith("s8") else "subtile3")
        ro = "ro" in name
        f = jax.jit(lambda cam, _v=name, _k=kern, _r=ro: frame(cam, _k, _r))
        out = np.asarray(f(cam))  # trace NOW under this variant's flags
        if ref_out is None:
            ref_out = out
        else:
            same = np.array_equal(ref_out, out)
            print(f"  {name}: output {'==' if same else '!='} "
                  f"{args.variants[0]}", file=sys.stderr)
        fns.append((name, f))

    best = {name: None for name, _ in fns}
    for rep in range(args.reps):
        for name, f in fns:
            dt = _slope(f, (cam,), args.n1, args.n2)
            best[name] = dt if best[name] is None else min(best[name], dt)
            # incremental line: a timeout mid-run still leaves every
            # completed measurement on disk (agenda tees this file)
            print(f"  rep{rep} {name:12s}: {dt*1e3:7.3f} ms/frame",
                  file=sys.stderr, flush=True)
    for name, _ in fns:
        dt = best[name]
        print(f"{name:12s}: {dt*1e3:7.3f} ms/frame ({1/dt:7.1f} FPS)")


if __name__ == "__main__":
    main()
