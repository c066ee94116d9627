#!/usr/bin/env python
"""Per-HLO device profile of the headline frame via jax.profiler.

The axon tunnel DOES carry xprof device traces (TPU pid, one event per
HLO op with device_duration_ps / bytes_accessed / model_flops and the
full long_name), so stage costs no longer have to be inferred from
wrong-output skip probes or slope A/B diffs — this prints the measured
per-fusion breakdown of one frame, aggregated over N traced dispatches.

Usage: python tools/profile_trace.py            # headline frame, s8
       python tools/profile_trace.py --top 40 --iters 30
       python tools/profile_trace.py --by-category
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_headline(kernel: str = "subtile8"):
    """The bench config-3 frame (960x540 bunny -> glyph indices), traced
    with the repo's current defaults. Returns (jitted fn, cam)."""
    import jax
    import jax.numpy as jnp
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
    probe = jax.jit(lambda c: R.render_soup_diag(
        p, n, c3, scene, c, rows=rows, cols=cols,
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

    def frame(c):
        (idx_img, _), _ = R.render_soup_diag(
            p, n, c3, scene, c, rows=rows, cols=cols,
            pixel_aspect=cfg.pixel_aspect, kernel=kernel,
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

    return jax.jit(frame), cam


def build_pt(spp: int = 64, rows: int = 36, cols: int = 96):
    """Bench config-0's path-traced frame (demo scene + atlas,
    5 bounces, Pallas megakernel). Returns (jitted fn, args)."""
    import functools
    import jax
    import jax.numpy as jnp
    from ascii_renderer_tpu.backends.pathtrace import render_pt
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.atlas.io import demo_atlas

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    fn = jax.jit(functools.partial(
        render_pt, rows=rows, cols=cols, pixel_aspect=0.5, spp=spp,
        bounces=5, light_color=(16.86, 10.76, 8.2),
        sample_batch=min(64, spp),
        use_kernel=jax.default_backend() == "tpu"))
    key = jax.random.key(0)
    return (lambda: fn(scene, scene.camera, jnp.float32(0.0), key)), ()


def build_step(rows: int = 540, cols: int = 960, spp: int = 8,
               skip: bool = True, advance: int = 0):
    """ProgressivePathTracer step program (render + Welford accumulate,
    adaptive compaction when skip=True) on an all-active state — the
    per-step cost the adaptive path pays before any work is saved."""
    import jax
    import jax.numpy as jnp
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.core.config import (AdaptiveConfig, Config,
                                                PathTracerConfig)
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.sim.accum import ProgressivePathTracer

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    cfg = Config(path_tracer=PathTracerConfig(samples_per_batch=spp),
                 adaptive=AdaptiveConfig(max_tolerance=0.12,
                                         max_samples=32))
    pt = ProgressivePathTracer(cfg, scene, rows, cols, use_kernel=True,
                               adaptive_skip=skip)
    import numpy as np
    for _ in range(advance):  # partially converge before profiling
        pt.step(scene.camera)
    if advance:
        from ascii_renderer_tpu.sim.accum import active_mask
        act = np.asarray(active_mask(
            pt.state, max_tolerance=cfg.adaptive.max_tolerance,
            max_samples=cfg.adaptive.max_samples))
        print(f"advanced {advance} steps, active {act.mean():.1%}",
              file=sys.stderr)
    key = jax.random.key(3)
    return (lambda: pt._step_fn(pt.state, pt.scene, scene.camera,
                                jnp.float32(0.0), key)), ()


def parse_trace(trace_dir: str):
    """Newest vm.trace.json.gz under trace_dir -> list of device op
    events (dicts with name, dur_us, args)."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    assert files, f"no trace under {trace_dir}"
    d = json.load(gzip.open(files[-1]))
    ev = d["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"]["name"]}
    # per-op events carry hlo_category; module-level events don't
    return [e for e in ev
            if e.get("ph") == "X" and e.get("pid") in dev_pids
            and "hlo_category" in e.get("args", {})]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--kernel", default=None,
                    help="raster kernel generation (default: headline)")
    ap.add_argument("--pt", action="store_true",
                    help="profile the path-traced frame (bench config 0) "
                         "instead of the raster headline")
    ap.add_argument("--pt-spp", type=int, default=64)
    ap.add_argument("--pt-rows", type=int, default=36)
    ap.add_argument("--pt-cols", type=int, default=96)
    ap.add_argument("--step", action="store_true",
                    help="profile the ProgressivePathTracer step "
                         "(render + accumulate + adaptive compaction) "
                         "at 960x540 spp8 on an all-active state")
    ap.add_argument("--step-advance", type=int, default=0,
                    help="run N steps first so the profiled step sees "
                         "a partially-converged active mask")
    ap.add_argument("--by-category", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/xprof_headline")
    ap.add_argument("--set", action="append", default=[],
                    help="module.ATTR=pyvalue trace-time flag override, "
                         "e.g. --set ascii_renderer_tpu.backends.raster"
                         ".SETUP_PACKED=False")
    args = ap.parse_args()

    import importlib
    for ov in args.set:
        target, val = ov.split("=", 1)
        mod, attr = target.rsplit(".", 1)
        setattr(importlib.import_module(mod), attr, eval(val))  # noqa: S307

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    if args.step:
        fn0, fargs = build_step(advance=args.step_advance)
        call = fn0
    elif args.pt:
        fn0, fargs = build_pt(args.pt_spp, args.pt_rows, args.pt_cols)
        fn, fargs = (lambda: fn0()), ()
        call = fn0
    else:
        from ascii_renderer_tpu.backends import raster as R
        fn, cam = build_headline(args.kernel or R.HEADLINE_KERNEL)
        call = lambda: fn(cam)  # noqa: E731
    import jax.tree_util as jtu

    def settle(o):
        np.asarray(jtu.tree_leaves(o)[0])

    out = call()
    settle(out)  # compile + settle
    for _ in range(8):
        out = call()
    settle(out)

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            out = call()
        settle(out)

    ops = parse_trace(args.trace_dir)
    total_us = sum(e["dur"] for e in ops)
    print(f"{len(ops)} device op events, {total_us:.0f} us total, "
          f"{total_us / args.iters * 1e-3:.3f} ms/frame (device op sum)")

    from collections import defaultdict
    agg = defaultdict(lambda: [0.0, 0, 0, 0])
    for e in ops:
        key = (e["args"].get("hlo_category", "?") if args.by_category
               else e["name"])
        a = agg[key]
        a[0] += e["dur"]
        a[1] += 1
        a[2] = max(a[2], int(e["args"].get("bytes_accessed", 0) or 0))
        a[3] = max(a[3], int(e["args"].get("model_flops", 0) or 0))
    longname = {}
    for e in ops:
        longname.setdefault(e["name"], e["args"].get("long_name", ""))

    rows_out = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"{'us/frame':>9} {'%':>5} {'n/fr':>5} {'GB/s':>6} "
          f"{'GF/s':>7}  op")
    for key, (dur, cnt, b, fl) in rows_out[:args.top]:
        us = dur / args.iters
        frac = dur / total_us * 100
        bw = (b * cnt / args.iters) / (us * 1e-6) / 1e9 if us else 0
        gf = (fl * cnt / args.iters) / (us * 1e-6) / 1e9 if us else 0
        print(f"{us:9.2f} {frac:5.1f} {cnt / args.iters:5.1f} "
              f"{bw:6.0f} {gf:7.0f}  {key}")
        if not args.by_category:
            ln = longname.get(key, "")
            if ln:
                print(f"{'':28s}{ln[:150]}")


if __name__ == "__main__":
    main()
