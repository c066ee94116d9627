#!/usr/bin/env python
"""Slope-timed path-tracer stage/variant profile — the megakernel
counterpart of tools/ab_slope.py (VERDICT r2 item 4: profile the PT the
way the raster path was profiled).

Every timing is a queue-depth slope with one scalar readback (see
bench.py:_time_fn_slope rationale: the axon tunnel's fixed ~30-40 ms RTT
and per-dispatch enqueue otherwise poison per-frame figures).

Variants (pass names on the CLI; default runs all):
  probe96   phase-1 center-ray probe only, 96x36 (megakernel, 1 trace/px)
  full96    render_pt 96x36 spp64 b64 megakernel (the reference workload)
  xla96     same workload on the channel-form XLA core (use_kernel=False)
  b16 b32   sample_batch sweep at 96x36 spp64 (batch-axis occupancy)
  hd8       960x540 spp8 megakernel (the headline-grid PT point)
  hd8xla    960x540 spp8 XLA core
  atlas64   full96 with a 64x64 atlas (two-level in-kernel gather)

Usage: python tools/profile_pt.py [variant ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ALL = ["probe96", "full96", "xla96", "b16", "b32", "hd8", "hd8xla",
       "atlas64"]


def _slope(fn, args, n1, n2):
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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=ALL)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="scale the per-variant (n1, n2) queue depths "
                         "(CPU smoke: --scale 0.1 --reps 1)")
    args = ap.parse_args()
    names = args.variants or ALL
    import jax
    import jax.numpy as jnp
    # the axon plugin ignores the JAX_PLATFORMS env var in subprocesses
    # (registration re-routes get_backend); the config knob always works
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.scene.demo import create_demo_scene

    LCOL = (16.86, 10.76, 8.2)

    def build_scene(atlas_side=32):
        sb = create_demo_scene()
        px = demo_atlas()  # u8 [32, 32, 4]
        if atlas_side != 32:
            # tile the 32x32 demo art up to atlas_side: content is
            # irrelevant to the timing, texel count is the variable
            reps = atlas_side // 32
            px = np.tile(px, (reps, reps, 1))
        sb.set_atlas(px)
        return sb.build(min_pad=1)

    scene = build_scene()
    key = jax.random.key(0)

    def render_fn(rows, cols, spp, batch, use_kernel, sc):
        return jax.jit(lambda s, c, t, k: jnp.sum(
            PT.render_pt(s, c, t, k, rows=rows, cols=cols,
                         pixel_aspect=0.5, spp=spp, bounces=5,
                         light_color=LCOL, sample_batch=batch,
                         use_kernel=use_kernel)[0])), sc

    def probe_fn(rows, cols, sc):
        def f(s, c, t, k):
            ro, rd, _px, _py = PT.primary_ray_grid(c, rows, cols, 0.5)
            lc, lr = PT.get_light_sphere(s, t)
            seed = (jax.random.key_data(k).reshape(-1)[-1]
                    .astype(jnp.int32))
            col0, ov0, fetched = PT.trace_eye_paths_kernel(
                s, ro, rd, seed, lc, lr, bounces=5,
                light_color=jnp.asarray(LCOL) * 1.3, nee=True)
            return jnp.sum(col0) + jnp.sum(ov0) + jnp.sum(fetched)
        return jax.jit(f), sc

    defs = {
        "probe96": (lambda: probe_fn(36, 96, scene), 16, 64),
        "full96": (lambda: render_fn(36, 96, 64, 64, True, scene), 8, 32),
        "xla96": (lambda: render_fn(36, 96, 64, 64, False, scene), 8, 32),
        "b16": (lambda: render_fn(36, 96, 64, 16, True, scene), 8, 32),
        "b32": (lambda: render_fn(36, 96, 64, 32, True, scene), 8, 32),
        "hd8": (lambda: render_fn(540, 960, 8, 8, True, scene), 2, 8),
        "hd8xla": (lambda: render_fn(540, 960, 8, 8, False, scene), 2, 8),
        "atlas64": (lambda: render_fn(36, 96, 64, 64, True,
                                      build_scene(64)), 8, 32),
    }

    for name in names:
        make, n1, n2 = defs[name]
        n1 = max(1, int(n1 * args.scale))
        n2 = max(n1 + 1, int(n2 * args.scale))
        fn, sc = make()
        out = np.asarray(fn(sc, sc.camera, jnp.float32(0.0), key))  # warm
        assert np.isfinite(out), (name, out)
        dt = min(_slope(fn, (sc, sc.camera, jnp.float32(0.0), key), n1, n2)
                 for _ in range(args.reps))
        print(f"{name:10s}: {dt*1e3:8.3f} ms/frame ({1/dt:8.1f} FPS)")


if __name__ == "__main__":
    main()
