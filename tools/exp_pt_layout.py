#!/usr/bin/env python
"""A/B the PT megakernel entry-stream layouts (round-4 item 1).

scalar: packed [rows, 128] descriptor rows, ~20 VMEM scalar reads + splats
        per entry (the round-3 bottleneck, PARITY.md "scalar-read-bound")
vec:    lane-replicated [E, N_CHAN, 128] — channel access is a (1, 128)
        row slice + sublane broadcast

Both are traced in one process and interleave-slope-timed (tunnel drift
cancels); outputs are checked for bit-identity (same candidate order,
same arithmetic — only the access instruction class differs).

Usage: python tools/exp_pt_layout.py [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--n1", type=int, default=8)
    ap.add_argument("--n2", type=int, default=32)
    ap.add_argument("--hd", action="store_true",
                    help="also run the 960x540 spp8 point")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.ops import pt_kernel as PK
    from ascii_renderer_tpu.scene.demo import create_demo_scene

    LCOL = (16.86, 10.76, 8.2)
    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    key = jax.random.key(0)
    cargs = (scene, scene.camera, jnp.float32(0.0), key)

    def trace_variant(layout, rows, cols, spp, batch):
        PK.PRIM_LAYOUT = layout
        try:
            fn = jax.jit(lambda s, c, t, k: PT.render_pt(
                s, c, t, k, rows=rows, cols=cols, pixel_aspect=0.5,
                spp=spp, bounces=5, light_color=LCOL, sample_batch=batch,
                use_kernel=True)[0])
            out = fn(*cargs)  # warm/compile under the flag
            out.block_until_ready()
            return fn, np.asarray(out)
        finally:
            PK.PRIM_LAYOUT = "vec"

    def slope(fn, n1, n2):
        tot = []
        for n in (n1, n2):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*cargs)
            np.asarray(out)
            tot.append(time.perf_counter() - t0)
        return (tot[1] - tot[0]) / (n2 - n1)

    points = [("96x36 spp64", 36, 96, 64, 64, args.n1, args.n2)]
    if args.hd:
        points.append(("960x540 spp8", 540, 960, 8, 8, 2, 8))

    for label, rows, cols, spp, batch, n1, n2 in points:
        fa, oa = trace_variant("scalar", rows, cols, spp, batch)
        fb, ob = trace_variant("vec", rows, cols, spp, batch)
        ident = np.array_equal(oa, ob)
        print(f"[{label}] outputs {'==' if ident else '!='}")
        res = {"scalar": [], "vec": []}
        for _ in range(args.reps):
            res["scalar"].append(slope(fa, n1, n2))
            res["vec"].append(slope(fb, n1, n2))
        for name in ("scalar", "vec"):
            v = sorted(res[name])
            med = v[len(v) // 2]
            print(f"  {name:7s}: med {med*1e3:7.3f} ms/frame "
                  f"({1/med:7.1f} FPS)  reps "
                  + " ".join(f"{x*1e3:.3f}" for x in res[name]))


if __name__ == "__main__":
    main()
