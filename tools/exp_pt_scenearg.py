#!/usr/bin/env python
"""A/B: why does scene-as-jit-argument double the PT megakernel frame?

Round-4 finding (per-HLO profile + cross-process bisects): the identical
960x540 spp8 kernel-path frame measures ~29 ms with the scene baked into
the jit as constants and ~57 ms with SceneData passed as an argument —
the in-context megakernel itself slows 2x (12.4 vs 6.1 us/block).
Cross-process bisects drifted, so this tool times ALL variants
interleaved in ONE process:

  const        scene closed over (constants); camera is the only arg
  scene_arg    production form: fn(scene, cam) — the slow one
  packed_const scene as arg, but pack_scene_entries precomputed and
               closed over as constants (candidate fix A)
  packed_arg   scene as arg, precomputed pack passed as ARRAYS per call
               (candidate fix B — survives scene swaps w/o retrace)

Usage: python tools/exp_pt_scenearg.py [--reps 10] [--rounds 3]
       [--rows 540 --cols 960 --spp 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--rows", type=int, default=540)
    ap.add_argument("--cols", type=int, default=960)
    ap.add_argument("--spp", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ascii_renderer_tpu.backends.pathtrace import (
        render_pt, pack_scene_entries)
    from ascii_renderer_tpu.scene.demo import create_demo_scene

    scene = create_demo_scene().build(min_pad=1)
    cam = scene.camera
    key = jax.random.key(3)
    t0 = jnp.float32(0.0)
    kw = dict(rows=args.rows, cols=args.cols, pixel_aspect=0.5,
              spp=args.spp, bounces=5, light_color=(1.0, 0.95, 0.9),
              use_kernel=True)

    packed = pack_scene_entries(scene)
    pp = jax.block_until_ready(jnp.asarray(packed[0]))
    af = jax.block_until_ready(jnp.asarray(packed[1]))
    AW, AH, SR = packed[2], packed[3], packed[4]
    pp_c = jnp.asarray(np.asarray(pp))   # numpy consts for the closure
    af_c = jnp.asarray(np.asarray(af))

    fns = {
        "const": jax.jit(lambda c: render_pt(scene, c, t0, key, **kw)),
        "scene_arg": jax.jit(
            lambda s, c: render_pt(s, c, t0, key, **kw)),
        "packed_const": jax.jit(
            lambda s, c: render_pt(s, c, t0, key,
                                   packed=(pp_c, af_c, AW, AH, SR), **kw)),
        "packed_arg": jax.jit(
            lambda s, c, p, a: render_pt(s, c, t0, key,
                                         packed=(p, a, AW, AH, SR), **kw)),
    }
    calls = {
        "const": lambda: fns["const"](cam),
        "scene_arg": lambda: fns["scene_arg"](scene, cam),
        "packed_const": lambda: fns["packed_const"](scene, cam),
        "packed_arg": lambda: fns["packed_arg"](scene, cam, pp, af),
    }

    def sync(out):
        # the axon tunnel's block_until_ready returns early on tuples —
        # a host round-trip of one scalar is the reliable fence
        return float(np.asarray(out[0][0, 0, 0]))

    ref = None
    for name, call in calls.items():
        out = call()  # compile
        v = np.asarray(out[0])
        if ref is None:
            ref = v
        else:
            bit_eq = np.array_equal(ref, v)
            print(f"{name}: bit_identical_to_const={bit_eq}")

    times = {k: [] for k in calls}
    for _ in range(args.rounds):
        for name, call in calls.items():
            reps = []
            sync(call())  # warm
            for _ in range(args.reps):
                a = time.perf_counter()
                sync(call())
                reps.append(time.perf_counter() - a)
            times[name].append(np.median(reps) * 1e3)

    print(f"\n{args.rows}x{args.cols} spp{args.spp} kernel-path frame, "
          f"median of {args.reps} reps x {args.rounds} interleaved rounds:")
    for name, ms in times.items():
        print(f"  {name:13s} {' '.join(f'{m:7.2f}' for m in ms)} ms")


if __name__ == "__main__":
    main()
