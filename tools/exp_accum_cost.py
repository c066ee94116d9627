#!/usr/bin/env python
"""Isolate the progressive step's per-step cost at 960x540 spp8.

Arms (one process, slope-timed at queue depth (4,16)):
  render      render_pt alone (the 25 ms baseline)
  step_plain  ProgressivePathTracer._step_fn with adaptive_skip=False
              (render + Welford accumulate in one jit)
  step_skip   same with adaptive_skip=True, state fully unconverged
              (mask all-active: compaction is a no-op permutation)

If step_plain >> render, the accumulate wrapper (or jit context) is
pessimizing the megakernel again (cf. the closed_call scan finding).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


def slope(call, read1, n1=4, n2=16):
    t = []
    for n in (n1, n2):
        a = time.perf_counter()
        out = None
        for _ in range(n):
            out = call()
        read1(out)
        t.append(time.perf_counter() - a)
    return (t[1] - t[0]) / (n2 - n1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.backends.pathtrace import render_pt
    from ascii_renderer_tpu.core.config import (AdaptiveConfig, Config,
                                                PathTracerConfig)
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.sim.accum import ProgressivePathTracer

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    cfg = Config(path_tracer=PathTracerConfig(samples_per_batch=8),
                 adaptive=AdaptiveConfig(max_tolerance=0.12,
                                         max_samples=32))
    key = jax.random.key(3)

    fn = jax.jit(functools.partial(
        render_pt, rows=540, cols=960, pixel_aspect=0.5, spp=8,
        bounces=5, light_color=cfg.path_tracer.light_color,
        sample_batch=32, use_kernel=True))

    def arm_render():
        return fn(scene, scene.camera, jnp.float32(0.0), key)

    pts = {name: ProgressivePathTracer(cfg, scene, 540, 960,
                                       use_kernel=True, adaptive_skip=s)
           for name, s in (("step_plain", False), ("step_skip", True))}

    def make_arm(pt):
        def arm():
            return pt._step_fn(pt.state, pt.scene, scene.camera,
                               jnp.float32(0.0), key)
        return arm

    arms = [("render", arm_render, lambda o: np.asarray(o[0][0, 0]))]
    for name, pt in pts.items():
        arms.append((name, make_arm(pt),
                     lambda o: np.asarray(o[1][0, 0])))

    for name, call, rd in arms:
        rd(call())  # compile

    for rnd in range(3):
        cells = []
        for name, call, rd in arms:
            cells.append(f"{name} {slope(call, rd):6.1f} ms")
        print(" | ".join(cells), flush=True)


if __name__ == "__main__":
    main()
