#!/usr/bin/env python
"""Measure the adaptive block-skip PT win (round-4 item 4).

Runs ProgressivePathTracer on the demo scene to a fixed CI target twice —
with and without device block skipping — and reports wall-clock to
convergence. Trajectories are identical by construction (tested in
tests/test_aux_subsystems.py), so the ratio is pure work saved.

Usage: python tools/exp_pt_adaptive.py [--rows 36 --cols 96 --spp 8
                                        --tol 0.1 --cap 64 --reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=36)
    ap.add_argument("--cols", type=int, default=96)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--tol", type=float, default=0.1)
    ap.add_argument("--cap", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--check-every", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.core.config import (AdaptiveConfig, Config,
                                                PathTracerConfig)
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.sim.accum import ProgressivePathTracer

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    cfg = Config(
        path_tracer=PathTracerConfig(samples_per_batch=args.spp),
        adaptive=AdaptiveConfig(max_tolerance=args.tol,
                                max_samples=args.cap),
    )

    def run(skip: bool, early_stop: bool = True):
        pt = ProgressivePathTracer(cfg, scene, args.rows, args.cols,
                                   use_kernel=True, adaptive_skip=skip)
        cam = scene.camera
        # warm the compile outside the timed run
        pt.step(cam)
        jax.block_until_ready(pt.state.mean)
        np.asarray(pt.state.mean)
        pt.state = pt.state.replace(
            count=pt.state.count * 0, mean=pt.state.mean * 0,
            m2=pt.state.m2 * 0, mean_y=pt.state.mean_y * 0,
            m2_y=pt.state.m2_y * 0,
            cam_sig=jnp.full((5,), jnp.inf, jnp.float32))
        pt._batch = 0
        t0 = time.perf_counter()
        steps = 0
        while steps < args.cap:
            pt.step(cam)
            steps += 1
            # pipelined lagged probe: no RTT, no dispatch-queue drain
            # (a sync pt.done every N steps cost ~30 ms + a bubble each)
            if early_stop and pt.poll_done():
                break
        np.asarray(pt.state.mean)  # full completion through the tunnel
        dt = time.perf_counter() - t0
        act = np.asarray(pt.state.count)
        return dt, steps, float(act.mean()), pt

    for rep in range(args.reps):
        ta, sa, ka, pa = run(True)
        tb, sb_, kb, pb = run(False)
        tc, sc, kc, _pc = run(False, early_stop=False)
        same = np.array_equal(np.asarray(pa.state.mean),
                              np.asarray(pb.state.mean))
        print(f"rep {rep}: adaptive {ta:.3f}s ({sa} steps, mean k {ka:.1f})"
              f" | full-to-CI {tb:.3f}s ({sb_} steps, mean k {kb:.1f})"
              f" | fixed-spp {tc:.3f}s ({sc} steps)"
              f" | skip win {tb/ta:.2f}x | vs fixed-spp {tc/ta:.2f}x"
              f" | converged output {'==' if same else '!='}")


if __name__ == "__main__":
    main()
