#!/usr/bin/env python
"""Same-process discriminator: is the PT megakernel really 2x slower
inside the frame program than standalone, or does the tunnel TPU have a
time-varying fast/slow device state that cross-process A/Bs confused
for a program effect?

Arms, interleaved each round:
  matmul   4k bf16 matmul x8 — pure-MXU device-clock canary (~137 GFLOP
           at ~200 TFLOP/s bf16 peak -> ~0.7 ms in the fast state)
  standalone  phase-2 replica: trace_eye_paths_kernel_packed alone on
           prebuilt [8,540,960] rays (4050 blocks; the prior '6.1
           us/block' figure came from this shape in its own process)
  frame    full render_pt 960x540 spp8 (4557 blocks total; reads 12.4
           us/block in today's profiles)

If us/block agrees between standalone and frame in-process, the
'in-context pessimization' was cross-process device drift; if the
matmul arm moves with them, the whole device state is the variable.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ascii_renderer_tpu.backends.pathtrace import (
        render_pt, trace_eye_paths_kernel_packed, get_light_sphere,
        primary_ray_grid)
    from ascii_renderer_tpu.scene.demo import create_demo_scene

    scene = create_demo_scene().build(min_pad=1)
    cam = scene.camera
    key = jax.random.key(3)
    t0 = jnp.float32(0.0)

    frame = jax.jit(lambda c: render_pt(
        scene, c, t0, key, rows=540, cols=960, pixel_aspect=0.5, spp=8,
        bounces=5, light_color=(1.0, 0.95, 0.9), use_kernel=True))

    ro, rd, _px, _py = primary_ray_grid(cam, 540, 960, 0.5)
    ro8 = jnp.broadcast_to(cam.pos, (8, 540, 960, 3))
    rd8 = jnp.broadcast_to(rd, (8, 540, 960, 3))
    lc, lr = get_light_sphere(scene, t0)
    standalone = jax.jit(lambda r, d: trace_eye_paths_kernel_packed(
        scene, r, d, 1234, lc, lr, bounces=5,
        light_color=jnp.asarray([1.3, 1.235, 1.17]), nee=True))
    ro8 = jax.block_until_ready(ro8 + 0.0)
    rd8 = jax.block_until_ready(rd8 + 0.0)

    a_mm = jnp.ones((4096, 4096), jnp.bfloat16) * 0.001
    mm = jax.jit(lambda x: x @ x @ x @ x @ x @ x @ x @ x @ x)

    def t_frame():
        out = frame(cam)
        return float(np.asarray(out[0][0, 0, 0]))

    def t_standalone():
        out = standalone(ro8, rd8)
        return float(np.asarray(out[0][0]))

    def t_mm():
        return float(np.asarray(mm(a_mm)[0, 0]))

    arms = [("matmul", t_mm, None), ("standalone", t_standalone, 4050),
            ("frame", t_frame, 4557)]
    for name, f, _ in arms:
        f()  # compile

    for rnd in range(args.rounds):
        line = []
        for name, f, blocks in arms:
            f()  # warm
            reps = []
            for _ in range(args.reps):
                a = time.perf_counter()
                f()
                reps.append(time.perf_counter() - a)
            med = np.median(reps) * 1e3
            per = f" ({med * 1e3 / blocks:5.2f} us/blk)" if blocks else ""
            line.append(f"{name} {med:7.2f} ms{per}")
        print(" | ".join(line), flush=True)


if __name__ == "__main__":
    main()
