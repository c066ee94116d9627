#!/usr/bin/env python
"""Why does bench's 960x540-PT slope read ~4x the sync-loop estimate?

Arms, one process:
  sync      N reps of (dispatch + 1-element readback): compute + RTT each
  slope a/b/c   queue-depth slopes at (2,8), (4,16), (8,32) — if deeper
            queues read slower per frame, streaming dispatch itself is
            degrading the device program (memory pressure / output
            transfer per dispatch); if all agree with sync-RTT, bench's
            reps=2 n=(2,8) reading was tunnel noise.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ascii_renderer_tpu.backends.pathtrace import render_pt
    from ascii_renderer_tpu.scene.demo import create_demo_scene

    from ascii_renderer_tpu.ops import pt_kernel as K
    for a in sys.argv:
        if a.startswith("--probe="):  # "skip" | "nocond" (see pt_kernel)
            K.ATLAS_PROBE = a.split("=", 1)[1]
    sb = create_demo_scene()
    if "--atlas" in sys.argv:
        # WITH the ASCII-texture atlas — the bench config-0 hd point's
        # actual workload. The original atlas-less form is what PARITY
        # r4 quoted as "~40 FPS / 25 ms": the one-hot texel fetch the
        # atlas adds is the kernel's most expensive block, so the two
        # workloads differ ~2x and the docs compared apples to oranges.
        from ascii_renderer_tpu.atlas.io import demo_atlas
        sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    key = jax.random.key(3)
    # precomputed scene pack = the production caller shape ("--inpack"
    # keeps the old pack-inside-jit arm for measuring that overhead)
    packed = None
    if "--inpack" not in sys.argv:
        from ascii_renderer_tpu.backends.pathtrace import \
            pack_scene_entries
        packed = pack_scene_entries(scene)
    fn = jax.jit(functools.partial(
        render_pt, rows=540, cols=960, pixel_aspect=0.5, spp=8,
        bounces=5, light_color=(16.86, 10.76, 8.2), sample_batch=8,
        use_kernel=True, packed=packed))

    def call():
        return fn(scene, scene.camera, jnp.float32(0.0), key)

    def read1(out):
        return float(np.asarray(out[0][0, 0, 0]))

    read1(call())  # compile
    read1(call())

    for rnd in range(3):
        # sync arm
        reps = []
        for _ in range(6):
            a = time.perf_counter()
            read1(call())
            reps.append(time.perf_counter() - a)
        sync = np.median(reps) * 1e3

        cells = [f"sync {sync:6.1f} ms"]
        for n1, n2 in ((2, 8), (4, 16), (8, 32)):
            t = []
            for n in (n1, n2):
                a = time.perf_counter()
                out = None
                for _ in range(n):
                    out = call()
                read1(out)
                t.append(time.perf_counter() - a)
            s = (t[1] - t[0]) / (n2 - n1) * 1e3
            cells.append(f"slope({n1},{n2}) {s:6.1f}")
        print(" | ".join(cells), flush=True)


if __name__ == "__main__":
    main()
