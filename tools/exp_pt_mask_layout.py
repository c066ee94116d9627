#!/usr/bin/env python
"""Which ray->block layout makes adaptive convergence skippable?

Runs the progressive PT to the cap, recording the active mask before
every batch, then reports — per layout — what fraction of 1024-ray
device blocks would have been skippable (all rays inactive), i.e. the
upper bound on the adaptive block-skip win under that layout.

Layouts compared (all FIXED permutations, so each preserves the
adaptive==full trajectory identity the block gate relies on):
  rowscan : the current order (pixel index = y*W + x)
  tile32  : 32x32 pixel tiles (one tile == one block)
  tile8   : 8x128 pixel tiles (matches the (BH, BW) block shape)

Usage: python tools/exp_pt_mask_layout.py [--rows 540 --cols 960
                                           --spp 8 --tol 0.1 --cap 64]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def block_frac_skippable(mask_flat: np.ndarray, perm: np.ndarray) -> float:
    """Fraction of 1024-ray blocks with zero active rays under a layout.

    `perm` maps block-stream position -> pixel index, with -1 = padding
    (always inactive)."""
    m = np.where(perm >= 0, mask_flat[np.clip(perm, 0, None)], False)
    pad = -len(m) % 1024
    m = np.concatenate([m, np.zeros(pad, bool)])
    blocks = m.reshape(-1, 1024)
    return float((~blocks.any(axis=1)).mean())


def layouts(rows: int, cols: int):
    """Each layout maps the active mask [rows*cols] onto a padded block
    stream: a list of 1024-ray blocks, each a boolean "any ray active".
    Padding rays (outside the grid) are inactive, so a partial tile is
    skippable iff its real rays are."""
    idx = np.arange(rows * cols).reshape(rows, cols)
    out = {"rowscan": idx.reshape(-1)}  # contiguous scan, pad at the end
    for name, th, tw in (("tile32", 32, 32), ("tile8", 8, 128),
                         ("tile16", 16, 64), ("tile4", 4, 256)):
        nth, ntw = -(-rows // th), -(-cols // tw)
        pad = np.full((nth * th, ntw * tw), -1, np.int64)
        pad[:rows, :cols] = idx
        t = pad.reshape(nth, th, ntw, tw)
        out[name] = t.transpose(0, 2, 1, 3).reshape(-1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=540)
    ap.add_argument("--cols", type=int, default=960)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--tol", type=float, default=0.1)
    ap.add_argument("--cap", type=int, default=64)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.core.config import (AdaptiveConfig, Config,
                                                PathTracerConfig)
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.sim.accum import (ProgressivePathTracer,
                                              active_mask)

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build(min_pad=1)
    cfg = Config(
        path_tracer=PathTracerConfig(samples_per_batch=args.spp),
        adaptive=AdaptiveConfig(max_tolerance=args.tol,
                                max_samples=args.cap),
    )
    pt = ProgressivePathTracer(cfg, scene, args.rows, args.cols,
                               use_kernel=True, adaptive_skip=False)
    cam = scene.camera
    lay = layouts(args.rows, args.cols)
    sums = {k: 0.0 for k in lay}
    active_frac_sum = 0.0
    for step in range(args.cap):
        act = np.array(active_mask(pt.state, max_tolerance=args.tol,
                                   max_samples=args.cap)).reshape(-1)
        if step == 0:
            act[:] = True  # first batch is always full (camera-move reset)
        active_frac_sum += act.mean()
        fr = {k: block_frac_skippable(act, perm) for k, perm in lay.items()}
        for k, v in fr.items():
            sums[k] += v
        if step % 8 == 0 or step == args.cap - 1:
            msg = " ".join(f"{k}={v:.3f}" for k, v in fr.items())
            print(f"step {step:3d}: active={act.mean():.3f} "
                  f"skippable: {msg}")
        pt.step(cam)
    n = args.cap
    print(f"\nmean active pixel frac: {active_frac_sum / n:.3f} "
          f"(ideal per-pixel skip win {n / max(active_frac_sum, 1e-9):.2f}x)")
    base_blocks = -(-args.rows * args.cols // 1024)
    for k, perm in lay.items():
        nblocks = -(-len(perm) // 1024)
        # win vs the unpadded rowscan dispatch, charging the layout for
        # its padding blocks: work ∝ live blocks.
        live = (1.0 - sums[k] / n) * nblocks
        print(f"layout {k:8s}: mean skippable block frac {sums[k]/n:.3f} "
              f"(blocks {nblocks}, pad {nblocks/base_blocks-1:+.1%}) "
              f"-> block-skip win upper bound {base_blocks/live:.2f}x")


if __name__ == "__main__":
    main()
