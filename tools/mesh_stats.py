#!/usr/bin/env python
"""Bin-depth validation of the synthetic benchmark meshes (VERDICT r1 #8).

The bin-walk kernel's cost is driven by the per-bin triangle-depth
distribution, so "bunny-class" claims about the displaced-sphere stand-in
(geom/meshes.py bunny_like; the real scan is unavailable under zero
egress) must be defended with measured bin statistics, not asserted.

Prints, for bunny_like and a uniform uv_sphere control at the same
triangle count and camera, the (tile, subtile)-bin depth distribution at
the 960x540 headline framing. Output feeds PARITY.md.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bin_stats(mesh_fn, name, rows=540, cols=960):
    import jax.numpy as jnp
    from ascii_renderer_tpu.backends import raster as R
    from ascii_renderer_tpu.geom import meshes
    from ascii_renderer_tpu.core.camera import Camera

    v, i = mesh_fn()
    p, n, c = meshes.mesh_to_soup(v, i, color=(0.8, 0.78, 0.75))
    cam = Camera.create(pos=(2.4, 1.4, 2.8),
                        yaw=float(np.arctan2(-2.8, -2.4)), pitch=-0.3)
    mvp = R.camera_mvp(cam, rows, cols, 0.5)
    ch = R.setup_screen_channels(
        R.transform_clip_channels(jnp.asarray(p), mvp), rows, cols)
    n2t = int(ch["valid"].shape[0])
    cch, _, n_valid = R.compact_valid_ch(ch, min(n2t, R.MAX_V_CAP))
    _z, _e, _t, n_rowsd, n_pairs = R.visibility_subtile(
        cch, rows, cols, big_cap=64, r_cap=65536, pair_cap=1 << 20)
    # recompute offsets host-side for the histogram
    import jax
    from ascii_renderer_tpu.ops import raster_subtile as RS
    tiles_y = -(-rows // R.TILE_H)
    tiles_x = -(-cols // R.TILE_W)

    # re-derive per-bin depths from a fresh key build (mirror of
    # visibility_subtile's prep, small and host-checked)
    xa, xb, xc = cch["sxa"], cch["sxb"], cch["sxc"]
    ya, yb, yc = cch["sya"], cch["syb"], cch["syc"]
    valid = cch["valid"]
    sx_n = tiles_x * RS.N_SUB
    n_bins = tiles_y * tiles_x * RS.N_SUB
    xmin = np.minimum(np.minimum(xa, xb), xc)
    xmax = np.maximum(np.maximum(xa, xb), xc)
    ymin = np.minimum(np.minimum(ya, yb), yc)
    ymax = np.maximum(np.maximum(ya, yb), yc)
    sc0 = np.floor(np.asarray(xmin) / RS.SUB_W).astype(int)
    sc1 = np.floor(np.asarray(xmax) / RS.SUB_W).astype(int)
    ty0 = np.floor(np.asarray(ymin) / R.TILE_H).astype(int)
    ty1 = np.floor(np.asarray(ymax) / R.TILE_H).astype(int)
    on = ((np.asarray(xmax) > 0) & (np.asarray(xmin) < cols)
          & (np.asarray(ymax) > 0) & (np.asarray(ymin) < rows))
    ok = np.asarray(valid) & on
    counts = np.zeros(n_bins, np.int64)
    for t in np.nonzero(ok)[0]:
        for ty in range(max(ty0[t], 0), min(ty1[t], tiles_y - 1) + 1):
            for sc in range(max(sc0[t], 0), min(sc1[t], sx_n - 1) + 1):
                counts[ty * sx_n + sc] += 1
    nz = counts[counts > 0]
    # screen-space triangle sizes
    w = (np.asarray(xmax) - np.asarray(xmin))[ok]
    h = (np.asarray(ymax) - np.asarray(ymin))[ok]
    print(f"{name}: valid={int(n_valid)} pairs={int(n_pairs)} "
          f"aligned_rows={int(n_rowsd)}")
    print(f"  tri bbox px: w p50={np.percentile(w, 50):.2f} "
          f"p95={np.percentile(w, 95):.2f} "
          f"h p50={np.percentile(h, 50):.2f} p95={np.percentile(h, 95):.2f}")
    print(f"  nonempty bins={nz.size}/{n_bins} depth mean={nz.mean():.1f} "
          f"p50={np.percentile(nz, 50):.0f} p90={np.percentile(nz, 90):.0f} "
          f"p99={np.percentile(nz, 99):.0f} max={nz.max()}")
    return nz


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ascii_renderer_tpu.geom import meshes

    bin_stats(lambda: meshes.bunny_like(69000), "bunny_like(69k)")
    # uniform control: a plain uv_sphere at comparable triangle count
    bin_stats(lambda: meshes.uv_sphere(186, 186), "uv_sphere control (~69k)")


if __name__ == "__main__":
    main()
