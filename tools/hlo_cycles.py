#!/usr/bin/env python
"""Compile-only cost attribution for the headline frame: sums the TPU
compiler's per-fusion `estimated_cycles` from the optimized HLO.

DEPRECATED FOR DECISIONS (round 3b). The model's estimated_cycles
mispriced real ops by up to 30x in both directions: it costed the fused
setup kernel's interface at ~260k cycles (actually ~40 us) while
missing the kernel's own 564 us, and priced the packed-u8 glyph select
at 16x native (actually equal wall time). Two landings based on it were
reverted after tools/profile_trace.py (real per-HLO device timings via
jax.profiler, which DOES work through the tunnel) contradicted it.
Keep for curiosity only; the profiler is the budget of record.

Usage: python tools/hlo_cycles.py [variant ...]   (names from ab_slope)
       python tools/hlo_cycles.py s8 s8split16 --top 12
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def frame_text(kern, ro=False):
    """Compile the headline frame (same program as ab_slope) and return
    optimized HLO text."""
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
    if ro:
        from ascii_renderer_tpu.geom.reorder import reorder_soup
        p, n, c3, _ = reorder_soup(p, n, c3)
    sb = SceneBuilder().set_env_light([0.22, 0.24, 0.28], 1.0)
    sb.add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9)
    scene = sb.build()
    cam = Camera.create(pos=(2.4, 1.4, 2.8),
                        yaw=float(np.arctan2(-2.8, -2.4)), pitch=-0.3)
    p, n, c3 = jnp.asarray(p), jnp.asarray(n), jnp.asarray(c3)
    pos9, attrs_t = R.soup_static_prep(p, n, c3, scene)
    caps = (45056, 0, 9984, 63488, 480)

    def frame(cam):
        (idx_img, _), _ = R.render_soup_diag(
            p, n, c3, scene, cam, rows=rows, cols=cols,
            pixel_aspect=cfg.pixel_aspect, kernel=kern,
            v_cap=caps[0], big_cap=caps[1], r_cap=caps[2],
            pair_cap=caps[3], tile_cap=caps[4],
            pos9=pos9, attrs_t=attrs_t, emit="idx",
            ramp_len=len(cfg.ascii_ramp))
        a_plane = jnp.ones((rows, cols), jnp.uint8)
        chars, _t = glyph_from_index(
            idx_img, a_plane, None, ramp=cfg.ascii_ramp,
            mode_on=cfg.ascii_mode_filter, mode_radius=cfg.mode_radius,
            mode_thresh=cfg.ascii_mode_thresh, grayscale=cfg.use_grayscale)
        return chars

    import jax
    return jax.jit(frame).lower(cam).compile().as_text()


def cycles(txt):
    rows = []
    for ln in txt.splitlines():
        m = re.search(r'estimated_cycles":"(\d+)', ln)
        if not m:
            continue
        cyc = int(m.group(1))
        s = ln.strip()
        name = s.split(" = ")[0]
        shape = s.split(" = ")[1][:52] if " = " in s else ""
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', ln)
        loc = (f"{src.group(1).split('/')[-1]}:{src.group(2)}"
               if src else "?")
        rows.append((cyc, name[:34], shape, loc))
    rows.sort(reverse=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=["s8"])
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    from ab_slope import VARIANTS, _apply

    for name in args.variants:
        _apply(VARIANTS[name])
        kern = ("subtile4" if name.startswith("s4")
                else "subtile5" if name.startswith("s5")
                else "subtile6" if name.startswith("s6")
                else "subtile7" if name.startswith("s7")
                else "subtile8" if name.startswith("s8") else "subtile3")
        txt = frame_text(kern, ro="ro" in name)
        rows = cycles(txt)
        tot = sum(r[0] for r in rows)
        print(f"== {name}: total {tot} cycles (~{tot/940e3:.3f} ms "
              f"@940MHz), {len(rows)} costed ops")
        for r in rows[:args.top]:
            print(f"  {r[0]:8d} {r[1]:34s} {r[2]:52s} {r[3]}")


if __name__ == "__main__":
    main()
