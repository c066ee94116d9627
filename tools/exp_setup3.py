#!/usr/bin/env python
"""Ablate the fused-setup kernel body to find its 0.66 ms hot spot.

Variants (same I/O shapes as the real kernel, c_out=42):
  full     — the real kernel math (copy of ops/setup2dh.py)
  nodiv    — all divides replaced by multiplies (wrong math, same flow)
  noshade  — skip shade-plane channels (write zeros)
  nobbox   — skip bbox fold + validity (write zeros)
  entry    — only entry planes + id (zeros elsewhere)
  copy     — write inputs through (DMA floor)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

EPS_W = 1e-4


def _time(fn, args, warmup=3, iters=128):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def make_kernel(jnp, jax, *, n_attrs, rows, cols, ts, mode):
    A = n_attrs

    def kern(mvp_ref, pos_ref, attr_ref, out_ref):
        m = [[mvp_ref[i, j] for j in range(4)] for i in range(4)]
        import jax.experimental.pallas as pl
        step = pl.program_id(0)

        def pos(i):
            return pos_ref[i, 0]

        zero = jnp.zeros((ts, 128), jnp.float32)
        if mode == "copy":
            for i in range(42):
                out_ref[i, 0] = pos(i % 9)
            return

        def rcp(x):
            if mode == "nodiv":
                return x * 1e-3
            return 1.0 / x

        vs = {}
        for i, s in enumerate("abc"):
            px, py, pz = pos(3 * i), pos(3 * i + 1), pos(3 * i + 2)
            xc = m[0][0] * px + m[0][1] * py + m[0][2] * pz + m[0][3]
            yc = m[1][0] * px + m[1][1] * py + m[1][2] * pz + m[1][3]
            zc = m[2][0] * px + m[2][1] * py + m[2][2] * pz + m[2][3]
            wc = m[3][0] * px + m[3][1] * py + m[3][2] * pz + m[3][3]
            vs[f"x{s}"] = (xc + wc) * (0.5 * cols)
            vs[f"y{s}"] = (wc - yc) * (0.5 * rows)
            vs[f"z{s}"] = (zc + wc) * 0.5
            vs[f"w{s}"] = wc

        def cross3(s1, s2):
            x1, y1, w1 = vs[f"x{s1}"], vs[f"y{s1}"], vs[f"w{s1}"]
            x2, y2, w2 = vs[f"x{s2}"], vs[f"y{s2}"], vs[f"w{s2}"]
            return (y1 * w2 - w1 * y2, w1 * x2 - x1 * w2, x1 * y2 - y1 * x2)

        e0 = cross3("b", "c")
        e1 = cross3("c", "a")
        e2 = cross3("a", "b")
        det = vs["xa"] * e0[0] + vs["ya"] * e0[1] + vs["wa"] * e0[2]
        det_safe = jnp.where(jnp.abs(det) < 1e-30, -1e-30, det)
        ninv = rcp(det_safe)
        inv = -ninv

        for k, e in enumerate((e0, e1, e2)):
            out_ref[3 * k + 0, 0] = e[0] * inv
            out_ref[3 * k + 1, 0] = e[1] * inv
            out_ref[3 * k + 2, 0] = e[2] * inv
        for ch, j in ((9, 0), (10, 1), (11, 2)):
            out_ref[ch, 0] = (vs["za"] * e0[j] + vs["zb"] * e1[j]
                              + vs["zc"] * e2[j]) * ninv

        iota = (jax.lax.broadcasted_iota(jnp.int32, (ts, 128), 0) * 128
                + jax.lax.broadcasted_iota(jnp.int32, (ts, 128), 1))
        out_ref[12, 0] = (iota.astype(jnp.float32)
                          + step.astype(jnp.float32) * (ts * 128))
        out_ref[13, 0] = zero
        out_ref[14, 0] = zero
        out_ref[15, 0] = zero

        if mode == "noshade":
            for jj in range(3 * A + 3):
                out_ref[16 + jj, 0] = zero
        else:
            for jj in range(A):
                aa = attr_ref[jj, 0]
                ab = attr_ref[A + jj, 0]
                ac = attr_ref[2 * A + jj, 0]
                for c_i in range(3):
                    out_ref[16 + 3 * jj + c_i, 0] = (
                        aa * e0[c_i] + ab * e1[c_i] + ac * e2[c_i]) * ninv
            dn_base = 16 + 3 * A
            for c_i in range(3):
                out_ref[dn_base + c_i, 0] = (
                    e0[c_i] + e1[c_i] + e2[c_i]) * ninv

        bb = 16 + 3 * A + 3
        if mode in ("nobbox", "entry"):
            for k in range(5):
                out_ref[bb + k, 0] = zero
            return

        big = jnp.float32(1e9)
        x0 = jnp.full((ts, 128), big)
        x1 = jnp.full((ts, 128), -big)
        y0 = jnp.full((ts, 128), big)
        y1 = jnp.full((ts, 128), -big)

        def fold(mask, xq, yq, x0, x1, y0, y1):
            return (jnp.where(mask, jnp.minimum(x0, xq), x0),
                    jnp.where(mask, jnp.maximum(x1, xq), x1),
                    jnp.where(mask, jnp.minimum(y0, yq), y0),
                    jnp.where(mask, jnp.maximum(y1, yq), y1))

        front = {}
        for s in "abc":
            w = vs[f"w{s}"]
            front[s] = w > EPS_W
            iw = rcp(jnp.where(front[s], w, 1.0))
            x0, x1, y0, y1 = fold(front[s], vs[f"x{s}"] * iw,
                                  vs[f"y{s}"] * iw, x0, x1, y0, y1)
        inv_eps = 1.0 / EPS_W
        for s1, s2 in (("a", "b"), ("b", "c"), ("c", "a")):
            w1, w2 = vs[f"w{s1}"], vs[f"w{s2}"]
            crossing = front[s1] != front[s2]
            t = (w1 - EPS_W) * rcp(jnp.where(crossing, w1 - w2, 1.0))
            xq = (vs[f"x{s1}"] + t * (vs[f"x{s2}"] - vs[f"x{s1}"])) * inv_eps
            yq = (vs[f"y{s1}"] + t * (vs[f"y{s2}"] - vs[f"y{s1}"])) * inv_eps
            x0, x1, y0, y1 = fold(crossing, xq, yq, x0, x1, y0, y1)

        out_ref[bb + 0, 0] = x0
        out_ref[bb + 1, 0] = x1
        out_ref[bb + 2, 0] = y0
        out_ref[bb + 3, 0] = y1

        all_front = front["a"] & front["b"] & front["c"]
        iw3 = tuple(rcp(jnp.where(front[s], vs[f"w{s}"], 1.0)) for s in "abc")
        a2h = det * iw3[0] * iw3[1] * iw3[2]
        sz = tuple(vs[f"z{s}"] * iw3[i] for i, s in enumerate("abc"))
        szmin = jnp.minimum(jnp.minimum(sz[0], sz[1]), sz[2])
        szmax = jnp.maximum(jnp.maximum(sz[0], sz[1]), sz[2])
        valid_front = ((a2h < 0.0) & (jnp.abs(a2h) > 1e-12)
                       & (szmax >= 0.0) & (szmin <= 1.0))
        valid_cross = det < -1e-20
        valid = (all_front & valid_front) | (~all_front & valid_cross)
        out_ref[bb + 4, 0] = valid.astype(jnp.float32)

    return kern


def main():
    global jax
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    A = 6
    tp = 69632
    S = 4096
    ts = S // 128
    nb = tp // S
    c_out = 16 + 3 * A + 3 + 5  # 42
    rows, cols = 540, 960

    rng = np.random.default_rng(0)
    pos9 = jnp.asarray(rng.standard_normal((9, nb, ts, 128)), jnp.float32)
    attrs = jnp.asarray(rng.standard_normal((3 * A, nb, ts, 128)),
                        jnp.float32)
    mvp = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)

    for mode in ("copy", "entry", "nobbox", "noshade", "nodiv", "full"):
        kern = make_kernel(jnp, jax, n_attrs=A, rows=rows, cols=cols,
                           ts=ts, mode=mode)
        f = jax.jit(lambda mvp, pos9, attrs, kern=kern: pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=__import__(
                    "jax.experimental.pallas.tpu", fromlist=["x"]).SMEM),
                pl.BlockSpec((9, 1, ts, 128), lambda i: (0, i, 0, 0)),
                pl.BlockSpec((3 * A, 1, ts, 128), lambda i: (0, i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((c_out, 1, ts, 128),
                                   lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((c_out, nb, ts, 128),
                                           jnp.float32),
        )(mvp, pos9, attrs))
        t = _time(f, (mvp, pos9, attrs)) * 1e3
        print(f"{mode:8s}: {t:7.3f} ms")


if __name__ == "__main__":
    main()
