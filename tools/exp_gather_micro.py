#!/usr/bin/env python
"""Does Mosaic lower a per-lane dynamic gather over sublanes natively?

If jnp.take_along_axis(mat, idx, axis=0) with a per-lane index vector
compiles in a Pallas TPU kernel and runs at ~vreg-op cost, the PT atlas
fetch's one-hot apparatus (the 960x540 frame's dominant block, 32 ms of
57) collapses to a few ops. Arms:
  tree  — 7-level where-tree select mat[lo[j], j] (known-good baseline)
  gather— jnp.take_along_axis over sublanes
  onehot— the r4 mask+mul+reduce form
Each runs standalone on a [128, 128] f32 value matrix, 512 selects per
kernel call to amortize, checked bit-exact against numpy.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N_SEL = 512  # selects per kernel call

    def make_kernel(form):
        def kernel(mat_r, idx_r, out_r):
            mat = mat_r[...]          # [128, 128] values
            acc = jnp.zeros((1, 128), jnp.float32)
            for k in range(N_SEL):
                lo = idx_r[k:k + 1, :]   # [1, 128] per-lane sublane index
                lo = (lo + k) & 127
                if form == "tree":
                    rows = mat
                    width = 128
                    while width > 1:
                        half = width // 2
                        bit = ((lo >> (width.bit_length() - 2)) & 1) > 0
                        rows = jnp.where(bit, rows[half:half + half],
                                         rows[0:half])
                        width = half
                    acc = acc + rows
                elif form == "gather":
                    # tpu.dynamic_gather wants indices shaped like the
                    # input; row 0 of the result is the selected row
                    lob = jnp.broadcast_to(lo, (128, 128))
                    acc = acc + jnp.take_along_axis(mat, lob,
                                                    axis=0)[0:1, :]
                elif form == "onehot":
                    io = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
                    acc = acc + jnp.sum(
                        mat * (io == lo).astype(jnp.float32),
                        axis=0, keepdims=True)
            out_r[...] = acc
        return kernel

    rng = np.random.default_rng(0)
    mat = rng.standard_normal((128, 128), dtype=np.float32)
    idx = rng.integers(0, 128, size=(N_SEL, 128)).astype(np.int32)

    # numpy oracle
    want = np.zeros((1, 128), np.float32)
    for k in range(N_SEL):
        lo = (idx[k] + k) & 127
        want = want + mat[lo, np.arange(128)]

    for form in ("tree", "gather", "onehot"):
        try:
            fn = jax.jit(lambda m, i, form=form: pl.pallas_call(
                make_kernel(form),
                out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(m, i))
            got = np.asarray(fn(mat, idx))
            ok = np.array_equal(got, want)
            # time: 200 calls queued
            fn(mat, idx).block_until_ready()
            t0 = time.perf_counter()
            o = None
            for _ in range(200):
                o = fn(mat, idx)
            o.block_until_ready()
            dt = (time.perf_counter() - t0) / 200 / N_SEL * 1e9
            print(f"{form:7s} exact={ok}  {dt:8.1f} ns/select", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"{form:7s} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
