#!/usr/bin/env python
"""Gather shape scaling on TPU: same total bytes, varying row width.
Ratios guide the rows-build layout (standalone numbers are optimistic
but relative shape costs hold; verify winners in context)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time(fn, args, warmup=3, iters=256):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    # ~90k x 32 f32 = 11.5 MB gathered, source ~70k rows
    total = 90112 * 32
    src_rows = 69632
    for w in (32, 64, 128, 256):
        n = total // w
        sr = src_rows * 32 // w
        src = jnp.asarray(rng.random((sr, min(w, 128) if w <= 128 else 128),
                                     np.float32))
        if w <= 128:
            src = jnp.asarray(rng.random((sr, w), np.float32))
            idx = jnp.asarray(rng.integers(0, sr, n, dtype=np.int32))
            f = jax.jit(lambda s, i: s[i])
            dt = _time(f, (src, idx))
            print(f"gather [{n:6d}, {w:3d}] : {dt*1e3:7.3f} ms")
        else:
            src = jnp.asarray(rng.random((sr, 2, 128), np.float32))
            idx = jnp.asarray(rng.integers(0, sr, n, dtype=np.int32))
            f = jax.jit(lambda s, i: s[i])
            dt = _time(f, (src, idx))
            print(f"gather [{n:6d}, 2, 128] : {dt*1e3:7.3f} ms")

    # narrow index gather (composition candidate)
    idx_src = jnp.asarray(rng.integers(0, src_rows, 278528, dtype=np.int32))
    idx_q = jnp.asarray(rng.integers(0, 278528, 90112, dtype=np.int32))
    f = jax.jit(lambda s, i: s[i])
    dt = _time(f, (idx_src, idx_q))
    print(f"gather [ 90112] narrow i32 : {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
