#!/usr/bin/env python
"""On-device exactness canary for the exact-3-split MXU dots.

Run on the real TPU whenever ops/mxu or ops/pack change: verifies
(a) Mosaic does NOT fold the in-kernel unbarriered split (it runs no
excess-precision pass), and (b) the XLA-level barriered select_dot
survives jit at DEFAULT matmul precision (the test suite cannot see
this: conftest forces highest precision globally and the CPU
backend does not fold). All three lines must print True.
"""
import os
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from ascii_renderer_tpu.ops import pack as P, mxu
print("devices:", jax.devices())
rng = np.random.default_rng(0)
cm = jnp.asarray(rng.normal(size=(40, 69632)).astype(np.float32))
# blocked pack on real TPU (Mosaic), exact3 split WITHOUT barriers in-kernel
b = P.pack_channels_split_blocked(cm.reshape(40, 544, 128), [(0, 16), (16, 40)],
                                  interpret=False)
want = np.asarray(cm).T
print("pack blocked on TPU exact:", np.array_equal(np.asarray(b[0]), want[:, :16])
      and np.array_equal(np.asarray(b[1]), want[:, 16:40]))
# flat split pack too
a = P.pack_channels_split(cm, [(0, 16), (16, 40)], interpret=False)
print("pack flat on TPU exact:", np.array_equal(np.asarray(a[0]), want[:, :16]))
# jnp-level select_dot (XLA pipeline, barriered) on TPU at default precision
x = jnp.asarray(rng.normal(size=(512, 24)).astype(np.float32))
gT = mxu.select_dot(x, jnp.eye(24, dtype=jnp.float32),
                    (((1,), (1,)), ((), ())), sel_on_left=True)
print("xla select_dot exact:", np.array_equal(np.asarray(jax.jit(
    lambda v: mxu.select_dot(v, jnp.eye(24, dtype=jnp.float32),
                             (((1,), (1,)), ((), ())), sel_on_left=True))(x)),
    np.asarray(x).T))
