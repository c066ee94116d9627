"""Exact f32 MXU dots against 0/1 matrices, without HIGHEST precision.

Most matmuls in this framework are not numerical contractions at all:
they multiply real data against an exactly-bf16 0/1 matrix (identity
transposes, channel-selection expands, triangular counting masks).
Precision.HIGHEST makes them exact but costs a 6-pass bf16 emulation;
these helpers get the same bits in 1 or 3 passes:

- count_dot: BOTH operands exactly bf16 (0/1 masks, small ints). A
  single DEFAULT-precision pass is exact: every product and partial sum
  is an integer accumulated in f32.
- select_dot: one operand exactly bf16, the other arbitrary f32. Split
  the f32 side into hi/mid/lo bf16 parts (3 x 8 = 24 mantissa bits) and
  run three DEFAULT passes: each part is exact, products against 0/1
  are exact, and hi + (mid + lo) == x holds exactly by construction.
  Caveat (same as ops/pack): split residues below bf16's subnormal
  floor (2^-133) are lost, so inputs with |x| < ~1e-33 can drop their
  last mantissa bits — beyond any meaningful channel resolution, and
  every kernel generation shares these helpers, so cross-generation
  bit-equivalence is unaffected.

EXACT3 = False restores Precision.HIGHEST everywhere (perf A/B knob,
tools/ab_slope "s8mxuhi"); measured on the headline frame the walk
kernel alone drops 220 -> ~130 us (tools/profile_trace.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EXACT3 = True


def _split3(x: jnp.ndarray, in_kernel: bool = False):
    # Outside Pallas, each bf16 part is wrapped in an
    # optimization_barrier: XLA's excess-precision simplification folds
    # the f32->bf16->f32 round-trip to identity, which rewrites
    # r1 = x - f32(bf16(x)) to zero and silently degrades the split to
    # plain bf16 (invisible under the test suite's global
    # highest-precision config; canary test in test_pallas_kernels).
    # Inside Pallas kernels (in_kernel=True) optimization_barrier is
    # not lowerable; Mosaic does not run XLA's excess-precision pass —
    # verified on the real device by tools/check_exact_tpu.py (run it
    # whenever ops/mxu or ops/pack change).
    bar = (lambda v: v) if in_kernel else jax.lax.optimization_barrier
    hi = bar(x.astype(jnp.bfloat16))
    r1 = x - hi.astype(jnp.float32)
    mid = bar(r1.astype(jnp.bfloat16))
    lo = bar((r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16))
    return hi, mid, lo


def count_dot(a01: jnp.ndarray, b01: jnp.ndarray, dn) -> jnp.ndarray:
    """dot_general of two exactly-bf16 operands (0/1 masks / small
    ints), f32 accumulation — exact in ONE default-precision pass."""
    if not EXACT3:
        return jax.lax.dot_general(
            a01, b01, dn, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        a01.astype(jnp.bfloat16), b01.astype(jnp.bfloat16), dn,
        preferred_element_type=jnp.float32)


def select_dot(x: jnp.ndarray, sel01: jnp.ndarray, dn,
               sel_on_left: bool = False,
               in_kernel: bool = False) -> jnp.ndarray:
    """dot_general(x, sel01, dn) (or dot_general(sel01, x, dn) with
    sel_on_left) where sel01 is exactly bf16: three default passes over
    the 3-way bf16 split of x, summed as hi + (mid + lo). Pass
    in_kernel=True from inside a Pallas kernel body (see _split3)."""
    if not EXACT3:
        a, b = (sel01, x) if sel_on_left else (x, sel01)
        return jax.lax.dot_general(
            a, b, dn, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    sel_bf = sel01.astype(jnp.bfloat16)

    def one(part):
        a, b = (sel_bf, part) if sel_on_left else (part, sel_bf)
        return jax.lax.dot_general(a, b, dn,
                                   preferred_element_type=jnp.float32)

    hi, mid, lo = _split3(x, in_kernel=in_kernel)
    return one(hi) + (one(mid) + one(lo))
