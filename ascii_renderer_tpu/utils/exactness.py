"""On-device exactness canary for the exact-3-split MXU dots.

The headline raster pipeline's bit-exactness rests on two properties the
test suite structurally cannot see (tests/conftest.py forces HIGHEST
matmul precision globally, and the CPU backend never folds):

(a) Mosaic must NOT fold the in-kernel unbarriered f32->bf16->f32 split
    (it runs no excess-precision pass — verified here on the device);
(b) the XLA-level barriered ``mxu.select_dot`` must survive jit at
    DEFAULT matmul precision (the optimization_barrier wrapping).

``run_checks()`` executes both on whatever backend is active and returns
a name->bool dict; ``verdict()`` reduces that to the string recorded in
BENCH_r*.json (VERDICT r3 item 3: the canary must be un-skippable — a
silently folded split would corrupt the headline output while every CPU
test stays green).
"""

from __future__ import annotations

import numpy as np


def run_checks() -> dict[str, bool]:
    """Run the canary checks on the current default backend.

    Keys: pack_blocked, pack_flat, xla_select_dot. Each True iff the
    operation is bit-exact on device."""
    import jax
    import jax.numpy as jnp
    from ascii_renderer_tpu.ops import mxu
    from ascii_renderer_tpu.ops import pack as P

    rng = np.random.default_rng(0)
    cm = jnp.asarray(rng.normal(size=(40, 69632)).astype(np.float32))
    want = np.asarray(cm).T
    interpret = jax.default_backend() != "tpu"

    b = P.pack_channels_split_blocked(
        cm.reshape(40, 544, 128), [(0, 16), (16, 40)], interpret=interpret)
    pack_blocked = (np.array_equal(np.asarray(b[0]), want[:, :16])
                    and np.array_equal(np.asarray(b[1]), want[:, 16:40]))

    a = P.pack_channels_split(cm, [(0, 16), (16, 40)], interpret=interpret)
    pack_flat = np.array_equal(np.asarray(a[0]), want[:, :16])

    x = jnp.asarray(rng.normal(size=(512, 24)).astype(np.float32))
    got = jax.jit(lambda v: mxu.select_dot(
        v, jnp.eye(24, dtype=jnp.float32), (((1,), (1,)), ((), ())),
        sel_on_left=True))(x)
    xla_select_dot = np.array_equal(np.asarray(got), np.asarray(x).T)

    return {"pack_blocked": pack_blocked, "pack_flat": pack_flat,
            "xla_select_dot": xla_select_dot}


def verdict(checks: dict[str, bool]) -> str:
    """'ok' iff every check passed, else 'FAIL:<names>'."""
    bad = sorted(k for k, v in checks.items() if not v)
    return "ok" if not bad else "FAIL:" + ",".join(bad)
