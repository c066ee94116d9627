#!/usr/bin/env python
"""On-device exactness canary for the exact-3-split MXU dots.

Run on the real TPU whenever ops/mxu or ops/pack change. The checks live
in ascii_renderer_tpu/utils/exactness.py and are ALSO run automatically
by bench.py before it records the headline (a FAIL zeroes the headline
record), so BENCH_r*.json can't report a number produced by a wrong
program. This script remains the standalone/diagnostic entry point.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from ascii_renderer_tpu.utils.exactness import run_checks, verdict

print("devices:", jax.devices())
checks = run_checks()
for name, ok in checks.items():
    print(f"{name}: {ok}")
v = verdict(checks)
print("verdict:", v)
sys.exit(0 if v == "ok" else 1)
