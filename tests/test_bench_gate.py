"""Drift-gated slope timing (bench.py::_time_fn_slope) — unit tests with
a synthetic drifting timer and scripted canary arms (no device, no real
clock). This is the measurement layer VERDICT r4 items 1+6 demanded:
canary-rejected reps are re-sampled, and impossible fits (negative RTT,
excess spread) are flagged low_confidence instead of recorded silently.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import bench  # noqa: E402

N1, N2 = 4, 16


class ScriptClock:
    """perf_counter stand-in scripted per rep: each rep is two queue
    depths (N1, N2), 2 clock reads per depth, with total time
    per_call * n + rtt — exactly the quantities the slope fit solves
    for, so tests control the fitted slope and intercept directly."""

    def __init__(self, rep_params):
        self.seq = []
        t = 0.0
        for per_call, rtt in rep_params:
            for n in (N1, N2):
                self.seq.append(t)
                t += per_call * n + rtt
                self.seq.append(t)
                t += 0.01  # idle gap between depths
        self.i = 0

    def __call__(self):
        v = self.seq[self.i]
        self.i += 1
        return v


def make_canary(values):
    it = iter(values)
    return lambda: next(it)


def run(rep_params, canary_vals=None, **kw):
    kw["clock"] = ScriptClock(rep_params)
    kw.setdefault("reps", 3)
    kw.setdefault("max_extra", 4)
    if canary_vals is not None:
        kw["gate"] = True
        kw["canary"] = make_canary(canary_vals)
    else:
        kw.setdefault("gate", False)
    return bench._time_fn_slope(lambda: 0, (), n1=N1, n2=N2, **kw)


def test_clean_reps_pass_ungated():
    dt, rtt, spread, meta = run([(1.0, 5.0)] * 3)
    assert abs(dt - 1.0) < 1e-9 and abs(rtt - 5.0) < 1e-9
    assert spread < 1e-9
    assert not meta.get("low_confidence")
    assert meta["samples_total"] == meta["samples_used"] == 3


def test_drifted_rep_rejected_and_resampled():
    """Rep 2 runs 1.5x slow AND its canary arms read 1.3x the session
    median -> the gate rejects it, re-samples one clean rep, and the
    record is the clean 1.0 slope with no low_confidence flag."""
    reps = [(1.0, 5.0), (1.0, 5.0), (1.5, 5.0), (1.0, 5.0), (1.0, 5.0)]
    # two arms per rep, bracketing: rep 2's arms drift to 1.3
    arms = [1.0, 1.0, 1.0, 1.0, 1.3, 1.3, 1.0, 1.0, 1.0, 1.0]
    dt, rtt, spread, meta = run(reps, canary_vals=arms)
    assert abs(dt - 1.0) < 1e-9
    assert spread < 1e-9
    assert not meta.get("low_confidence")
    assert meta["samples_total"] == 4  # one extra rep was taken
    assert meta["samples_used"] == 3
    assert meta["canary_dev"] <= bench.CANARY_TOL


def test_single_stalled_arm_does_not_reject():
    """A transient tunnel stall inflates ONE canary arm (stalls only add
    time); the rep's reading is the min of its bracket pair, so a clean
    rep between a clean arm and a stalled arm stays accepted."""
    reps = [(1.0, 5.0)] * 3
    arms = [1.0, 1.0, 1.0, 5.0, 1.0, 1.0]  # rep 1's trailing arm stalled
    dt, rtt, spread, meta = run(reps, canary_vals=arms)
    assert abs(dt - 1.0) < 1e-9
    assert not meta.get("low_confidence")
    assert meta["samples_total"] == meta["samples_used"] == 3


def test_persistent_drift_flags_low_confidence():
    """When the canary never settles (every extra rep also drifts), the
    record must say so rather than pretend: low_confidence with the
    only-k-of-n-reps reason."""
    n = 3 + 4  # reps + max_extra
    reps = [(1.0, 5.0)] * n
    # a monotone ramp: every rep's arms sit >10% from the session median,
    # so no majority of mutually-consistent samples ever forms (a steady
    # 1.5x state WOULD be accepted — consistency, not absolute speed, is
    # what the gate checks)
    levels = [0.6, 0.8, 1.0, 1.3, 1.7, 2.2, 2.9]
    arms = [v for lv in levels for v in (lv, lv)]
    dt, rtt, spread, meta = run(reps, canary_vals=arms)
    assert meta.get("low_confidence")
    assert any("canary gate" in r or "drift" in r
               for r in meta["lc_reasons"])


def test_negative_fitted_rtt_flagged():
    """The BENCH_r04 config-1 class: rtt_ms=-13.58 is an impossible
    intercept — the fit is noise and must be marked (VERDICT r4 item 6)."""
    dt, rtt, spread, meta = run([(1.0, -2.0)] * 3)
    assert rtt < 0
    assert meta.get("low_confidence")
    assert any("negative fitted RTT" in r for r in meta["lc_reasons"])


def test_impossible_spread_flagged():
    """Slopes of 1.0/1.0/2.0 with no resampling budget: spread 1.0 is
    beyond SPREAD_IMPOSSIBLE and must be flagged."""
    dt, rtt, spread, meta = run([(1.0, 5.0), (1.0, 5.0), (2.0, 5.0)],
                                max_extra=0)
    assert spread > bench.SPREAD_IMPOSSIBLE
    assert meta.get("low_confidence")
    assert any("spread" in r for r in meta["lc_reasons"])


def test_spread_target_triggers_resample_ungated():
    """Even without the canary gate, a loose first window re-samples
    until the tightest reps-window meets SPREAD_TARGET."""
    reps = [(1.0, 5.0), (1.2, 5.0), (1.0, 5.0), (1.0, 5.0)]
    dt, rtt, spread, meta = run(reps)
    assert abs(dt - 1.0) < 1e-9
    assert spread <= bench.SPREAD_TARGET
    assert meta["samples_total"] == 4 and meta["samples_used"] == 3
    assert not meta.get("low_confidence")
