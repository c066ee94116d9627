#!/bin/bash
# Unattended TPU measurement agenda (round 5). Run whenever the axon
# tunnel is reachable; every step tees its output under /tmp/tpu_r4/ so a
# short tunnel window still yields durable measurements.
#
#   bash tools/tpu_agenda.sh probe   # fast reachability check (exit 0 = up)
#   bash tools/tpu_agenda.sh run     # full agenda (profiles, bench, A/Bs)
#
# Measurement doctrine (learned in round 3):
# - tools/profile_trace.py is the budget of record: jax.profiler carries
#   full per-HLO device timings through the tunnel. Sanity-check an
#   unchanged op (e.g. the key sort ~136 us at headline scale) against
#   its prior reading — a contended tunnel inflates every op uniformly.
# - ab_slope is for END-TO-END deltas and on-device bit-identity checks
#   (it prints output ==/!=); its per-rep noise is +-0.3 ms, so only
#   trust effects that survive per-rep pairing across >=5 reps.
# - NEVER run two TPU jobs at once (A/Bs go to garbage).
# - tools/hlo_cycles.py (static cycle model) is DEPRECATED for decisions
#   — it mispriced the fused setup kernel 30x and the glyph select 16x.
# - Naive single-readback timings carry the FULL ~30 ms RTT per rep;
#   shallow slopes (reps=2, depths 2/8) can read 4x. Use depths >=(4,16),
#   >=3 reps, record spread (see PARITY 'Measurement gotchas').
# - The tunnel device drifts ~±10% across minutes: cross-process numbers
#   are not comparable; only same-process interleaved arms are evidence.
# - 1-D gathers/scatters at 100k+ elements are element-rate kCustom ops;
#   permutations must be lax.sort on a unique composite key (PARITY
#   'Optimization doctrine').
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5
mkdir -p "$OUT"

probe() {
  # import jax under the axon platform with a hard kill: when the relay is
  # down the import itself hangs forever
  timeout 75 python -c "import jax; print(jax.devices())" \
    > "$OUT/probe.txt" 2>&1
  rc=$?
  if [ $rc -eq 0 ] && grep -qi "tpu\|axon" "$OUT/probe.txt"; then
    echo "TPU UP: $(cat "$OUT/probe.txt")"
    return 0
  fi
  echo "TPU DOWN (rc=$rc): $(tail -1 "$OUT/probe.txt" 2>/dev/null)"
  return 1
}

run() {
  probe || return 1
  echo "=== 1/5 headline per-HLO profile (budget of record) ==="
  timeout 1200 python tools/profile_trace.py --top 25 \
    2>&1 | tee "$OUT/profile_headline.txt"
  echo "=== 2/5 PT per-HLO profile ==="
  timeout 1200 python tools/profile_trace.py --pt --iters 12 --top 12 \
    2>&1 | tee "$OUT/profile_pt.txt"
  echo "=== 3/5 exactness canary (run after any ops/mxu or ops/pack change) ==="
  timeout 600 python tools/check_exact_tpu.py 2>&1 | tee "$OUT/exact.txt"
  echo "=== 4/5 full bench (all configs) ==="
  timeout 3600 python bench.py 2>&1 | tee "$OUT/bench_full.txt"
  echo "=== 5/6 end-to-end identity + slope of the landed defaults ==="
  timeout 1500 python tools/ab_slope.py s8 s8mxuhi s8packhi --reps 5 \
    2>&1 | tee "$OUT/ab_identity.txt"
  echo "=== 6/6 adaptive-PT throughput win (r4 feature; expect ~2x) ==="
  timeout 1200 python tools/exp_pt_adaptive.py --rows 540 --cols 960 \
    --spp 8 --cap 32 --tol 0.12 --reps 2 2>&1 | tee "$OUT/adaptive.txt"
  echo "agenda done; outputs in $OUT"
}

case "${1:-run}" in
  probe) probe ;;
  run) run ;;
  *) echo "usage: $0 probe|run"; exit 2 ;;
esac
