#!/bin/bash
# Unattended TPU measurement agenda for round 3. Run whenever the axon
# tunnel is reachable; every step tees its output under /tmp/tpu_r3/ so a
# short tunnel window still yields durable measurements.
#
#   bash tools/tpu_agenda.sh probe   # fast reachability check (exit 0 = up)
#   bash tools/tpu_agenda.sh run     # full agenda (slope A/Bs, bench, PT)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r3
mkdir -p "$OUT"

probe() {
  # import jax under the axon platform with a hard kill: when the relay is
  # down the import itself hangs forever (memory: sitecustomize re-routes)
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
  echo "=== 1/4 slope A/B: base vs shade-table widths vs chunk sizes ==="
  # Ordered by landing value: the ESSENTIAL run alone picks the winner.
  # A short tunnel window should still produce ab_essential + bench.
  echo "=== 1/5 slope A/B (ESSENTIAL): landing candidates ==="
  timeout 2000 python tools/ab_slope.py \
    base t24 s5t24 s6t24 split24 s6split24 s6t24c16 \
    2>&1 | tee "$OUT/ab_essential.txt"
  echo "=== 2/5 full bench (all configs incl. PT Mrays/s fields) ==="
  timeout 3600 python bench.py 2>&1 | tee "$OUT/bench_full.txt"
  echo "=== 3/5 slope A/B (BROAD): single-knob grid for attribution ==="
  timeout 2400 python tools/ab_slope.py \
    base t32 chunk16 chunk64 s5 s6 split s5split s6split s6t24c64 \
    2>&1 | tee "$OUT/ab_broad.txt"
  echo "=== 4/5 stage profile of the headline prefix ==="
  timeout 1200 python tools/profile_prefix.py 2>&1 | tee "$OUT/profile.txt"
  echo "=== 5/5 PT megakernel stage/variant profile ==="
  timeout 2400 python tools/profile_pt.py 2>&1 | tee "$OUT/profile_pt.txt"
  echo "agenda done; outputs in $OUT"
}

case "${1:-run}" in
  probe) probe ;;
  run) run ;;
  *) echo "usage: $0 probe|run"; exit 2 ;;
esac
