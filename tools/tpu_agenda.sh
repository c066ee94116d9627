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
  timeout 2400 python tools/ab_slope.py \
    base t24 t32 chunk16 chunk64 t24c16 t32c16 \
    2>&1 | tee "$OUT/ab_base.txt"
  echo "=== 2/4 slope A/B: K2/K4 walks (s5/s6) + their knob combos ==="
  timeout 2400 python tools/ab_slope.py \
    base s5 s5t24 s5c16 s5c64 s6 s6t24 s6c16 s6c64 \
    2>&1 | tee "$OUT/ab_k.txt"
  echo "=== 2b/4 slope A/B: combined landing candidates ==="
  timeout 2400 python tools/ab_slope.py \
    base s5t32 s6t32 s5t24c16 s6t24c16 s6t24c64 t24 s6t24 \
    2>&1 | tee "$OUT/ab_combo.txt"
  echo "=== 2c/4 slope A/B: contiguous split-pack candidates ==="
  timeout 2400 python tools/ab_slope.py \
    base split split24 s5split s6split s6split24 \
    2>&1 | tee "$OUT/ab_split.txt"
  echo "=== 3/4 full bench (all configs incl. PT Mrays/s fields) ==="
  timeout 3600 python bench.py 2>&1 | tee "$OUT/bench_full.txt"
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
