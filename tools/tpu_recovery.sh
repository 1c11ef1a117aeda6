#!/bin/bash
# Round-4/5 TPU recovery runbook: run this ONCE when the axon tunnel
# comes back after an outage (probe first:
#   timeout 90 python -c "import jax; jax.devices()").
#
# Order matters — the compile service degrades with use, so the
# MANDATORY warms come first and the opportunistic A/Bs last:
#   1. shared span nb=512  (HLO changed by the round-4 precision pins)
#   2. sustained span nb=512 (HLO changed by the round-4 precision pins)
#   3. hetero span nb=1024 (HLO unchanged — should be a warm cache fetch)
#   4. hetero scan-mix superchunk A/B (pending round-4 decision; flip
#      build_span_tables' default ONLY on a measured win, then re-warm
#      rung 3 with the new default)
# Each step is a guarded bench.py child (bench's own retry/outage logic
# applies inside). Results append to tools/tpu_recovery.log.
set -u
cd "$(dirname "$0")/.."
LOG=tools/tpu_recovery.log
stamp() { date -u +%H:%M:%S; }
run() {
  local label="$1"; shift
  echo "=== $(stamp) $label: $*" >> "$LOG"
  timeout 700 "$@" >> "$LOG" 2>&1
  echo "--- $(stamp) rc=$?" >> "$LOG"
}
echo "==== $(stamp) recovery run start ====" >> "$LOG"
run "warm+measure shared (precision-pinned HLO)" \
    python bench.py --span --skip-single
run "warm+measure sustained (precision-pinned HLO)" \
    python bench.py --span --sustained --nblocks=512 --skip-single
run "warm+measure hetero nb=1024 (unchanged HLO)" \
    python bench.py --span --hetero --nblocks=1024 --skip-single
run "A/B hetero scan-mix superchunk" \
    python bench.py --span --hetero --nblocks=1024 --skip-single \
    --hetero-superchunk
echo "==== $(stamp) recovery run done ====" >> "$LOG"
