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
run() {  # run <budget_s> <label> <cmd...>
  local budget="$1" label="$2"; shift 2
  echo "=== $(stamp) $label: $*" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  echo "--- $(stamp) rc=$?" >> "$LOG"
}
echo "==== $(stamp) recovery run start ====" >> "$LOG"
run 700 "warm+measure shared (precision-pinned HLO)" \
    python bench.py --span --skip-single
run 700 "warm+measure sustained (precision-pinned HLO)" \
    python bench.py --span --sustained --nblocks=512 --skip-single
run 700 "warm+measure hetero nb=1024 (unchanged HLO)" \
    python bench.py --span --hetero --nblocks=1024 --skip-single
run 700 "A/B hetero scan-mix superchunk" \
    python bench.py --span --hetero --nblocks=1024 --skip-single \
    --hetero-superchunk
# 5. device parity at the library-default HIGHEST precision: first
#    end-to-end validation of the precision pins on the real MXU; also
#    warms the bench ladder's nb=64 fallback executables.
run 1200 "device parity (HIGHEST)" python tools/tpu_parity.py
# 6-7 (opt-in, RUN_HIGH=1): the PRECISION=high experiment. Decision rule
#    for flipping the library default (ops/integrator.PRECISION):
#    (a) compile service healthy (steps 1-5 fast), (b) parity at HIGH
#    <= -70 dB on ALL rungs, (c) shared RTF win >= 5%. All-new HLOs:
#    only run while plenty of round time remains.
if [ "${RUN_HIGH:-0}" = "1" ]; then
  run 1200 "device parity (HIGH)" env OPENPBSO_MATMUL_PRECISION=high \
      python tools/tpu_parity.py
  run 700 "shared RTF at HIGH" env OPENPBSO_MATMUL_PRECISION=high \
      python bench.py --span --skip-single
  run 700 "sustained RTF at HIGH" env OPENPBSO_MATMUL_PRECISION=high \
      python bench.py --span --sustained --nblocks=512 --skip-single
fi
echo "==== $(stamp) recovery run done ====" >> "$LOG"
