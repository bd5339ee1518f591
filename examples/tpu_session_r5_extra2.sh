#!/bin/bash
# Round-5 follow-ups driven by the first extra session's results:
#  - m@640 batch 128 missed fitting by 90 MB under remat:full; the wired
#    assigner_bf16 flag halves the ~275 MB f32 assigner tensors — does it fit?
#  - bench_wgrad rerun with the fixed scan-diff iteration counts (the first
#    run's native-side numbers were relay-noise-dominated)
#  - the uint8 dispatch-mode legs the main session's timeout ate
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_session_r5.log
echo "=== r5 extra2 $(date -u +%FT%TZ) ===" | tee -a $LOG

run() {
  echo "--- $* ---" | tee -a $LOG
  timeout "${STEP_TIMEOUT:-2700}" "$@" 2>&1 | tee -a $LOG
}

run env BENCH_SCALE=m BENCH_REMAT=full BENCH_ASSIGNER_BF16=1 BENCH_BATCHES=128 python -u bench_train.py
# profile@128 showed the LOSS adds 38.8 ms at the headline batch (vs +8.9
# at 32) — the f32 assigner tensors are the scaling term; does bf16 pay?
run env BENCH_ASSIGNER_BF16=1 BENCH_BATCHES=128 python -u bench_train.py
run python -u examples/bench_wgrad.py
run env BENCH_DISPATCH=only python -u bench_train.py
echo "=== done $(date -u +%FT%TZ) ===" | tee -a $LOG
