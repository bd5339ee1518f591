#!/bin/bash
# One-shot TPU measurement session: run every hardware-gated number in order
# the moment the relay is reachable. Each step appends to /tmp/tpu_session.log.
# Usage: bash examples/tpu_session.sh [quick]
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_session.log
echo "=== tpu session $(date -u +%FT%TZ) ===" | tee -a $LOG

run() {
  echo "--- $* ---" | tee -a $LOG
  timeout 1800 "$@" 2>&1 | tee -a $LOG
}

# 0. liveness (fail fast if the relay is down)
timeout 300 python -c "import jax; print(jax.devices())" 2>&1 | tee -a $LOG || {
  echo "relay unreachable; aborting" | tee -a $LOG; exit 1; }

# 1. headline inference bench (writes the BENCH json line)
run python bench.py

# 2. per-stage forward profile (docs/performance.md lane-fill decomposition)
run python examples/profile_forward.py

# 3. train-step bench (batch sweep happens inside)
run python bench_train.py

if [ "${1:-}" != "quick" ]; then
  # 4. dispatch-mode comparison alone (per-step vs chunked x f32 vs uint8,
  #    incl. transfer+fetch — the quantity chunking/uint8 change)
  run env BENCH_DISPATCH=only python bench_train.py
  # 5. train-step slice profile (fwd / +loss / +dgrad / +bwd / +remat ladder)
  run python examples/profile_train_step.py
  # 5b. the same ladder at the headline batch (loss/optimizer share at 128)
  run env BENCH_BATCH=128 python examples/profile_train_step.py
  # 5c. remat throughput check at the headline batch (memory-vs-speed trade)
  run env BENCH_REMAT=1 BENCH_BATCHES=128 python bench_train.py
  # 6. predictor on real sources
  run python examples/bench_predictor.py
  # 7. PJRT C++ client box parity on the TPU
  run python -m pytest tests/test_pjrt_client.py --slow -q -p no:cacheprovider
  # 8. (round 5) train ladder at s/m widths — the lane-fill model on training
  run env BENCH_SCALE=s BENCH_BATCHES=64,128 python bench_train.py
  run env BENCH_SCALE=m BENCH_BATCHES=32,64 python bench_train.py
  # 9. (round 5) wgrad-contraction lever: native vs im2col formulations
  run python examples/bench_wgrad.py
  # 10. (round 5) int8 MXU probe on 1x1-conv matmul shapes (Pallas vs XLA)
  run python examples/bench_int8_matmul.py
  # 11. (round 5) rect-val canvas ladder + validator pipeline win
  run python examples/bench_rect.py
  run python examples/bench_val_pipeline.py
fi
echo "=== done $(date -u +%FT%TZ) ===" | tee -a $LOG
