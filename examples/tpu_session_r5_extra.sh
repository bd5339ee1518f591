#!/bin/bash
# Round-5 addendum to tpu_session.sh: the remat-policy and width/memory
# legs the round-4 verdict asked for explicitly (VERDICT r4 next #1), plus
# retries of the steps the main session lost to relay flakiness/timeouts.
# All python runs are unbuffered (-u) so a timeout kill can't eat the
# partial output (the main session lost bench_rect's entire 30 min that way).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_session_r5.log
echo "=== r5 extra $(date -u +%FT%TZ) ===" | tee -a $LOG

run() {
  echo "--- $* ---" | tee -a $LOG
  timeout "${STEP_TIMEOUT:-2700}" "$@" 2>&1 | tee -a $LOG
}

# remat policies at the headline batch: 'seg' (save only layer boundaries)
# and the full-remat re-measurement alongside it
run env BENCH_REMAT=seg BENCH_BATCHES=128 python -u bench_train.py
run env BENCH_REMAT=full BENCH_BATCHES=128 python -u bench_train.py
# 'light' (save everything except boundaries): the default.yaml comment
# claims it INFLATES memory (OOM at batch 32) — verify that claim
run env BENCH_REMAT=light BENCH_BATCHES=32 python -u bench_train.py
run env BENCH_REMAT=seg BENCH_BATCHES=32 python -u bench_train.py
# m-width memory ladder: where does m@640 OOM per remat mode on a 16G v5e?
run env BENCH_SCALE=m BENCH_BATCHES=128 python -u bench_train.py
run env BENCH_SCALE=m BENCH_REMAT=full BENCH_BATCHES=128 python -u bench_train.py
# s-width remat check (does the batch-32 remat win persist at s?)
run env BENCH_SCALE=s BENCH_REMAT=full BENCH_BATCHES=64 python -u bench_train.py
# rect-val canvas ladder (main session: 3 batch-128 graph+NMS compiles blew
# the 1800s budget; give it the full window)
run python -u examples/bench_rect.py
# train-step slice ladder at the headline batch (relay crashed this leg)
run env BENCH_BATCH=128 python -u examples/profile_train_step.py
echo "=== done $(date -u +%FT%TZ) ===" | tee -a $LOG
