#!/bin/bash
# Session 4: B=1 model-gap diagnosis + long-context model point + final warm.
cd "$(dirname "$0")/.."
LOG=runs/bench_r5/session4.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
sleep 500   # spacing after session3's last run

note "model diag: compress=True with XLA attend (isolates kernel-launch floor)"
BENCH_ONLY=model BENCH_MODEL_FUSED_IMPL=xla timeout 590 python bench.py \
  > runs/bench_r5/only_model_xla.jsonl 2> runs/bench_r5/only_model_xla.err
note "model_xla rc=$?: $(grep '^{' runs/bench_r5/only_model_xla.jsonl | tail -1 | head -c 300)"
sleep 500

note "model at 16k ctx (long-context E2E point)"
BENCH_ONLY=model BENCH_MODEL_CTX=16384 timeout 590 python bench.py \
  > runs/bench_r5/only_model_16k.jsonl 2> runs/bench_r5/only_model_16k.err
note "model_16k rc=$?: $(grep '^{' runs/bench_r5/only_model_16k.jsonl | tail -1 | head -c 300)"
note "SESSION4 DONE"
