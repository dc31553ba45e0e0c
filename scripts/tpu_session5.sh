#!/bin/bash
cd "$(dirname "$0")/.."
LOG=runs/bench_r5/session5.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
sleep 420

note "bisect 16k lowering failure"
timeout 560 python scripts/bisect_16k.py > runs/bench_r5/bisect_16k.log 2>&1
note "bisect rc=$?: $(grep -E 'OK|FAILED' runs/bench_r5/bisect_16k.log | tr '\n' ' ')"
sleep 500

note "model diag retry: compress=True with XLA attend"
BENCH_ONLY=model BENCH_MODEL_FUSED_IMPL=xla timeout 590 python bench.py \
  > runs/bench_r5/only_model_xla2.jsonl 2> runs/bench_r5/only_model_xla2.err
note "model_xla rc=$?: $(grep '^{' runs/bench_r5/only_model_xla2.jsonl | tail -1 | head -c 300)"
note "SESSION5 DONE"
