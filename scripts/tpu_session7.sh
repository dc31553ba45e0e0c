#!/bin/bash
cd "$(dirname "$0")/.."
LOG=runs/bench_r5/session7.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
sleep 360

note "model_7b no-append ablation (isolate append/flush cost)"
BENCH_ONLY=model_7b BENCH_MODEL_NO_APPEND=1 timeout 590 python bench.py \
  > runs/bench_r5/only_model7b_noapp.jsonl 2> runs/bench_r5/only_model7b_noapp.err
note "noapp rc=$?: $(grep '^{' runs/bench_r5/only_model7b_noapp.jsonl | tail -1 | head -c 400)"
sleep 500

note "final full bench (full_4, with model_7b stage)"
timeout 590 python bench.py > runs/bench_r5/full_4.jsonl 2> runs/bench_r5/full_4.err
note "full4 rc=$?: $(grep '^{' runs/bench_r5/full_4.jsonl | tail -1 | head -c 500)"
note "SESSION7 DONE"
