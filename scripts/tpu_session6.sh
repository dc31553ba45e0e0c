#!/bin/bash
cd "$(dirname "$0")/.."
LOG=runs/bench_r5/session6.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
sleep 300

note "warm model_7b"
BENCH_ONLY=model_7b timeout 590 python bench.py \
  > runs/bench_r5/only_model7b.jsonl 2> runs/bench_r5/only_model7b.err
note "model7b rc=$?: $(grep '^{' runs/bench_r5/only_model7b.jsonl | tail -1 | head -c 400)"
sleep 500

note "model 16k retry (pack tile fix)"
BENCH_ONLY=model BENCH_MODEL_CTX=16384 timeout 590 python bench.py \
  > runs/bench_r5/only_model_16k2.jsonl 2> runs/bench_r5/only_model_16k2.err
note "model16k rc=$?: $(grep '^{' runs/bench_r5/only_model_16k2.jsonl | tail -1 | head -c 300)"
note "SESSION6 DONE"
