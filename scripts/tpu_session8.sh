#!/bin/bash
cd "$(dirname "$0")/.."
LOG=runs/bench_r5/session8.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
sleep 420
note "final warm full bench (full_5) — last device touch of round 5"
timeout 590 python bench.py > runs/bench_r5/full_5.jsonl 2> runs/bench_r5/full_5.err
note "full5 rc=$?: $(grep '^{' runs/bench_r5/full_5.jsonl | tail -1 | head -c 500)"
note "SESSION8 DONE"
