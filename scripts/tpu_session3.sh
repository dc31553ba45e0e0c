#!/bin/bash
# Session 3 (after session 2): kbench round 2 (cb64/hb8 outlier forms),
# warm the new int2_gear_o128 bench stage, paged pb=32 probe, final bench.
cd "$(dirname "$0")/.."
LOG=runs/bench_r5/session3.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

for i in $(seq 1 240); do
  grep -q "SESSION2 DONE" runs/bench_r5/session2.log 2>/dev/null && break
  sleep 30
done
note "session2 done; kbench round 2"
sleep 120

timeout 2300 python scripts/kbench.py base gear64@4 gear64:o128@4 gear32:o128@8 gearl64@4 \
  --heads 32 --watchdog 2250 > runs/bench_r5/kbench2_h32.log 2>&1
note "kbench2 rc=$?: $(grep us/step runs/bench_r5/kbench2_h32.log | tr '\n' ' | ')"
sleep 500

note "warm int2_gear_o128 stage"
BENCH_ONLY=int2_gear_o128 timeout 590 python bench.py > runs/bench_r5/only_o128.jsonl 2> runs/bench_r5/only_o128.err
note "o128 rc=$?: $(grep '^{' runs/bench_r5/only_o128.jsonl | tail -1 | head -c 300)"
sleep 500

note "paged pb=32 probe"
BENCH_ONLY=paged BENCH_PAGED_PB=32 timeout 590 python bench.py > runs/bench_r5/only_paged32.jsonl 2> runs/bench_r5/only_paged32.err
note "paged32 rc=$?: $(grep '^{' runs/bench_r5/only_paged32.jsonl | tail -1 | head -c 300)"
sleep 500

note "final full bench (with o128 stage)"
timeout 590 python bench.py > runs/bench_r5/full_3.jsonl 2> runs/bench_r5/full_3.err
note "full3 rc=$?: $(grep '^{' runs/bench_r5/full_3.jsonl | tail -1 | head -c 400)"
note "SESSION3 DONE"
