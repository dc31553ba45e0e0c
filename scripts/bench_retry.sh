#!/bin/bash
# Spaced bench.py retry loop (CLAUDE.md wedge protocol: >=9 min between
# attempts; bench's internal probe gates cheaply). Run DETACHED via setsid.
cd "$(dirname "$0")/.."
mkdir -p runs/bench_r5
for i in 1 2 3 4 5 6 7 8; do
  echo "=== attempt $i $(date) ===" >> runs/bench_r5/loop.log
  timeout 590 python bench.py > runs/bench_r5/try_$i.jsonl 2> runs/bench_r5/try_$i.err
  last=$(grep '^{' runs/bench_r5/try_$i.jsonl | tail -1)
  echo "$last" >> runs/bench_r5/loop.log
  if echo "$last" | python -c "import json,sys
d=json.loads(sys.stdin.read() or '{}')
sys.exit(0 if d.get('vs_baseline',0)>0 and 'error' not in d else 1)"; then
    echo "SUCCESS on attempt $i" >> runs/bench_r5/loop.log
    exit 0
  fi
  sleep 540
done
echo "LOOP-DONE no success $(date)" >> runs/bench_r5/loop.log
