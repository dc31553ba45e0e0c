#!/bin/bash
# Round-5 TPU session orchestration (run DETACHED): spaced dedicated
# warming runs for each cold bench stage, then one full bench run.
# >=8 min between device sessions after any run that may have hard-exited.
cd "$(dirname "$0")/.."
LOG=runs/bench_r5/session.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

run_only() {  # run_only <stages> <tag>
  note "start BENCH_ONLY=$1"
  BENCH_ONLY="$1" timeout 590 python bench.py > "runs/bench_r5/only_$2.jsonl" 2> "runs/bench_r5/only_$2.err"
  note "done BENCH_ONLY=$1 rc=$?: $(grep '^{' runs/bench_r5/only_$2.jsonl | tail -1 | head -c 300)"
}

sleep 480                      # wait out the wedge from the last hard exit
run_only model model
sleep 500
run_only model_b8 modelb8
sleep 500
run_only int2_gear gear
sleep 500
run_only int2_gearl_kcvt,int4_gearl,paged extras
sleep 500
note "full bench run"
timeout 590 python bench.py > runs/bench_r5/full_1.jsonl 2> runs/bench_r5/full_1.err
note "full done rc=$?: $(grep '^{' runs/bench_r5/full_1.jsonl | tail -1 | head -c 400)"
note "SESSION DONE"
