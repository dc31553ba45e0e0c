#!/bin/bash
# Session 2: kbench outlier A/Bs at H=32, mid-scale training + eval sweep,
# verify drive, final bench. Starts after session 1 logs SESSION DONE.
cd "$(dirname "$0")/.."
LOG=runs/bench_r5/session2.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

for i in $(seq 1 90); do
  grep -q "SESSION DONE" runs/bench_r5/session.log 2>/dev/null && break
  sleep 30
done
note "session1 done; starting kbench A/B"
sleep 60

timeout 2300 python scripts/kbench.py base gear32@4 gear32:kseg@4 gear32:o128@4 gear32:o128+kseg@4 \
  --heads 32 --watchdog 2250 > runs/bench_r5/kbench_gear_h32.log 2>&1
note "kbench rc=$?: $(grep us/step runs/bench_r5/kbench_gear_h32.log | tr '\n' ' | ')"
sleep 500

note "mid-scale training"
timeout 2300 python scripts/acc_run.py train --scale mid --steps 1500 > runs/bench_r5/mid_train.log 2>&1
note "train rc=$?: $(tail -2 runs/bench_r5/mid_train.log | tr '\n' ' ')"
sleep 500

note "mid-scale eval sweep"
timeout 3500 python scripts/acc_run.py eval --scale mid --sweep --limit 150 > runs/bench_r5/mid_eval.log 2>&1
note "eval rc=$?: $(tail -3 runs/bench_r5/mid_eval.log | tr '\n' ' ')"
sleep 500

note "verify drive"
timeout 550 python - > runs/bench_r5/verify_drive.log 2>&1 <<'PYEOF'
import jax
from gear_tpu.config import CompressionConfig
from gear_tpu.engine import EngineConfig, InferenceEngine
from gear_tpu.models import llama
cfg = llama.ModelConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                        num_layers=4, num_heads=8, num_kv_heads=4, head_dim=32)
params = llama.init_params(jax.random.PRNGKey(0), cfg)
comp = CompressionConfig(num_layers=cfg.num_layers, compress_method="GEARL",
                         quantize_bit=8, group_size=64, rank=2, prefill_rank=4, loop=2)
outs = {}
for mode in ("fused", "raw"):
    eng = InferenceEngine(cfg, params, comp, EngineConfig(max_len=256, mode=mode), batch_size=2)
    outs[mode] = eng.generate([[1,2,3,4,5,6,7],[10,11,12]], 40)
    print(mode, outs[mode], flush=True)
print("MATCH" if outs["fused"] == outs["raw"] else "MISMATCH")
PYEOF
note "verify rc=$?: $(tail -1 runs/bench_r5/verify_drive.log)"
sleep 400

note "final full bench"
timeout 590 python bench.py > runs/bench_r5/full_2.jsonl 2> runs/bench_r5/full_2.err
note "full2 rc=$?: $(grep '^{' runs/bench_r5/full_2.jsonl | tail -1 | head -c 400)"
note "SESSION2 DONE"
