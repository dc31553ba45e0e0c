"""Continuous-batching serving engine tests (tiny model, CPU)."""
import numpy as np
import jax
import pytest

from gear_tpu.config import CompressionConfig
from gear_tpu.engine import EngineConfig, InferenceEngine
from gear_tpu.models import llama
from gear_tpu.serving import Scheduler, ServingEngine


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.ModelConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_scheduler_native_loaded():
    s = Scheduler(2)
    assert s.native, "native scheduler library should be built"


def test_scheduler_fcfs_and_slots():
    s = Scheduler(2)
    assert s.add(10, 4, 3) == 0
    assert s.add(11, 4, 2) == 0
    assert s.add(12, 4, 1) == 0
    assert s.next_admission() == 10
    assert s.admit(10) == 0
    assert s.admit(11) == 1
    assert s.next_admission() == -1  # no free slot for rid 12
    assert s.step(0) == 2
    assert s.step(0) == 1
    assert s.step(0) == 0
    assert s.finish(0) == 10
    assert s.next_admission() == 12
    assert s.admit(12) == 0


def test_serving_completes_all_requests(tiny):
    cfg, params = tiny
    comp = CompressionConfig(num_layers=cfg.num_layers,
                             compress_method="GEARL", quantize_bit=8,
                             group_size=16, rank=2, prefill_rank=2, loop=2)
    eng = ServingEngine(cfg, params, comp, n_slots=2, max_len=128)
    rids = [eng.submit([1, 2, 3], 6), eng.submit([4, 5], 4),
            eng.submit([7, 8, 9, 10], 5)]  # 3 requests, 2 slots
    outs = eng.run()
    assert set(outs) == set(rids)
    assert len(outs[rids[0]]) == 6
    assert len(outs[rids[1]]) == 4
    assert len(outs[rids[2]]) == 5


def test_serving_matches_static_engine(tiny):
    """A single request served continuously equals the static engine's
    greedy output for the same prompt."""
    cfg, params = tiny
    comp = CompressionConfig(num_layers=cfg.num_layers,
                             compress_method="GEARL", quantize_bit=8,
                             group_size=16, rank=2, prefill_rank=2, loop=2)
    prompt = [1, 5, 9, 12]
    eng = ServingEngine(cfg, params, comp, n_slots=2, max_len=128)
    rid = eng.submit(prompt, 8)
    out = eng.run()[rid]

    static = InferenceEngine(
        cfg, params, comp, EngineConfig(max_len=128, mode="fused"),
        batch_size=1)
    want = static.generate([prompt], 8)[0]
    agree = np.mean([a == b for a, b in zip(out, want)])
    assert agree >= 0.75, f"serving vs static agreement {agree}: {out} vs {want}"


def test_serving_interleaved_admission(tiny):
    """A request admitted mid-flight into a freed slot completes correctly."""
    cfg, params = tiny
    comp = CompressionConfig(num_layers=cfg.num_layers,
                             compress_method="GEARL", quantize_bit=8,
                             group_size=16, rank=2, prefill_rank=2, loop=2)
    eng = ServingEngine(cfg, params, comp, n_slots=1, max_len=128)
    r1 = eng.submit([1, 2, 3], 3)
    r2 = eng.submit([9, 8, 7, 6], 4)
    outs = eng.run()
    assert len(outs[r1]) == 3 and len(outs[r2]) == 4
    # Second request must match serving it alone (slot reuse is clean).
    solo = ServingEngine(cfg, params, comp, n_slots=1, max_len=128)
    rs = solo.submit([9, 8, 7, 6], 4)
    assert solo.run()[rs] == outs[r2]
