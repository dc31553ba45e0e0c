"""Paged continuous-batching engine tests (tiny model, CPU)."""
import numpy as np
import jax
import pytest

from gear_tpu.config import CompressionConfig
from gear_tpu.engine import EngineConfig, InferenceEngine
from gear_tpu.models import llama
from gear_tpu.serving import PagedServingEngine, ServingEngine


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.ModelConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def mk_comp(cfg):
    return CompressionConfig(num_layers=cfg.num_layers,
                             compress_method="GEARL", quantize_bit=8,
                             group_size=16, rank=2, prefill_rank=2, loop=2)


def test_paged_serving_completes_all_requests(tiny):
    cfg, params = tiny
    eng = PagedServingEngine(cfg, params, mk_comp(cfg), n_slots=2,
                             max_len=128, n_pages=16, page_blocks=2)
    rids = [eng.submit([1, 2, 3], 6), eng.submit([4, 5], 4),
            eng.submit([7, 8, 9, 10], 5)]  # 3 requests, 2 slots
    outs = eng.run()
    assert set(outs) == set(rids)
    assert len(outs[rids[0]]) == 6
    assert len(outs[rids[1]]) == 4
    assert len(outs[rids[2]]) == 5
    # all pages returned to the pool after completion
    assert eng.alloc.free_count() == 16


def test_paged_serving_matches_dense_serving(tiny):
    """The paged engine emits the same greedy tokens as the dense per-slot
    engine for the same requests (int8, generations long enough to flush
    residuals into pages; per-slot key chains are matched so the
    power-iteration randomness is bit-identical)."""
    cfg, params = tiny
    comp = mk_comp(cfg)
    n_new = 24  # > group(16): crosses a residual flush into a page
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]

    dense = ServingEngine(cfg, params, comp, n_slots=2, max_len=128)
    r0 = [dense.submit(p, n_new) for p in prompts]
    out_dense = dense.run()

    paged = PagedServingEngine(cfg, params, comp, n_slots=2, max_len=128,
                               n_pages=16, page_blocks=1)
    r1 = [paged.submit(p, n_new) for p in prompts]
    out_paged = paged.run()

    for a, b in zip(r0, r1):
        assert out_dense[a] == out_paged[b], (out_dense[a], out_paged[b])


def test_paged_serving_staggered_finishes_match_dense(tiny):
    """Regression: a PARKED slot must not keep appending/flushing — with
    staggered finish times (max_new 48 vs 4) the dead slot used to flush a
    garbage block into physical page 0 (owned by the live request) ~group
    steps after finishing, corrupting the survivor's tokens."""
    cfg, params = tiny
    comp = mk_comp(cfg)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    max_news = [48, 4]  # slot 1 finishes early, slot 0 keeps generating

    dense = ServingEngine(cfg, params, comp, n_slots=2, max_len=128)
    r0 = [dense.submit(p, n) for p, n in zip(prompts, max_news)]
    out_dense = dense.run()

    paged = PagedServingEngine(cfg, params, comp, n_slots=2, max_len=128,
                               n_pages=16, page_blocks=1)
    r1 = [paged.submit(p, n) for p, n in zip(prompts, max_news)]
    out_paged = paged.run()

    for a, b in zip(r0, r1):
        assert out_dense[a] == out_paged[b], (out_dense[a], out_paged[b])


def test_paged_serving_preempts_on_pool_exhaustion(tiny):
    """Decode-time pool exhaustion must not crash: a victim slot is
    preempted (pages released, request requeued with its generated prefix)
    and every request still completes with the right token count."""
    cfg, params = tiny
    # group 16, page_blocks 1 -> a page per 16 tokens. 6 pages total.
    # Two 32-token prompts take 2 pages each (+1 spare rule leaves 1 free);
    # both slots then generate 40 tokens (> 2 flushes each), forcing a
    # decode-time page allocation that cannot be satisfied for both.
    eng = PagedServingEngine(cfg, params, mk_comp(cfg), n_slots=2,
                             max_len=128, n_pages=6, page_blocks=1)
    p = list(range(1, 33))
    rids = [eng.submit(p, 40), eng.submit([x + 50 for x in p], 40)]
    outs = eng.run()
    assert set(outs) == set(rids)
    assert all(len(outs[r]) == 40 for r in rids)
    assert eng.alloc.free_count() == 6


def test_paged_serving_waits_for_free_pages(tiny):
    """When the pool is too small for a new admission, the request waits
    rather than failing, and completes once pages free up."""
    cfg, params = tiny
    eng = PagedServingEngine(cfg, params, mk_comp(cfg), n_slots=2,
                             max_len=64, n_pages=4, page_blocks=1)
    # each 48-token prompt needs 3 pages; two can't fit at once in 4 pages
    p = list(range(1, 49))
    rids = [eng.submit(p, 3), eng.submit(p, 3)]
    outs = eng.run()
    assert set(outs) == set(rids)
    assert all(len(outs[r]) == 3 for r in rids)
    assert eng.alloc.free_count() == 4
