"""End-to-end engine tests on a tiny random-init Llama (CPU backend).

The acceptance criterion mirrors the reference's de-facto test: compressed
generation must track the uncompressed model (survey §4.4), here checked at
the logits/token level instead of a full GSM8K run.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu.config import CompressionConfig
from gear_tpu.engine import EngineConfig, InferenceEngine
from gear_tpu.models import llama


@pytest.fixture(scope="module")
def tiny():
    cfg = llama.ModelConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def mk_engine(cfg, params, mode, batch=2, **comp_kw):
    comp_defaults = dict(num_layers=cfg.num_layers, compress_method="GEARL",
                         quantize_bit=4, group_size=16, rank=2, prefill_rank=4,
                         loop=2, left=0.02, streaming_gap=16)
    comp_defaults.update(comp_kw)
    comp = CompressionConfig(**comp_defaults)
    ecfg = EngineConfig(max_len=128, mode=mode, eos_token_id=None)
    return InferenceEngine(cfg, params, comp, ecfg, batch_size=batch)


def test_raw_generation_deterministic(tiny):
    cfg, params = tiny
    eng = mk_engine(cfg, params, "raw")
    prompts = [[1, 5, 9, 12], [3, 7]]
    out1 = eng.generate(prompts, 8)
    out2 = eng.generate(prompts, 8)
    assert out1 == out2
    assert all(len(o) == 8 for o in out1)
    assert all(0 <= t < cfg.vocab_size for o in out1 for t in o)


def test_fused_tracks_raw(tiny):
    """INT8 fused compression must reproduce the uncompressed greedy tokens
    on a short horizon (near-lossless at 8-bit)."""
    cfg, params = tiny
    prompts = [[1, 5, 9, 12], [3, 7]]
    raw = mk_engine(cfg, params, "raw").generate(prompts, 12)
    fused = mk_engine(cfg, params, "fused", quantize_bit=8).generate(prompts, 12)
    agree = np.mean([a == b for ra, rf in zip(raw, fused) for a, b in zip(ra, rf)])
    assert agree >= 0.75, f"INT8 fused vs raw agreement {agree}"


def test_fused_int4_runs_past_flush(tiny):
    """Generate enough tokens to cross several flush boundaries."""
    cfg, params = tiny
    eng = mk_engine(cfg, params, "fused", quantize_bit=4)
    out = eng.generate([[1, 2, 3], [4, 5, 6]], 20)  # crosses a flush (group 16)
    assert all(len(o) == 20 for o in out)


def test_simulated_mode_runs(tiny):
    cfg, params = tiny
    eng = mk_engine(cfg, params, "simulated", compress_method="GEAR",
                    quantize_bit=8, group_size=16)
    out = eng.generate([[1, 2, 3, 4], [9, 8, 7]], 10)
    assert all(len(o) == 10 for o in out)


def test_eos_early_stop(tiny):
    cfg, params = tiny
    comp = CompressionConfig(num_layers=cfg.num_layers, compress_method="NONE")
    # Force eos to whatever the model emits first so rows terminate.
    eng0 = InferenceEngine(cfg, params, comp,
                           EngineConfig(max_len=128, mode="raw"), batch_size=1)
    first = eng0.generate([[1, 2, 3]], 1)[0][0]
    eng = InferenceEngine(cfg, params, comp,
                          EngineConfig(max_len=128, mode="raw",
                                       eos_token_id=int(first), sync_every=4),
                          batch_size=1)
    out = eng.generate([[1, 2, 3]], 24)[0]
    assert out[-1] == int(first)
    assert len(out) <= 24


def test_left_padding_invariance(tiny):
    """A row's output must not depend on the other rows' lengths (padding)."""
    cfg, params = tiny
    eng2 = mk_engine(cfg, params, "raw", batch=2)
    both = eng2.generate([[1, 5, 9, 12, 14, 2, 8, 4], [3]], 10)
    comp = CompressionConfig(num_layers=cfg.num_layers, compress_method="NONE")
    eng1 = InferenceEngine(cfg, params, comp,
                           EngineConfig(max_len=128, mode="raw"), batch_size=1)
    solo = eng1.generate([[1, 5, 9, 12, 14, 2, 8, 4]], 10)
    assert both[0] == solo[0]


def test_prefill_logits_match_reference_attention(tiny):
    """forward_prefill logits equal a plain (unscanned) numpy-checked pass."""
    cfg, params = tiny
    tokens = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    mask = jnp.ones_like(tokens)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    logits, _ = llama.forward_prefill(params, cfg, tokens, positions, mask, None)
    assert logits.shape == (1, 8, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    # Decode from the raw cache must reproduce the next prefill logits:
    # run prefill on tokens[:-1], then decode token[-1].
    spec = cfg.cache_spec(1, 128, CompressionConfig(num_layers=cfg.num_layers).layer(0))
    logits_head, caches = llama.forward_prefill(
        params, cfg, tokens[:, :-1], positions[:, :-1], mask[:, :-1], spec,
        compress=False)
    step_logits, _ = llama.forward_decode(
        params, cfg, tokens[:, -1], positions[:, -1], caches,
        spec=spec, compress=False)
    np.testing.assert_allclose(
        np.asarray(step_logits[0]), np.asarray(logits[0, -1]), rtol=2e-2, atol=2e-2)


def test_pallas_attn_impl_matches_xla(tiny):
    """fused decode via the Pallas kernel (interpret) == XLA fallback."""
    cfg, params = tiny
    prompts = [[1, 5, 9, 12], [3, 7]]
    ex = mk_engine(cfg, params, "fused", quantize_bit=8)
    out_xla = ex.generate(prompts, 10)
    ep = mk_engine(cfg, params, "fused", quantize_bit=8)
    ep.ecfg = EngineConfig(max_len=128, mode="fused",
                           attn_impl="pallas_interpret")
    out_pal = ep.generate(prompts, 10)
    agree = np.mean([a == b for ra, rp in zip(out_xla, out_pal)
                     for a, b in zip(ra, rp)])
    assert agree >= 0.8, f"pallas vs xla agreement {agree}"


def test_simulated_full_recompress_mode(tiny):
    """stream_grouping=False (reference default): whole-cache recompression
    at gap boundaries."""
    cfg, params = tiny
    eng = mk_engine(cfg, params, "simulated", compress_method="GEARL",
                    quantize_bit=8, group_size=16, stream_grouping=False)
    out = eng.generate([[1, 2, 3, 4], [9, 8, 7]], 20)  # crosses gap=16
    assert all(len(o) == 20 for o in out)
    eng2 = mk_engine(cfg, params, "simulated", compress_method="GEARL",
                     quantize_bit=8, group_size=16, stream_grouping=True)
    out2 = eng2.generate([[1, 2, 3, 4], [9, 8, 7]], 20)
    assert all(len(o) == 20 for o in out2)


def test_temperature_sampling(tiny):
    """temperature > 0 produces varied but valid sequences."""
    cfg, params = tiny
    comp = CompressionConfig(num_layers=cfg.num_layers, compress_method="NONE")
    eng = InferenceEngine(cfg, params, comp,
                          EngineConfig(max_len=64, mode="raw",
                                       temperature=1.0), batch_size=1)
    out1 = eng.generate([[1, 2, 3]], 8, prng=jax.random.PRNGKey(0))
    out2 = eng.generate([[1, 2, 3]], 8, prng=jax.random.PRNGKey(1))
    assert all(0 <= t < cfg.vocab_size for t in out1[0] + out2[0])
    assert out1 != out2  # different keys -> different samples


def test_int2_fused_engine(tiny):
    """INT2 (the reference's canonical accuracy config bit-width) runs
    through the fused path end to end."""
    cfg, params = tiny
    eng = mk_engine(cfg, params, "fused", quantize_bit=2)
    out = eng.generate([[1, 2, 3], [4, 5]], 20)
    assert all(len(o) == 20 for o in out)


def test_per_layer_config_overrides():
    """Heterogeneous per-layer policies via CompressionConfig.overrides."""
    comp = CompressionConfig(num_layers=4, quantize_bit=4,
                             overrides=((1, (("quantize_bit", 8),)),
                                        (3, (("compress_method", "NONE"),))))
    layers = comp.per_layer()
    assert [l.quantize_bit for l in layers] == [4, 8, 4, 4]
    assert layers[3].compress_method == "NONE"


# ---------------------------------------------------------------------------
# Eviction cache modes (h2o / sink) — engine-integrated end to end.
# ---------------------------------------------------------------------------

def test_h2o_mode_matches_raw_before_eviction(tiny):
    """With budget >= prompt + generation, H2O never evicts and must emit
    exactly the raw engine's greedy tokens."""
    cfg, params = tiny
    raw = mk_engine(cfg, params, "raw")
    h2o = mk_engine(cfg, params, "h2o",
                    important_size=16, recent_size=112)  # budget 128
    prompts = [[1, 5, 9, 12], [3, 7]]
    assert raw.generate(prompts, 12) == h2o.generate(prompts, 12)


def test_h2o_mode_generates_past_eviction(tiny):
    """Budget smaller than prompt+generation: eviction kicks in and decode
    keeps producing valid tokens (shape + finiteness, not parity)."""
    cfg, params = tiny
    eng = mk_engine(cfg, params, "h2o",
                    important_size=8, recent_size=24)  # budget 32
    outs = eng.generate([[1, 2, 3, 4, 5, 6, 7, 8], [9, 8, 7]], 48)
    assert all(len(o) == 48 for o in outs)
    assert all(0 <= t < cfg.vocab_size for o in outs for t in o)


def test_sink_mode_matches_raw_before_eviction(tiny):
    """With capacity >= prompt + generation and no ring wrap, cache-relative
    positions equal absolute ones, so sink decode logits must track raw
    decode logits closely (not bit-exactly: sink stores keys UNROTATED in
    bf16 and rotates at attend time — one extra bf16 rounding vs raw)."""
    import jax.numpy as jnp
    from gear_tpu import sink as sink_mod

    cfg, params = tiny
    raw = mk_engine(cfg, params, "raw")
    snk = mk_engine(cfg, params, "sink", sink_size=4, window_size=124)
    tokens = jnp.asarray([[1, 5, 9, 12], [3, 7, 11, 2]], jnp.int32)
    mask = jnp.ones_like(tokens)
    positions = jnp.cumsum(mask, axis=1) - 1

    # prefill: identical math (standard causal attention) -> tight match
    lg_raw, rcaches = llama.forward_prefill(
        params, cfg, tokens, positions, mask, raw.spec, compress=False)
    lg_snk, scaches = llama.forward_prefill_sink(
        params, cfg, tokens, positions, mask, snk.sspec)
    np.testing.assert_allclose(np.asarray(lg_snk), np.asarray(lg_raw),
                               rtol=0, atol=1e-5)

    # a few decode steps: logits track within bf16 re-rotation noise
    cur = jnp.argmax(lg_raw[:, -1], axis=-1).astype(jnp.int32)
    pad0 = jnp.zeros((2,), jnp.int32)
    for i in range(4):
        pos = jnp.full((2,), 4 + i, jnp.int32)
        l_raw, rcaches = llama.forward_decode(
            params, cfg, cur, pos, rcaches, spec=raw.spec, compress=False,
            pad_start=pad0)
        l_snk, scaches = llama.forward_decode_sink(
            params, cfg, cur, pos, scaches, sspec=snk.sspec)
        d = np.abs(np.asarray(l_snk) - np.asarray(l_raw)).max()
        assert d < 0.05, f"step {i}: sink logits diverged by {d}"
        cur = jnp.argmax(l_raw, axis=-1).astype(jnp.int32)


def test_sink_mode_generates_past_window_wrap(tiny):
    cfg, params = tiny
    eng = mk_engine(cfg, params, "sink", sink_size=2, window_size=30)
    outs = eng.generate([[1, 2, 3, 4] * 4, [5, 6, 7, 8] * 4], 48)
    assert all(len(o) == 48 for o in outs)
    assert all(0 <= t < cfg.vocab_size for o in outs for t in o)
