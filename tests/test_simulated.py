"""Tests for the simulated (fake-quant) GEAR recipe — the accuracy path.

The de-facto acceptance criterion mirrors the reference: the GEAR recipe must
reconstruct KV tensors much more accurately than plain quantization at the
same bit width (that is the entire point of the paper).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu.config import CompressionConfig
from gear_tpu.core import simulated


def make_kv(rng, b=1, h=4, s=96, d=32):
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    return jnp.asarray(k), jnp.asarray(v)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).mean() / np.abs(b).mean()


def test_token_quant_groups_span_heads(rng):
    """Per-token groups run along flattened h*d (Stack-A semantics)."""
    b, h, s, d = 1, 4, 8, 16
    x = rng.standard_normal((b, h, s, d)).astype(np.float32)
    out = simulated.fake_token_quant(jnp.asarray(x), 4, h * d)
    # With group == h*d there is exactly one group per token: quantizing any
    # head alone (group=d) must differ from the joint quantization.
    out_per_head = simulated.fake_token_quant(jnp.asarray(x), 4, d)
    assert not np.allclose(np.asarray(out), np.asarray(out_per_head))
    assert rel_err(out, x) < 0.15  # 4-bit mean rel err on N(0,1) is ~0.1


def test_channel_quant_tail_passthrough(rng):
    """seq % group_size remainder passes through uncompressed."""
    b, h, s, d = 1, 2, 70, 16  # 70 = 64 + 6 tail
    x = rng.standard_normal((b, h, s, d)).astype(np.float32)
    out = np.asarray(simulated.fake_channel_quant(jnp.asarray(x), 2, 64))
    np.testing.assert_array_equal(out[:, :, 64:], x[:, :, 64:])
    assert not np.allclose(out[:, :, :64], x[:, :, :64])


@pytest.mark.parametrize("method", ["KIVI_V2", "KCVT", "GEARL", "GEAR"])
def test_recipe_reduces_error_ladder(rng, method):
    """GEAR < GEARL < plain quant in reconstruction error at the same bits."""
    k, v = make_kv(rng)
    cfg = CompressionConfig(
        num_layers=1, compress_method=method, quantize_bit=2, group_size=32,
        prefill_rank=4, prefill_rankv=4, loop=3, left=0.02,
    ).layer(0)
    k_c, v_c = simulated.compress_kv(k, v, cfg, prefill=True)
    assert k_c.shape == k.shape and v_c.shape == v.shape
    assert np.isfinite(np.asarray(k_c)).all()
    err = rel_err(k_c, k) + rel_err(v_c, v)
    # Method-specific expectations at INT2 (sum of K+V mean rel errors on
    # N(0,1) data; measured ~0.82 / 1.05 / 0.71 / 0.63 — the ladder
    # GEAR < GEARL < plain is the property that matters):
    bounds = {"KIVI_V2": 1.0, "KCVT": 1.2, "GEARL": 0.85, "GEAR": 0.75}
    assert err < bounds[method], f"{method}: err={err}"


def test_gear_beats_plain_quant(rng):
    k, v = make_kv(rng)
    base = CompressionConfig(num_layers=1, quantize_bit=2, group_size=32,
                             prefill_rank=4, prefill_rankv=4, loop=3, left=0.02)
    plain = base.__class__(**{**base.__dict__, "compress_method": "KIVI_V2"}).layer(0)
    gear = base.__class__(**{**base.__dict__, "compress_method": "GEAR"}).layer(0)
    k_p, v_p = simulated.compress_kv(k, v, plain, prefill=True)
    k_g, v_g = simulated.compress_kv(k, v, gear, prefill=True)
    assert rel_err(k_g, k) < rel_err(k_p, k)
    assert rel_err(v_g, v) < rel_err(v_p, v)


def test_outliers_preserved_exactly(rng):
    """Planted extreme entries survive GEAR compression bit-exactly-ish."""
    k, v = make_kv(rng, s=64)
    k = k.at[0, 0, 5, 3].set(50.0)
    cfg = CompressionConfig(
        num_layers=1, compress_method="OUTLIER", quantize_bit=4,
        group_size=32, left=0.05,
    ).layer(0)
    k_c, _ = simulated.compress_kv(k, v, cfg, prefill=True)
    np.testing.assert_allclose(float(k_c[0, 0, 5, 3]), 50.0, rtol=1e-3)


def test_prefill_vs_stream_rank_selection(rng):
    k, v = make_kv(rng, s=64)
    cfg = CompressionConfig(
        num_layers=1, compress_method="GEARL", quantize_bit=2, group_size=32,
        rank=1, rankv=1, prefill_rank=8, prefill_rankv=8, loop=4,
    ).layer(0)
    k_pre, _ = simulated.compress_kv(k, v, cfg, prefill=True)
    k_str, _ = simulated.compress_kv(k, v, cfg, prefill=False)
    assert rel_err(k_pre, k) < rel_err(k_str, k)


def test_token_preserving_slices(rng):
    k, v = make_kv(rng, s=64)
    cfg = CompressionConfig(
        num_layers=1, compress_method="KIVI_V2", quantize_bit=2, group_size=16,
        token_preserving=True, start_saving=0.125, locality_saving=0.125,
    ).layer(0)
    k_c, v_c = simulated.compress_kv(k, v, cfg, prefill=True)
    np.testing.assert_array_equal(np.asarray(k_c[:, :, :8]), np.asarray(k[:, :, :8]))
    np.testing.assert_array_equal(np.asarray(k_c[:, :, -8:]), np.asarray(k[:, :, -8:]))
    assert not np.allclose(np.asarray(k_c[:, :, 8:-8]), np.asarray(k[:, :, 8:-8]))


def test_compress_kv_jit(rng):
    k, v = make_kv(rng, s=64)
    cfg = CompressionConfig(num_layers=1, compress_method="GEAR",
                            quantize_bit=4, group_size=32, left=0.02).layer(0)
    f = jax.jit(lambda a, b: simulated.compress_kv(a, b, cfg, prefill=True))
    k_c, v_c = f(k, v)
    assert np.isfinite(np.asarray(k_c)).all()


def test_config_ratio_sane():
    cfg = CompressionConfig(num_layers=32, quantize_bit=4, group_size=64,
                            prefill_rank=4, left=0.02)
    r = cfg.ratio(seq_len=4096, num_heads=32, head_dim=128)
    assert 2.0 < r < 4.5  # INT4 + sidebands + outliers + bases
    assert cfg.quant_ratio() == 4.0
