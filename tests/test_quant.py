"""Quant/pack round-trip and parity tests against an independent numpy model.

Mirrors the acceptance criteria of the reference's kernel scripts
(cuda_supported_gear/quant/test.py: quant round-trip relative error at
2/4/8-bit) but with asserted tolerances instead of printed numbers.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gear_tpu.core import quant


def np_quant_dequant(x, bits, group_size):
    """Independent numpy reference: group-wise asymmetric min/max quant."""
    levels = 2**bits - 1
    shape = x.shape
    g = x.reshape(-1, group_size).astype(np.float64)
    mn = g.min(axis=1, keepdims=True)
    mx = g.max(axis=1, keepdims=True)
    step = (mx - mn) / levels
    step_safe = np.where(step == 0, 1.0, step)
    q = np.clip(np.round((g - mn) / step_safe), 0, levels)
    return (q * step + mn).reshape(shape)


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("group_size", [32, 64, 128])
def test_fake_quant_matches_numpy(rng, bits, group_size):
    x = rng.standard_normal((2, 3, 128)).astype(np.float32)
    got = np.asarray(quant.fake_quantize_groups(jnp.asarray(x), bits, group_size))
    want = np_quant_dequant(x, bits, group_size)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quant_roundtrip_error_bound(rng, bits):
    """Max error of uniform quant is step/2 per group."""
    x = rng.standard_normal((4, 256)).astype(np.float32)
    codes, scale, mn = quant.quantize_groups(jnp.asarray(x), bits, 64)
    deq = quant.dequantize_groups(codes, scale, mn, 64)
    err = np.abs(np.asarray(deq) - x)
    step = np.asarray(scale).repeat(64, axis=-1)
    assert (err <= step / 2 + 1e-5).all()


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_pack_unpack_roundtrip(rng, bits):
    n = 256
    codes = rng.integers(0, 2**bits, size=(3, 5, n)).astype(np.int32)
    packed = quant.pack_codes(jnp.asarray(codes), bits)
    assert packed.shape == (3, 5, n * bits // 32)
    assert packed.dtype == jnp.int32
    unpacked = quant.unpack_codes(packed, bits)
    np.testing.assert_array_equal(np.asarray(unpacked), codes)


def test_pack_word_layout():
    """Little-endian lane order within each int32 word (reference
    pack_tensor semantics, new_pack.py:86-107)."""
    codes = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
    packed = quant.pack_codes(codes, 4)
    want = sum(v << (4 * j) for j, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8]))
    assert int(packed[0, 0]) & 0xFFFFFFFF == want


@pytest.mark.parametrize("bits", [2, 4])
def test_quantize_and_pack_roundtrip(rng, bits):
    x = rng.standard_normal((2, 4, 128)).astype(np.float32)
    packed, scale, mn = quant.quantize_and_pack(jnp.asarray(x), bits, 64)
    deq = quant.unpack_and_dequantize(packed, scale, mn, bits, 64)
    want = np_quant_dequant(x, bits, 64)
    np.testing.assert_allclose(np.asarray(deq), want, rtol=1e-4, atol=1e-5)


def test_constant_group_no_nan():
    x = jnp.ones((2, 64))
    out = quant.fake_quantize_groups(x, 4, 64)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_per_channel_layout(rng):
    """Per-channel K quant groups along seq: a tensor constant across seq
    reconstructs exactly even at 2 bits."""
    b, h, s, d = 1, 2, 64, 8
    base = rng.standard_normal((b, h, 1, d)).astype(np.float32)
    x = np.broadcast_to(base, (b, h, s, d)).copy()
    codes, scale, mn = quant.quant_kv_per_channel(jnp.asarray(x), 2, 32)
    assert codes.shape == (b, h, d, s)
    deq = quant.dequantize_groups(codes, scale, mn, 32)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(deq, -1, -2)), x, rtol=1e-4, atol=1e-5
    )


def test_per_token_layout(rng):
    b, h, s, d = 1, 2, 4, 64
    base = rng.standard_normal((b, h, s, 1)).astype(np.float32)
    x = np.broadcast_to(base, (b, h, s, d)).copy()
    codes, scale, mn = quant.quant_kv_per_token(jnp.asarray(x), 2, 32)
    assert codes.shape == (b, h, s, d)
    deq = quant.dequantize_groups(codes, scale, mn, 32)
    np.testing.assert_allclose(np.asarray(deq), x, rtol=1e-4, atol=1e-5)
