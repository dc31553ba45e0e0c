"""Golden numeric parity vs the ACTUAL reference torch code.

Imports the reference's pure-torch compression math directly from the
read-only snapshot and compares gear_tpu outputs on identical inputs:

  - Simulated stack (accuracy path):
      reference: GenerationBench/GenerationTest/GEARLM/Simulated/
      compress_function.py — fake_groupwise_{token,channel} quant (:7-67),
      cluster variants (:100-160), fake_poweriteration_group (:69-98),
      gears_{channel,token}Q (:261-333).
  - True compression stack (memory path):
      reference: GEARLM/TrueCompression/models/TrueCompressFunction.py —
      true_uniform_quantization_compress/decompress (:51-92),
      true_poweriteration (:132-163), fake_quant_error_simulation (:122-129).

Documented deliberate divergences (survey §7.4) are asserted as such where
they can be triggered:
  * level count: the reference outlier path passes ``bits**2 - 1`` cluster
    levels (== ``2**bits - 1`` only for bits in {2, 4}); gear_tpu always uses
    ``2**bits - 1``.  Parity tests therefore run at bits in {2, 4}.
  * constant groups: the reference divides by zero (NaN); gear_tpu guards.
  * fake_quant_error_simulation: the reference's "error" is
    ``x - round((x - mn)/step)`` — code-space minus value-space, NOT the true
    quantization error. Pinned here as reference behavior; gear_tpu's true
    path uses the actual dequantized error.
"""
from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from gear_tpu.core import lowrank, outliers, quant, simulated
from gear_tpu.config import LayerCompressionConfig

_REF_ROOT = "/root/reference/GenerationBench/GenerationTest/GEARLM"
_SIM = os.path.join(_REF_ROOT, "Simulated", "compress_function.py")
_TRUE = os.path.join(_REF_ROOT, "TrueCompression", "models",
                     "TrueCompressFunction.py")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(_SIM) and os.path.exists(_TRUE)),
    reason="reference snapshot not present",
)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_sim():
    return _load("_ref_compress_function", _SIM)


@pytest.fixture(scope="module")
def ref_true():
    return _load("_ref_true_compress_function", _TRUE)


def _rand(shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# A1: fake groupwise quantization
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [2, 4, 8])
def test_token_quant_parity(ref_sim, bits):
    # [B,H,S,D]; token groups run along flattened h*d (reference :7-37).
    x = _rand((2, 4, 10, 32), seed=1)
    ref = ref_sim.fake_groupwise_token_asymmetric_quantization(
        torch.from_numpy(x.copy()), bits, group_size=64).numpy()
    got = np.asarray(simulated.fake_token_quant(jnp.asarray(x), bits, 64))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_channel_quant_parity(ref_sim, bits):
    # channel groups run along seq (reference :39-67); seq divisible by group.
    x = _rand((2, 4, 24, 32), seed=2)
    ref = ref_sim.fake_groupwise_channel_asymmetric_quantization_new(
        torch.from_numpy(x.copy()), bits, group_size=8).numpy()
    got = np.asarray(simulated.fake_channel_quant(jnp.asarray(x), bits, 8))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


@pytest.mark.parametrize("bits", [2, 4])
def test_channel_cluster_tail_passthrough_parity(ref_sim, bits):
    # Non-divisible seq: the cluster variant passes the tail through
    # uncompressed (reference :100-131). bits in {2,4} where the reference's
    # bits**2-1 == 2**bits-1 coincidence holds.
    x = _rand((2, 4, 21, 32), seed=3)
    ref = ref_sim.fake_groupwise_channel_asymmetric_quantization_cluster(
        torch.from_numpy(x.copy()), 2 ** bits - 1, group_size=8).numpy()
    got = np.asarray(simulated.fake_channel_quant(jnp.asarray(x), bits, 8))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_cluster_levels_divergence_documented(ref_sim):
    # At bits=8 the reference outlier path would quantize with 8**2-1 = 63
    # levels instead of 255 — the deliberate gear_tpu fix. Pin the reference
    # behavior so the divergence stays documented, not accidental.
    x = _rand((1, 2, 16, 32), seed=4)
    ref63 = ref_sim.fake_groupwise_token_asymmetric_quantization_cluster(
        torch.from_numpy(x.copy()), 8 ** 2 - 1, group_size=64).numpy()
    got255 = np.asarray(simulated.fake_token_quant(jnp.asarray(x), 8, 64))
    # 255-level quantization must be strictly more accurate.
    assert np.abs(got255 - x).mean() < np.abs(ref63 - x).mean()


# ---------------------------------------------------------------------------
# A2: power iteration (identical random init injected into both)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("loop,rank", [(1, 2), (3, 2), (3, 4)])
def test_poweriteration_parity(ref_sim, loop, rank):
    b, h, s, d = 2, 3, 20, 16
    x = _rand((b, h, s, d), seed=5)
    p0 = np.random.default_rng(6).random((b, h, d, rank)).astype(np.float32)
    q0 = np.zeros((b, h, s, rank), np.float32)  # overwritten before use

    ref = ref_sim.fake_poweriteration_group(
        torch.from_numpy(x.copy()), loop, rank, "cpu",
        [torch.from_numpy(p0.copy())], [torch.from_numpy(q0.copy())]).numpy()

    p, q = lowrank.power_iterate(jnp.asarray(x), rank, loop,
                                 p0=jnp.asarray(p0))
    got = np.asarray(lowrank.reconstruct(p, q))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-4)


def test_true_poweriteration_parity(ref_true):
    # true_poweriteration flattens [B,H,S,D] -> [B,S,H*D] rows
    # (TrueCompressFunction.py:132-163); bases are per-batch, not per-head.
    b, h, s, d = 2, 2, 24, 8
    loop, rank = 3, 4
    x = _rand((b, h, s, d), seed=7)
    p0 = np.random.default_rng(8).random((b, h * d, rank)).astype(np.float32)
    q0 = np.zeros((b, s, rank), np.float32)

    pb, qb = ref_true.true_poweriteration(
        torch.from_numpy(x.copy()), loop, rank,
        [torch.from_numpy(p0.copy())], [torch.from_numpy(q0.copy())])
    ref = (qb[0].float() @ pb[0].float().transpose(1, 2)).numpy()

    rows = jnp.transpose(jnp.asarray(x), (0, 2, 1, 3)).reshape(b, s, h * d)
    p, q = lowrank.power_iterate(rows, rank, loop, p0=jnp.asarray(p0))
    got = np.asarray(lowrank.reconstruct(p, q))
    # reference rounds P/Q to fp16 before the reconstruction matmul
    np.testing.assert_allclose(got, ref, rtol=0, atol=5e-3)


# ---------------------------------------------------------------------------
# A3: outlier extract/quantize/restore (gears_tokenQ / gears_channelQ)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [2, 4])
def test_gears_tokenQ_parity(ref_sim, bits):
    x = _rand((2, 4, 16, 32), seed=9)
    sparsity = 0.05
    ref = ref_sim.gears_tokenQ(torch.from_numpy(x.copy()), bits,
                               group_size=64, sparsity=sparsity)
    got = np.asarray(simulated.outlier_token_quant(
        jnp.asarray(x), bits, 64, sparsity), np.float32)
    np.testing.assert_allclose(got, ref.float().numpy(), rtol=0, atol=2e-3)


@pytest.mark.parametrize("bits", [2, 4])
def test_gears_channelQ_parity(ref_sim, bits):
    x = _rand((2, 4, 16, 32), seed=10)
    sparsity = 0.05
    ref = ref_sim.gears_channelQ(torch.from_numpy(x.copy()), bits,
                                 group_size=8, sparsity=sparsity)
    got = np.asarray(simulated.outlier_channel_quant(
        jnp.asarray(x), bits, 8, sparsity), np.float32)
    np.testing.assert_allclose(got, ref.float().numpy(), rtol=0, atol=2e-3)


# ---------------------------------------------------------------------------
# A4: full GEAR recipe — deterministic pieces match exactly (above); the
# composed path uses independent random low-rank inits, so assert equal
# reconstruction FIDELITY instead.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [2, 4])
def test_gear_full_fidelity(ref_sim, bits):
    x = _rand((1, 4, 32, 32), seed=11, scale=0.5)
    sparsity, rank, loop = 0.05, 4, 3
    ref = ref_sim.gearslkivi_tokenQ_new(
        torch.from_numpy(x.copy()), bits, group_size=64,
        sparsity=sparsity, rank=rank, loop=loop).float().numpy()
    got = np.asarray(simulated.gear_token(
        jnp.asarray(x), bits, 64, sparsity, rank, loop), np.float32)
    err_ref = np.abs(ref - x).mean()
    err_got = np.abs(got - x).mean()
    # same recipe, independent random init: fidelity within 15% of each other
    assert err_got <= err_ref * 1.15, (err_got, err_ref)


def test_kcvt_dispatch_parity(ref_sim):
    # KCVT: K per-channel with group_size = seq_len, V per-token with
    # group = h*d (compress_insert_function :471-517 KCVT branch).
    b, h, s, d = 1, 4, 24, 32
    k = _rand((b, h, s, d), seed=12)
    v = _rand((b, h, s, d), seed=13)
    bits = 4
    ref_k = ref_sim.fake_groupwise_channel_asymmetric_quantization_cluster(
        torch.from_numpy(k.copy()), 2 ** bits - 1, group_size=s).numpy()
    ref_v = ref_sim.fake_groupwise_token_asymmetric_quantization_cluster(
        torch.from_numpy(v.copy()), 2 ** bits - 1, group_size=h * d).numpy()
    cfg = LayerCompressionConfig(compress_method="KCVT", quantize_bit=bits,
                                 group_size=64)
    got_k, got_v = simulated.compress_kv(jnp.asarray(k), jnp.asarray(v), cfg,
                                         prefill=True)
    np.testing.assert_allclose(np.asarray(got_k), ref_k, rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_v), ref_v, rtol=0, atol=2e-5)


# ---------------------------------------------------------------------------
# B1: true (bit-packed) uniform quantization round trip
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [4, 8])
def test_true_uniform_roundtrip_parity(ref_true, bits):
    x = _rand((2, 4, 8, 16), seed=14)
    t = torch.from_numpy(x.copy())
    packed, shape, mn, step = ref_true.true_uniform_quantization_compress(
        t.clone(), bits)
    ref = ref_true.true_uniform_quantization_decompress(
        packed, bits, shape, mn, step, torch.float32).numpy()

    # gear_tpu equivalent: whole-tensor grouping == one group spanning all
    # elements; our pack layouts differ (byte-strided) but the dequantized
    # values must match the reference exactly.
    flat = jnp.asarray(x).reshape(1, -1)
    codes, scale, mn_j = quant.quantize_groups(flat, bits, flat.shape[-1])
    got = np.asarray(quant.dequantize_groups(
        codes, scale, mn_j, flat.shape[-1])).reshape(x.shape)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)
    assert abs(float(mn) - float(mn_j[0, 0])) < 1e-6
    assert abs(float(step) - float(scale[0, 0])) < 1e-6

    # and our packed codes round-trip bit-exactly through every layout
    for pack, unpack in [(quant.pack_codes, quant.unpack_codes),
                         (quant.pack_codes_strided,
                          quant.unpack_codes_strided),
                         (quant.pack_codes_bytestrided,
                          quant.unpack_codes_bytestrided)]:
        rt = np.asarray(unpack(pack(codes, bits), bits))
        np.testing.assert_array_equal(rt, np.asarray(codes))


def test_true_outlier_roundtrip_parity(ref_true):
    # true_outlier_quantization: whole-tensor topk outliers zeroed, quantized,
    # exact values restored post-dequant (TrueCompressFunction.py:95-119).
    x = _rand((1, 2, 8, 16), seed=15)
    left = 0.1
    t = torch.from_numpy(x.copy())
    packed, shape, mn, step, vals, idx = \
        ref_true.true_outlier_quantization_compress(t.clone(), 8, left)
    ref = ref_true.true_outlier_quantization_decompress(
        packed, 8, shape, mn, step, torch.float32, vals, idx).numpy()

    flat = jnp.asarray(x).reshape(1, -1)
    k = int(flat.shape[-1] * left / 2)
    cleaned, rec = outliers.extract(flat, k)
    # reference zero-fills outliers (not mean-fill) in the true path
    zeroed = flat.at[jnp.arange(1)[:, None], rec.indices].set(0.0)
    codes, scale, mn_j = quant.quantize_groups(zeroed, 8, flat.shape[-1])
    deq = quant.dequantize_groups(codes, scale, mn_j, flat.shape[-1])
    got = np.asarray(outliers.restore(deq, rec)).reshape(x.shape)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_fake_quant_error_simulation_is_code_space(ref_true):
    # Pin the reference quirk: its "error" is x - round((x-mn)/step) — the
    # rounded CODES are never rescaled (TrueCompressFunction.py:122-129), so
    # the quantity power-iterated by true_gear_compress is not the actual
    # quantization error. gear_tpu's true path deliberately uses the real
    # dequantized error (smaller, structured), which is strictly better.
    x = _rand((64,), seed=16)
    err, mn, step = ref_true.fake_quant_error_simulation(
        torch.from_numpy(x.copy()), 4)
    expect = x - np.round((x - float(mn)) / float(step))
    np.testing.assert_allclose(err.numpy(), expect, rtol=0, atol=1e-5)
    true_err = x - (np.round((x - float(mn)) / float(step)) * float(step)
                    + float(mn))
    assert np.abs(true_err).mean() < np.abs(err.numpy()).mean()
