"""Pallas pack kernel vs the XLA reference path (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gear_tpu.core import quant
from gear_tpu.kernels import pack as P


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_quant_pack_tokens_matches_xla(rng, bits):
    m, d, vg = 64, 128, 64
    x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
    packed, scale, mn = P.quant_pack_tokens(
        x, bits=bits, v_group=vg, sideband_dtype=jnp.float32, interpret=True)
    codes_ref, scale_ref, mn_ref = quant.quantize_groups(x, bits, vg)
    packed_ref = quant.pack_codes_bytestrided(codes_ref, bits)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(packed_ref))
    np.testing.assert_allclose(np.asarray(scale), np.asarray(scale_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mn), np.asarray(mn_ref), rtol=1e-6)


@pytest.mark.parametrize("bits", [2, 4])
def test_quant_pack_channels_matches_xla(rng, bits):
    s, d, g = 128, 128, 64
    x = jnp.asarray(rng.standard_normal((s, d)).astype(np.float32))
    packed, scale, mn = P.quant_pack_channels(
        x, bits=bits, group=g, sideband_dtype=jnp.float32, interpret=True)
    # Reference: per-channel groups along time.
    from gear_tpu.cache import CacheSpec, _compress_k_block
    spec = CacheSpec(batch=1, num_kv_heads=1, head_dim=d, max_len=s,
                     bits=bits, group=g, dtype=jnp.float32,
                     sideband_dtype=jnp.float32)
    packed_ref, scale_ref, mn_ref = _compress_k_block(
        spec, x[None, None])[:3]
    # _compress_k_block stores words transposed [WD, S]; the kernel emits
    # block-major [NBs, G, WD].
    np.testing.assert_array_equal(
        np.asarray(packed).reshape(s, -1),
        np.asarray(jnp.swapaxes(packed_ref[0, 0], -1, -2)))
    np.testing.assert_allclose(
        np.asarray(scale)[:, 0], np.asarray(scale_ref[0, 0]), rtol=1e-6)


@pytest.mark.parametrize("ko", [0, 32])
def test_pk_compress_paths_match_xla(rng, ko):
    """The pack-kernel-backed block compressors (used by cache.prefill on
    TPU) must be bit-identical to the XLA compressors, outlier deltas
    included."""
    from gear_tpu import cache as C
    spec = C.CacheSpec(batch=1, num_kv_heads=2, head_dim=128, max_len=256,
                       bits=4, group=64, rank=2, prefill_rank=4,
                       dtype=jnp.bfloat16, sideband_dtype=jnp.bfloat16,
                       outliers_per_block=ko)
    shape = (1, 2, 256, 128)
    x = rng.standard_normal(shape).astype(np.float32)
    x += 8.0 * rng.standard_normal(shape).astype(np.float32) * (
        rng.random(shape) < 0.01)
    xj = jnp.asarray(x)
    for xla_fn, pk_fn in ((C._compress_k_block, C._compress_k_block_pk),
                          (C._compress_v_block, C._compress_v_block_pk)):
        want = xla_fn(spec, xj)
        got = pk_fn(spec, xj, interpret=True)
        for w, g_ in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g_))
