"""Pallas fused decode kernel vs the XLA reference attention (interpret mode).

The acceptance contract mirrors the reference's kernel tests
(cuda_supported_gear/quant/gemv.py:93-165: fused kernel vs attention over the
dequantized cache) with asserted tolerances.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu import cache as C
from gear_tpu.kernels import decode as K


def mk_spec(**kw):
    base = dict(batch=2, num_kv_heads=2, head_dim=128, max_len=256, bits=4,
                group=64, rank=2, prefill_rank=4, lowrank_loop=3,
                dtype=jnp.float32, sideband_dtype=jnp.float32)
    base.update(kw)
    return C.CacheSpec(**base)


def rand_cache(rng, spec, s):
    shape = (spec.batch, spec.num_kv_heads, s, spec.head_dim)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    return C.prefill(spec, k, v)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_kernel_matches_xla_attend(rng, bits):
    spec = mk_spec(bits=bits)
    cache = rand_cache(rng, spec, 256)
    hq = 4
    q = jnp.asarray(
        rng.standard_normal((spec.batch, hq, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    # v3 kernel computes in bf16 (f32 accumulate): ~0.4% rounding noise on
    # top of the f32 XLA reference.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_kernel_with_residual_tier(rng):
    spec = mk_spec()
    cache = rand_cache(rng, spec, 192 + 17)  # 192 compressed + 17 residual
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    # v3 kernel computes in bf16 (f32 accumulate): ~0.4% rounding noise on
    # top of the f32 XLA reference.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_kernel_partial_prefix(rng):
    """comp_len < max_len: out-of-range blocks must be skipped."""
    spec = mk_spec()
    cache = rand_cache(rng, spec, 128)  # half capacity
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    # v3 kernel computes in bf16 (f32 accumulate): ~0.4% rounding noise on
    # top of the f32 XLA reference.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_kernel_pad_start(rng):
    spec = mk_spec()
    cache = rand_cache(rng, spec, 256)
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    pad = jnp.asarray([0, 70], jnp.int32)  # row 1 masks the first 70 tokens
    want = C.attend(spec, cache, q, pad_start=pad)
    got = K.attend_fused(spec, cache, q, pad_start=pad, interpret=True)
    # v3 kernel computes in bf16 (f32 accumulate): ~0.4% rounding noise on
    # top of the f32 XLA reference.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_kernel_gqa(rng):
    spec = mk_spec(num_kv_heads=2)
    cache = rand_cache(rng, spec, 128)
    hq = 8  # 4 query heads per kv head
    q = jnp.asarray(
        rng.standard_normal((spec.batch, hq, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    # v3 kernel computes in bf16 (f32 accumulate): ~0.4% rounding noise on
    # top of the f32 XLA reference.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_kernel_empty_residual_after_flush(rng):
    """resid_len == 0 (right after a flush) must not produce NaNs."""
    spec = mk_spec()
    cache = rand_cache(rng, spec, 128)
    assert int(cache.resid_len) == 0
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    got = K.attend_fused(spec, cache, q, interpret=True)
    assert np.isfinite(np.asarray(got)).all()


def test_kernel_int8_bases(rng):
    spec = mk_spec(base_bits=8)
    cache = rand_cache(rng, spec, 192)
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


@pytest.mark.parametrize("bits,ko", [(4, 32), (2, 64)])
def test_kernel_coo_outliers(rng, bits, ko):
    """Full GEAR recipe in-kernel: quant + low-rank + COO outlier deltas.

    The reference's fused CUDA path never implemented its outlier slots
    (modeling_llamagear.py:458-466); here they ride the kernel as one-hot
    gather/scatter dots and must match the XLA restore path."""
    spec = mk_spec(bits=bits, outliers_per_block=ko)
    shape = (spec.batch, spec.num_kv_heads, 256, spec.head_dim)
    k = rng.standard_normal(shape).astype(np.float32)
    v = rng.standard_normal(shape).astype(np.float32)
    # heavy tails so outliers carry real signal
    k += 8.0 * rng.standard_normal(shape).astype(np.float32) * (
        rng.random(shape) < 0.01)
    v += 8.0 * rng.standard_normal(shape).astype(np.float32) * (
        rng.random(shape) < 0.01)
    cache = C.prefill(spec, jnp.asarray(k), jnp.asarray(v))
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 4, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_kernel_outliers_with_residual_and_flush(rng):
    """Outlier path across a decode flush + non-empty residual tier."""
    spec = mk_spec(outliers_per_block=32, dtype=jnp.bfloat16,
                   sideband_dtype=jnp.bfloat16)
    cache = rand_cache(rng, spec, 150)  # 128 compressed + 22 residual
    key = jax.random.PRNGKey(3)
    for i in range(50):  # crosses one flush boundary (resid 22 -> 64 -> 8)
        kn = jax.random.normal(jax.random.fold_in(key, 2 * i),
                               (spec.batch, spec.num_kv_heads, 1,
                                spec.head_dim))
        cache = C.append(spec, cache, kn, kn * 0.5 + 1.0)
    assert int(cache.comp_len) == 192
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=1.5e-2)


@pytest.mark.parametrize("hb", [2, 4])
def test_kernel_heads_per_step(rng, hb):
    """heads_per_step batches BH rows per grid step; results identical."""
    spec = mk_spec(num_kv_heads=2)  # batch 2 x 2 kv heads = 4 BH rows
    cache = rand_cache(rng, spec, 256)
    q = jnp.asarray(rng.standard_normal(
        (spec.batch, 4, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, heads_per_step=hb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_kernel_dual_region_slow_path(rng):
    """Chunks past prefill_len take the per-block low-rank path; forcing
    prefill_len lower (P is replicated, so the math is unchanged) must
    reproduce the fast-path result."""
    spec = mk_spec()
    cache = rand_cache(rng, spec, 256)
    q = jnp.asarray(rng.standard_normal(
        (spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    want = K.attend_fused(spec, cache, q, blocks_per_chunk=2, interpret=True)
    forced = cache.replace(prefill_len=jnp.int32(64))
    got = K.attend_fused(spec, forced, q, blocks_per_chunk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-4)

@pytest.mark.parametrize("ko", [0, 8])
def test_kernel_kcvt_prefill(rng, ko):
    """kcvt_prefill: whole-span per-channel K scales (KCVT K grouping,
    compress_function.py:441-452) replicated per block; the kernel's
    fast path folds the scale into q once per chunk. Must match the XLA
    reference on BOTH regions (prefill fast path + decode-flushed slow
    path) and agree with the slow path when prefill_len is forced down."""
    spec = mk_spec(bits=2, kcvt_prefill=True, base_bits=8,
                   outliers_per_block=ko, max_len=512)
    cache = rand_cache(rng, spec, 320)
    # push two decode-flushed blocks beyond the prefill region
    key = jax.random.PRNGKey(3)
    app = jax.jit(lambda c, kn, vn: C.append(spec, c, kn, vn, key=key))
    for i in range(130):
        shape = (spec.batch, spec.num_kv_heads, 1, spec.head_dim)
        kn = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        vn = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        cache = app(cache, kn, vn)
    assert int(cache.comp_len) > int(cache.prefill_len)
    q = jnp.asarray(rng.standard_normal(
        (spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, blocks_per_chunk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)
    # fast path == slow path on the shared-scale region
    forced = cache.replace(prefill_len=jnp.int32(0))
    got2 = K.attend_fused(spec, forced, q, blocks_per_chunk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got),
                               rtol=1e-3, atol=1e-4)


def test_rankv_asymmetric_fused_matches_attend(rng):
    """K/V-asymmetric ranks (reference rank vs rankv flags,
    evaluation_gsm8k.py:280-330) through prefill + a decode flush."""
    spec = mk_spec(rank=2, prefill_rank=4, rank_v=4, prefill_rank_v=2,
                   max_len=320)
    assert spec.r_store == 4
    cache = rand_cache(rng, spec, 192)
    # drive one full decode flush (group=64 appends)
    for i in range(64):
        kn = jnp.asarray(rng.standard_normal(
            (spec.batch, spec.num_kv_heads, 1, spec.head_dim)).astype(np.float32))
        vn = jnp.asarray(rng.standard_normal(
            (spec.batch, spec.num_kv_heads, 1, spec.head_dim)).astype(np.float32))
        cache = C.append(spec, cache, kn, vn)
    assert int(cache.comp_len) == 256 and int(cache.resid_len) == 0
    q = jnp.asarray(rng.standard_normal(
        (spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_rankv_bases_have_asymmetric_rank(rng):
    """The V bases must actually carry rank_v columns (not silently K's)."""
    spec = mk_spec(rank=2, prefill_rank=4, rank_v=1, prefill_rank_v=1)
    cache = rand_cache(rng, spec, 256)
    vqt = np.asarray(cache.vqt)  # [B,H,R,T] transposed Q
    kqt = np.asarray(cache.kqt)
    # V used rank 1: rows >= 1 must be exactly zero; K rank 4 rows populated
    assert np.abs(vqt[:, :, 1:, :]).max() == 0.0
    assert np.abs(kqt[:, :, 3, :]).max() > 0.0


def test_rankv_zero_v_side(rng):
    """rank_v=0 with K ranks on: V correction absent, K correction present."""
    spec = mk_spec(rank=2, prefill_rank=2, rank_v=0, prefill_rank_v=0)
    cache = rand_cache(rng, spec, 256)
    assert np.abs(np.asarray(cache.vqt)).max() == 0.0
    assert np.abs(np.asarray(cache.kqt)).max() > 0.0
    q = jnp.asarray(rng.standard_normal(
        (spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


@pytest.mark.parametrize("abl", ["", "kseg", "noseg", "nobnd"])
def test_kernel_outlier_scatter_strategies_agree(rng, abl):
    """All outlier scatter strategies must match the XLA restore path:
    default = K one-hot token scatter + V boundary segmented-sum (measured
    fastest at hb>=4 on v5e), "kseg" = boundary on both, "noseg" = one-hot
    on both (lane-gather kept), "nobnd" = the pure one-hot fallback with no
    lane gathers. d=128 so ko_store pads 20 -> 128 (the padded entries are
    zero-delta no-ops)."""
    spec = mk_spec(outliers_per_block=20, base_bits=8)
    assert spec.ko_store == 128
    shape = (spec.batch, spec.num_kv_heads, 256, spec.head_dim)
    k = rng.standard_normal(shape).astype(np.float32)
    v = rng.standard_normal(shape).astype(np.float32)
    k += 8.0 * rng.standard_normal(shape).astype(np.float32) * (
        rng.random(shape) < 0.01)
    cache = C.prefill(spec, jnp.asarray(k), jnp.asarray(v))
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 4, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, cache, q)
    got = K.attend_fused(spec, cache, q, interpret=True,
                         ablate=frozenset([abl]) if abl else frozenset())
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_sorted_outlier_boundary_table_semantics(rng):
    """bnd[..., t] = (# entries with key <= t) - 1 over the SORTED entries;
    K sorted by token, V sorted by channel (cache._sort_outliers)."""
    spec = mk_spec(outliers_per_block=164, batch=1, num_kv_heads=1)
    cache = rand_cache(rng, spec, 256)
    d, g = spec.head_dim, spec.group
    ki = np.asarray(C._unpack_oidx(cache.k_out_idx))[0, 0]
    kb = np.asarray(cache.k_out_bnd)[0, 0]
    vi = np.asarray(C._unpack_oidx(cache.v_out_idx))[0, 0]
    vb = np.asarray(cache.v_out_bnd)[0, 0]
    for n in range(ki.shape[0]):
        kk, vk = ki[n] // d, vi[n] % d
        assert np.all(np.diff(kk) >= 0) and np.all(np.diff(vk) >= 0)
        for t in range(0, 128, 17):
            assert kb[n, t] == np.sum(kk <= t) - 1
            assert vb[n, t] == np.sum(vk <= t) - 1
