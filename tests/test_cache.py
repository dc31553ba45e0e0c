"""Tests for the two-tier compressed KV cache and its fused-semantics attention.

Mirrors the reference acceptance protocol (quant/test.py: streaming KV cache
replayed against exact attention; gemv.py: fused product vs dequantized
reference) with asserted tolerances.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu import cache as C


def mk_spec(**kw):
    base = dict(batch=1, num_kv_heads=2, head_dim=32, max_len=256, bits=4,
                group=32, rank=2, prefill_rank=4, lowrank_loop=3,
                dtype=jnp.float32, sideband_dtype=jnp.float32)
    base.update(kw)
    return C.CacheSpec(**base)


def rand_kv(rng, spec, s):
    shape = (spec.batch, spec.num_kv_heads, s, spec.head_dim)
    return (jnp.asarray(rng.standard_normal(shape).astype(np.float32)),
            jnp.asarray(rng.standard_normal(shape).astype(np.float32)))


def reconstruct_valid(spec, cache):
    """Full reconstructed KV seen by attention: prefix (dequant+lowrank) up to
    comp_len, then residual up to resid_len."""
    k_pre, v_pre = C.dequantize_kv(spec, cache)
    cl = int(cache.comp_len)
    rl = int(cache.resid_len)
    k = jnp.concatenate([k_pre[:, :, :cl], cache.k_resid[:, :, :rl]], axis=2)
    v = jnp.concatenate([v_pre[:, :, :cl], cache.v_resid[:, :, :rl]], axis=2)
    return k, v


def exact_attention(q, k, v, sm_scale):
    qf = q.astype(jnp.float32)
    b, hq, qn, d = q.shape
    hkv = k.shape[1]
    gq = hq // hkv
    qg = qf.reshape(b, hkv, gq * qn, d)
    s = jnp.einsum("bhqd,bhtd->bhqt", qg, k.astype(jnp.float32)) * sm_scale
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqt,bhtd->bhqd", w, v.astype(jnp.float32))
    return o.reshape(b, hq, qn, d)


def rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.abs(a - b).mean() / (np.abs(b).mean() + 1e-12)


# -------------------------- prefill --------------------------------------

def test_prefill_reconstruction_int4(rng):
    spec = mk_spec()
    k, v = rand_kv(rng, spec, 96)  # 96 = 3 blocks of 32
    cache = C.prefill(spec, k, v)
    assert int(cache.comp_len) == 96 and int(cache.resid_len) == 0
    k_rec, v_rec = C.dequantize_kv(spec, cache)
    # INT4 + rank-4 on worst-case N(0,1) data: ~0.07 mean rel err (real KV
    # tensors are far more structured; accuracy is gated end-to-end instead).
    assert rel(k_rec[:, :, :96], k) < 0.1
    assert rel(v_rec[:, :, :96], v) < 0.1


def test_prefill_tail_goes_to_residual(rng):
    spec = mk_spec()
    k, v = rand_kv(rng, spec, 40)  # 32 full + 8 tail
    cache = C.prefill(spec, k, v)
    assert int(cache.comp_len) == 32 and int(cache.resid_len) == 8
    np.testing.assert_allclose(
        np.asarray(cache.k_resid[:, :, :8]), np.asarray(k[:, :, 32:]), rtol=1e-2, atol=1e-2
    )


def test_lowrank_improves_prefill(rng):
    spec2 = mk_spec(bits=2, prefill_rank=8)
    k, v = rand_kv(rng, spec2, 128)
    c_lr = C.prefill(spec2, k, v, use_lowrank=True)
    c_nl = C.prefill(spec2, k, v, use_lowrank=False)
    k_lr, _ = C.dequantize_kv(spec2, c_lr)
    k_nl, _ = C.dequantize_kv(spec2, c_nl)
    assert rel(k_lr[:, :, :128], k) < rel(k_nl[:, :, :128], k)


# -------------------------- append / flush -------------------------------

def test_append_and_flush(rng):
    spec = mk_spec()
    k0, v0 = rand_kv(rng, spec, 32)
    cache = C.prefill(spec, k0, v0)
    ks, vs = rand_kv(rng, spec, spec.group)
    step = jax.jit(lambda c, kn, vn: C.append(spec, c, kn, vn))
    for i in range(spec.group):
        cache = step(cache, ks[:, :, i:i+1], vs[:, :, i:i+1])
    # One full group appended -> exactly one flush.
    assert int(cache.comp_len) == 64
    assert int(cache.resid_len) == 0
    k_rec, _ = C.dequantize_kv(spec, cache)
    assert rel(k_rec[:, :, 32:64], ks) < 0.1


def test_append_partial_stays_in_residual(rng):
    spec = mk_spec()
    cache = C.init_layer_cache(spec)
    ks, vs = rand_kv(rng, spec, 5)
    for i in range(5):
        cache = C.append(spec, cache, ks[:, :, i:i+1], vs[:, :, i:i+1])
    assert int(cache.comp_len) == 0 and int(cache.resid_len) == 5
    np.testing.assert_allclose(
        np.asarray(cache.k_resid[:, :, :5]), np.asarray(ks), rtol=1e-2, atol=1e-2
    )


def test_streaming_matches_exact_attention(rng):
    """Replay decode steps against exact attention on the ORIGINAL fp values
    (reference protocol: quant/test.py:126-167 test_streaming_kvcache)."""
    spec = mk_spec(bits=4)
    s0 = 64
    k_all, v_all = rand_kv(rng, spec, s0 + 16)
    cache = C.prefill(spec, k_all[:, :, :s0], v_all[:, :, :s0])
    hq = spec.num_kv_heads * 2
    sm = spec.head_dim ** -0.5
    step = jax.jit(lambda c, kn, vn: C.append(spec, c, kn, vn))
    att = jax.jit(lambda c, q: C.attend(spec, c, q, sm_scale=sm))
    for i in range(6):
        cache = step(cache, k_all[:, :, s0+i:s0+i+1], v_all[:, :, s0+i:s0+i+1])
        q = jnp.asarray(
            rng.standard_normal((spec.batch, hq, 1, spec.head_dim)).astype(np.float32)
        )
        got = att(cache, q)
        want = exact_attention(q, k_all[:, :, :s0+i+1], v_all[:, :, :s0+i+1], sm)
        assert rel(got, want) < 0.15, f"step {i}: {rel(got, want)}"  # INT4 on N(0,1) worst case


# -------------------------- attend ---------------------------------------

def test_attend_matches_reconstructed_reference(rng):
    """attend() == exact attention over the materialized reconstruction
    (the fused-vs-dequantized acceptance check, gemv.py:93-165)."""
    spec = mk_spec()
    k, v = rand_kv(rng, spec, 75)  # 64 compressed + 11 residual
    cache = C.prefill(spec, k, v)
    hq = spec.num_kv_heads * 4
    q = jnp.asarray(
        rng.standard_normal((spec.batch, hq, 1, spec.head_dim)).astype(np.float32)
    )
    sm = spec.head_dim ** -0.5
    got = C.attend(spec, cache, q, sm_scale=sm)
    k_ref, v_ref = reconstruct_valid(spec, cache)
    want = exact_attention(q, k_ref, v_ref, sm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_attend_gqa_matches_repeated_kv(rng):
    """GQA grouping must equal explicit repeat_kv + MHA."""
    spec = mk_spec(num_kv_heads=2)
    k, v = rand_kv(rng, spec, 64)
    cache = C.prefill(spec, k, v)
    hq = 8
    q = jnp.asarray(
        rng.standard_normal((spec.batch, hq, 1, spec.head_dim)).astype(np.float32)
    )
    sm = spec.head_dim ** -0.5
    got = C.attend(spec, cache, q, sm_scale=sm)
    k_ref, v_ref = reconstruct_valid(spec, cache)
    k_rep = jnp.repeat(k_ref, hq // 2, axis=1)
    v_rep = jnp.repeat(v_ref, hq // 2, axis=1)
    s = jnp.einsum("bhqd,bhtd->bhqt", q.astype(jnp.float32), k_rep) * sm
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhqt,bhtd->bhqd", w, v_rep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


def test_attend_pad_start_masks_prefix(rng):
    spec = mk_spec(batch=2)
    k, v = rand_kv(rng, spec, 64)
    cache = C.prefill(spec, k, v)
    q = jnp.asarray(
        rng.standard_normal((2, spec.num_kv_heads, 1, spec.head_dim)).astype(np.float32)
    )
    sm = spec.head_dim ** -0.5
    pad = jnp.asarray([0, 16], jnp.int32)
    got = C.attend(spec, cache, q, sm_scale=sm, pad_start=pad)
    # Row 1 must equal attention over tokens 16..63 only.
    k_ref, v_ref = reconstruct_valid(spec, cache)
    want_row1 = exact_attention(q[1:], k_ref[1:, :, 16:], v_ref[1:, :, 16:], sm)
    np.testing.assert_allclose(np.asarray(got[1:]), np.asarray(want_row1),
                               rtol=2e-3, atol=2e-3)


def test_append_jit_single_compile(rng):
    spec = mk_spec()
    step = jax.jit(lambda c, kn, vn: C.append(spec, c, kn, vn))
    cache = C.init_layer_cache(spec)
    kn = jnp.ones((spec.batch, spec.num_kv_heads, 1, spec.head_dim))
    for _ in range(spec.group + 3):  # crosses a flush boundary under jit
        cache = step(cache, kn, kn)
    assert int(cache.comp_len) == spec.group
    assert int(cache.resid_len) == 3


def test_memory_footprint_reported():
    spec = mk_spec(batch=1, num_kv_heads=8, head_dim=128, max_len=4096,
                   bits=4, group=64, rank=2, prefill_rank=4,
                   dtype=jnp.bfloat16, sideband_dtype=jnp.bfloat16)
    ratio = spec.bytes_fp16_baseline() / spec.bytes_compressed()
    assert ratio > 2.5, ratio  # INT4 + sidebands + bases + residual


# -------------------------- int8-quantized bases --------------------------

def test_int8_bases_reconstruction_close_to_bf16(rng):
    """base_bits=8 (reference true_poweriteration_quantized) reconstructs
    nearly as well as full-precision bases and shrinks the footprint."""
    s16 = mk_spec(bits=2, prefill_rank=8)
    s8 = mk_spec(bits=2, prefill_rank=8, base_bits=8)
    k, v = rand_kv(rng, s16, 128)
    c16 = C.prefill(s16, k, v)
    c8 = C.prefill(s8, k, v)
    k16, _ = C.dequantize_kv(s16, c16)
    k8, _ = C.dequantize_kv(s8, c8)
    e16 = rel(k16[:, :, :128], k)
    e8 = rel(k8[:, :, :128], k)
    assert e8 < e16 * 1.05, (e8, e16)  # int8 bases cost <5% extra error
    assert c8.kpt.dtype == jnp.int8
    # Memory accounting shrinks.
    assert s8.bytes_compressed() < s16.bytes_compressed()


def test_int8_bases_attend_matches_reference(rng):
    spec = mk_spec(base_bits=8)
    k, v = rand_kv(rng, spec, 96)
    cache = C.prefill(spec, k, v)
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 4, 1, spec.head_dim)).astype(np.float32))
    got = C.attend(spec, cache, q)
    k_ref, v_ref = reconstruct_valid(spec, cache)
    want = exact_attention(q, k_ref, v_ref, spec.head_dim ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_int8_bases_flush(rng):
    spec = mk_spec(base_bits=8)
    cache = C.prefill(spec, *rand_kv(rng, spec, 32))
    ks, vs = rand_kv(rng, spec, spec.group)
    step = jax.jit(lambda c, kn, vn: C.append(spec, c, kn, vn))
    for i in range(spec.group):
        cache = step(cache, ks[:, :, i:i+1], vs[:, :, i:i+1])
    assert int(cache.comp_len) == 64
    k_rec, _ = C.dequantize_kv(spec, cache)
    assert rel(k_rec[:, :, 32:64], ks) < 0.1


class TestOutliers:
    """COO outliers on the true-compressed cache (reference gears_channelQ/
    tokenQ semantics: largest/smallest values kept exact, restored before
    the low-rank error is computed)."""

    def _spec(self, **kw):
        import jax.numpy as jnp
        base = dict(batch=1, num_kv_heads=2, head_dim=128, max_len=256,
                    bits=4, group=64, rank=2, prefill_rank=4, lowrank_loop=3,
                    dtype=jnp.float32, sideband_dtype=jnp.float32)
        base.update(kw)
        return C.CacheSpec(**base)

    def test_outlier_values_restored_exactly(self, rng):
        import jax, numpy as np, jax.numpy as jnp
        spec = self._spec(outliers_per_block=32)
        shape = (1, 2, 256, 128)
        k = rng.standard_normal(shape).astype(np.float32)
        # plant extreme outliers
        k[0, 0, 3, 7] = 40.0
        k[0, 1, 70, 99] = -35.0
        kj = jnp.asarray(k)
        cache = C.prefill(spec, kj, kj, use_lowrank=False)
        k_deq = np.asarray(C._dequant_k_block(
            spec, cache.k_codes, cache.k_scale, cache.k_mn,
            cache.k_out_idx, cache.k_out_val))
        assert k_deq[0, 0, 3, 7] == 40.0
        assert k_deq[0, 1, 70, 99] == -35.0

    def test_outliers_reduce_reconstruction_error(self, rng):
        import numpy as np, jax.numpy as jnp
        shape = (1, 2, 256, 128)
        k = rng.standard_normal(shape).astype(np.float32)
        # heavy-tailed: outliers blow up the min/max range without them
        k = k + 8.0 * rng.standard_normal(shape).astype(np.float32) * (
            rng.random(shape) < 0.01)
        kj = jnp.asarray(k)
        errs = {}
        for ko in (0, 164):
            spec = self._spec(outliers_per_block=ko)
            cache = C.prefill(spec, kj, kj, use_lowrank=False)
            k_deq = np.asarray(C._dequant_k_block(
                spec, cache.k_codes, cache.k_scale, cache.k_mn,
                cache.k_out_idx, cache.k_out_val))
            errs[ko] = np.abs(k_deq - k).mean()
        assert errs[164] < 0.7 * errs[0], errs

    def test_attend_and_flush_with_outliers(self, rng):
        """GEAR (outliers + low-rank) end to end: prefill + decode appends
        across a flush; attend output closer to exact than GEARL."""
        import jax, numpy as np, jax.numpy as jnp
        from gear_tpu.models import llama as L
        shape = (1, 2, 192, 128)
        k = rng.standard_normal(shape).astype(np.float32)
        v = rng.standard_normal(shape).astype(np.float32)
        k += 8.0 * rng.standard_normal(shape).astype(np.float32) * (
            rng.random(shape) < 0.01)
        v += 8.0 * rng.standard_normal(shape).astype(np.float32) * (
            rng.random(shape) < 0.01)
        kj, vj = jnp.asarray(k), jnp.asarray(v)
        q = jnp.asarray(rng.standard_normal((1, 4, 1, 128)).astype(np.float32))
        key = jax.random.PRNGKey(0)

        outs = {}
        for ko in (0, 164):
            spec = self._spec(outliers_per_block=ko)
            cache = C.prefill(spec, kj, vj, key=key)
            step = jax.jit(lambda c, kn, spec=spec: C.append(
                spec, c, kn, kn, key=key))
            for t in range(64):  # one full flush
                kn = jnp.asarray(
                    rng.standard_normal((1, 2, 1, 128)).astype(np.float32))
                cache = step(cache, kn)
            outs[ko] = np.asarray(C.attend(spec, cache, q))
            assert np.isfinite(outs[ko]).all()
        # exact reference on the reconstructed-from-scratch cache is
        # implicit; with planted outliers GEAR must differ from GEARL
        assert not np.allclose(outs[0], outs[164])

    def test_fused_kernel_handles_outliers(self, rng):
        """Outliers keep the Pallas fast path (no XLA fallback): the fused
        kernel folds the COO deltas in-kernel and matches the XLA restore
        path within the usual bf16 kernel tolerance."""
        import numpy as np, jax.numpy as jnp
        from gear_tpu.kernels import decode as K
        spec = self._spec(outliers_per_block=16)
        shape = (1, 2, 256, 128)
        kj = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        cache = C.prefill(spec, kj, kj)
        q = jnp.asarray(rng.standard_normal((1, 4, 1, 128)).astype(np.float32))
        want = C.attend(spec, cache, q)
        got = K.attend_fused(spec, cache, q, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=8e-3)
