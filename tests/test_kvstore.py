"""Checkpoint/resume of compressed KV caches via the native codec."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu import cache as C
from gear_tpu.runtime import kvstore


def mk_cache(rng, s=96):
    spec = C.CacheSpec(batch=1, num_kv_heads=2, head_dim=32, max_len=128,
                       bits=4, group=32, rank=2, prefill_rank=4,
                       lowrank_loop=2, dtype=jnp.float32,
                       sideband_dtype=jnp.float32)
    shape = (1, 2, s, 32)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    return spec, C.prefill(spec, k, v)


def test_native_lib_loaded():
    # The .so is committed-buildable via `make -C native`; this environment
    # builds it in-repo, so the native path must be active.
    assert kvstore.native_available()


def test_roundtrip_exact(rng, tmp_path):
    spec, cache = mk_cache(rng)
    p = kvstore.save_cache(tmp_path / "snap.gear", cache)
    restored = kvstore.load_cache(p, cache)
    for a, b in zip(jax.tree.leaves(cache), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_bf16(rng, tmp_path):
    spec, cache = mk_cache(rng)
    cache_bf = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        cache)
    p = kvstore.save_cache(tmp_path / "snap_bf.gear", cache_bf)
    restored = kvstore.load_cache(p, cache_bf)
    for a, b in zip(jax.tree.leaves(cache_bf), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_corruption_detected(rng, tmp_path):
    spec, cache = mk_cache(rng)
    p = kvstore.save_cache(tmp_path / "snap2.gear", cache)
    data = bytearray(p.read_bytes())
    data[200] ^= 0xFF  # flip a payload byte
    p.write_bytes(bytes(data))
    with pytest.raises(IOError):
        kvstore.load_cache(p, cache)


def test_snapshot_smaller_than_fp16(rng, tmp_path):
    """At production dtypes (bf16 sidebands) the snapshot undercuts fp16 KV."""
    spec = C.CacheSpec(batch=1, num_kv_heads=4, head_dim=128, max_len=1024,
                       bits=4, group=64, rank=2, prefill_rank=4,
                       lowrank_loop=2, dtype=jnp.bfloat16,
                       sideband_dtype=jnp.bfloat16)
    shape = (1, 4, 1024, 128)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cache = C.prefill(spec, k, v)
    p = kvstore.save_cache(tmp_path / "snap3.gear", cache)
    assert p.stat().st_size < spec.bytes_fp16_baseline() / 2


def test_resume_generation_continues(rng, tmp_path):
    """Save caches mid-generation, restore, and confirm identical attention."""
    spec, cache = mk_cache(rng)
    q = jnp.asarray(rng.standard_normal((1, 2, 1, 32)).astype(np.float32))
    want = C.attend(spec, cache, q)
    p = kvstore.save_cache(tmp_path / "snap4.gear", cache)
    restored = kvstore.load_cache(p, cache)
    got = C.attend(spec, restored, q)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
