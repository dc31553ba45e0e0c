"""Sequence-parallel compressed-KV attention on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from gear_tpu import cache as C
from gear_tpu.parallel import context as ctx

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs >=4 virtual devices"
)


def mk(rng, s, max_len=512):
    spec = C.CacheSpec(batch=1, num_kv_heads=2, head_dim=32, max_len=max_len,
                       bits=4, group=32, rank=2, prefill_rank=4,
                       lowrank_loop=3, dtype=jnp.float32,
                       sideband_dtype=jnp.float32)
    shape = (1, 2, s, 32)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    return spec, C.prefill(spec, k, v)


def test_attend_partial_merge_equals_attend(rng):
    """Merging the partial state with an empty partner == plain attend."""
    spec, cache = mk(rng, 200)
    q = jnp.asarray(rng.standard_normal((1, 4, 1, 32)).astype(np.float32))
    want = C.attend(spec, cache, q)
    acc, m, l = C.attend_partial(spec, cache, q)
    got = C.merge_partials([(acc, m, l)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_split_cache_partials_merge(rng):
    """Splitting the cache into shards and merging partials reproduces the
    single-device attention (host-side, no mesh)."""
    spec, cache = mk(rng, 512)
    n = 4
    q = jnp.asarray(rng.standard_normal((1, 4, 1, 32)).astype(np.float32))
    want = C.attend(spec, cache, q)

    sharded = ctx.split_cache(spec, cache, n)
    lspec = ctx.shard_spec(spec, n)
    parts = []
    for i in range(n):
        local = jax.tree.map(lambda x: x[i], sharded)
        parts.append(C.attend_partial(lspec, local, q))
    got = C.merge_partials(parts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_split_cache_with_residual_and_pad(rng):
    spec, cache = mk(rng, 300)  # 288 compressed + 12 residual
    assert int(cache.resid_len) == 12
    n = 4
    q = jnp.asarray(rng.standard_normal((1, 2, 1, 32)).astype(np.float32))
    pad = jnp.asarray([37], jnp.int32)
    want = C.attend(spec, cache, q, pad_start=pad)
    sharded = ctx.split_cache(spec, cache, n)
    lspec = ctx.shard_spec(spec, n)
    parts = []
    for i in range(n):
        local = jax.tree.map(lambda x: x[i], sharded)
        parts.append(C.attend_partial(
            lspec, local, q, pad_start=pad,
            token_offset=i * lspec.max_len))
    got = C.merge_partials(parts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_seq_sharded_attend_on_mesh(rng):
    spec, cache = mk(rng, 512)
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))
    q = jnp.asarray(rng.standard_normal((1, 4, 1, 32)).astype(np.float32))
    want = C.attend(spec, cache, q)
    sharded = ctx.split_cache(spec, cache, n)
    got = ctx.seq_sharded_attend(spec, sharded, q, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_seq_sharded_attend_pad_and_residual_on_mesh(rng):
    spec, cache = mk(rng, 300)
    n = 4
    mesh = Mesh(np.array(jax.devices()[:n]), ("seq",))
    q = jnp.asarray(rng.standard_normal((1, 2, 1, 32)).astype(np.float32))
    pad = jnp.asarray([21], jnp.int32)
    want = C.attend(spec, cache, q, pad_start=pad)
    sharded = ctx.split_cache(spec, cache, n)
    got = ctx.seq_sharded_attend(spec, sharded, q, mesh, pad_start=pad)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_engine_seq_parallel_matches_plain(rng):
    """Engine decode with seq-sharded compressed KV (shard_seq) emits the
    same greedy tokens as the plain fused engine."""
    from jax.sharding import Mesh
    from gear_tpu.config import CompressionConfig
    from gear_tpu.engine import EngineConfig, InferenceEngine
    from gear_tpu.models import llama

    cfg = llama.ModelConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    comp = CompressionConfig(num_layers=cfg.num_layers,
                             compress_method="GEARL", quantize_bit=8,
                             group_size=16, rank=2, prefill_rank=2, loop=2)
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    n_new = 40  # crosses two residual flushes on the last shard

    plain = InferenceEngine(cfg, params, comp,
                            EngineConfig(max_len=128, mode="fused"),
                            batch_size=2)
    want = plain.generate(prompts, n_new)

    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    eng = InferenceEngine(cfg, params, comp,
                          EngineConfig(max_len=128, mode="fused"),
                          batch_size=2).shard_seq(mesh)
    got = eng.generate(prompts, n_new)
    assert got == want, (got, want)
