"""Blockwise (flash-style) prefill attention == dense causal attention.

Long prompts must not materialize the O(S^2) score tensor (8k ctx = 8.6 GB
f32 at 32 heads); models/llama.py switches to a lax.scan online-softmax
form past a threshold."""
import numpy as np

import jax.numpy as jnp

from gear_tpu.models import llama as L


def _data(b=2, hq=8, hkv=4, s=384, d=64, seed=1):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, hq, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, hkv, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, hkv, s, d)).astype(np.float32))
    am = jnp.asarray((np.arange(s)[None, :]
                      >= np.array([[5], [100]])).astype(np.int32))
    return q, k, v, am


def test_blockwise_matches_dense():
    q, k, v, am = _data()
    dense = L.causal_attention(q, k, v, am, None,
                               blockwise_threshold=10**9)
    blk = L._causal_attention_blockwise(q, k, v, am, None, chunk=128)
    np.testing.assert_allclose(np.asarray(blk, np.float32),
                               np.asarray(dense, np.float32),
                               rtol=1e-4, atol=1e-5)


def test_blockwise_sliding_window():
    q, k, v, am = _data(seed=3)
    dense = L.causal_attention(q, k, v, am, 96, blockwise_threshold=10**9)
    blk = L._causal_attention_blockwise(q, k, v, am, 96, chunk=128)
    np.testing.assert_allclose(np.asarray(blk, np.float32),
                               np.asarray(dense, np.float32),
                               rtol=1e-4, atol=1e-5)


def test_blockwise_nondivisible_chunk():
    # s=320: chunk 512 halves down to 64 automatically
    q, k, v, am = _data(s=320, seed=5)
    dense = L.causal_attention(q, k, v, am, None,
                               blockwise_threshold=10**9)
    blk = L._causal_attention_blockwise(q, k, v, am, None)
    np.testing.assert_allclose(np.asarray(blk, np.float32),
                               np.asarray(dense, np.float32),
                               rtol=1e-4, atol=1e-5)
