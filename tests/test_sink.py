"""StreamingLLM sink-cache tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu import sink
from gear_tpu.models.llama import apply_rope, rope_cos_sin


def mk_spec(**kw):
    base = dict(batch=1, num_kv_heads=2, head_dim=16, num_sink=2, window=6,
                dtype=jnp.float32)
    base.update(kw)
    return sink.SinkSpec(**base)


def rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_relative_positions_before_wrap():
    spec = mk_spec()
    pos = np.asarray(sink._relative_positions(spec, jnp.int32(5)))
    # 5 tokens: sinks 0,1 then window slots 2,3,4 -> positions 2,3,4
    assert pos[:5].tolist() == [0, 1, 2, 3, 4]
    assert (pos[5:] == -1).all()


def test_relative_positions_after_wrap():
    spec = mk_spec()  # capacity 8
    pos = np.asarray(sink._relative_positions(spec, jnp.int32(11)))
    # 11 tokens: sinks keep 0,1; window holds tokens 5..10 at positions 2..7.
    assert pos[0] == 0 and pos[1] == 1
    assert sorted(pos[2:].tolist()) == [2, 3, 4, 5, 6, 7]


def test_attend_matches_exact_before_eviction(rng):
    """While nothing has been evicted, sink attention == standard attention
    with absolute positions."""
    spec = mk_spec()
    c = sink.init(spec)
    ks, vs = [], []
    n = 7  # < capacity
    for i in range(n):
        k1, v1 = rand(rng, 1, 2, 1, 16), rand(rng, 1, 2, 1, 16)
        ks.append(k1), vs.append(v1)
        c = sink.append(spec, c, k1, v1)
    q = rand(rng, 1, 2, 1, 16)
    got = sink.attend(spec, c, q)

    # Reference: rotate each k at its absolute position, q at position n-1.
    k_all = jnp.concatenate(ks, axis=2)
    pos = jnp.arange(n)[None]
    cos, sin_ = rope_cos_sin(pos, 16, spec.rope_theta)
    k_rot = apply_rope(k_all, cos, sin_)
    cq, sq = rope_cos_sin(jnp.asarray([[n - 1]]), 16, spec.rope_theta)
    q_rot = apply_rope(q, cq, sq)
    s = jnp.einsum("bhqd,bhtd->bhqt", q_rot, k_rot) * (16 ** -0.5)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhqt,bhtd->bhqd", w, jnp.concatenate(vs, axis=2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_bounded_memory_long_stream(rng):
    spec = mk_spec()
    c = sink.init(spec)
    q = rand(rng, 1, 2, 1, 16)
    step = jax.jit(lambda c, k, v: sink.append(spec, c, k, v))
    for i in range(20):  # 2.5x capacity
        c = step(c, rand(rng, 1, 2, 1, 16), rand(rng, 1, 2, 1, 16))
    out = sink.attend(spec, c, q)
    assert np.isfinite(np.asarray(out)).all()
    assert c.k.shape[2] == spec.capacity  # fixed memory
    assert int(c.length) == 20
