"""H2O heavy-hitter eviction cache tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu import h2o


def mk_spec(**kw):
    base = dict(batch=1, num_kv_heads=2, head_dim=16, budget=16, important=8,
                dtype=jnp.float32)
    base.update(kw)
    return h2o.H2OSpec(**base)


def rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_append_until_budget(rng):
    spec = mk_spec()
    c = h2o.init(spec)
    for i in range(10):
        c = h2o.append(spec, c, rand(rng, 1, 2, 1, 16), rand(rng, 1, 2, 1, 16), i)
    assert int(c.length) == 10
    assert np.asarray(c.pos)[0, 0, :10].tolist() == list(range(10))


def test_eviction_keeps_budget_and_recents(rng):
    spec = mk_spec(budget=16, important=8)
    c = h2o.init(spec)
    q = rand(rng, 1, 4, 1, 16)
    step = jax.jit(lambda c, k, v, p: h2o.attend(
        spec, h2o.append(spec, c, k, v, p), q)[1])
    for i in range(22):
        c = step(c, rand(rng, 1, 2, 1, 16), rand(rng, 1, 2, 1, 16), i)
    assert int(c.length) <= spec.budget
    pos = np.asarray(c.pos)[0, 0]
    # The most recent positions must survive eviction.
    assert 21 in pos.tolist()
    assert 20 in pos.tolist()


def test_heavy_hitter_survives(rng):
    """A position that dominates attention mass must not be evicted."""
    spec = mk_spec(budget=8, important=4, num_kv_heads=1)
    c = h2o.init(spec)
    big_k = jnp.ones((1, 1, 1, 16)) * 2.0  # attracts high scores for q ~ 1
    q = jnp.ones((1, 1, 1, 16))
    c = h2o.append(spec, c, big_k, big_k, 0)
    for i in range(1, 14):
        c = h2o.append(spec, c, rand(rng, 1, 1, 1, 16) * 0.1,
                       rand(rng, 1, 1, 1, 16), i)
        _, c = h2o.attend(spec, c, q)
    assert 0 in np.asarray(c.pos)[0, 0].tolist(), "heavy hitter evicted"


def test_attend_matches_exact_before_eviction(rng):
    spec = mk_spec(budget=32, important=16)
    c = h2o.init(spec)
    ks, vs = [], []
    for i in range(12):
        k1 = rand(rng, 1, 2, 1, 16)
        v1 = rand(rng, 1, 2, 1, 16)
        ks.append(k1), vs.append(v1)
        c = h2o.append(spec, c, k1, v1, i)
    q = rand(rng, 1, 4, 1, 16)
    out, _ = h2o.attend(spec, c, q)
    k_all = jnp.concatenate(ks, axis=2)
    v_all = jnp.concatenate(vs, axis=2)
    qg = q.reshape(1, 2, 2, 16)
    s = jnp.einsum("bhqd,bhtd->bhqt", qg, k_all) * (16 ** -0.5)
    w = jax.nn.softmax(s, axis=-1)
    want = jnp.einsum("bhqt,bhtd->bhqd", w, v_all).reshape(1, 4, 1, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_jit_compatible(rng):
    spec = mk_spec(budget=8, important=4)
    step = jax.jit(lambda c, k, v, p, q: h2o.attend(
        spec, h2o.append(spec, c, k, v, p), q))
    c = h2o.init(spec)
    q = rand(rng, 1, 4, 1, 16)
    for i in range(12):  # crosses eviction under jit
        out, c = step(c, rand(rng, 1, 2, 1, 16), rand(rng, 1, 2, 1, 16), i, q)
    assert np.isfinite(np.asarray(out)).all()
    assert int(c.length) <= spec.budget
