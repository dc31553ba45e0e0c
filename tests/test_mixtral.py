"""Mixtral MoE: routing semantics + end-to-end decode with compressed KV."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu.config import CompressionConfig
from gear_tpu.models import mixtral


@pytest.fixture(scope="module")
def tiny():
    cfg = mixtral.MixtralConfig.tiny()
    params = mixtral.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_moe_block_topk_routing(rng):
    """Gate keeps exactly top-k experts, renormalized to sum 1."""
    e, ne, f = 16, 4, 32
    x = jnp.asarray(rng.standard_normal((1, 3, e)).astype(np.float32))
    router = jnp.asarray(rng.standard_normal((e, ne)).astype(np.float32))
    wg = jnp.asarray(rng.standard_normal((ne, e, f)).astype(np.float32)) * 0.1
    wu = jnp.asarray(rng.standard_normal((ne, e, f)).astype(np.float32)) * 0.1
    wd = jnp.asarray(rng.standard_normal((ne, f, e)).astype(np.float32)) * 0.1
    out = mixtral.moe_block(x, router, wg, wu, wd, top_k=2)
    assert out.shape == x.shape
    # Reference: manual top-2 mixture.
    logits = np.asarray(x) @ np.asarray(router)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want = np.zeros_like(np.asarray(x))
    for b in range(1):
        for s in range(3):
            top2 = np.argsort(probs[b, s])[-2:]
            w = probs[b, s, top2] / probs[b, s, top2].sum()
            for wi, ei in zip(w, top2):
                xe = np.asarray(x)[b, s]
                hg = xe @ np.asarray(wg)[ei]
                hu = xe @ np.asarray(wu)[ei]
                act = hg / (1 + np.exp(-hg)) * hu
                want[b, s] += wi * (act @ np.asarray(wd)[ei])
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)


def test_mixtral_prefill_decode_compressed(tiny):
    cfg, params = tiny
    comp = CompressionConfig(num_layers=cfg.num_layers, quantize_bit=8,
                             group_size=16, rank=2, prefill_rank=2, loop=2)
    spec = cfg.cache_spec(1, 64, comp.layer(0))
    tokens = jnp.asarray([[1, 2, 3, 4] * 4], jnp.int32)
    mask = jnp.ones_like(tokens)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    logits, caches = mixtral.forward_prefill(
        params, cfg, tokens, positions, mask, spec, compress=True)
    assert logits.shape == (1, 16, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    step_logits, caches = mixtral.forward_decode(
        params, cfg, jnp.asarray([7], jnp.int32), jnp.asarray([16], jnp.int32),
        caches, spec=spec, compress=True)
    assert step_logits.shape == (1, cfg.vocab_size)
    assert np.isfinite(np.asarray(step_logits)).all()


def test_mixtral_compressed_tracks_uncompressed(tiny):
    """INT8-compressed decode logits stay close to raw-cache logits."""
    cfg, params = tiny
    comp = CompressionConfig(num_layers=cfg.num_layers, quantize_bit=8,
                             group_size=16, rank=2, prefill_rank=4, loop=2)
    spec = cfg.cache_spec(1, 64, comp.layer(0))
    tokens = jnp.asarray([[5, 9, 2, 8] * 4], jnp.int32)
    mask = jnp.ones_like(tokens)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)

    outs = {}
    for compress in (True, False):
        _, caches = mixtral.forward_prefill(
            params, cfg, tokens, positions, mask, spec, compress=compress)
        logits, _ = mixtral.forward_decode(
            params, cfg, jnp.asarray([7], jnp.int32),
            jnp.asarray([16], jnp.int32), caches, spec=spec,
            compress=compress)
        outs[compress] = np.asarray(logits, np.float32)
    assert np.argmax(outs[True]) == np.argmax(outs[False])


def test_expert_parallel_matches_dense_mixture(rng):
    """moe_block_ep over a 4-device `expert` mesh == the single-device dense
    mixture, and a full EP decode step matches the non-EP step."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from gear_tpu.models import mixtral as MX

    if jax.device_count() < 4:
        import pytest
        pytest.skip("needs >= 4 devices")
    cfg = MX.MixtralConfig.tiny()
    params = MX.init_params(jax.random.PRNGKey(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("expert",))

    x = jnp.asarray(rng.standard_normal(
        (2, 5, cfg.hidden_size)).astype(np.float32)).astype(cfg.dtype)
    lp = jax.tree.map(lambda p: p[0], params["layers"])
    want = MX.moe_block(x, lp["router"], lp["wg"], lp["wu"], lp["wd"],
                        cfg.experts_per_token)
    got = MX.moe_block_ep(x, lp["router"], lp["wg"], lp["wu"], lp["wd"],
                          cfg.experts_per_token, mesh)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=5e-2, atol=5e-3)

    # full decode step parity (EP vs not), compressed cache
    from gear_tpu import cache as C
    spec = cfg.cache_spec(1, 64, __import__(
        "gear_tpu.config", fromlist=["CompressionConfig"]
    ).CompressionConfig(num_layers=cfg.num_layers, quantize_bit=8,
                        group_size=16, rank=2, prefill_rank=2,
                        loop=2).layer(0))
    tokens = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    positions = jnp.arange(4)[None]
    mask = jnp.ones_like(tokens)
    _, caches = MX.forward_prefill(params, cfg, tokens, positions, mask,
                                   spec, compress=True)
    tok = jnp.asarray([5], jnp.int32)
    pos = jnp.asarray([4], jnp.int32)
    l0, _ = MX.forward_decode(params, cfg, tok, pos, caches, spec=spec,
                              compress=True)
    l1, _ = MX.forward_decode(params, cfg, tok, pos, caches, spec=spec,
                              compress=True, ep_mesh=mesh)
    assert int(jnp.argmax(l0[0])) == int(jnp.argmax(l1[0]))
