"""Mixtral (sparse MoE) with compressed-KV attention.

Behavioral reference: GenerationBench/GenerationTest/GEARLM/Simulated/
modeling_mixtral.py — the reference vendors the HF Mixtral model
(MixtralSparseMoeBlock :782) but wires NO compression hooks into it (survey
A9: dead weight signaling intended MoE support). Here the MoE block plugs
into the same attention/cache stack as Llama, so every compression scheme
works for Mixtral too — closing that reference gap.

TPU-native MoE formulation: top-k routing with a DENSE weighted mixture —
every expert runs and results are combined with the (renormalized) top-k
gate weights (zero for non-selected experts). This trades FLOPs for static
shapes and zero gather/scatter; expert-parallel sharding over a mesh axis
is the later-round optimization (survey §2.5: EP out of scope for v1).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import cache as kvcache
from ..cache import CacheSpec
from .llama import (ModelConfig, _split_heads, apply_rope, causal_attention,
                    logits_from_hidden, raw_append, raw_attend, raw_prefill,
                    rmsnorm, rope_cos_sin)


@dataclass(frozen=True)
class MixtralConfig(ModelConfig):
    num_experts: int = 8
    experts_per_token: int = 2

    @classmethod
    def tiny(cls, **kw) -> "MixtralConfig":
        base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                    num_experts=4, experts_per_token=2,
                    max_position_embeddings=512)
        base.update(kw)
        return cls(**base)

    @classmethod
    def mixtral_8x7b(cls) -> "MixtralConfig":
        return cls(vocab_size=32000, hidden_size=4096,
                   intermediate_size=14336, num_layers=32, num_heads=32,
                   num_kv_heads=8, head_dim=128, rope_theta=1000000.0,
                   max_position_embeddings=32768, num_experts=8,
                   experts_per_token=2)

    @classmethod
    def from_hf(cls, cfg: dict) -> "MixtralConfig":
        base = ModelConfig.from_hf(cfg)
        return cls(**{**base.__dict__,
                      "num_experts": cfg.get("num_local_experts", 8),
                      "experts_per_token": cfg.get("num_experts_per_tok", 2)})


def init_params(key: jax.Array, cfg: MixtralConfig) -> dict:
    """Random init; HF loading via models.loader semantics can map
    block_sparse_moe.experts.*.w{1,2,3} into the stacked layout."""
    e, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    ne = cfg.num_experts
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 12)
    dt = cfg.dtype

    def init(k, *shape, scale):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    return {
        "embed": init(keys[0], cfg.vocab_size, e, scale=0.02),
        "layers": {
            "attn_norm": jnp.ones((l, e), dt),
            "mlp_norm": jnp.ones((l, e), dt),
            "wq": init(keys[1], l, e, hq * dh, scale=e ** -0.5),
            "wk": init(keys[2], l, e, hkv * dh, scale=e ** -0.5),
            "wv": init(keys[3], l, e, hkv * dh, scale=e ** -0.5),
            "wo": init(keys[4], l, hq * dh, e, scale=(hq * dh) ** -0.5),
            "router": init(keys[5], l, e, ne, scale=e ** -0.5),
            "wg": init(keys[6], l, ne, e, f, scale=e ** -0.5),
            "wu": init(keys[7], l, ne, e, f, scale=e ** -0.5),
            "wd": init(keys[8], l, ne, f, e, scale=f ** -0.5),
        },
        "final_norm": jnp.ones((e,), dt),
        "lm_head": init(keys[9], e, cfg.vocab_size, scale=e ** -0.5),
    }


def moe_block(x: jax.Array, router: jax.Array, wg, wu, wd, top_k: int):
    """Sparse-MoE FFN as a dense weighted mixture (static shapes).

    x [B,S,E]; router [E,NE]; wg/wu [NE,E,F]; wd [NE,F,E].
    Routing follows HF Mixtral: softmax over experts, keep top-k, renormalize
    (reference modeling_mixtral.py MixtralSparseMoeBlock semantics).
    """
    logits = (x.astype(jnp.float32) @ router.astype(jnp.float32))  # [B,S,NE]
    probs = jax.nn.softmax(logits, axis=-1)
    top_vals, _ = jax.lax.top_k(probs, top_k)
    thresh = top_vals[..., -1:]
    gate = jnp.where(probs >= thresh, probs, 0.0)
    gate = gate / jnp.sum(gate, axis=-1, keepdims=True)
    # Dense mixture over experts.
    h_g = jnp.einsum("bse,nef->bnsf", x, wg)
    h_u = jnp.einsum("bse,nef->bnsf", x, wu)
    h = jax.nn.silu(h_g) * h_u
    out = jnp.einsum("bnsf,nfe->bnse", h, wd)
    return jnp.einsum("bnse,bsn->bse", out.astype(jnp.float32),
                      gate).astype(x.dtype)


def moe_block_ep(x, router, wg, wu, wd, top_k: int, mesh, axis="expert"):
    """EXPERT-PARALLEL sparse-MoE FFN: expert weights sharded on their
    leading NE axis over the mesh's ``axis``; every device computes the
    routing identically (router is replicated), evaluates only its LOCAL
    experts, and the weighted partial outputs merge with one psum.

    survey §2.5: the reference ships the Mixtral fork with no EP (and no
    compression hooks); this is new capability.
    """
    from functools import partial as _partial
    from jax.sharding import PartitionSpec as P

    ne = router.shape[-1]
    n_shards = mesh.shape[axis]
    nel = ne // n_shards

    @_partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
    )
    def run(x_rep, router_rep, wg_l, wu_l, wd_l):
        logits = (x_rep.astype(jnp.float32)
                  @ router_rep.astype(jnp.float32))          # [B,S,NE]
        probs = jax.nn.softmax(logits, axis=-1)
        top_vals, _ = jax.lax.top_k(probs, top_k)
        thresh = top_vals[..., -1:]
        gate = jnp.where(probs >= thresh, probs, 0.0)
        gate = gate / jnp.sum(gate, axis=-1, keepdims=True)
        shard = jax.lax.axis_index(axis)
        gate_l = jax.lax.dynamic_slice_in_dim(
            gate, shard * nel, nel, axis=-1)                 # [B,S,NEL]
        h_g = jnp.einsum("bse,nef->bnsf", x_rep, wg_l)
        h_u = jnp.einsum("bse,nef->bnsf", x_rep, wu_l)
        h = jax.nn.silu(h_g) * h_u
        out = jnp.einsum("bnsf,nfe->bnse", h, wd_l)
        part = jnp.einsum("bnse,bsn->bse", out.astype(jnp.float32), gate_l)
        return jax.lax.psum(part, axis).astype(x_rep.dtype)

    return run(x, router, wg, wu, wd)


def _moe(x, lp, cfg, ep_mesh, ep_axis):
    if ep_mesh is not None:
        return moe_block_ep(x, lp["router"], lp["wg"], lp["wu"], lp["wd"],
                            cfg.experts_per_token, ep_mesh, axis=ep_axis)
    return moe_block(x, lp["router"], lp["wg"], lp["wu"], lp["wd"],
                     cfg.experts_per_token)


def forward_prefill(params, cfg: MixtralConfig, tokens, positions, attn_mask,
                    spec: CacheSpec | None, *, compress=True, prng=None,
                    ep_mesh=None, ep_axis="expert"):
    h = params["embed"][tokens].astype(cfg.dtype)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    if prng is None:
        prng = jax.random.PRNGKey(0)
    layer_keys = jax.random.split(prng, cfg.num_layers)

    def body(h, xs):
        lp, lkey = xs
        x = rmsnorm(h, lp["attn_norm"], cfg.rms_eps)
        q = _split_heads(x @ lp["wq"], cfg.num_heads, cfg.head_dim)
        k = _split_heads(x @ lp["wk"], cfg.num_kv_heads, cfg.head_dim)
        v = _split_heads(x @ lp["wv"], cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = causal_attention(q, k, v, attn_mask, cfg.sliding_window)
        b, s = tokens.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + _moe(x2, lp, cfg, ep_mesh, ep_axis)
        if spec is None:
            lc = (k, v)
        elif compress:
            lc = kvcache.prefill(spec, k, v, key=lkey)
        else:
            lc = raw_prefill(spec, k, v)
        return h, lc

    h, caches = jax.lax.scan(body, h, (params["layers"], layer_keys))
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    return logits_from_hidden(params, cfg, h), caches


def forward_decode(params, cfg: MixtralConfig, token, position, caches, *,
                   spec: CacheSpec | None, compress=True, pad_start=None,
                   prng=None, ep_mesh=None, ep_axis="expert"):
    b = token.shape[0]
    h = params["embed"][token].astype(cfg.dtype)[:, None]
    cos, sin = rope_cos_sin(position[:, None], cfg.head_dim, cfg.rope_theta)
    if prng is None:
        prng = jax.random.PRNGKey(0)
    layer_keys = jax.random.split(prng, cfg.num_layers)

    def body(h, xs):
        lp, lcache, lkey = xs
        x = rmsnorm(h, lp["attn_norm"], cfg.rms_eps)
        q = _split_heads(x @ lp["wq"], cfg.num_heads, cfg.head_dim)
        k = _split_heads(x @ lp["wk"], cfg.num_kv_heads, cfg.head_dim)
        v = _split_heads(x @ lp["wv"], cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if compress:
            lcache = kvcache.append(spec, lcache, k, v, key=lkey)
            attn = kvcache.attend(spec, lcache, q, pad_start=pad_start)
        else:
            lcache = raw_append(spec, lcache, k, v)
            attn = raw_attend(spec, lcache, q, pad_start=pad_start)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + _moe(x2, lp, cfg, ep_mesh, ep_axis)
        return h, lcache

    h, caches = jax.lax.scan(body, h, (params["layers"], caches, layer_keys))
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    return logits_from_hidden(params, cfg, h)[:, 0], caches
