"""Functional JAX Llama-family model with compressed-KV decode.

A from-scratch TPU-first implementation (NOT a fork of HF transformers, unlike
the reference's vendored model files — reference behavior spec:
GenerationBench/GenerationTest/GEARLM/Simulated/modeling_llama_new.py and
cuda_supported_gear/modeling_llamagear.py:177-484).

Design:
  * params are a plain pytree with all layers STACKED on a leading axis and
    the layer loop expressed as ``lax.scan`` — one trace/compile regardless
    of depth, XLA pipelines the weight fetches;
  * weights stay bf16; attention/quant math accumulates in fp32;
  * decode attends against the two-tier compressed cache
    (:mod:`gear_tpu.cache`) or an uncompressed ring for the fp16 baseline;
  * HF-compatible conventions (rotate-half RoPE, GQA head grouping, RMSNorm,
    SwiGLU) so checkpoints load without transformation beyond transpose.

Mistral is a config delta of this module (see gear_tpu/models/mistral.py);
Mixtral adds MoE layers (gear_tpu/models/mixtral.py).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .. import cache as kvcache
from ..cache import CacheSpec, LayerCache


@dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    sliding_window: int | None = None  # Mistral-style; None = full attention
    dtype: Any = jnp.bfloat16

    @classmethod
    def tiny(cls, **kw) -> "ModelConfig":
        """Small config for tests; GQA on by default to exercise grouping."""
        base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                    max_position_embeddings=512)
        base.update(kw)
        return cls(**base)

    @classmethod
    def llama2_7b(cls) -> "ModelConfig":
        return cls()

    @classmethod
    def llama2_13b(cls) -> "ModelConfig":
        return cls(hidden_size=5120, intermediate_size=13824, num_layers=40,
                   num_heads=40, num_kv_heads=40)

    @classmethod
    def llama2_70b(cls) -> "ModelConfig":
        return cls(hidden_size=8192, intermediate_size=28672, num_layers=80,
                   num_heads=64, num_kv_heads=8)

    @classmethod
    def llama3_8b(cls) -> "ModelConfig":
        return cls(vocab_size=128256, hidden_size=4096, intermediate_size=14336,
                   num_layers=32, num_heads=32, num_kv_heads=8,
                   rope_theta=500000.0, max_position_embeddings=8192)

    @classmethod
    def from_hf(cls, cfg: dict) -> "ModelConfig":
        """Build from a HF config.json dict (LlamaConfig/MistralConfig keys)."""
        num_heads = cfg["num_attention_heads"]
        return cls(
            vocab_size=cfg["vocab_size"],
            hidden_size=cfg["hidden_size"],
            intermediate_size=cfg["intermediate_size"],
            num_layers=cfg["num_hidden_layers"],
            num_heads=num_heads,
            num_kv_heads=cfg.get("num_key_value_heads", num_heads),
            head_dim=cfg.get("head_dim", cfg["hidden_size"] // num_heads),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rms_eps=cfg.get("rms_norm_eps", 1e-5),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            sliding_window=cfg.get("sliding_window"),
        )

    def cache_spec(self, batch: int, max_len: int, comp) -> CacheSpec:
        """CacheSpec for this model from a LayerCompressionConfig."""
        # GEAR methods carry outliers (`left` fraction of entries exact,
        # reference run templates: left=0.02); GEARL/KIVI/KCVT do not.
        ko = 0
        if comp.compress_method.startswith("GEAR") and \
                not comp.compress_method.startswith("GEARL"):
            ko = int(comp.left * comp.group_size * self.head_dim)
            ko -= ko % 2
        return CacheSpec(
            batch=batch,
            num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            max_len=max_len,
            bits=comp.quantize_bit,
            group=comp.group_size,
            rank=comp.rank,
            prefill_rank=comp.prefill_rank,
            # K/V-asymmetric ranks (reference rank/rankv + prefillrank/
            # prefillrankv flags, evaluation_gsm8k.py:280-330)
            rank_v=comp.rankv,
            prefill_rank_v=comp.prefill_rankv,
            lowrank_loop=comp.loop,
            outliers_per_block=ko,
            # *-KCVT = K per-channel with group = seq_len
            # (compress_function.py:441-452): the fused-path analog scales
            # the whole prefill span with one per-channel sideband.
            kcvt_prefill=comp.compress_method.endswith("KCVT"),
            dtype=self.dtype,
            sideband_dtype=self.dtype,
        )


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: ModelConfig) -> dict:
    """Random init (for tests/benchmarks; real weights via models.loader)."""
    e, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hq, hkv, dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    keys = jax.random.split(key, 10)
    dt = cfg.dtype

    def init(k, *shape, scale=None):
        scale = scale or (shape[0] ** -0.5)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    params = {
        "embed": init(keys[0], cfg.vocab_size, e, scale=0.02),
        "layers": {
            "attn_norm": jnp.ones((l, e), dt),
            "mlp_norm": jnp.ones((l, e), dt),
            "wq": init(keys[1], l, e, hq * dh, scale=e ** -0.5),
            "wk": init(keys[2], l, e, hkv * dh, scale=e ** -0.5),
            "wv": init(keys[3], l, e, hkv * dh, scale=e ** -0.5),
            "wo": init(keys[4], l, hq * dh, e, scale=(hq * dh) ** -0.5),
            "wg": init(keys[5], l, e, f, scale=e ** -0.5),
            "wu": init(keys[6], l, e, f, scale=e ** -0.5),
            "wd": init(keys[7], l, f, e, scale=f ** -0.5),
        },
        "final_norm": jnp.ones((e,), dt),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = init(keys[8], e, cfg.vocab_size, scale=e ** -0.5)
    return params


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rmsnorm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """cos/sin [B, S, head_dim] for HF rotate-half RoPE."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half * 2))
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # [B,S,half]
    ang = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B,H,S,D]; cos/sin [B,S,D]. HF convention: x*cos + rotate_half(x)*sin."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    xf = x.astype(jnp.float32)
    rotf = rot.astype(jnp.float32)
    return (xf * cos[:, None] + rotf * sin[:, None]).astype(x.dtype)


def _split_heads(x: jax.Array, n_heads: int, head_dim: int) -> jax.Array:
    b, s, _ = x.shape
    return x.reshape(b, s, n_heads, head_dim).transpose(0, 2, 1, 3)


def causal_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    attn_mask: jax.Array | None, sliding_window: int | None = None,
    *, blockwise_threshold: int = 2048,
) -> jax.Array:
    """Full prefill attention. q [B,Hq,S,D], k/v [B,Hkv,S,D] (GQA grouped),
    attn_mask [B,S] 1=valid. fp32 softmax.

    Long prompts (S > blockwise_threshold) run BLOCKWISE: a lax.scan over
    KV chunks with f32 online-softmax accumulators, so peak memory is
    O(S * chunk) instead of the O(S^2) dense score tensor (8k ctx at 32
    heads would otherwise materialize an 8.6 GB f32 score block — more than
    half of a v5e's HBM). XLA fuses the per-chunk einsum+mask+exp; compute
    stays on the MXU.
    """
    b, hq, s, d = q.shape
    if s > blockwise_threshold:
        return _causal_attention_blockwise(q, k, v, attn_mask,
                                           sliding_window)
    hkv = k.shape[1]
    gq = hq // hkv
    qg = q.reshape(b, hkv, gq, s, d).astype(jnp.float32)
    scores = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k.astype(jnp.float32))
    scores = scores * (d ** -0.5)
    ii = jnp.arange(s)
    mask = ii[:, None] >= ii[None, :]
    if sliding_window is not None:
        mask = mask & (ii[:, None] - ii[None, :] < sliding_window)
    mask = mask[None, None, None]
    if attn_mask is not None:
        mask = mask & attn_mask[:, None, None, None, :].astype(bool)
    scores = jnp.where(mask, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    w = jnp.where(jnp.isnan(w), 0.0, w)  # fully-masked rows (left padding)
    out = jnp.einsum("bhgqk,bhkd->bhgqd", w, v.astype(jnp.float32))
    return out.reshape(b, hq, s, d).astype(q.dtype)


def _causal_attention_blockwise(
    q: jax.Array, k: jax.Array, v: jax.Array,
    attn_mask: jax.Array | None, sliding_window: int | None = None,
    chunk: int = 512,
) -> jax.Array:
    """Flash-style prefill: scan over KV chunks, online-softmax merge."""
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    gq = hq // hkv
    ck = chunk
    while s % ck:
        ck //= 2
    n = s // ck
    sm = d ** -0.5
    qg = (q.reshape(b, hkv, gq, s, d) * sm).astype(jnp.float32)
    kc = k.astype(jnp.float32).reshape(b, hkv, n, ck, d).transpose(
        2, 0, 1, 3, 4)                                   # [n,B,H,ck,D]
    vc = v.astype(jnp.float32).reshape(b, hkv, n, ck, d).transpose(
        2, 0, 1, 3, 4)
    if attn_mask is not None:
        amc = attn_mask.astype(bool).reshape(b, n, ck).transpose(1, 0, 2)
    else:
        amc = jnp.ones((n, b, ck), bool)
    qpos = jnp.arange(s)

    def body(carry, xs):
        acc, m, l = carry                                # [B,H,G,S,D]/[...,S]
        kj, vj, amj, j = xs
        scores = jnp.einsum("bhgqd,bhkd->bhgqk", qg, kj)  # [B,H,G,S,ck]
        kpos = j * ck + jnp.arange(ck)
        msk = qpos[:, None] >= kpos[None, :]             # causal
        if sliding_window is not None:
            msk = msk & (qpos[:, None] - kpos[None, :] < sliding_window)
        msk = msk[None, None, None] & amj[:, None, None, None, :]
        scores = jnp.where(msk, scores, -1e30)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        p = jnp.where(msk, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(-1)
        acc = acc * alpha[..., None] + jnp.einsum("bhgqk,bhkd->bhgqd", p, vj)
        return (acc, m_new, l), None

    acc0 = jnp.zeros((b, hkv, gq, s, d), jnp.float32)
    m0 = jnp.full((b, hkv, gq, s), -1e30, jnp.float32)
    l0 = jnp.zeros((b, hkv, gq, s), jnp.float32)
    (acc, m, l), _ = jax.lax.scan(
        body, (acc0, m0, l0), (kc, vc, amc, jnp.arange(n)))
    out = acc / jnp.where(l == 0.0, 1.0, l)[..., None]   # padded rows -> 0
    return out.reshape(b, hq, s, d).astype(q.dtype)


def mlp_block(h, wg, wu, wd):
    return (jax.nn.silu(h @ wg) * (h @ wu)) @ wd


def _layer_slice(layers: dict, idx) -> dict:
    return {k: v[idx] for k, v in layers.items()}


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def forward_prefill(
    params: dict,
    cfg: ModelConfig,
    tokens: jax.Array,          # [B, S] int32
    positions: jax.Array,       # [B, S] int32 (left-padding aware)
    attn_mask: jax.Array,       # [B, S] 1 = valid
    spec: CacheSpec | None,
    *,
    compress: bool = True,
    prng: jax.Array | None = None,
    kv_hook=None,
) -> tuple[jax.Array, LayerCache | tuple]:
    """Run the prompt, return (logits [B,S,V], stacked caches).

    When ``spec`` is given and ``compress`` is True, each layer's KV is
    compressed into a two-tier LayerCache (prefill block at prefill_rank +
    residual tail). With ``compress=False`` an uncompressed RawLayerCache
    stack is built instead (the fp16 baseline).

    ``kv_hook``: optional ``(k, v) -> (k, v)`` applied after RoPE and BEFORE
    the prompt attention — the reference's simulated compression hook lives
    inside attention pre-softmax (modeling_llama_new.py:944-1027), so prompt
    logits (and the first generated token) see the COMPRESSED prompt KV.
    The hooked values are also what gets cached.
    """
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
        if kv_hook is not None:
            k, v = kv_hook(k, v)
        attn = causal_attention(q, k, v, attn_mask, cfg.sliding_window)
        b, s = tokens.shape
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + mlp_block(x2, lp["wg"], lp["wu"], lp["wd"])
        if spec is None:
            lc = (k, v)
        elif compress:
            lc = kvcache.prefill(spec, k, v, key=lkey)
        else:
            lc = raw_prefill(spec, k, v)
        return h, lc

    h, caches = jax.lax.scan(body, h, (params["layers"], layer_keys))
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    logits = logits_from_hidden(params, cfg, h)
    return logits, caches


def forward_decode(
    params: dict,
    cfg: ModelConfig,
    token: jax.Array,       # [B] int32
    position: jax.Array,    # [B] int32 — RoPE position of this token
    caches: LayerCache,
    *,
    spec: CacheSpec | None,
    compress: bool = True,
    pad_start: jax.Array | None = None,
    prng: jax.Array | None = None,
    attn_impl: str = "xla",  # "xla" | "pallas" | "pallas_interpret"
    append_kv: bool = True,  # False = benchmarking ablation (frozen cache)
) -> tuple[jax.Array, LayerCache]:
    """One decode step: append KV, attend against the compressed cache.

    Mirrors the reference decode ordering (cache update then attention over
    everything including the new token, modeling_llamagear.py:208-384).
    ``append_kv=False`` skips the cache update (attention runs over the
    frozen cache) — output tokens are then WRONG; it exists only to isolate
    the append/flush cost in benchmarks (bench.py BENCH_MODEL_NO_APPEND).
    """
    b = token.shape[0]
    h = params["embed"][token].astype(cfg.dtype)[:, None]  # [B,1,E]
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
        win = cfg.sliding_window
        if compress:
            if append_kv:
                lcache = kvcache.append(spec, lcache, k, v, key=lkey)
            if attn_impl.startswith("pallas"):
                from ..kernels import decode as fused

                # "pallas@<n>" batches n kv heads per kernel grid step.
                impl, _, hb_s = attn_impl.partition("@")
                attn = fused.attend_fused(
                    spec, lcache, q, pad_start=pad_start, window=win,
                    heads_per_step=int(hb_s) if hb_s else 1,
                    interpret=impl == "pallas_interpret")
            else:
                attn = kvcache.attend(spec, lcache, q, pad_start=pad_start,
                                      window=win)
        else:
            lcache = raw_append(spec, lcache, k, v)
            attn = raw_attend(spec, lcache, q, pad_start=pad_start,
                              window=win)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + mlp_block(x2, lp["wg"], lp["wu"], lp["wd"])
        return h, lcache

    h, caches = jax.lax.scan(body, h, (params["layers"], caches, layer_keys))
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    logits = logits_from_hidden(params, cfg, h)
    return logits[:, 0], caches


def forward_decode_seqsharded(
    params: dict,
    cfg: ModelConfig,
    token: jax.Array,       # [B] int32
    position: jax.Array,    # [B] int32
    caches,                 # LayerCache leaves [L, NSHARD, ...] (seq-sharded)
    mesh,
    *,
    spec: CacheSpec,
    axis: str = "seq",
    pad_start: jax.Array | None = None,
    prng: jax.Array | None = None,
):
    """One decode step with the compressed KV SHARDED ALONG TIME over the
    mesh's ``seq`` axis (context parallelism — survey §2.5, absent from the
    reference). Params and activations are replicated over the axis; each
    device holds T/n blocks of packed codes + sidebands + low-rank bases,
    appends land on the last shard, and partial flash states merge with one
    O(B*Hq*D) psum per layer — the compressed KV never moves.
    """
    from ..parallel import context as ctx

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
        attn, lcache = ctx.seq_sharded_append_attend(
            spec, lcache, k, v, q, mesh, axis=axis, key=lkey,
            pad_start=pad_start)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + mlp_block(x2, lp["wg"], lp["wu"], lp["wd"])
        return h, lcache

    h, caches = jax.lax.scan(body, h, (params["layers"], caches, layer_keys))
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    logits = logits_from_hidden(params, cfg, h)
    return logits[:, 0], caches


def forward_decode_paged(
    params: dict,
    cfg: ModelConfig,
    token: jax.Array,       # [B] int32  (B = serving slots)
    position: jax.Array,    # [B] int32
    pools,                  # PagePool with leading layer axis on every leaf
    seqs,                   # PagedSeqs; k/v_resid carry a layer axis [L,B,..]
    *,
    pspec,
    pad_start: jax.Array | None = None,
    prng: jax.Array | None = None,
    attn_impl: str = "xla",  # "xla" | "pallas" | "pallas_interpret"
    live: jax.Array | None = None,  # bool [B]; parked slots don't append
):
    """One decode step over PAGED caches with per-sequence lengths.

    Unlike :func:`forward_decode` (one dense cache, batch-uniform lengths),
    every slot masks by its own comp_len/resid_len — the continuous-batching
    step serves slots of different ages in ONE forward pass (the reference
    can only run uniform static batches through HF generate; survey §1).
    """
    from .. import paged as paged_mod
    from ..kernels import decode as fused

    b = token.shape[0]
    h = params["embed"][token].astype(cfg.dtype)[:, None]  # [B,1,E]
    cos, sin = rope_cos_sin(position[:, None], cfg.head_dim, cfg.rope_theta)
    if prng is None:
        prng = jax.random.PRNGKey(0)
    # Per-slot then per-layer key split — the SAME chain as the dense
    # engine's vmapped one_slot + forward_decode, so a paged slot's flush
    # randomness is bit-identical to its dense twin.
    slot_keys = jax.random.split(prng, b)                       # [B, 2]
    layer_keys = jnp.swapaxes(
        jax.vmap(lambda k: jax.random.split(k, cfg.num_layers))(slot_keys),
        0, 1)                                                   # [L, B, 2]

    shared = paged_mod.PagedSeqs(
        block_table=seqs.block_table, comp_len=seqs.comp_len,
        resid_len=seqs.resid_len, prefill_len=seqs.prefill_len,
        k_resid=None, v_resid=None)

    def body(h, xs):
        lp, lpool, rk, rv, lkey = xs
        lseqs = shared.replace(k_resid=rk, v_resid=rv)
        x = rmsnorm(h, lp["attn_norm"], cfg.rms_eps)
        q = _split_heads(x @ lp["wq"], cfg.num_heads, cfg.head_dim)
        k = _split_heads(x @ lp["wk"], cfg.num_kv_heads, cfg.head_dim)
        v = _split_heads(x @ lp["wv"], cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        lpool, lseqs = paged_mod.append_paged(pspec, lpool, lseqs, k, v,
                                              key=lkey, live=live)
        if attn_impl.startswith("pallas"):
            attn = fused.attend_paged(
                pspec, lpool, lseqs, q, pad_start=pad_start,
                window=cfg.sliding_window,
                interpret=attn_impl == "pallas_interpret")
        else:
            attn = paged_mod.attend_xla(pspec, lpool, lseqs, q,
                                        pad_start=pad_start,
                                        window=cfg.sliding_window)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + mlp_block(x2, lp["wg"], lp["wu"], lp["wd"])
        return h, (lpool, lseqs.k_resid, lseqs.v_resid,
                   lseqs.comp_len, lseqs.resid_len)

    h, (pools, rks, rvs, comps, resids) = jax.lax.scan(
        body, h, (params["layers"], pools, seqs.k_resid, seqs.v_resid,
                  layer_keys))
    # Lengths advance identically in every layer; keep layer 0's.
    seqs = seqs.replace(k_resid=rks, v_resid=rvs,
                        comp_len=comps[0], resid_len=resids[0])
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    logits = logits_from_hidden(params, cfg, h)
    return logits[:, 0], pools, seqs


def logits_from_hidden(params: dict, cfg: ModelConfig, h: jax.Array) -> jax.Array:
    w = params["embed"].T if cfg.tie_word_embeddings else params["lm_head"]
    return (h.astype(jnp.float32) @ w.astype(jnp.float32))


# ---------------------------------------------------------------------------
# H2O (heavy-hitter eviction) forward passes — engine mode "h2o".
# The reference imports an H2OCache that never existed (survey §2.1 defect);
# gear_tpu/h2o.py implements it and these wire it into the model.
# ---------------------------------------------------------------------------

def _prefill_received_attention(q, k, attn_mask, sliding_window=None):
    """Per-position attention mass received during prefill [B,Hkv,S] —
    the H2O score initialization (sum of softmax probs over all queries,
    matching h2o.attend's decode-time accumulation)."""
    b, hq, s, d = q.shape
    hkv = k.shape[1]
    gq = hq // hkv
    qg = q.reshape(b, hkv, gq, s, d).astype(jnp.float32)
    scores = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k.astype(jnp.float32))
    scores = scores * (d ** -0.5)
    ii = jnp.arange(s)
    mask = ii[:, None] >= ii[None, :]
    mask = mask[None, None, None]
    if attn_mask is not None:
        mask = mask & attn_mask[:, None, None, None, :].astype(bool)
    scores = jnp.where(mask, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    return w.sum(axis=(2, 3))  # over query heads in group + query positions


def forward_prefill_h2o(params, cfg: ModelConfig, tokens, positions,
                        attn_mask, hspec):
    """Prompt pass building per-layer H2OCaches (prompt len <= budget;
    eviction starts at decode). Left padding is supported: pad slots carry
    pos=-1 which h2o.attend masks and h2o._evict drops first."""
    from .. import h2o

    h = params["embed"][tokens].astype(cfg.dtype)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    b, s = tokens.shape

    def body(h, lp):
        x = rmsnorm(h, lp["attn_norm"], cfg.rms_eps)
        q = _split_heads(x @ lp["wq"], cfg.num_heads, cfg.head_dim)
        k = _split_heads(x @ lp["wk"], cfg.num_kv_heads, cfg.head_dim)
        v = _split_heads(x @ lp["wv"], cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        attn = causal_attention(q, k, v, attn_mask, cfg.sliding_window)
        score = _prefill_received_attention(q, k, attn_mask)
        lc = h2o.init(hspec)
        pos = jnp.where(attn_mask.astype(bool), positions, -1)  # [B,S]
        lc = lc.replace(
            k=lc.k.at[:, :, :s].set(k.astype(hspec.dtype)),
            v=lc.v.at[:, :, :s].set(v.astype(hspec.dtype)),
            score=lc.score.at[:, :, :s].set(score),
            pos=lc.pos.at[:, :, :s].set(
                jnp.broadcast_to(pos[:, None], (b, hspec.num_kv_heads, s))),
            length=jnp.int32(s),
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + mlp_block(x2, lp["wg"], lp["wu"], lp["wd"])
        return h, lc

    h, caches = jax.lax.scan(body, h, params["layers"])
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    return logits_from_hidden(params, cfg, h), caches


def forward_decode_h2o(params, cfg: ModelConfig, token, position, caches,
                       *, hspec):
    """One decode step over H2O caches: evict-if-full, append, attend
    (score-accumulating)."""
    from .. import h2o

    b = token.shape[0]
    h = params["embed"][token].astype(cfg.dtype)[:, None]
    cos, sin = rope_cos_sin(position[:, None], cfg.head_dim, cfg.rope_theta)

    def body(h, xs):
        lp, lcache = xs
        x = rmsnorm(h, lp["attn_norm"], cfg.rms_eps)
        q = _split_heads(x @ lp["wq"], cfg.num_heads, cfg.head_dim)
        k = _split_heads(x @ lp["wk"], cfg.num_kv_heads, cfg.head_dim)
        v = _split_heads(x @ lp["wv"], cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        lcache = h2o.append(hspec, lcache, k, v, position)
        attn, lcache = h2o.attend(hspec, lcache, q)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + mlp_block(x2, lp["wg"], lp["wu"], lp["wd"])
        return h, lcache

    h, caches = jax.lax.scan(body, h, (params["layers"], caches))
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    return logits_from_hidden(params, cfg, h)[:, 0], caches


# ---------------------------------------------------------------------------
# StreamingLLM sink-cache forward passes — engine mode "sink".
# The reference ships SinkCache unused (cache_utils.py:201-363; survey A6).
# ---------------------------------------------------------------------------

def forward_prefill_sink(params, cfg: ModelConfig, tokens, positions,
                         attn_mask, sspec):
    """Prompt pass building per-layer SinkCaches (prompt len <= capacity).
    Keys are cached UNROTATED (sink.attend rotates at cache-relative
    positions). No left-padding: sinks are literally the first tokens."""
    from .. import sink

    h = params["embed"][tokens].astype(cfg.dtype)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    b, s = tokens.shape

    def body(h, lp):
        x = rmsnorm(h, lp["attn_norm"], cfg.rms_eps)
        q = _split_heads(x @ lp["wq"], cfg.num_heads, cfg.head_dim)
        k_unrot = _split_heads(x @ lp["wk"], cfg.num_kv_heads, cfg.head_dim)
        v = _split_heads(x @ lp["wv"], cfg.num_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k_unrot, cos, sin)
        attn = causal_attention(q, k, v, attn_mask, cfg.sliding_window)
        lc = sink.init(sspec)
        lc = lc.replace(
            k=lc.k.at[:, :, :s].set(k_unrot.astype(sspec.dtype)),
            v=lc.v.at[:, :, :s].set(v.astype(sspec.dtype)),
            length=jnp.int32(s),
        )
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + mlp_block(x2, lp["wg"], lp["wu"], lp["wd"])
        return h, lc

    h, caches = jax.lax.scan(body, h, params["layers"])
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    return logits_from_hidden(params, cfg, h), caches


def forward_decode_sink(params, cfg: ModelConfig, token, position, caches,
                        *, sspec):
    """One decode step over sink caches. RoPE happens INSIDE sink.attend at
    cache-relative positions (StreamingLLM semantics), so q/k stay unrotated
    here; ``position`` is unused beyond parity with the other decoders."""
    from .. import sink

    b = token.shape[0]
    h = params["embed"][token].astype(cfg.dtype)[:, None]

    def body(h, xs):
        lp, lcache = xs
        x = rmsnorm(h, lp["attn_norm"], cfg.rms_eps)
        q = _split_heads(x @ lp["wq"], cfg.num_heads, cfg.head_dim)
        k = _split_heads(x @ lp["wk"], cfg.num_kv_heads, cfg.head_dim)
        v = _split_heads(x @ lp["wv"], cfg.num_kv_heads, cfg.head_dim)
        lcache = sink.append(sspec, lcache, k, v)
        attn = sink.attend(sspec, lcache, q)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, 1, -1)
        h = h + attn @ lp["wo"]
        x2 = rmsnorm(h, lp["mlp_norm"], cfg.rms_eps)
        h = h + mlp_block(x2, lp["wg"], lp["wu"], lp["wd"])
        return h, lcache

    h, caches = jax.lax.scan(body, h, (params["layers"], caches))
    h = rmsnorm(h, params["final_norm"], cfg.rms_eps)
    return logits_from_hidden(params, cfg, h)[:, 0], caches


# ---------------------------------------------------------------------------
# Uncompressed baseline cache (fp16/bf16) — for accuracy and speed baselines.
# ---------------------------------------------------------------------------

from flax import struct  # noqa: E402


@struct.dataclass
class RawLayerCache:
    k: jax.Array        # [B, H, max_len, D]
    v: jax.Array
    length: jax.Array   # int32 scalar


def raw_init(spec: CacheSpec) -> RawLayerCache:
    b, h, d = spec.batch, spec.num_kv_heads, spec.head_dim
    z = jnp.zeros((b, h, spec.max_len, d), spec.dtype)
    return RawLayerCache(k=z, v=z, length=jnp.zeros((), jnp.int32))


def raw_prefill(spec: CacheSpec, k: jax.Array, v: jax.Array) -> RawLayerCache:
    c = raw_init(spec)
    s = k.shape[2]
    return RawLayerCache(
        k=c.k.at[:, :, :s].set(k.astype(spec.dtype)),
        v=c.v.at[:, :, :s].set(v.astype(spec.dtype)),
        length=jnp.int32(s),
    )


def raw_append(spec: CacheSpec, c: RawLayerCache, k_new, v_new) -> RawLayerCache:
    return RawLayerCache(
        k=jax.lax.dynamic_update_slice(c.k, k_new.astype(spec.dtype), (0, 0, c.length, 0)),
        v=jax.lax.dynamic_update_slice(c.v, v_new.astype(spec.dtype), (0, 0, c.length, 0)),
        length=c.length + k_new.shape[2],
    )


def raw_attend(
    spec: CacheSpec, c: RawLayerCache, q: jax.Array,
    *, sm_scale: float | None = None, pad_start: jax.Array | None = None,
    window: int | None = None,
) -> jax.Array:
    b, hq, qn, d = q.shape
    hkv = spec.num_kv_heads
    gq = hq // hkv
    if sm_scale is None:
        sm_scale = d ** -0.5
    qg = q.reshape(b, hkv, gq * qn, d).astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhtd->bhqt", qg, c.k.astype(jnp.float32)) * sm_scale
    pos = jnp.arange(spec.max_len)
    valid = (pos < c.length)[None, None, None, :]
    if pad_start is not None:
        valid = valid & (pos[None, :] >= pad_start[:, None])[:, None, None, :]
    if window is not None:
        valid = valid & (pos >= c.length - window)[None, None, None, :]
    scores = jnp.where(valid, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqt,bhtd->bhqd", w, c.v.astype(jnp.float32))
    return out.reshape(b, hq, qn, d).astype(q.dtype)
