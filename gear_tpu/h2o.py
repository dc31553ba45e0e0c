"""H2O (Heavy-Hitter Oracle) KV-cache eviction.

The reference IMPORTS ``H2OCache`` (Simulated/modeling_llama_new.py:59) and
carries h2o knobs in its config (important_size/recent_size/h2o_head_wise,
compress_config.py) but the class is defined nowhere — the whole path is
dead code (survey §2.1, "known defect"). This module provides the working
equivalent, TPU-native: a fixed-budget cache that, when full, keeps the
``important`` highest-accumulated-attention positions plus the ``recent``
window and evicts the rest — all with static shapes (top_k + gather) so the
decode step stays jit-compiled.

Scores accumulate per (batch, head, position) as in the H2O paper
(arXiv:2306.14048): the sum of attention probabilities each position has
received.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct


@dataclass(frozen=True)
class H2OSpec:
    batch: int
    num_kv_heads: int
    head_dim: int
    budget: int          # total kept positions (important + recent)
    important: int       # heavy-hitter slots
    dtype: jnp.dtype = jnp.bfloat16

    def __post_init__(self):
        if self.important >= self.budget - 1:
            raise ValueError("important must be < budget - 1")

    @property
    def recent(self) -> int:
        return self.budget - self.important


@struct.dataclass
class H2OCache:
    k: jax.Array        # [B, H, budget, D]
    v: jax.Array
    score: jax.Array    # [B, H, budget] accumulated attention mass
    pos: jax.Array      # [B, H, budget] original position ids (-1 = empty)
    length: jax.Array   # int32 scalar — number of valid slots


def init(spec: H2OSpec) -> H2OCache:
    b, h, d = spec.batch, spec.num_kv_heads, spec.head_dim
    return H2OCache(
        k=jnp.zeros((b, h, spec.budget, d), spec.dtype),
        v=jnp.zeros((b, h, spec.budget, d), spec.dtype),
        score=jnp.zeros((b, h, spec.budget), jnp.float32),
        pos=jnp.full((b, h, spec.budget), -1, jnp.int32),
        length=jnp.zeros((), jnp.int32),
    )


def _evict(spec: H2OSpec, c: H2OCache) -> H2OCache:
    """Keep top-``important`` by score among non-recent slots + the newest
    ``recent - 1`` slots (leaving one slot free for the incoming token);
    compact left. Runs when the cache is full."""
    b, h = spec.batch, spec.num_kv_heads
    nr = spec.recent - 1
    imp = spec.important
    # Newest nr slots (by original position) are protected.
    order = jnp.argsort(c.pos, axis=-1)          # ascending positions
    recent_idx = order[..., -nr:]                # [B,H,nr]
    # Scores of protected slots masked out of the heavy-hitter vote.
    protect_full = jnp.zeros(c.score.shape, bool)
    protect_full = jax.vmap(jax.vmap(lambda p, i: p.at[i].set(True)))(
        protect_full, recent_idx)
    masked = jnp.where(protect_full, -jnp.inf, c.score)
    _, hh_idx = jax.lax.top_k(masked, imp)       # [B,H,imp]
    keep = jnp.concatenate([hh_idx, recent_idx], axis=-1)  # [B,H,budget-? ]

    def gather(x, idx):
        return jax.vmap(jax.vmap(lambda a, i: a[i]))(x, idx)

    kept = keep.shape[-1]
    pad = spec.budget - kept
    new = H2OCache(
        k=gather(c.k, keep),
        v=gather(c.v, keep),
        score=gather(c.score, keep),
        pos=gather(c.pos, keep),
        length=jnp.int32(kept),
    )
    if pad:
        z = lambda x, fill: jnp.pad(
            x, ((0, 0), (0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 3),
            constant_values=fill)
        new = H2OCache(k=z(new.k, 0), v=z(new.v, 0),
                       score=z(new.score, 0), pos=z(new.pos, -1),
                       length=new.length)
    return new


def append(spec: H2OSpec, c: H2OCache, k_new, v_new, position) -> H2OCache:
    """Append one token's KV [B,H,1,D] at ``position`` (scalar or [B]);
    evict when full."""
    c = jax.lax.cond(
        c.length >= spec.budget, lambda x: _evict(spec, x), lambda x: x, c)
    i = c.length
    pos = jnp.broadcast_to(
        jnp.asarray(position, jnp.int32).reshape(-1, 1, 1),
        (spec.batch, spec.num_kv_heads, 1))
    return H2OCache(
        k=jax.lax.dynamic_update_slice(c.k, k_new.astype(spec.dtype),
                                       (0, 0, i, 0)),
        v=jax.lax.dynamic_update_slice(c.v, v_new.astype(spec.dtype),
                                       (0, 0, i, 0)),
        score=c.score,
        pos=jax.lax.dynamic_update_slice(c.pos, pos, (0, 0, i)),
        length=i + 1,
    )


def attend(spec: H2OSpec, c: H2OCache, q, *, sm_scale=None):
    """Decode attention over kept positions; accumulates H2O scores.

    Returns (out [B,Hq,1,D], updated cache)."""
    b, hq, qn, d = q.shape
    hkv = spec.num_kv_heads
    gq = hq // hkv
    if sm_scale is None:
        sm_scale = d ** -0.5
    qf = q.reshape(b, hkv, gq * qn, d).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhtd->bhqt", qf, c.k.astype(jnp.float32)) * sm_scale
    valid = (jnp.arange(spec.budget)[None, None, None, :]
             < c.length) & (c.pos[:, :, None, :] >= 0)
    s = jnp.where(valid, s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    out = jnp.einsum("bhqt,bhtd->bhqd", w, c.v.astype(jnp.float32))
    new_score = c.score + jnp.sum(w, axis=2)  # accumulate over query heads
    return (out.reshape(b, hq, qn, d).astype(q.dtype),
            c.replace(score=new_score))
