"""StreamingLLM attention-sink cache (bounded window + sink tokens).

Behavioral reference: GenerationBench/GenerationTest/GEARLM/Simulated/
cache_utils.py:201-363 — the vendored HF ``SinkCache`` keeps ``num_sink``
initial tokens plus a rolling window, re-rotating evicted keys' RoPE to
cache-relative positions. It ships in the reference but no eval script uses
it (survey A6).

TPU-native redesign: keys are stored UNROTATED and rotated at attend time
by their CURRENT cache-relative slot position — this makes eviction a pure
ring-buffer overwrite (no re-rotation state, no dynamic shapes) at the cost
of one cheap RoPE application per step over the bounded window. Values are
position-free. Semantics match StreamingLLM: positions are cache-relative,
so the model never sees positions beyond ``num_sink + window``.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from .models.llama import apply_rope, rope_cos_sin


@dataclass(frozen=True)
class SinkSpec:
    batch: int
    num_kv_heads: int
    head_dim: int
    num_sink: int = 4
    window: int = 252     # total capacity = num_sink + window
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def capacity(self) -> int:
        return self.num_sink + self.window


@struct.dataclass
class SinkCache:
    k: jax.Array        # [B, H, cap, D] UNROTATED keys
    v: jax.Array        # [B, H, cap, D]
    length: jax.Array   # int32 — total tokens ever appended


def init(spec: SinkSpec) -> SinkCache:
    b, h, d = spec.batch, spec.num_kv_heads, spec.head_dim
    z = jnp.zeros((b, h, spec.capacity, d), spec.dtype)
    return SinkCache(k=z, v=z, length=jnp.zeros((), jnp.int32))


def _slot_for(spec: SinkSpec, n: jax.Array) -> jax.Array:
    """Ring slot for the n-th appended token: sinks stay put, the window
    wraps."""
    ns, w = spec.num_sink, spec.window
    return jnp.where(n < ns, n, ns + (n - ns) % w)


def append(spec: SinkSpec, c: SinkCache, k_unrot, v_new) -> SinkCache:
    """Append one token's UNROTATED K and V [B,H,1,D]."""
    slot = _slot_for(spec, c.length)
    return SinkCache(
        k=jax.lax.dynamic_update_slice(c.k, k_unrot.astype(spec.dtype),
                                       (0, 0, slot, 0)),
        v=jax.lax.dynamic_update_slice(c.v, v_new.astype(spec.dtype),
                                       (0, 0, slot, 0)),
        length=c.length + 1,
    )


def _relative_positions(spec: SinkSpec, length: jax.Array) -> jax.Array:
    """Cache-relative position of each slot given total appended ``length``.

    Sinks keep positions 0..ns-1. Window slots are ordered by recency: the
    oldest surviving token gets position ns, ..., newest gets
    ns + min(length-ns, w) - 1. Empty slots get -1.
    """
    ns, w = spec.num_sink, spec.window
    slots = jnp.arange(spec.capacity)
    n_win = jnp.clip(length - ns, 0, w)          # tokens in window
    newest_slot = ns + (jnp.maximum(length - ns, 1) - 1) % w
    age = (newest_slot - slots) % w              # 0 = newest
    win_pos = ns + n_win - 1 - age
    pos = jnp.where(slots < ns, slots, win_pos)
    valid = jnp.where(slots < ns, slots < length, age < n_win)
    return jnp.where(valid, pos, -1)


def attend(spec: SinkSpec, c: SinkCache, q_unrot, *, sm_scale=None):
    """Decode attention. q_unrot [B,Hq,1,D] is rotated to the CURRENT
    cache-relative query position; keys rotate to their slot positions."""
    b, hq, qn, d = q_unrot.shape
    hkv = spec.num_kv_heads
    gq = hq // hkv
    if sm_scale is None:
        sm_scale = d ** -0.5

    pos = _relative_positions(spec, c.length)            # [cap]
    q_pos = jnp.minimum(c.length - 1, spec.capacity - 1)

    cosk, sink_ = rope_cos_sin(
        jnp.maximum(pos, 0)[None].repeat(b, 0), d, spec.rope_theta)
    k_rot = apply_rope(c.k, cosk, sink_)
    cosq, sinq = rope_cos_sin(
        q_pos[None, None].repeat(b, 0), d, spec.rope_theta)
    q_rot = apply_rope(q_unrot, cosq, sinq)

    qf = q_rot.reshape(b, hkv, gq * qn, d).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhtd->bhqt", qf, k_rot.astype(jnp.float32))
    s = s * sm_scale
    s = jnp.where((pos >= 0)[None, None, None, :], s, -jnp.inf)
    w = jax.nn.softmax(s, axis=-1)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    out = jnp.einsum("bhqt,bhtd->bhqd", w, c.v.astype(jnp.float32))
    return out.reshape(b, hq, qn, d).astype(q_unrot.dtype)
