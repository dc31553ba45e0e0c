"""Two-tier compressed KV cache — the TPU-native GEAR-KIVI fused path.

Behavioral reference (semantics only, reimplemented TPU-first):
  - reference: cuda_supported_gear/modeling_llamagear.py:177-484 — two-tier
    cache: packed-quantized prefix (K per-channel, V per-token) + fp16
    residual ring of ``residual_length`` tokens, flushed through
    quantize-and-pack + per-head low-rank error bases when full.
  - reference: cuda_supported_gear/quant/new_pack.py:8-48 (KIVI layouts),
    :253-288 (quantize with error), :291-311 (headwise_lrap).
  - reference: cuda_supported_gear/modeling_llamagear.py:54-111
    (matmul_withlrap: quantized GEMV + ``q @ Q P^T`` low-rank correction).

TPU-native redesign (vs the reference's growing 17-slot python tuples):
  * every leaf is a FIXED-SHAPE array preallocated to ``max_len``; lengths are
    int32 scalars in the pytree, so one jitted decode step serves the entire
    generation (no retracing, no host round-trips);
  * K codes are packed along TIME into int32 words ([B,H,D,W]) so the
    per-channel scale folds into the query once per time-group and the score
    against packed codes is a pure (integer) matmul;
  * V codes are packed along HEAD-DIM ([B,H,T,Wd]) so the per-token scale
    folds into the attention weights and PV is again a pure matmul;
  * low-rank error bases are stored per time-block (block == group ==
    residual length): P [B,H,NB,D,r], Q [B,H,T,r]; the prefill block's
    rank-``prefill_rank`` base is replicated across its blocks, decode flushes
    write rank-``rank`` bases (zero-padded columns);
  * the residual tier is a linear buffer flushed exactly when full
    (``resid_len == group``), as a ``lax.cond`` inside the jitted step.

The attention entry point :func:`attend` computes decode attention directly
against the compressed representation (packed codes + folded scales +
low-rank correction + residual) with one online softmax across both tiers.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import struct

from .core import lowrank, quant


@dataclass(frozen=True)
class CacheSpec:
    """Static description of one layer's compressed cache (hashable; safe as
    a jit static argument)."""

    batch: int
    num_kv_heads: int
    head_dim: int
    max_len: int          # capacity in tokens; multiple of group
    bits: int = 4         # 2 | 4 | 8
    group: int = 64       # time-group for K == head-dim group for V == residual len
    rank: int = 2         # decode-flush rank for the low-rank error bases
    prefill_rank: int = 4
    rank_v: int = -1      # V-side ranks; -1 = same as K (the reference's
    prefill_rank_v: int = -1  # rank/rankv + prefillrank/prefillrankv flags,
                          # evaluation_gsm8k.py:280-330). Base leaves are
                          # padded to r_store, so asymmetric ranks only
                          # change which columns are zero — the fused kernel
                          # needs no shape changes.
    lowrank_loop: int = 3
    base_bits: int = 16   # 16 = bf16 P/Q bases; 8 = int8-quantized bases
                          # (reference: true_poweriteration_quantized,
                          # old_models/CompressUtils/TrueCompressFunction.py:166-207)
    outliers_per_block: int = 0
                          # exact entries kept per (head, quant-block) per
                          # tensor, half largest / half smallest BY VALUE
                          # (reference `left` fraction, gears_channelQ /
                          # gears_tokenQ, compress_function.py:261-333:
                          # left=0.02 -> ~0.02 * group * head_dim). Stored
                          # as fixed-size COO (flat idx + exact value);
                          # restored by scatter before the low-rank error
                          # is computed (reference order). 0 = GEARL.
    kcvt_prefill: bool = False
                          # Quantize the PREFILL region's K with ONE
                          # per-channel min/max over the whole prompt
                          # (the reference's KCVT K grouping: group_size =
                          # seq_len, compress_function.py:441-452) instead
                          # of per time-block. Stored replicated across the
                          # block rows (layout unchanged); the Pallas
                          # kernel's dual-region fast path then folds the
                          # scale into q ONCE per chunk and computes one
                          # flash-shaped score dot instead of per-block
                          # dots. Decode-flushed blocks keep per-block
                          # scales. The quant error delta is absorbed by
                          # the low-rank error bases (computed after).
    v_group_size: int = 0
                          # V quantization group along the head dim;
                          # 0 = min(group, head_dim). The reference's
                          # simulated GEAR quantizes V per token over the
                          # FULL hidden dim (fake_groupwise_token_...,
                          # compress_function.py:7-37, group = h*d), so
                          # v_group_size=head_dim is the accuracy-faithful
                          # setting; the fused KIVI path groups by
                          # group_size (new_pack.py:27-48).
    dtype: jnp.dtype = jnp.bfloat16
    sideband_dtype: jnp.dtype = jnp.bfloat16

    def __post_init__(self):
        if self.max_len % self.group != 0:
            raise ValueError("max_len must be a multiple of group")
        if self.v_group_size and self.head_dim % self.v_group_size:
            raise ValueError("head_dim must be a multiple of v_group_size")
        if 32 % self.bits != 0:
            raise ValueError("bits must divide 32")
        if self.group % (32 // self.bits) != 0:
            raise ValueError("group must be a multiple of feats-per-int32")
        if self.base_bits not in (8, 16):
            raise ValueError("base_bits must be 8 or 16")
        if self.outliers_per_block < 0 or self.outliers_per_block % 2:
            raise ValueError("outliers_per_block must be even and >= 0")
        if self.outliers_per_block > self.group * self.head_dim // 2:
            raise ValueError("outliers_per_block too large")
        if self.outliers_per_block and self.group * self.head_dim > 65536:
            raise ValueError(
                "outlier indices are 16-bit (packed 2/int32): "
                "group * head_dim must be <= 65536")

    @property
    def fpi(self) -> int:
        return 32 // self.bits

    @property
    def n_blocks(self) -> int:
        return self.max_len // self.group

    @property
    def v_group(self) -> int:
        return self.v_group_size or min(self.group, self.head_dim)

    @property
    def v_groups_per_token(self) -> int:
        return self.head_dim // self.v_group

    @property
    def rank_v_eff(self) -> int:
        return self.rank if self.rank_v < 0 else self.rank_v

    @property
    def prefill_rank_v_eff(self) -> int:
        return self.prefill_rank if self.prefill_rank_v < 0 \
            else self.prefill_rank_v

    @property
    def ko_store(self) -> int:
        """Stored outlier entries per block: ``outliers_per_block`` rounded
        UP to a multiple of 128 when head_dim == 128. Padding entries are
        (idx 0, delta 0) no-ops for every consumer (scatter-ADD of zero),
        and full-128 lane windows let the Pallas kernel take the hardware
        lane gather (v5e: take_along_axis on exactly [*, 128] f32) with no
        ragged-tail concat — Mosaic rejects concats of lane-offset
        mismatched vectors, so the ragged path never compiled on TPU."""
        ko = self.outliers_per_block
        if ko and self.head_dim == 128:
            return -(-ko // 128) * 128
        return ko

    @property
    def bnd_lanes(self) -> int:
        return 128 if self.outliers_per_block else 0

    @property
    def r_store(self) -> int:
        # at least one (zero) column: zero-size base leaves would need
        # zero-size Pallas blocks, which neither Mosaic nor the interpreter
        # accept (rank 0 = UNIFORM/KIVI configs).
        return max(self.rank, self.prefill_rank, self.rank_v_eff,
                   self.prefill_rank_v_eff, 1)

    @property
    def k_words(self) -> int:
        return self.max_len // self.fpi

    @property
    def v_words(self) -> int:
        return self.head_dim // self.fpi

    def bytes_compressed(self) -> int:
        """HBM bytes of one layer's cache at full capacity (for reporting)."""
        import numpy as np

        def nbytes(shape, dt):
            return int(np.prod(shape)) * jnp.dtype(dt).itemsize

        b, h, d, t = self.batch, self.num_kv_heads, self.head_dim, self.max_len
        el = jnp.dtype(self.sideband_dtype).itemsize
        total = 0
        total += nbytes((b, h, t, self.v_words), jnp.int32)
        total += 2 * b * h * d * self.n_blocks * el
        total += nbytes((b, h, t, self.v_words), jnp.int32)
        total += 2 * b * h * t * self.v_groups_per_token * el
        total += 2 * nbytes((b, h, self.group, d), self.dtype)
        base_el = 1 if self.base_bits == 8 else 2
        total += 2 * b * h * self.n_blocks * d * self.r_store * base_el
        total += 2 * b * h * t * self.r_store * base_el
        if self.base_bits == 8:  # per-(block, rank) f32 scales
            total += 4 * b * h * self.n_blocks * self.r_store * 4
        ko = self.ko_store
        if ko:  # COO outliers: packed 16-bit idx + 16-bit delta, per tensor
            total += 2 * b * h * self.n_blocks * ko * (
                2 + jnp.dtype(self.dtype).itemsize)
        return total

    def bytes_fp16_baseline(self) -> int:
        b, h, d, t = self.batch, self.num_kv_heads, self.head_dim, self.max_len
        return 2 * b * h * t * d * 2


@struct.dataclass
class LayerCache:
    """One layer's compressed KV state. All leaves fixed-shape arrays."""

    # Packed quantized prefix. BOTH K and V codes are bit-packed along the
    # head dim (BYTE-STRIDED layout, quant.pack_codes_bytestrided) and
    # stored WORD-MAJOR TRANSPOSED: [D/fpi, T] int32 — time in lanes, so
    # the Pallas kernel's unpack is a couple of full-lane int32 shift/mask
    # ops + sublane-expanding int8 bitcasts. Only the SCALE GROUPING
    # differs: K per (time-block, channel), V per (token, d-group, also
    # stored transposed [NGV, T]). The packing dim is deliberately
    # decoupled from the quantization-grouping dim.
    k_codes: jax.Array   # int32 [B, H, head_dim // fpi, max_len]
    k_scale: jax.Array   # [B, H, n_blocks, D]
    k_mn: jax.Array      # [B, H, n_blocks, D]
    v_codes: jax.Array   # int32 [B, H, head_dim // fpi, max_len]
    v_scale: jax.Array   # [B, H, v_groups_per_token, max_len]
    v_mn: jax.Array      # [B, H, v_groups_per_token, max_len]
    # Residual (uncompressed) tier.
    k_resid: jax.Array   # [B, H, group, head_dim]
    v_resid: jax.Array   # [B, H, group, head_dim]
    # Low-rank error bases, per time-block. Q factors stored TRANSPOSED
    # ([R, T]) and V's P factor row-major per rank ([NB, R, D]) so the
    # kernel reads full-lane tiles.
    kpt: jax.Array       # [B, H, n_blocks, r_store, head_dim]
    kqt: jax.Array       # [B, H, r_store, max_len]
    vpt: jax.Array       # [B, H, n_blocks, r_store, head_dim]
    vqt: jax.Array       # [B, H, r_store, max_len]
    # Fixed-size COO outliers per quant block (flat idx = t_loc * D + d,
    # d-major within the block, for BOTH K and V; empty when
    # outliers_per_block == 0). Values are DELTAS (exact original entry
    # minus its dequantized value), so restore is a scatter-ADD and the
    # Pallas kernel folds them as one-hot-dot corrections without touching
    # the packed codes. Stored block-major ([NB, KO], entries in lanes):
    # the kernel slices the chunk's blocks on SUBLANES (lane slices would
    # need 128-aligned starts) and builds its one-hot tiles entry-in-lanes.
    # Indices are 16-bit, packed TWO per int32 word (word j = idx[j] |
    # idx[j + KO/2] << 16) — 4 bytes per outlier entry total. Duplicate
    # indices within a block carry delta 0 (add-safe).
    k_out_idx: jax.Array  # int32 [B, H, n_blocks, KO // 2]  (packed pairs)
    k_out_val: jax.Array  # [B, H, n_blocks, KO]  (delta values)
    v_out_idx: jax.Array  # int32 [B, H, n_blocks, KO // 2]
    v_out_val: jax.Array  # [B, H, n_blocks, KO]  (delta values)
    # Sorted-outlier boundary tables (empty when outliers_per_block == 0):
    # entries within each block are stored sorted by token (K) / channel
    # (V); bnd[..., t] = (# entries with key <= t) - 1. The Pallas kernel
    # turns the scatter side of the outlier correction into a running-sum
    # gather at these boundaries (see kernels/decode.py) instead of
    # building data-dependent one-hot matrices on the VPU.
    k_out_bnd: jax.Array  # int32 [B, H, n_blocks, 128]
    v_out_bnd: jax.Array  # int32 [B, H, n_blocks, 128]
    # int8-base scales (all-ones when base_bits == 16).
    kpt_scale: jax.Array  # [B, H, n_blocks, r_store]
    kqt_scale: jax.Array  # [B, H, r_store, n_blocks]
    vpt_scale: jax.Array  # [B, H, n_blocks, r_store]
    vqt_scale: jax.Array  # [B, H, r_store, n_blocks]
    # Lengths (tokens). comp_len is always a multiple of group.
    # prefill_len marks the prefix compressed at prefill time: those blocks
    # all share ONE low-rank P (replicated below), which the Pallas kernel
    # exploits with a precomputed q.P0 instead of per-block machinery.
    comp_len: jax.Array  # int32 scalar
    resid_len: jax.Array  # int32 scalar
    prefill_len: jax.Array  # int32 scalar

    @property
    def total_len(self) -> jax.Array:
        return self.comp_len + self.resid_len


def init_layer_cache(spec: CacheSpec) -> LayerCache:
    b, h, d = spec.batch, spec.num_kv_heads, spec.head_dim
    sb = spec.sideband_dtype
    base_dt = jnp.int8 if spec.base_bits == 8 else spec.dtype
    return LayerCache(
        k_codes=jnp.zeros((b, h, spec.v_words, spec.max_len), jnp.int32),
        k_scale=jnp.zeros((b, h, spec.n_blocks, d), sb),
        k_mn=jnp.zeros((b, h, spec.n_blocks, d), sb),
        v_codes=jnp.zeros((b, h, spec.v_words, spec.max_len), jnp.int32),
        v_scale=jnp.zeros((b, h, spec.v_groups_per_token, spec.max_len), sb),
        v_mn=jnp.zeros((b, h, spec.v_groups_per_token, spec.max_len), sb),
        k_resid=jnp.zeros((b, h, spec.group, d), spec.dtype),
        v_resid=jnp.zeros((b, h, spec.group, d), spec.dtype),
        kpt=jnp.zeros((b, h, spec.n_blocks, spec.r_store, d), base_dt),
        kqt=jnp.zeros((b, h, spec.r_store, spec.max_len), base_dt),
        vpt=jnp.zeros((b, h, spec.n_blocks, spec.r_store, d), base_dt),
        vqt=jnp.zeros((b, h, spec.r_store, spec.max_len), base_dt),
        k_out_idx=jnp.zeros((b, h, spec.n_blocks,
                             spec.ko_store // 2), jnp.int32),
        k_out_val=jnp.zeros((b, h, spec.n_blocks, spec.ko_store),
                            spec.dtype),
        v_out_idx=jnp.zeros((b, h, spec.n_blocks,
                             spec.ko_store // 2), jnp.int32),
        v_out_val=jnp.zeros((b, h, spec.n_blocks, spec.ko_store),
                            spec.dtype),
        k_out_bnd=jnp.zeros((b, h, spec.n_blocks, spec.bnd_lanes),
                            jnp.int32),
        v_out_bnd=jnp.zeros((b, h, spec.n_blocks, spec.bnd_lanes),
                            jnp.int32),
        kpt_scale=jnp.ones((b, h, spec.n_blocks, spec.r_store), jnp.float32),
        kqt_scale=jnp.ones((b, h, spec.r_store, spec.n_blocks), jnp.float32),
        vpt_scale=jnp.ones((b, h, spec.n_blocks, spec.r_store), jnp.float32),
        vqt_scale=jnp.ones((b, h, spec.r_store, spec.n_blocks), jnp.float32),
        comp_len=jnp.zeros((), jnp.int32),
        resid_len=jnp.zeros((), jnp.int32),
        prefill_len=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Compression of a block of tokens (prefill or residual flush).
# ---------------------------------------------------------------------------

def _extract_outliers(spec: CacheSpec, x: jax.Array):
    """Pull the per-block largest/smallest entries out of a block [B,H,S,D].

    Reference semantics (gears_channelQ/tokenQ, compress_function.py:261-333):
    the `left` fraction of entries, half largest / half smallest BY VALUE,
    replaced with the mean before quantization (tightening the min/max
    range), their exact values kept aside and restored after dequantization.
    TPU-static redesign: a FIXED count per (head, quant-block) instead of a
    data-dependent fraction per channel/token, so shapes stay jit-static.

    Returns (x_cleaned, idx int32 [B,H,NBs,KO], val [B,H,NBs,KO]) with flat
    block indices idx = t_local * D + d.
    """
    ko = spec.outliers_per_block
    b, h, s_len, d = x.shape
    g = spec.group
    nbs = s_len // g
    xf = x.astype(jnp.float32).reshape(b, h, nbs, g * d)
    top_v, top_i = jax.lax.top_k(xf, ko // 2)
    bot_nv, bot_i = jax.lax.top_k(-xf, ko // 2)
    idx = jnp.concatenate([top_i, bot_i], axis=-1)          # [B,H,NBs,KO]
    val = jnp.concatenate([top_v, -bot_nv], axis=-1)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    # Duplicate indices (possible only under heavy value ties) get their
    # non-first occurrences masked out so the delta restore (scatter-ADD)
    # never double-counts a position.
    dup = jnp.tril(idx[..., :, None] == idx[..., None, :], k=-1)  # [.,KO,KO]
    is_dup = jnp.any(dup, axis=-1)                                # [.,KO]
    # single flat 1-D scatter (a vmapped per-row scatter inside the flush
    # cond triggers an XLA:CPU compiler crash in later compilations)
    nrows = b * h * nbs
    flat_x = xf.reshape(nrows * g * d)
    gidx = (idx.reshape(nrows, ko)
            + (jnp.arange(nrows, dtype=jnp.int32) * (g * d))[:, None])
    flat_m = jnp.broadcast_to(mean, idx.shape).reshape(nrows * ko)
    cleaned = flat_x.at[gidx.reshape(-1)].set(flat_m)
    if spec.ko_store != ko:
        # pad to the stored count with (idx 0, dup=True) entries — their
        # deltas are forced to 0 downstream, making them exact no-ops.
        pad = [(0, 0)] * 3 + [(0, spec.ko_store - ko)]
        idx = jnp.pad(idx, pad)
        val = jnp.pad(val, pad)
        is_dup = jnp.pad(is_dup, pad, constant_values=True)
    return (cleaned.reshape(b, h, s_len, d), idx, val, is_dup)


def _sort_outliers(spec: CacheSpec, o_idx: jax.Array, o_val: jax.Array,
                   key_mode: str):
    """Sort each block's COO outliers by token (K) or channel (V) and build
    the 128-lane boundary table the Pallas kernel's segmented-sum path uses.

    ``bnd[..., t] = (# entries with key <= t) - 1`` ∈ [-1, KO-1]: with the
    entries sorted by key, the contribution of token/channel ``t`` is the
    difference of the running value-sum gathered at ``bnd[t]`` and
    ``bnd[t-1]`` — no data-dependent one-hot scatter matrices needed
    in-kernel (those VPU builds dominated the outlier cost, docs/STATUS.md).
    Scatter-add restore and the one-hot fallback are order-independent, so
    sorting is free for every other consumer.
    """
    if spec.outliers_per_block == 0:
        bnd = jnp.zeros(o_idx.shape[:-1] + (0,), jnp.int32)
        return _pack_oidx(o_idx), o_val, bnd
    d = spec.head_dim
    # The table has exactly 128 lanes, so every key must fit in [0, 128):
    # K keys are in-block token indices (group) and V keys are channel
    # indices (head_dim). The kernel's gate (k_tile_ok / v_bnd_ok) requires
    # the same, but a silent truncation here would outlive a kernel change.
    key_range = spec.group if key_mode == "token" else spec.head_dim
    assert key_range <= 128, (
        f"sorted-outlier boundary table needs {key_mode} key range "
        f"{key_range} <= 128 lanes; use group/head_dim <= 128 or disable "
        "outliers")
    key = o_idx // d if key_mode == "token" else o_idx % d
    # variadic lax.sort (co-sort, stable) instead of argsort +
    # take_along_axis: the gather form inside append's flush lax.cond
    # segfaults the XLA:CPU compiler (same bug class as the vmapped
    # scatter noted in _extract_outliers / paged.append_paged).
    key_s, idx_s, val_s = jax.lax.sort((key, o_idx, o_val), num_keys=1,
                                       is_stable=True)
    t = jnp.arange(128, dtype=jnp.int32)
    bnd = (jnp.sum(key_s[..., None, :] <= t[:, None], axis=-1) - 1
           ).astype(jnp.int32)                      # [..., 128]
    return _pack_oidx(idx_s), val_s, bnd


def _pack_oidx(idx: jax.Array) -> jax.Array:
    """[..., KO] int32 indices -> [..., KO//2] with 16-bit pairs packed per
    int32 word (word j = idx[j] | idx[j + KO/2] << 16)."""
    ko = idx.shape[-1]
    lo, hi = idx[..., :ko // 2], idx[..., ko // 2:]
    return lo | (hi << 16)


def _unpack_oidx(packed: jax.Array) -> jax.Array:
    """Inverse of _pack_oidx: [..., KO//2] -> [..., KO] (original order)."""
    lo = packed & 0xFFFF
    hi = jax.lax.shift_right_logical(packed, 16) & 0xFFFF
    return jnp.concatenate([lo, hi], axis=-1)


def _restore_outliers(spec: CacheSpec, x: jax.Array, idx: jax.Array,
                      val: jax.Array) -> jax.Array:
    """Scatter exact outlier values back into a dequantized block [B,H,S,D].

    Runs BEFORE the low-rank error is computed, matching the reference
    order (quantize-with-outliers -> restore -> error -> power iteration).
    ``val`` holds DELTAS (exact - dequantized), so this is a scatter-ADD.
    ``idx`` arrives packed ([B,H,NBs,KO//2]); ``val`` is [B,H,NBs,KO].
    """
    idx = _unpack_oidx(idx)
    b, h, s_len, d = x.shape
    g = spec.group
    nbs = s_len // g
    ko = idx.shape[-1]
    nrows = b * h * nbs
    flat_x = x.astype(jnp.float32).reshape(nrows * g * d)
    gidx = (idx.reshape(nrows, ko)
            + (jnp.arange(nrows, dtype=jnp.int32) * (g * d))[:, None])
    flat_v = val.astype(jnp.float32).reshape(nrows * ko)
    out = flat_x.at[gidx.reshape(-1)].add(flat_v)
    return out.reshape(b, h, s_len, d)


def _compress_k_block(spec: CacheSpec, k: jax.Array, whole_span: bool = False):
    """K block [B,H,S,D] -> per-channel quant (groups along time), codes
    token-major and packed along the head dim.

    Quantization runs directly on the time-grouped view (no transposes):
    min/max over each ``group``-token window per channel — or, when
    ``whole_span`` (kcvt_prefill), over ALL S tokens at once (KCVT K
    grouping, compress_function.py:441-452), replicated per block row.
    Returns (packed int32 [B,H,WD,S], scale/mn [B,H,S//group,D]).
    """
    b, h, s_len, d = k.shape
    g = spec.group
    nbs = s_len // g
    if spec.outliers_per_block:
        k, o_idx, o_exact, o_dup = _extract_outliers(spec, k)
    else:
        ko = spec.ko_store
        o_idx = jnp.zeros((b, h, nbs, ko), jnp.int32)
        o_exact = None
        o_val = jnp.zeros((b, h, nbs, ko), spec.dtype)
    levels = (1 << spec.bits) - 1
    kg = k.astype(jnp.float32).reshape(b, h, nbs, g, d)
    if whole_span:
        mn = jnp.broadcast_to(
            jnp.min(kg, axis=(2, 3), keepdims=True)[:, :, :, 0],
            (b, h, nbs, d))
        mx = jnp.broadcast_to(
            jnp.max(kg, axis=(2, 3), keepdims=True)[:, :, :, 0],
            (b, h, nbs, d))
    else:
        mn = jnp.min(kg, axis=3)        # [B,H,NBs,D]
        mx = jnp.max(kg, axis=3)
    scale = (mx - mn) / levels
    safe = jnp.where(scale == 0.0, 1.0, scale)
    codes = jnp.clip(
        jnp.round((kg - mn[:, :, :, None]) / safe[:, :, :, None]), 0, levels
    ).astype(jnp.int32).reshape(b, h, s_len, d)
    if spec.outliers_per_block:
        # deltas vs the STORED (sideband-cast) scales, so the scatter-add
        # restore reproduces the exact value up to one fp rounding.
        sc = scale.astype(spec.sideband_dtype).astype(jnp.float32)
        mc = mn.astype(spec.sideband_dtype).astype(jnp.float32)
        deq = (codes.astype(jnp.float32).reshape(b, h, nbs, g, d)
               * sc[:, :, :, None] + mc[:, :, :, None])
        at = jnp.take_along_axis(deq.reshape(b, h, nbs, g * d), o_idx,
                                 axis=-1)
        o_val = jnp.where(o_dup, 0.0, o_exact - at).astype(spec.dtype)
    packed = quant.pack_codes_bytestrided(codes, spec.bits)  # [B,H,S,WD]
    packed = jnp.swapaxes(packed, -1, -2)                # [B,H,WD,S]
    return (packed, scale.astype(spec.sideband_dtype),
            mn.astype(spec.sideband_dtype),
            *_sort_outliers(spec, o_idx, o_val, "token"))


def _compress_v_block(spec: CacheSpec, v: jax.Array):
    """V block [B,H,S,D] -> per-token codes packed along head dim,
    stored word-major transposed.

    Returns (packed int32 [B,H,D//fpi,S], scale [B,H,D//v_group,S], mn).
    """
    b, h, s_len, d = v.shape
    nbs = s_len // spec.group
    if spec.outliers_per_block:
        v, o_idx, o_exact, o_dup = _extract_outliers(spec, v)
    else:
        ko = spec.ko_store
        o_idx = jnp.zeros((b, h, nbs, ko), jnp.int32)
        o_val = jnp.zeros((b, h, nbs, ko), spec.dtype)
    codes, scale, mn = quant.quantize_groups(v, spec.bits, spec.v_group)
    if spec.outliers_per_block:
        deq = quant.dequantize_groups(
            codes,
            scale.astype(spec.sideband_dtype).astype(jnp.float32),
            mn.astype(spec.sideband_dtype).astype(jnp.float32),
            spec.v_group)
        at = jnp.take_along_axis(deq.reshape(b, h, nbs, spec.group * d),
                                 o_idx, axis=-1)
        o_val = jnp.where(o_dup, 0.0, o_exact - at).astype(spec.dtype)
    packed = jnp.swapaxes(quant.pack_codes_bytestrided(codes, spec.bits), -1, -2)
    return (packed, jnp.swapaxes(scale, -1, -2).astype(spec.sideband_dtype),
            jnp.swapaxes(mn, -1, -2).astype(spec.sideband_dtype),
            *_sort_outliers(spec, o_idx, o_val, "channel"))


def _compress_k_block_pk(spec: CacheSpec, k: jax.Array, interpret=False):
    """_compress_k_block via the fused Pallas pack kernel (kernels/pack.py):
    one read of the fp block emits packed words + sidebands without
    materializing the int32 code tensor in HBM (the XLA path's [B,H,S,D]
    intermediate). Outlier deltas are recomputed at their positions from
    the gathered sidebands (bit-identical quant formula). Used by
    :func:`prefill` on TPU; the per-flush block stays on the XLA path
    (reference Triton analog: new_pack.py:132-177 was production for
    prefill-scale blocks)."""
    from .kernels import pack as packk

    b, h, s_len, d = k.shape
    g = spec.group
    nbs = s_len // g
    if spec.outliers_per_block:
        k, o_idx, o_exact, o_dup = _extract_outliers(spec, k)
    else:
        ko = spec.ko_store
        o_idx = jnp.zeros((b, h, nbs, ko), jnp.int32)
        o_val = jnp.zeros((b, h, nbs, ko), spec.dtype)

    xf = k.astype(jnp.float32).reshape(b * h, s_len, d)
    fn = functools.partial(
        packk.quant_pack_channels, bits=spec.bits, group=g,
        sideband_dtype=jnp.float32, interpret=interpret)
    codes3, scale3, mn3 = jax.vmap(fn)(xf)
    packed = jnp.swapaxes(
        codes3.reshape(b, h, s_len, spec.v_words), -1, -2)   # [B,H,WD,S]
    scale_f = scale3.reshape(b, h, nbs, d)    # f32 (what the codes used)
    mn_f = mn3.reshape(b, h, nbs, d)
    scale = scale_f.astype(spec.sideband_dtype)
    mn = mn_f.astype(spec.sideband_dtype)

    if spec.outliers_per_block:
        d_pos = o_idx % d
        gat = lambda a: jnp.take_along_axis(a.astype(jnp.float32), d_pos,
                                            axis=-1)
        xg = jnp.take_along_axis(
            k.astype(jnp.float32).reshape(b, h, nbs, g * d), o_idx, axis=-1)
        deq = _deq_at(spec, xg, gat(scale_f), gat(mn_f), gat(scale), gat(mn))
        o_val = jnp.where(o_dup, 0.0, o_exact - deq).astype(spec.dtype)
    return (packed, scale, mn,
            *_sort_outliers(spec, o_idx, o_val, "token"))


def _compress_v_block_pk(spec: CacheSpec, v: jax.Array, interpret=False):
    """_compress_v_block via the fused Pallas pack kernel (see above)."""
    from .kernels import pack as packk

    b, h, s_len, d = v.shape
    g = spec.group
    nbs = s_len // g
    ngv = spec.v_groups_per_token
    if spec.outliers_per_block:
        v, o_idx, o_exact, o_dup = _extract_outliers(spec, v)
    else:
        ko = spec.ko_store
        o_idx = jnp.zeros((b, h, nbs, ko), jnp.int32)
        o_val = jnp.zeros((b, h, nbs, ko), spec.dtype)

    xf = v.astype(jnp.float32).reshape(b * h, s_len, d)
    fn = functools.partial(
        packk.quant_pack_tokens, bits=spec.bits, v_group=spec.v_group,
        sideband_dtype=jnp.float32, interpret=interpret)
    codes3, scale3, mn3 = jax.vmap(fn)(xf)
    packed = jnp.swapaxes(
        codes3.reshape(b, h, s_len, spec.v_words), -1, -2)
    scale_f = scale3.reshape(b, h, s_len, ngv)               # token-major f32
    mn_f = mn3.reshape(b, h, s_len, ngv)
    scale_t = scale_f.astype(spec.sideband_dtype)
    mn_t = mn_f.astype(spec.sideband_dtype)

    if spec.outliers_per_block:
        t_loc = o_idx // d
        dgrp = (o_idx % d) // spec.v_group
        gidx = t_loc * ngv + dgrp
        gat = lambda a: jnp.take_along_axis(
            a.astype(jnp.float32).reshape(b, h, nbs, g * ngv), gidx, axis=-1)
        xg = jnp.take_along_axis(
            v.astype(jnp.float32).reshape(b, h, nbs, g * d), o_idx, axis=-1)
        deq = _deq_at(spec, xg, gat(scale_f), gat(mn_f),
                      gat(scale_t), gat(mn_t))
        o_val = jnp.where(o_dup, 0.0, o_exact - deq).astype(spec.dtype)
    return (packed,
            jnp.swapaxes(scale_t, -1, -2),
            jnp.swapaxes(mn_t, -1, -2),
            *_sort_outliers(spec, o_idx, o_val, "channel"))


def _deq_at(spec: CacheSpec, x, scale_q, mn_q, scale_s, mn_s):
    """Quantize-dequantize scalar positions: the code is derived with the
    f32 quantization sidebands (``*_q``, what the packed codes used); the
    dequantized value uses the STORED (sideband-cast) ones (``*_s``) —
    exactly the XLA compress path's recipe."""
    levels = (1 << spec.bits) - 1
    safe = jnp.where(scale_q == 0.0, 1.0, scale_q)
    code = jnp.clip(jnp.round((x - mn_q) / safe), 0, levels)
    return code * scale_s + mn_s


def _dequant_k_block(spec: CacheSpec, packed, scale, mn,
                     o_idx=None, o_val=None):
    """Inverse of _compress_k_block -> [B,H,S,D] (exact outliers restored)."""
    b, h, _, s_len = packed.shape
    nbs = s_len // spec.group
    codes = quant.unpack_codes_bytestrided(
        jnp.swapaxes(packed, -1, -2), spec.bits)  # [B,H,S,D]
    d = codes.shape[-1]
    cg = codes.astype(jnp.float32).reshape(b, h, nbs, spec.group, d)
    x = (cg * scale.astype(jnp.float32)[:, :, :, None]
         + mn.astype(jnp.float32)[:, :, :, None])
    x = x.reshape(b, h, s_len, d)
    if spec.outliers_per_block and o_idx is not None:
        x = _restore_outliers(spec, x, o_idx, o_val)
    return x


def _dequant_v_block(spec: CacheSpec, packed, scale, mn,
                     o_idx=None, o_val=None):
    codes = quant.unpack_codes_bytestrided(jnp.swapaxes(packed, -1, -2), spec.bits)
    x = quant.dequantize_groups(
        codes, jnp.swapaxes(scale, -1, -2).astype(jnp.float32),
        jnp.swapaxes(mn, -1, -2).astype(jnp.float32), spec.v_group
    )
    if spec.outliers_per_block and o_idx is not None:
        x = _restore_outliers(spec, x, o_idx, o_val)
    return x


def _error_bases(spec: CacheSpec, x, x_hat, rank: int, key):
    """Low-rank bases of the quantization error, zero-padded to r_store.

    x, x_hat: [B,H,S,D]. Returns (P [B,H,D,r_store], Q [B,H,S,r_store]).
    """
    err = x.astype(jnp.float32) - x_hat.astype(jnp.float32)
    if rank <= 0:  # one side of an asymmetric rank/rank_v config may be 0
        b, h, s, d = x.shape
        p = jnp.zeros((b, h, d, spec.r_store), jnp.float32)
        q = jnp.zeros((b, h, s, spec.r_store), jnp.float32)
    else:
        p, q = lowrank.power_iterate(err, rank, spec.lowrank_loop, key)
        pad = spec.r_store - rank
        if pad:
            p = jnp.pad(p, ((0, 0),) * (p.ndim - 1) + ((0, pad),))
            q = jnp.pad(q, ((0, 0),) * (q.ndim - 1) + ((0, pad),))
    qt = jnp.swapaxes(q, -1, -2)  # [..., r_store, S]
    if spec.base_bits == 8:
        # int8 symmetric absmax per rank column (reference
        # true_poweriteration_quantized semantics, 8-bit bases).
        p_absmax = jnp.max(jnp.abs(p), axis=-2, keepdims=True)   # over D
        p_scale = jnp.maximum(p_absmax, 1e-12) / 127.0
        p8 = jnp.clip(jnp.round(p / p_scale), -127, 127).astype(jnp.int8)
        qt_absmax = jnp.max(jnp.abs(qt), axis=-1, keepdims=True)  # over S
        qt_scale = jnp.maximum(qt_absmax, 1e-12) / 127.0
        qt8 = jnp.clip(jnp.round(qt / qt_scale), -127, 127).astype(jnp.int8)
        return p8, qt8, p_scale[..., 0, :], qt_scale[..., 0]
    ones_p = jnp.ones(p.shape[:-2] + (p.shape[-1],), jnp.float32)
    ones_q = jnp.ones(qt.shape[:-1], jnp.float32)
    # Q returned TRANSPOSED [..., r_store, S] for the lane-major cache layout.
    return p.astype(spec.dtype), qt.astype(spec.dtype), ones_p, ones_q


def prefill(
    spec: CacheSpec,
    k: jax.Array,
    v: jax.Array,
    *,
    key: jax.Array | None = None,
    use_lowrank: bool = True,
    pack_kernel: bool | None = None,
) -> LayerCache:
    """Build a LayerCache from prefill K/V [B,H,S,D] (S <= max_len, static).

    The first ``(S // group) * group`` tokens are compressed as one prefill
    block at ``prefill_rank``; the remainder seeds the residual tier
    (reference: modeling_llamagear.py:386-434).

    ``pack_kernel``: route the block quantize+pack through the fused Pallas
    pack kernel (kernels/pack.py) — default on for the TPU backend; the XLA
    path otherwise (bit-identical formulas).
    """
    b, h, s, d = k.shape
    g = spec.group
    n_full = (s // g) * g
    cache = init_layer_cache(spec)
    if key is None:
        key = jax.random.PRNGKey(0)
    if pack_kernel is None:
        pack_kernel = jax.default_backend() == "tpu"

    if n_full:
        kb, vb = k[:, :, :n_full], v[:, :, :n_full]
        c_k = _compress_k_block_pk if pack_kernel else _compress_k_block
        c_v = _compress_v_block_pk if pack_kernel else _compress_v_block
        if spec.kcvt_prefill:
            # whole-span per-channel K scales (KCVT): the sidebands come
            # from one global reduction, so the fused pack kernel's
            # per-group minmax doesn't apply — XLA path for K.
            k_pack, k_scale, k_mn, ko_i, ko_v, ko_b = _compress_k_block(
                spec, kb, whole_span=True)
        else:
            k_pack, k_scale, k_mn, ko_i, ko_v, ko_b = c_k(spec, kb)
        v_pack, v_scale, v_mn, vo_i, vo_v, vo_b = c_v(spec, vb)
        nbs = n_full // g
        cache = cache.replace(
            k_codes=cache.k_codes.at[:, :, :, :n_full].set(k_pack),
            k_scale=cache.k_scale.at[:, :, :nbs].set(k_scale),
            k_mn=cache.k_mn.at[:, :, :nbs].set(k_mn),
            v_codes=cache.v_codes.at[:, :, :, :n_full].set(v_pack),
            v_scale=cache.v_scale.at[:, :, :, :n_full].set(v_scale),
            v_mn=cache.v_mn.at[:, :, :, :n_full].set(v_mn),
            comp_len=jnp.int32(n_full),
            prefill_len=jnp.int32(n_full),
        )
        if spec.outliers_per_block:  # avoid zero-size array updates
            cache = cache.replace(
                k_out_idx=cache.k_out_idx.at[:, :, :nbs].set(ko_i),
                k_out_val=cache.k_out_val.at[:, :, :nbs].set(ko_v),
                v_out_idx=cache.v_out_idx.at[:, :, :nbs].set(vo_i),
                v_out_val=cache.v_out_val.at[:, :, :nbs].set(vo_v),
                k_out_bnd=cache.k_out_bnd.at[:, :, :nbs].set(ko_b),
                v_out_bnd=cache.v_out_bnd.at[:, :, :nbs].set(vo_b),
            )
        if use_lowrank and max(spec.prefill_rank,
                               spec.prefill_rank_v_eff) > 0:
            kk, kv = jax.random.split(key)
            k_hat = _dequant_k_block(spec, k_pack, k_scale, k_mn, ko_i, ko_v)
            v_hat = _dequant_v_block(spec, v_pack, v_scale, v_mn, vo_i, vo_v)
            kp1, kqt1, kps1, kqs1 = _error_bases(
                spec, kb, k_hat, spec.prefill_rank, kk)
            vp1, vqt1, vps1, vqs1 = _error_bases(
                spec, vb, v_hat, spec.prefill_rank_v_eff, kv)
            # Replicate the prefill P (and its scales) across its blocks;
            # Q columns in place, per-block scale = the prefill scale.
            kpt1 = jnp.swapaxes(kp1, -1, -2)  # [B,H,R,D]
            vpt1 = jnp.swapaxes(vp1, -1, -2)  # [B,H,R,D]
            cache = cache.replace(
                kpt=cache.kpt.at[:, :, :nbs].set(kpt1[:, :, None].repeat(nbs, 2)),
                kqt=cache.kqt.at[:, :, :, :n_full].set(kqt1),
                vpt=cache.vpt.at[:, :, :nbs].set(vpt1[:, :, None].repeat(nbs, 2)),
                vqt=cache.vqt.at[:, :, :, :n_full].set(vqt1),
                kpt_scale=cache.kpt_scale.at[:, :, :nbs].set(
                    kps1[:, :, None].repeat(nbs, 2)),
                kqt_scale=cache.kqt_scale.at[:, :, :, :nbs].set(
                    kqs1[:, :, :, None].repeat(nbs, 3)),
                vpt_scale=cache.vpt_scale.at[:, :, :nbs].set(
                    vps1[:, :, None].repeat(nbs, 2)),
                vqt_scale=cache.vqt_scale.at[:, :, :, :nbs].set(
                    vqs1[:, :, :, None].repeat(nbs, 3)),
            )

    tail = s - n_full
    if tail:
        cache = cache.replace(
            k_resid=cache.k_resid.at[:, :, :tail].set(
                k[:, :, n_full:].astype(spec.dtype)
            ),
            v_resid=cache.v_resid.at[:, :, :tail].set(
                v[:, :, n_full:].astype(spec.dtype)
            ),
            resid_len=jnp.int32(tail),
        )
    return cache


def _flush(spec: CacheSpec, cache: LayerCache, key, use_lowrank: bool) -> LayerCache:
    """Quantize the full residual buffer into the packed prefix.

    reference behavior: modeling_llamagear.py:265-293 (keys) / :335-384
    (values) — flush happens exactly when the residual reaches ``group``.
    """
    g = spec.group
    kb = cache.k_resid.astype(jnp.float32)
    vb = cache.v_resid.astype(jnp.float32)
    k_pack, k_scale, k_mn, ko_i, ko_v, ko_b = _compress_k_block(spec, kb)
    v_pack, v_scale, v_mn, vo_i, vo_v, vo_b = _compress_v_block(spec, vb)

    blk = cache.comp_len // g
    b, h, d = spec.batch, spec.num_kv_heads, spec.head_dim

    upd = dict(
        k_codes=jax.lax.dynamic_update_slice(
            cache.k_codes, k_pack, (0, 0, 0, cache.comp_len)
        ),
        k_scale=jax.lax.dynamic_update_slice(
            cache.k_scale, k_scale, (0, 0, blk, 0)
        ),
        k_mn=jax.lax.dynamic_update_slice(cache.k_mn, k_mn, (0, 0, blk, 0)),
        v_codes=jax.lax.dynamic_update_slice(
            cache.v_codes, v_pack, (0, 0, 0, cache.comp_len)
        ),
        v_scale=jax.lax.dynamic_update_slice(
            cache.v_scale, v_scale, (0, 0, 0, cache.comp_len)
        ),
        v_mn=jax.lax.dynamic_update_slice(
            cache.v_mn, v_mn, (0, 0, 0, cache.comp_len)
        ),
        comp_len=cache.comp_len + g,
        resid_len=jnp.int32(0),
    )
    if spec.outliers_per_block:  # avoid zero-size array updates
        upd.update(
            k_out_idx=jax.lax.dynamic_update_slice(
                cache.k_out_idx, ko_i, (0, 0, blk, 0)),
            k_out_val=jax.lax.dynamic_update_slice(
                cache.k_out_val, ko_v, (0, 0, blk, 0)),
            v_out_idx=jax.lax.dynamic_update_slice(
                cache.v_out_idx, vo_i, (0, 0, blk, 0)),
            v_out_val=jax.lax.dynamic_update_slice(
                cache.v_out_val, vo_v, (0, 0, blk, 0)),
            k_out_bnd=jax.lax.dynamic_update_slice(
                cache.k_out_bnd, ko_b, (0, 0, blk, 0)),
            v_out_bnd=jax.lax.dynamic_update_slice(
                cache.v_out_bnd, vo_b, (0, 0, blk, 0)),
        )
    if use_lowrank and max(spec.rank, spec.rank_v_eff) > 0:
        kk, kv = jax.random.split(jax.random.fold_in(key, 0))
        k_hat = _dequant_k_block(spec, k_pack, k_scale, k_mn, ko_i, ko_v)
        v_hat = _dequant_v_block(spec, v_pack, v_scale, v_mn, vo_i, vo_v)
        kp1, kqt1, kps1, kqs1 = _error_bases(spec, kb, k_hat, spec.rank, kk)
        vp1, vqt1, vps1, vqs1 = _error_bases(spec, vb, v_hat,
                                             spec.rank_v_eff, kv)
        upd.update(
            kpt=jax.lax.dynamic_update_slice(
                cache.kpt, jnp.swapaxes(kp1, -1, -2)[:, :, None],
                (0, 0, blk, 0, 0)
            ),
            kqt=jax.lax.dynamic_update_slice(
                cache.kqt, kqt1, (0, 0, 0, cache.comp_len)),
            vpt=jax.lax.dynamic_update_slice(
                cache.vpt, jnp.swapaxes(vp1, -1, -2)[:, :, None],
                (0, 0, blk, 0, 0)
            ),
            vqt=jax.lax.dynamic_update_slice(
                cache.vqt, vqt1, (0, 0, 0, cache.comp_len)),
            kpt_scale=jax.lax.dynamic_update_slice(
                cache.kpt_scale, kps1[:, :, None], (0, 0, blk, 0)),
            kqt_scale=jax.lax.dynamic_update_slice(
                cache.kqt_scale, kqs1[:, :, :, None], (0, 0, 0, blk)),
            vpt_scale=jax.lax.dynamic_update_slice(
                cache.vpt_scale, vps1[:, :, None], (0, 0, blk, 0)),
            vqt_scale=jax.lax.dynamic_update_slice(
                cache.vqt_scale, vqs1[:, :, :, None], (0, 0, 0, blk)),
        )
    return cache.replace(**upd)


def append(
    spec: CacheSpec,
    cache: LayerCache,
    k_new: jax.Array,
    v_new: jax.Array,
    *,
    key: jax.Array | None = None,
    use_lowrank: bool = True,
) -> LayerCache:
    """Append one decode step's K/V [B,H,1,D]; flush the residual tier into
    the packed prefix when it fills to ``group`` tokens (lax.cond — jit-safe).

    Capacity: total tokens must stay <= ``spec.max_len``. A flush past
    capacity silently CLAMPS its dynamic_update_slice starts onto the last
    block (mixed per-block state the fast dual-region path mis-reads) —
    callers (engine/serving) size max_len for prompt + max_new_tokens; use
    ``runtime.faults`` guards when generating unbounded.
    """
    i = cache.resid_len
    cache = cache.replace(
        k_resid=jax.lax.dynamic_update_slice(
            cache.k_resid, k_new.astype(spec.dtype), (0, 0, i, 0)
        ),
        v_resid=jax.lax.dynamic_update_slice(
            cache.v_resid, v_new.astype(spec.dtype), (0, 0, i, 0)
        ),
        resid_len=i + 1,
    )
    if key is None:
        key = jax.random.PRNGKey(1)
    key = jax.random.fold_in(key, cache.comp_len)
    return jax.lax.cond(
        cache.resid_len == spec.group,
        lambda c: _flush(spec, c, key, use_lowrank),
        lambda c: c,
        cache,
    )


def base_kpt(spec: CacheSpec, cache: LayerCache) -> jax.Array:
    """Dequantized K low-rank P factor (transposed) [B,H,NB,R,D] f32."""
    kpt = cache.kpt.astype(jnp.float32)
    if spec.base_bits == 8:
        kpt = kpt * cache.kpt_scale[:, :, :, :, None]
    return kpt


def base_vpt(spec: CacheSpec, cache: LayerCache) -> jax.Array:
    """Dequantized V low-rank P factor (transposed) [B,H,NB,R,D] f32."""
    vpt = cache.vpt.astype(jnp.float32)
    if spec.base_bits == 8:
        vpt = vpt * cache.vpt_scale[:, :, :, :, None]
    return vpt


def base_kqt(spec: CacheSpec, cache: LayerCache) -> jax.Array:
    """Dequantized K low-rank Q factor (transposed) [B,H,R,T] f32."""
    kqt = cache.kqt.astype(jnp.float32)
    if spec.base_bits == 8:
        scale = jnp.repeat(cache.kqt_scale, spec.group, axis=-1)
        kqt = kqt * scale
    return kqt


def base_vqt(spec: CacheSpec, cache: LayerCache) -> jax.Array:
    vqt = cache.vqt.astype(jnp.float32)
    if spec.base_bits == 8:
        scale = jnp.repeat(cache.vqt_scale, spec.group, axis=-1)
        vqt = vqt * scale
    return vqt


# ---------------------------------------------------------------------------
# Attention against the compressed cache (XLA reference path).
# The Pallas fused kernel (gear_tpu.kernels.decode) implements the same
# contract; this version is the correctness baseline and CPU fallback.
# ---------------------------------------------------------------------------

def dequantize_kv(spec: CacheSpec, cache: LayerCache):
    """Materialize the full reconstructed K/V [B,H,max_len,D] (prefix tier
    only; includes low-rank correction). For tests and the fallback path."""
    k = _dequant_k_block(spec, cache.k_codes, cache.k_scale, cache.k_mn,
                         cache.k_out_idx, cache.k_out_val)
    v = _dequant_v_block(spec, cache.v_codes, cache.v_scale, cache.v_mn,
                         cache.v_out_idx, cache.v_out_val)
    b, h = spec.batch, spec.num_kv_heads
    nb, g, r = spec.n_blocks, spec.group, spec.r_store
    kqt = base_kqt(spec, cache).reshape(b, h, r, nb, g)
    vqt = base_vqt(spec, cache).reshape(b, h, r, nb, g)
    k_corr = jnp.einsum("bhrng,bhnrd->bhngd", kqt, base_kpt(spec, cache))
    v_corr = jnp.einsum("bhrng,bhnrd->bhngd", vqt, base_vpt(spec, cache))
    k = k + k_corr.reshape(k.shape)
    v = v + v_corr.reshape(v.shape)
    return k, v


def attend(
    spec: CacheSpec,
    cache: LayerCache,
    q: jax.Array,
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    window: int | None = None,
) -> jax.Array:
    """Decode attention of q [B,Hq,Qn,D] against the compressed cache.

    Computes scores against (a) the packed prefix with low-rank correction and
    (b) the residual tier, with a single masked softmax across both, then the
    analogous two-tier PV product. GQA: Hq must be a multiple of num_kv_heads
    (the reference fused path asserts this away, modeling_llamagear.py:206 —
    supported here).

    pad_start: optional int32 [B] — per-row first valid token index (for
    left-padded batches).
    window: optional sliding-window size (Mistral): only the last ``window``
    tokens of the sequence are attended (HF Mistral masks by window at
    decode too; the reference fork inherits that via the attention mask —
    modeling_mistral.py sliding-window mask). Exact across both tiers.
    """
    b, hq, qn, d = q.shape
    hkv = spec.num_kv_heads
    if hq % hkv:
        raise ValueError(f"query heads {hq} not a multiple of kv heads {hkv}")
    gq = hq // hkv
    if sm_scale is None:
        sm_scale = d ** -0.5
    t, nb, g, r = spec.max_len, spec.n_blocks, spec.group, spec.r_store

    qf = q.reshape(b, hkv, gq * qn, d).astype(jnp.float32)

    # --- scores: packed prefix ---
    k_deq = _dequant_k_block(spec, cache.k_codes, cache.k_scale, cache.k_mn,
                             cache.k_out_idx, cache.k_out_val)
    scores_q = jnp.einsum("bhqd,bhtd->bhqt", qf, k_deq)  # k_deq [B,H,T,D]
    # low-rank correction: q·P per block, dotted with per-token Q columns
    kpt = base_kpt(spec, cache)
    kqt = base_kqt(spec, cache).reshape(b, hkv, r, nb, g)
    qp = jnp.einsum("bhqd,bhnrd->bhqnr", qf, kpt)
    scores_lr = jnp.einsum("bhqnr,bhrng->bhqng", qp, kqt).reshape(b, hkv, gq * qn, t)
    # residual tier
    kr = cache.k_resid.astype(jnp.float32)
    scores_res = jnp.einsum("bhqd,bhrd->bhqr", qf, kr)

    scores = jnp.concatenate([scores_q + scores_lr, scores_res], axis=-1)
    scores = scores * sm_scale

    # --- mask ---
    pos = jnp.arange(t + spec.group)
    valid = jnp.where(pos < t, pos < cache.comp_len, (pos - t) < cache.resid_len)
    valid = valid[None, None, None, :]
    if pad_start is not None:
        valid = valid & jnp.where(
            pos[None, :] < t, pos[None, :] >= pad_start[:, None], True
        )[:, None, None, :]
    if window is not None:
        # absolute position: prefix slot i sits at i; residual slot r at
        # comp_len + r. Only the last ``window`` of comp_len+resid_len live.
        total = cache.comp_len + cache.resid_len
        abs_pos = jnp.where(pos < t, pos, cache.comp_len + (pos - t))
        valid = valid & (abs_pos >= total - window)[None, None, None, :]
    scores = jnp.where(valid, scores, -jnp.inf)

    w = jax.nn.softmax(scores, axis=-1)
    wc, wr = w[..., :t], w[..., t:]

    # --- PV: packed prefix ---
    v_deq = _dequant_v_block(spec, cache.v_codes, cache.v_scale, cache.v_mn,
                             cache.v_out_idx, cache.v_out_val)
    out = jnp.einsum("bhqt,bhtd->bhqd", wc, v_deq)
    vpt = base_vpt(spec, cache)
    vqt = base_vqt(spec, cache).reshape(b, hkv, r, nb, g)
    wv = jnp.einsum("bhqng,bhrng->bhqnr", wc.reshape(b, hkv, gq * qn, nb, g), vqt)
    out = out + jnp.einsum("bhqnr,bhnrd->bhqd", wv, vpt)
    out = out + jnp.einsum("bhqr,bhrd->bhqd", wr, cache.v_resid.astype(jnp.float32))

    return out.reshape(b, hq, qn, d).astype(q.dtype)


def attend_partial(
    spec: CacheSpec,
    cache: LayerCache,
    q: jax.Array,
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    include_residual: bool = True,
    token_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Unnormalized flash-style attention state against this cache (shard).

    Returns (acc [B,Hq,Qn,D] f32, m [B,Hq,Qn], l [B,Hq,Qn]) such that the
    softmax-normalized output is acc / l; partial states from KV shards merge
    with :func:`merge_partials` — the sequence-parallel decode building block
    (survey §2.5: KV-sharded long context with online-softmax merge).

    ``token_offset`` is this shard's global position of local token 0 (used
    only for pad masking against global ``pad_start``).
    """
    b, hq, qn, d = q.shape
    hkv = spec.num_kv_heads
    gq = hq // hkv
    if sm_scale is None:
        sm_scale = d ** -0.5
    t, nb, g, r = spec.max_len, spec.n_blocks, spec.group, spec.r_store

    qf = q.reshape(b, hkv, gq * qn, d).astype(jnp.float32)

    k_deq = _dequant_k_block(spec, cache.k_codes, cache.k_scale, cache.k_mn,
                             cache.k_out_idx, cache.k_out_val)
    scores = jnp.einsum("bhqd,bhtd->bhqt", qf, k_deq)
    kpt = base_kpt(spec, cache)
    kqt = base_kqt(spec, cache).reshape(b, hkv, r, nb, g)
    qp = jnp.einsum("bhqd,bhnrd->bhqnr", qf, kpt)
    scores = scores + jnp.einsum(
        "bhqnr,bhrng->bhqng", qp, kqt).reshape(b, hkv, gq * qn, t)
    if include_residual:
        kr = cache.k_resid.astype(jnp.float32)
        scores_res = jnp.einsum("bhqd,bhrd->bhqr", qf, kr)
        scores = jnp.concatenate([scores, scores_res], axis=-1)
    scores = scores * sm_scale

    n_ext = spec.group if include_residual else 0
    pos = jnp.arange(t + n_ext)
    valid = jnp.where(pos < t, pos < cache.comp_len,
                      (pos - t) < cache.resid_len)
    valid = valid[None, None, None, :]
    if pad_start is not None:
        gpos = pos + token_offset
        valid = valid & jnp.where(
            pos[None, :] < t, gpos[None, :] >= pad_start[:, None], True
        )[:, None, None, :]
    scores = jnp.where(valid, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    w = jnp.where(jnp.isfinite(scores), jnp.exp(scores - m_safe[..., None]), 0.0)
    l = jnp.sum(w, axis=-1)
    wc = w[..., :t]
    v_deq = _dequant_v_block(spec, cache.v_codes, cache.v_scale, cache.v_mn,
                             cache.v_out_idx, cache.v_out_val)
    acc = jnp.einsum("bhqt,bhtd->bhqd", wc, v_deq)
    vpt = base_vpt(spec, cache)
    vqt = base_vqt(spec, cache).reshape(b, hkv, r, nb, g)
    wv = jnp.einsum("bhqng,bhrng->bhqnr",
                    wc.reshape(b, hkv, gq * qn, nb, g), vqt)
    acc = acc + jnp.einsum("bhqnr,bhnrd->bhqd", wv, vpt)
    if include_residual:
        acc = acc + jnp.einsum("bhqr,bhrd->bhqd", w[..., t:],
                               cache.v_resid.astype(jnp.float32))

    m = jnp.where(jnp.isfinite(m), m, -1e30)
    shape_out = (b, hq, qn)
    return (acc.reshape(b, hq, qn, d), m.reshape(shape_out),
            l.reshape(shape_out))


def merge_partials(parts):
    """Merge flash-attention partial states [(acc, m, l), ...] -> output.

    Standard online-softmax merge: m* = max m_i; out = sum(acc_i e^{m_i-m*})
    / sum(l_i e^{m_i-m*}).
    """
    accs, ms, ls = zip(*parts)
    m_tot = ms[0]
    for m in ms[1:]:
        m_tot = jnp.maximum(m_tot, m)
    num = 0.0
    den = 0.0
    for acc, m, l in parts:
        a = jnp.where(m > -1e29, jnp.exp(m - m_tot), 0.0)
        num = num + acc * a[..., None]
        den = den + l * a
    return num / den[..., None]


def stack_layers(caches: list[LayerCache]) -> LayerCache:
    """Stack per-layer caches into one pytree with a leading layer axis
    (for lax.scan over layers)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *caches)


def init_stacked(spec: CacheSpec, num_layers: int) -> LayerCache:
    one = init_layer_cache(spec)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_layers,) + x.shape), one
    )
