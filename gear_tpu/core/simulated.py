"""Simulated ("fake-quant") GEAR compression — the accuracy path.

Quantize -> dequantize immediately; the cache stays in high precision. This is
the path the reference's published GSM8K/BBH/AQuA accuracy numbers use.

Behavioral reference (semantics only):
  - reference: GenerationBench/GenerationTest/GEARLM/Simulated/compress_function.py
      :7-37   per-token quant (groups along flattened h*d)
      :39-67  per-channel quant (groups along seq)
      :100-160 cluster variants with non-divisible seq tail passthrough
      :204-220 gearslkivi_{token,channel}Q_new (outliers+quant then +low-rank)
      :261-333 gears_{channel,token}Q (outlier extract/restore around quant)
      :421-584 compress_insert_function (method dispatch)

Deliberate fixes vs the reference (survey §7.4):
  * level count is always ``2**bits - 1`` (the reference passes
    ``bits**2 - 1`` in the outlier path, which only coincides for bits in {2,4});
  * constant groups do not divide by zero;
  * everything is jit-safe with static shapes (outlier k is static).

Layout note: these functions follow Stack-A semantics where per-token groups
run along the FLATTENED h*d channel axis and per-channel groups along seq —
distinct from the fused KIVI path (per-head groups, see gear_tpu.cache).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import LayerCompressionConfig
from . import lowrank, outliers, quant


def _to_tokens(x: jax.Array) -> jax.Array:
    """[B,H,S,D] -> [B,S,H*D] (token rows)."""
    b, h, s, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b, s, h * d)


def _from_tokens(x: jax.Array, h: int, d: int) -> jax.Array:
    b, s, _ = x.shape
    return jnp.transpose(x.reshape(b, s, h, d), (0, 2, 1, 3))


def fake_token_quant(x: jax.Array, bits: int, group_size: int) -> jax.Array:
    """Per-token fake quant of [B,H,S,D]; groups of ``group_size`` along h*d.

    reference: compress_function.py:7-37.
    """
    b, h, s, d = x.shape
    rows = _to_tokens(x)
    out = quant.fake_quantize_groups(rows, bits, group_size)
    return _from_tokens(out, h, d).astype(x.dtype)


def fake_channel_quant(x: jax.Array, bits: int, group_size: int) -> jax.Array:
    """Per-channel fake quant of [B,H,S,D]; groups of ``group_size`` along seq.

    A trailing ``seq % group_size`` remainder passes through uncompressed
    (reference cluster-variant semantics, compress_function.py:109-122).
    """
    b, h, s, d = x.shape
    rows = _to_tokens(x)  # [b, s, n]
    n_full = (s // group_size) * group_size
    head_rows = rows[:, :n_full, :]
    # Group along seq: [b, s, n] -> [b, n_groups, g, n]; minmax over g.
    cols = jnp.swapaxes(head_rows, 1, 2)  # [b, n, s_full]
    out_cols = quant.fake_quantize_groups(cols, bits, group_size)
    out_head = jnp.swapaxes(out_cols, 1, 2)
    out = jnp.concatenate([out_head, rows[:, n_full:, :]], axis=1) if n_full != s else out_head
    return _from_tokens(out, h, d).astype(x.dtype)


def _outlier_k_tokens(x: jax.Array, sparsity: float) -> int:
    b, h, s, d = x.shape
    return outliers.outlier_k(b * h * s * d, b * s, sparsity)


def outlier_token_quant(
    x: jax.Array, bits: int, group_size: int, sparsity: float
) -> jax.Array:
    """gears_tokenQ: extract outliers per token row, quantize, restore.

    reference: compress_function.py:297-333.
    """
    b, h, s, d = x.shape
    k = _outlier_k_tokens(x, sparsity)
    rows = _to_tokens(x).astype(jnp.float32)
    cleaned, rec = outliers.extract(rows, k)
    cleaned_q = fake_token_quant(_from_tokens(cleaned, h, d), bits, group_size)
    restored = outliers.restore(_to_tokens(cleaned_q.astype(jnp.float32)), rec)
    return _from_tokens(restored, h, d).astype(x.dtype)


def outlier_channel_quant(
    x: jax.Array, bits: int, group_size: int, sparsity: float
) -> jax.Array:
    """gears_channelQ: outliers per channel row (along seq), quantize, restore.

    reference: compress_function.py:261-296. The reference computes k per
    TOKEN-count rows even for the channel path; we mirror that formula.
    """
    b, h, s, d = x.shape
    k = _outlier_k_tokens(x, sparsity)
    k = min(k, s)  # channel rows have seq_len entries
    cols = jnp.swapaxes(_to_tokens(x), 1, 2).astype(jnp.float32)  # [b, n, s]
    cleaned, rec = outliers.extract(cols, k)
    cleaned_bhsd = _from_tokens(jnp.swapaxes(cleaned, 1, 2), h, d)
    cleaned_q = fake_channel_quant(cleaned_bhsd, bits, group_size)
    cols_q = jnp.swapaxes(_to_tokens(cleaned_q.astype(jnp.float32)), 1, 2)
    restored = outliers.restore(cols_q, rec)
    return _from_tokens(jnp.swapaxes(restored, 1, 2), h, d).astype(x.dtype)


def _add_lowrank_error(
    original: jax.Array, approx: jax.Array, rank: int, loop: int, key
) -> jax.Array:
    """approx + rank-r power-iteration reconstruction of (original - approx)."""
    if rank <= 0:
        return approx
    err = original.astype(jnp.float32) - approx.astype(jnp.float32)
    err_lr = lowrank.low_rank_residual(err, rank, loop, key)
    return (approx.astype(jnp.float32) + err_lr).astype(original.dtype)


def gear_token(x, bits, group_size, sparsity, rank, loop, key=None):
    """GEAR V-path: outliers + per-token quant + low-rank error.

    reference: gearslkivi_tokenQ_new, compress_function.py:204-211."""
    out = outlier_token_quant(x, bits, group_size, sparsity)
    return _add_lowrank_error(x, out, rank, loop, key)


def gear_channel(x, bits, group_size, sparsity, rank, loop, key=None):
    """GEAR K-path: outliers + per-channel quant + low-rank error.

    reference: gearslkivi_channelQ_new, compress_function.py:213-220."""
    out = outlier_channel_quant(x, bits, group_size, sparsity)
    return _add_lowrank_error(x, out, rank, loop, key)


def gearl_token(x, bits, group_size, rank, loop, key=None):
    """GEARL V-path: per-token quant + low-rank error (no outliers).

    reference: tokenwise_gearlkivi_tokenQ."""
    out = fake_token_quant(x, bits, group_size)
    return _add_lowrank_error(x, out, rank, loop, key)


def gearl_channel(x, bits, group_size, rank, loop, key=None):
    """GEARL K-path: per-channel quant + low-rank error (no outliers).

    reference: tokenwise_gearlkivi_channelQ."""
    out = fake_channel_quant(x, bits, group_size)
    return _add_lowrank_error(x, out, rank, loop, key)


def compress_kv(
    key_states: jax.Array,
    value_states: jax.Array,
    cfg: LayerCompressionConfig,
    *,
    prefill: bool,
    prng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Method dispatch over a [B,H,S,D] K/V pair — the simulated path's
    equivalent of the reference's compress_insert_function
    (compress_function.py:421-584). Returns compressed-then-reconstructed K, V.
    """
    b, h, s, d = key_states.shape
    method = cfg.compress_method
    if method == "UNIFORM":
        method = "KIVI_V2"
    bits = cfg.quantize_bit
    g = cfg.group_size
    rank, rankv = cfg.rank_for(prefill)
    if prng is None:
        prng = jax.random.PRNGKey(0)
    kk, kv = jax.random.split(prng)

    lo, hi = 0, s
    if cfg.token_preserving:
        lo = int(cfg.start_saving * s)
        hi = s - int(cfg.locality_saving * s)
    k_mid, v_mid = key_states[:, :, lo:hi], value_states[:, :, lo:hi]

    if method == "NONE":
        return key_states, value_states
    elif method == "KIVI_V2":
        k_c = fake_channel_quant(k_mid, bits, g)
        v_c = fake_token_quant(v_mid, bits, g)
    elif method == "KCVT":
        k_c = fake_channel_quant(k_mid, bits, hi - lo)
        v_c = fake_token_quant(v_mid, bits, h * d)
    elif method == "GEAR":
        k_c = gear_channel(k_mid, bits, g, cfg.left, rank, cfg.loop, kk)
        v_c = gear_token(v_mid, bits, g, cfg.left, rankv, cfg.loop, kv)
    elif method == "GEAR-KCVT":
        k_c = gear_channel(k_mid, bits, hi - lo, cfg.left, rank, cfg.loop, kk)
        v_c = gear_token(v_mid, bits, h * d, cfg.left, rankv, cfg.loop, kv)
    elif method == "GEARL":
        k_c = gearl_channel(k_mid, bits, g, rank, cfg.loop, kk)
        v_c = gearl_token(v_mid, bits, g, rankv, cfg.loop, kv)
    elif method == "GEARL-KCVT":
        k_c = gearl_channel(k_mid, bits, hi - lo, rank, cfg.loop, kk)
        v_c = gearl_token(v_mid, bits, h * d, rankv, cfg.loop, kv)
    elif method == "OUTLIER":
        k_c = outlier_channel_quant(k_mid, bits, g, cfg.left)
        v_c = outlier_token_quant(v_mid, bits, g, cfg.left)
    else:
        raise ValueError(f"unknown compress_method {method!r}")

    if lo == 0 and hi == s:
        return k_c, v_c
    k_out = jnp.concatenate([key_states[:, :, :lo], k_c, key_states[:, :, hi:]], axis=2)
    v_out = jnp.concatenate([value_states[:, :, :lo], v_c, value_states[:, :, hi:]], axis=2)
    return k_out, v_out
