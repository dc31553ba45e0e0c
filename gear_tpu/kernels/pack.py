"""Pallas TPU kernel: fused group-minmax + quantize + bit-pack.

Replaces the reference's Triton pack kernels
(cuda_supported_gear/quant/new_pack.py:132-177 ``_pack_along_last_dim`` /
``_minmax_along_last_dim``) with a single fused TPU kernel: one read of the
fp block produces packed int32 words + per-group scale/min without
materializing intermediate codes in HBM.

Two entry points matching the cache layouts (gear_tpu.cache):
  * :func:`quant_pack_tokens`  — V-style: groups along the head dim
    (per-token scales), codes byte-strided-packed along the head dim.
  * :func:`quant_pack_channels` — K-style: groups along time (per-channel
    scales), codes still packed along the head dim (packing dim is decoupled
    from grouping dim).

Used on the prefill path where the block is large; the per-flush block
(``group`` tokens) is small enough that the XLA path is equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pack_bytestrided(codes, bits: int):
    """[..., n] int32 codes -> [..., n*bits//32] int32 words, BYTE-STRIDED
    layout (quant.pack_codes_bytestrided semantics).

    Bit-field planes OR into a byte array along lanes; the 4:1 lane
    compaction bytes->words runs as two exact f32 selection matmuls (values
    <= 65535 < 2^24; Mosaic has no strided lane slicing in-kernel).
    """
    vpb = 8 // bits
    n = codes.shape[-1]
    nb = n // vpb
    # int32 end-to-end: Mosaic on v5e supports no uint32<->float casts
    # (all byte values are < 2^16, so int32 arithmetic is exact).
    byte = codes[..., :nb]
    for m in range(1, vpb):
        byte = byte | (codes[..., m * nb:(m + 1) * nb]
                       << jnp.int32(m * bits))
    w = nb // 4
    # selection matrices: S_lo[b, w] = 1 if b==4w, 256 if b==4w+1;
    #                     S_hi[b, w] = 1 if b==4w+2, 256 if b==4w+3.
    brow = jax.lax.broadcasted_iota(jnp.int32, (nb, w), 0)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (nb, w), 1)
    s_lo = (jnp.where(brow == 4 * wcol, 1.0, 0.0)
            + jnp.where(brow == 4 * wcol + 1, 256.0, 0.0)).astype(jnp.float32)
    s_hi = (jnp.where(brow == 4 * wcol + 2, 1.0, 0.0)
            + jnp.where(brow == 4 * wcol + 3, 256.0, 0.0)).astype(jnp.float32)
    bf32 = byte.astype(jnp.float32)
    dims = (((bf32.ndim - 1,), (0,)), ((), ()))
    lo16 = jax.lax.dot_general(bf32, s_lo, dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    hi16 = jax.lax.dot_general(bf32, s_hi, dims,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    # hi16 << 16 wraps into the sign bit for values >= 2^15 — the intended
    # bit pattern for the packed int32 word.
    return lo16.astype(jnp.int32) | (hi16.astype(jnp.int32) << jnp.int32(16))


def _token_kernel(x_ref, codes_ref, scale_ref, mn_ref, *, bits, v_group):
    """x [TM, D] -> packed [TM, WD], scale/mn [TM, NGV]."""
    x = x_ref[...].astype(jnp.float32)
    tm, d = x.shape
    ngv = d // v_group
    levels = (1 << bits) - 1
    code_parts, scales, mns = [], [], []
    for i in range(ngv):
        seg = x[:, i * v_group:(i + 1) * v_group]
        mn = jnp.min(seg, axis=-1, keepdims=True)
        mx = jnp.max(seg, axis=-1, keepdims=True)
        scale = (mx - mn) / levels
        safe = jnp.where(scale == 0.0, 1.0, scale)
        c = jnp.clip(jnp.round((seg - mn) / safe), 0, levels).astype(jnp.int32)
        code_parts.append(c)
        scales.append(scale)
        mns.append(mn)
    codes = jnp.concatenate(code_parts, axis=-1)            # [TM, D]
    codes_ref[...] = _pack_bytestrided(codes, bits)
    scale_ref[...] = jnp.concatenate(scales, axis=-1).astype(scale_ref.dtype)
    mn_ref[...] = jnp.concatenate(mns, axis=-1).astype(mn_ref.dtype)


def _channel_kernel(x_ref, codes_ref, scale_ref, mn_ref, *, bits):
    """x [1, G, D] (one time-block) -> packed [1, G, WD], scale/mn [1, 1, D]."""
    x = x_ref[0].astype(jnp.float32)                        # [G, D]
    levels = (1 << bits) - 1
    mn = jnp.min(x, axis=0, keepdims=True)                  # [1, D]
    mx = jnp.max(x, axis=0, keepdims=True)
    scale = (mx - mn) / levels
    safe = jnp.where(scale == 0.0, 1.0, scale)
    codes = jnp.clip(jnp.round((x - mn) / safe), 0, levels).astype(jnp.int32)
    codes_ref[0] = _pack_bytestrided(codes, bits)
    scale_ref[0] = scale.astype(scale_ref.dtype)
    mn_ref[0] = mn.astype(mn_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bits", "v_group", "sideband_dtype", "interpret"))
def quant_pack_tokens(x, *, bits, v_group, sideband_dtype=jnp.bfloat16,
                      interpret=False):
    """x [M, D] fp -> (packed int32 [M, D*bits//32], scale [M, D//v_group],
    mn) with per-token groups along the head dim (V layout)."""
    m, d = x.shape
    wd = d * bits // 32
    ngv = d // v_group
    # Row tile: must divide m AND be a sublane multiple (8) — Mosaic
    # rejects non-8-multiple block rows unless the block spans the whole
    # array (hit at 16k ctx where m=16256 made the old loop pick 508).
    tm = min(512, m)
    while tm > 1 and (m % tm or tm % 8):
        tm -= 1
    if tm % 8:
        tm = m  # full-array block (equal-to-array dims is always legal)
    kernel = functools.partial(_token_kernel, bits=bits, v_group=v_group)
    return pl.pallas_call(
        kernel,
        grid=(m // tm,),
        in_specs=[pl.BlockSpec((tm, d), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((tm, wd), lambda i: (i, 0)),
            pl.BlockSpec((tm, ngv), lambda i: (i, 0)),
            pl.BlockSpec((tm, ngv), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, wd), jnp.int32),
            jax.ShapeDtypeStruct((m, ngv), sideband_dtype),
            jax.ShapeDtypeStruct((m, ngv), sideband_dtype),
        ],
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("bits", "group", "sideband_dtype", "interpret"))
def quant_pack_channels(x, *, bits, group, sideband_dtype=jnp.bfloat16,
                        interpret=False):
    """x [S, D] fp -> (packed int32 [S, D*bits//32], scale [S//group, D], mn)
    with per-channel groups along time (K layout), codes packed along D."""
    s, d = x.shape
    wd = d * bits // 32
    nbs = s // group
    kernel = functools.partial(_channel_kernel, bits=bits)
    xb = x.reshape(nbs, group, d)
    return pl.pallas_call(
        kernel,
        grid=(nbs,),
        in_specs=[pl.BlockSpec((1, group, d), lambda i: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((1, group, wd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nbs, group, wd), jnp.int32),
            jax.ShapeDtypeStruct((nbs, 1, d), sideband_dtype),
            jax.ShapeDtypeStruct((nbs, 1, d), sideband_dtype),
        ],
        interpret=interpret,
    )(xb)
