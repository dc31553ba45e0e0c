"""Pallas TPU kernel: bf16 flash-decode attention over the raw (uncompressed)
KV cache.

Two roles:
  * the fast path for the engine's ``raw`` mode (the fp16-baseline parity
    mode; reference protocol cuda_supported_gear/test.py:95-102 measures
    uncompressed generate as the baseline);
  * the apples-to-apples Pallas baseline for the fused compressed kernel
    (gear_tpu.kernels.decode) — same grid/softmax structure, no codes.

Decode attention is a GEMV: XLA's einsum path upcasts to f32 (half MXU
rate) and re-materializes masks; this kernel streams K/V in bf16 chunks
with f32 flash accumulators in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VAL = -1e30


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _flash_kernel(
    # scalar prefetch
    len_ref,           # int32 [1]
    pad_start_ref,     # int32 [BH]
    # inputs
    q_ref,             # [1, GQ, D] f32 (sm_scale folded in)
    k_ref,             # [1, CHUNK, D] cache dtype
    v_ref,             # [1, CHUNK, D]
    # outputs
    out_ref,           # [1, GQ, D] f32
    # scratch
    acc_ref, m_ref, l_ref,
    *, chunk: int,
):
    bh = pl.program_id(0)
    nc = pl.program_id(1)
    gq = q_ref.shape[1]
    bf = jnp.bfloat16

    @pl.when(nc == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, MASK_VAL)
        l_ref[:] = jnp.zeros_like(l_ref)

    length = len_ref[0]

    @pl.when(nc * chunk < length)
    def _chunk():
        q = q_ref[0].astype(bf)
        k = k_ref[0].astype(bf)                             # [CHUNK, D]
        s = _dot(q, k, (((1,), (1,))))                      # [GQ, CHUNK] f32

        pad0 = pad_start_ref[bh]
        tok = nc * chunk + jax.lax.broadcasted_iota(jnp.int32, (gq, chunk), 1)
        s = jnp.where((tok >= pad0) & (tok < length), s, MASK_VAL)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(s > MASK_VAL / 2, jnp.exp(s - m_new), 0.0)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

        pv = _dot(p.astype(bf), v_ref[0].astype(bf), (((1,), (0,))))
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(nc == pl.num_programs(1) - 1)
    def _finalize():
        out_ref[0] = acc_ref[:] / l_ref[:, :1]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def flash_decode(
    length: jax.Array,       # int32 []
    pad_start: jax.Array,    # int32 [BH]
    q: jax.Array,            # [BH, GQ, D] f32, sm_scale folded in
    k: jax.Array,            # [BH, T, D]
    v: jax.Array,            # [BH, T, D]
    *,
    chunk: int = 1024,
    interpret: bool = False,
):
    bh, gq, d = q.shape
    t = k.shape[1]
    ck = min(chunk, t)
    while t % ck:
        ck -= 1
    nc = t // ck

    out = pl.pallas_call(
        functools.partial(_flash_kernel, chunk=ck),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, nc),
            in_specs=[
                pl.BlockSpec((1, gq, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, ck, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, ck, d), lambda i, j, *_: (i, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, gq, d), lambda i, j, *_: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((gq, d), jnp.float32),
                pltpu.VMEM((gq, 128), jnp.float32),
                pltpu.VMEM((gq, 128), jnp.float32),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((bh, gq, d), jnp.float32)],
        interpret=interpret,
    )(length.reshape(1), pad_start, q, k, v)
    return out[0]


def raw_attend_flash(
    spec,
    c,                       # models.llama.RawLayerCache
    q: jax.Array,            # [B, Hq, Qn, D]
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    chunk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for gear_tpu.models.llama.raw_attend."""
    b, hq, qn, d = q.shape
    hkv = spec.num_kv_heads
    gq_n = (hq // hkv) * qn
    if sm_scale is None:
        sm_scale = d ** -0.5
    bhn = b * hkv

    qf = (q.reshape(b, hkv, gq_n, d) * sm_scale).astype(jnp.float32)
    gq_pad = max(8, ((gq_n + 7) // 8) * 8)
    if gq_pad != gq_n:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, gq_pad - gq_n), (0, 0)))

    if pad_start is None:
        pad_bh = jnp.zeros((bhn,), jnp.int32)
    else:
        pad_bh = jnp.repeat(pad_start.astype(jnp.int32), hkv)

    flat = lambda x: x.reshape(bhn, *x.shape[2:])
    out = flash_decode(
        c.length.astype(jnp.int32), pad_bh,
        flat(qf), flat(c.k), flat(c.v),
        chunk=chunk, interpret=interpret,
    )
    out = out.reshape(b, hkv, gq_pad, d)[:, :, :gq_n]
    return out.reshape(b, hq, qn, d).astype(q.dtype)
