"""Pallas TPU kernel: fused compressed-KV decode attention.

Replaces the reference's CUDA ``bgemv4/bgemv2_kernel_outer_dim``
(cuda_supported_gear/quant/csrc/gemv_cuda.cu:264-434) and its out-of-kernel
low-rank correction (modeling_llamagear.py:54-111) with ONE kernel that
streams the packed int32 codes from HBM and performs, per time-chunk, in VMEM:

  unpack (shift/mask on strided lanes) -> scale-folded score matmul
  (exact: ``(q*scale) @ codes + q.mn``) -> low-rank score correction
  (``qp @ kq^T``) -> online softmax -> scale-folded PV matmul
  -> low-rank output correction (``(p@vq) @ vp^T``)

so dequantization + error reconstruction + QK^T/PV happen in one HBM pass
(BASELINE north star). The tiny residual tier and the cross-tier softmax
merge run in XLA (:func:`attend_fused`).

Layouts (see gear_tpu.cache):
  K codes [BH, NB, D, group//fpi] int32, block-major, block-local strided
  packing along time; V codes [BH, T, D//fpi] int32, strided along head dim;
  K scale/mn per (time-block, channel); V scale/mn per (token, d-group).

Grid is (BH, NB // blocks_per_chunk): each step handles ``blocks_per_chunk``
quant groups (default 8 groups = 512 tokens) to amortize per-step pipeline
overhead; flash-style accumulators live in VMEM scratch. Chunks beyond
comp_len are predicated off; partial chunks are masked per token.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Finite "minus infinity": keeps the online-softmax recurrences NaN-free when
# an entire chunk is masked (exp(-inf - -inf) would be NaN).
MASK_VAL = -1e30


def _unpack_strided(words_u32, bits: int):
    """[..., W] uint32 -> [..., W * fpi] codes (lane-order identity)."""
    fpi = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    parts = [(words_u32 >> jnp.uint32(j * bits)) & mask for j in range(fpi)]
    # Mosaic supports uint32->int32 but not uint32->float; go via int32
    # (values fit in [0, 255]).
    return jnp.concatenate(parts, axis=-1).astype(jnp.int32)


def _decode_kernel(
    # scalar prefetch
    comp_len_ref, pad_start_ref,
    # inputs (VMEM blocks)
    q_ref,        # [1, GQ, D]      f32 (sm_scale folded in)
    qp_ref,       # [1, CB, GQ, R]  f32 (sm_scale folded in)
    kcodes_ref,   # [1, CB, D, WG]  int32  (WG = group // fpi)
    kscale_ref,   # [1, CB, 1, D]   sideband dtype
    kmn_ref,      # [1, CB, 1, D]
    kq_ref,       # [1, CB*G, R]
    vcodes_ref,   # [1, CB*G, WD]   int32  (WD = D // fpi)
    vscale_ref,   # [1, CB*G, NGV]
    vmn_ref,      # [1, CB*G, NGV]
    vq_ref,       # [1, CB*G, R]
    vp_ref,       # [1, CB, D, R]
    # outputs
    acc_out_ref,  # [1, GQ, D]   f32
    m_out_ref,    # [1, GQ, 128] f32
    l_out_ref,    # [1, GQ, 128] f32
    # scratch
    acc_ref, m_ref, l_ref,
    *, bits: int, group: int, v_group: int, blocks_per_chunk: int,
):
    bh = pl.program_id(0)
    nc = pl.program_id(1)
    cb = blocks_per_chunk
    g = group
    chunk = cb * g

    @pl.when(nc == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, MASK_VAL)
        l_ref[:] = jnp.zeros_like(l_ref)

    comp_len = comp_len_ref[0]

    @pl.when(nc * chunk < comp_len)
    def _chunk():
        gq, d = q_ref.shape[1], q_ref.shape[2]
        q = q_ref[0]                                        # [GQ, D] f32

        # ---- K scores per sub-block: (q*scale) @ codes + q.mn -----------
        s_parts = []
        for sb in range(cb):
            kwords = kcodes_ref[0, sb].astype(jnp.uint32)   # [D, WG]
            kcodes = _unpack_strided(kwords, bits).astype(jnp.float32)
            kscale = kscale_ref[0, sb, 0].astype(jnp.float32)   # [D]
            kmn = kmn_ref[0, sb, 0].astype(jnp.float32)         # [D]
            qs = q * kscale[None, :]
            s_sb = jax.lax.dot_general(
                qs, kcodes, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [GQ, G]
            smn = jax.lax.dot_general(
                q, kmn[:, None], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [GQ, 1]
            s_lr = jax.lax.dot_general(
                qp_ref[0, sb],
                kq_ref[0, sb * g:(sb + 1) * g].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [GQ, G]
            s_parts.append(s_sb + smn + s_lr)
        s = jnp.concatenate(s_parts, axis=-1)               # [GQ, CHUNK]

        # ---- masking: padding prefix and beyond-comp_len tail -----------
        pad0 = pad_start_ref[bh]
        tok = nc * chunk + jax.lax.broadcasted_iota(jnp.int32, (gq, chunk), 1)
        s = jnp.where((tok >= pad0) & (tok < comp_len), s, MASK_VAL)

        # ---- online softmax ---------------------------------------------
        m_prev = m_ref[:, :1]                               # [GQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(s > MASK_VAL / 2, jnp.exp(s - m_new), 0.0)  # [GQ, CHUNK]
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

        # ---- PV: per d-group scale folding ------------------------------
        vwords = vcodes_ref[0].astype(jnp.uint32)           # [CHUNK, WD]
        vcodes = _unpack_strided(vwords, bits).astype(jnp.float32)  # [CHUNK, D]
        vscale = vscale_ref[0].astype(jnp.float32)          # [CHUNK, NGV]
        vmn_f = vmn_ref[0].astype(jnp.float32)
        ngv = d // v_group
        outs = []
        for gd in range(ngv):
            ps = p * vscale[:, gd][None, :]                 # [GQ, CHUNK]
            seg = jax.lax.dot_general(
                ps, vcodes[:, gd * v_group:(gd + 1) * v_group],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [GQ, v_group]
            pmn = jax.lax.dot_general(
                p, vmn_f[:, gd:gd + 1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [GQ, 1]
            outs.append(seg + pmn)
        pv = jnp.concatenate(outs, axis=-1)                 # [GQ, D]

        # ---- low-rank output correction, per sub-block P ----------------
        for sb in range(cb):
            pvq_sb = jax.lax.dot_general(
                p[:, sb * g:(sb + 1) * g],
                vq_ref[0, sb * g:(sb + 1) * g].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # [GQ, R]
            pv = pv + jax.lax.dot_general(
                pvq_sb, vp_ref[0, sb].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [GQ, D]

        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(nc == pl.num_programs(1) - 1)
    def _emit():
        acc_out_ref[0] = acc_ref[:]
        m_out_ref[0] = m_ref[:]
        l_out_ref[0] = l_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group", "v_group", "blocks_per_chunk",
                     "interpret"),
)
def decode_attention_prefix(
    comp_len: jax.Array,     # int32 []
    pad_start: jax.Array,    # int32 [BH]
    q: jax.Array,            # [BH, GQ, D] f32 — sm_scale already folded in
    qp: jax.Array,           # [BH, NB, GQ, R] f32 — q @ kp, sm_scale folded
    k_codes: jax.Array,      # [BH, NB, D, group//fpi] int32
    k_scale: jax.Array,      # [BH, NB, 1, D]
    k_mn: jax.Array,         # [BH, NB, 1, D]
    kq: jax.Array,           # [BH, T, R]
    v_codes: jax.Array,      # [BH, T, D//fpi] int32
    v_scale: jax.Array,      # [BH, T, NGV]
    v_mn: jax.Array,         # [BH, T, NGV]
    vq: jax.Array,           # [BH, T, R]
    vp: jax.Array,           # [BH, NB, D, R]
    *,
    bits: int,
    group: int,
    v_group: int,
    blocks_per_chunk: int = 8,
    interpret: bool = False,
):
    """Flash-decode over the packed compressed prefix.

    Returns (acc [BH,GQ,D], m [BH,GQ], l [BH,GQ]) — unnormalized softmax
    state, merged with the residual tier by the caller.
    """
    bh, gq, d = q.shape
    t = kq.shape[1]
    nb = t // group
    cb = min(blocks_per_chunk, nb)
    while nb % cb:
        cb -= 1
    nc = nb // cb
    r = kq.shape[2]
    wg = group // (32 // bits)
    wd = d // (32 // bits)
    ngv = d // v_group
    chunk = cb * group

    kernel = functools.partial(
        _decode_kernel, bits=bits, group=group, v_group=v_group,
        blocks_per_chunk=cb)

    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, nc),
            in_specs=[
                pl.BlockSpec((1, gq, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, cb, gq, r), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, cb, d, wg), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, cb, 1, d), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, cb, 1, d), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, chunk, r), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, chunk, wd), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, chunk, ngv), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, chunk, ngv), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, chunk, r), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, cb, d, r), lambda i, j, *_: (i, j, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, gq, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, gq, 128), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, gq, 128), lambda i, j, *_: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((gq, d), jnp.float32),
                pltpu.VMEM((gq, 128), jnp.float32),
                pltpu.VMEM((gq, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, gq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, gq, 128), jnp.float32),
            jax.ShapeDtypeStruct((bh, gq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(
        comp_len.reshape(1), pad_start,
        q, qp, k_codes, k_scale, k_mn, kq, v_codes, v_scale, v_mn, vq, vp,
    )
    return acc, m[:, :, 0], l[:, :, 0]


def attend_fused(
    spec,
    cache,
    q: jax.Array,            # [B, Hq, Qn, D]
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    blocks_per_chunk: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for gear_tpu.cache.attend using the Pallas kernel
    for the compressed prefix and XLA for the residual tier + merge."""
    b, hq, qn, d = q.shape
    hkv = spec.num_kv_heads
    gq_n = (hq // hkv) * qn
    if sm_scale is None:
        sm_scale = d ** -0.5
    bhn = b * hkv
    nb = spec.n_blocks

    qf = (q.reshape(b, hkv, gq_n, d) * sm_scale).astype(jnp.float32)
    # GQ padded to the f32 sublane tile (8).
    gq_pad = max(8, ((gq_n + 7) // 8) * 8)
    if gq_pad != gq_n:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, gq_pad - gq_n), (0, 0)))

    kp = cache.kp.astype(jnp.float32)
    qp = jnp.einsum("bhqd,bhndr->bhnqr", qf, kp)

    flat = lambda x: x.reshape(bhn, *x.shape[2:])
    if pad_start is None:
        pad_bh = jnp.zeros((bhn,), jnp.int32)
    else:
        pad_bh = jnp.repeat(pad_start.astype(jnp.int32), hkv)

    acc, m, l = decode_attention_prefix(
        cache.comp_len.astype(jnp.int32),
        pad_bh,
        flat(qf), flat(qp),
        flat(cache.k_codes),
        flat(cache.k_scale).reshape(bhn, nb, 1, d),
        flat(cache.k_mn).reshape(bhn, nb, 1, d),
        flat(cache.kq),
        flat(cache.v_codes),
        flat(cache.v_scale),
        flat(cache.v_mn),
        flat(cache.vq),
        flat(cache.vp),
        bits=spec.bits, group=spec.group, v_group=spec.v_group,
        blocks_per_chunk=blocks_per_chunk, interpret=interpret,
    )

    # ---- residual tier (tiny) in XLA + softmax merge ----------------------
    qr = qf.reshape(b, hkv, gq_pad, d)
    kr = cache.k_resid.astype(jnp.float32)
    s2 = jnp.einsum("bhqd,bhrd->bhqr", qr, kr)  # sm_scale already in q
    rpos = jnp.arange(spec.group)
    s2 = jnp.where((rpos < cache.resid_len)[None, None, None, :], s2, -jnp.inf)
    m2 = jnp.max(s2, axis=-1)
    p2 = jnp.where(
        jnp.isfinite(s2),
        jnp.exp(s2 - jnp.where(jnp.isfinite(m2), m2, 0.0)[..., None]), 0.0)
    l2 = jnp.sum(p2, axis=-1)
    acc2 = jnp.einsum("bhqr,bhrd->bhqd", p2, cache.v_resid.astype(jnp.float32))

    m1 = m.reshape(b, hkv, gq_pad)
    l1 = l.reshape(b, hkv, gq_pad)
    acc1 = acc.reshape(b, hkv, gq_pad, d)
    m2 = jnp.where(jnp.isfinite(m2), m2, MASK_VAL)
    m_tot = jnp.maximum(m1, m2)
    a1 = jnp.where(m1 > MASK_VAL / 2, jnp.exp(m1 - m_tot), 0.0)
    a2 = jnp.where(m2 > MASK_VAL / 2, jnp.exp(m2 - m_tot), 0.0)
    l_tot = l1 * a1 + l2 * a2
    out = (acc1 * a1[..., None] + acc2 * a2[..., None]) / l_tot[..., None]

    out = out[:, :, :gq_n]
    return out.reshape(b, hq, qn, d).astype(q.dtype)
