"""Pallas TPU kernel: fused compressed-KV decode attention (v2, lane-major).

Replaces the reference's CUDA ``bgemv4/bgemv2_kernel_outer_dim``
(cuda_supported_gear/quant/csrc/gemv_cuda.cu:264-434) and its out-of-kernel
low-rank correction (modeling_llamagear.py:54-111) with ONE kernel that
streams the packed int32 codes from HBM and, per 1024-token chunk in VMEM:

  unpack (shift/mask on full-lane [chunk, D] tiles) -> dequant via
  expander-matmul scale/min expansion -> one QK^T matmul -> low-rank score
  correction -> online softmax -> one PV matmul -> low-rank PV correction

so dequantization + error reconstruction + QK^T/PV happen in one HBM pass
(BASELINE north star). The tiny residual tier and the cross-tier softmax
merge run in XLA (:func:`attend_fused`).

Layout (see gear_tpu.cache): K and V codes are bit-packed along the head
dim and stored word-major TRANSPOSED ([D/fpi, T] int32, time in lanes) — the
packing dim is decoupled from the quantization-grouping dim, so unpack is
full-lane shifts + a sublane concat producing channel-major [D, chunk]
tiles. K scales per (time-block, channel) [NB, D] expand to [D, chunk] with
a one-hot block-expander matmul; V scales per (token, d-group) [NGV, T]
expand by sublane broadcast. All matmuls run in bf16 with f32 accumulation
(codes <= 255 are exact in bf16). Low-rank Q factors are stored transposed
[R, T]; V's P factor as [NB, R, D].

Grid is (BH, T // chunk) with flash accumulators in VMEM scratch. Chunks
beyond comp_len are predicated off; partial chunks are masked per token.
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


def _unpack_words_t(words_t, bits: int):
    """[WD, chunk] int32 words -> [D, chunk] bf16 codes, channel-major.

    Under the strided packing, bit-field j of word row w is channel
    ``j * WD + w``, so a SUBLANE concat of the shifted parts restores exact
    channel order — every op runs on full-lane tiles.
    """
    fpi = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    w = words_t.astype(jnp.uint32)
    parts = [
        ((w >> jnp.uint32(j * bits)) & mask).astype(jnp.int32)
        for j in range(fpi)
    ]
    return jnp.concatenate(parts, axis=0).astype(jnp.bfloat16)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _decode_kernel(
    # scalar prefetch
    comp_len_ref, pad_start_ref,
    # inputs (VMEM blocks)
    q_ref,        # [1, GQ, D]        f32 (sm_scale folded in)
    qp_ref,       # [1, CB, R, GQ]    f32 (sm_scale folded in)
    kcodes_ref,   # [1, WD, CHUNK]    int32  (WD = D // fpi)
    kscale_ref,   # [1, CB, D]        sideband dtype
    kmn_ref,      # [1, CB, D]
    kqt_ref,      # [1, R, CHUNK]
    vcodes_ref,   # [1, WD, CHUNK]    int32
    vscale_ref,   # [1, NGV, CHUNK]
    vmn_ref,      # [1, NGV, CHUNK]
    vqt_ref,      # [1, R, CHUNK]
    vpt_ref,      # [1, CB, R, D]
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
        r = kqt_ref.shape[1]
        ngv = d // v_group
        bf = jnp.bfloat16
        q = q_ref[0].astype(bf)                             # [GQ, D]

        # One-hot block expander E[t, c] = (t // g == c), [CHUNK, CB].
        trow = jax.lax.broadcasted_iota(jnp.int32, (chunk, cb), 0) // g
        ccol = jax.lax.broadcasted_iota(jnp.int32, (chunk, cb), 1)
        expander = (trow == ccol).astype(bf)                # [CHUNK, CB]

        # ---- K scores with scale FOLDED INTO q (no dequant tensor) ------
        # s[., t in block c] = (q * kscale[c]) . codes[:, t] + q . kmn[c]
        kcodes = _unpack_words_t(kcodes_ref[0], bits)       # [D, CHUNK] bf16
        kscale = kscale_ref[0].astype(bf)                   # [CB, D]
        kmn = kmn_ref[0].astype(bf)
        s_parts = []
        for c in range(cb):
            qs = q * kscale[c][None, :]                     # [GQ, D]
            s_parts.append(_dot(
                qs, kcodes[:, c * g:(c + 1) * g], (((1,), (0,)))))
        s = jnp.concatenate(s_parts, axis=-1)               # [GQ, CHUNK] f32
        # + per-block q.mn, expanded along the chunk
        qmn = _dot(q, kmn, (((1,), (1,))))                  # [GQ, CB] f32
        s = s + _dot(qmn.astype(bf), expander, (((1,), (1,))))

        # low-rank score correction
        kqt = kqt_ref[0]                                    # [R, CHUNK] bf16
        for ri in range(r):
            qp_r = qp_ref[0, :, ri, :].astype(bf)           # [CB, GQ]
            qp_exp = _dot(qp_r, expander, (((0,), (1,))))   # [GQ, CHUNK] f32
            s = s + qp_exp * kqt[ri][None, :].astype(jnp.float32)

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
        p_bf = p.astype(bf)

        # ---- PV with scale FOLDED INTO p (no dequant tensor) ------------
        # pv[., d in group i] = (p * vscale[i]) . codes[d, :] + (p . vmn[i])
        vcodes = _unpack_words_t(vcodes_ref[0], bits)       # [D, CHUNK] bf16
        vscale = vscale_ref[0].astype(bf)                   # [NGV, CHUNK]
        vmn_f = vmn_ref[0].astype(bf)
        pv_parts = []
        for i in range(ngv):
            ps = p_bf * vscale[i][None, :]                  # [GQ, CHUNK]
            seg = _dot(ps, vcodes[i * v_group:(i + 1) * v_group, :],
                       (((1,), (1,))))                      # [GQ, v_group]
            # bf16 minor-dim insertion is unsupported in Mosaic; contract
            # against the 2-D row slice instead.
            pmn = _dot(p_bf, vmn_f[i:i + 1, :], (((1,), (1,))))  # [GQ, 1]
            pv_parts.append(seg + pmn)
        pv = jnp.concatenate(pv_parts, axis=-1)             # [GQ, D] f32

        # low-rank PV correction: sum_r ((p * vqt_r) @ E) @ vpt_r
        vqt = vqt_ref[0]                                    # [R, CHUNK] bf16
        for ri in range(r):
            w_r = p_bf * vqt[ri][None, :]                   # [GQ, CHUNK]
            wv_r = _dot(w_r, expander, (((1,), (0,))))      # [GQ, CB] f32
            pv = pv + _dot(wv_r.astype(bf),
                           vpt_ref[0, :, ri, :],
                           (((1,), (0,))))                  # [GQ, D]

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
    qp: jax.Array,           # [BH, NB, R, GQ] f32 — q @ kp, sm_scale folded
    k_codes: jax.Array,      # [BH, D//fpi, T] int32 (word-major transposed)
    k_scale: jax.Array,      # [BH, NB, D]
    k_mn: jax.Array,         # [BH, NB, D]
    kqt: jax.Array,          # [BH, R, T]
    v_codes: jax.Array,      # [BH, D//fpi, T] int32
    v_scale: jax.Array,      # [BH, NGV, T]
    v_mn: jax.Array,         # [BH, NGV, T]
    vqt: jax.Array,          # [BH, R, T]
    vpt: jax.Array,          # [BH, NB, R, D]
    *,
    bits: int,
    group: int,
    v_group: int,
    blocks_per_chunk: int = 16,
    interpret: bool = False,
):
    """Flash-decode over the packed compressed prefix.

    Returns (acc [BH,GQ,D], m [BH,GQ], l [BH,GQ]) — unnormalized softmax
    state, merged with the residual tier by the caller.
    """
    bh, gq, d = q.shape
    t = kqt.shape[2]
    nb = t // group
    # Chunk size: cb blocks of `group` tokens. The k_scale block is
    # [cb, D], so cb must be a multiple of 8 or equal nb (TPU tiling rule).
    cb = min(blocks_per_chunk, nb)
    while nb % cb:
        cb -= 1
    if cb % 8 and cb != nb:
        cb = nb  # fall back to one chunk
    nc = nb // cb
    r = kqt.shape[1]
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
                pl.BlockSpec((1, cb, r, gq), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, wd, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, cb, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, cb, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, r, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, wd, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, ngv, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, ngv, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, r, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, cb, r, d), lambda i, j, *_: (i, j, 0, 0)),
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
        q, qp, k_codes, k_scale, k_mn, kqt, v_codes, v_scale, v_mn, vqt, vpt,
    )
    return acc, m[:, :, 0], l[:, :, 0]


def attend_fused(
    spec,
    cache,
    q: jax.Array,            # [B, Hq, Qn, D]
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    blocks_per_chunk: int = 16,
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

    from .. import cache as _cache_mod

    kp = _cache_mod.base_kp(spec, cache)
    qp = jnp.einsum("bhqd,bhndr->bhnrq", qf, kp)  # [B,H,NB,R,GQ]
    # int8 bases are dequantized to bf16 views for the kernel (kernel-native
    # int8 base reads are a later optimization); HBM residency stays int8.
    kqt_in = _cache_mod.base_kqt(spec, cache).astype(jnp.bfloat16) \
        if spec.base_bits == 8 else cache.kqt
    vqt_in = _cache_mod.base_vqt(spec, cache).astype(jnp.bfloat16) \
        if spec.base_bits == 8 else cache.vqt
    vpt_in = _cache_mod.base_vpt(spec, cache).astype(jnp.bfloat16) \
        if spec.base_bits == 8 else cache.vpt

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
        flat(cache.k_scale),
        flat(cache.k_mn),
        flat(kqt_in),
        flat(cache.v_codes),
        flat(cache.v_scale),
        flat(cache.v_mn),
        flat(vqt_in),
        flat(vpt_in),
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
