"""Pallas TPU kernel: fused compressed-KV decode attention (v5).

Replaces the reference's CUDA ``bgemv4/bgemv2_kernel_outer_dim``
(cuda_supported_gear/quant/csrc/gemv_cuda.cu:264-434) and its out-of-kernel
low-rank correction (modeling_llamagear.py:54-111) with ONE kernel that
streams the packed int32 codes from HBM and, per chunk in VMEM:

  unpack (full-lane shifts) -> K dequant via one expander matmul (scale
  only; the per-block mins fold into score space as ``q . mn``) -> one
  QK^T matmul -> low-rank score correction -> online softmax -> PV against
  the packed V codes with the per-token V scale/min FOLDED INTO the
  attention weights (no dequantized V tensor is ever materialized) ->
  low-rank PV correction -> at the last chunk, the fp residual tier and the
  final softmax normalization, emitting the finished attention output.

So dequantization + error reconstruction + QK^T/PV + cross-tier merge all
happen in one kernel, one HBM pass (BASELINE north star). v5 vs v3: ~2x
fewer VPU ops per element (single cast chain, no [D,chunk] V broadcasts,
no mn expander matmul) and no XLA merge tail.

Layout (see gear_tpu.cache): K and V codes are bit-packed along the head
dim and stored word-major TRANSPOSED ([D/fpi, T] int32, time in lanes) — the
packing dim is decoupled from the quantization-grouping dim, so unpack is
full-lane shifts + a sublane concat producing channel-major [D, chunk]
tiles. K scales per (time-block, channel) [NB, D] expand to [D, chunk] with
a one-hot block-expander matmul; V scales per (token, d-group) [NGV, T]
fold into the attention weights. All matmuls run in bf16 with f32
accumulation (codes <= 255 are exact in bf16). Low-rank Q factors are
stored transposed [R, T]; V's P factor as [NB, R, D].

Mosaic pitfalls observed on v5e and respected here: no bf16 broadcasts of
1-row slices (row-broadcast multiplies run in f32); no bf16 minor-dim-insert
reshapes; block last-two dims are (mult of 8, mult of 128) or equal to the
array dims.

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


def _unpack_words_i32(words_t, bits: int):
    """[WD, chunk] int32 words -> [D, chunk] int32 codes, channel-major.

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
    return jnp.concatenate(parts, axis=0)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_f32(a, b, dims):
    """True-f32 dot. On TPU, f32 matmuls at DEFAULT precision are a single
    bf16 MXU pass — for the mn folds that single rounded value is a
    systematic per-block/group bias that doesn't cancel, so force HIGHEST."""
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _decode_kernel(
    # scalar prefetch
    lens_ref,          # int32 [2] = (comp_len, resid_len)
    pad_start_ref,     # int32 [BH]
    # inputs (VMEM blocks)
    q_ref,        # [1, GQ, D]        f32 (sm_scale folded in)
    qp_ref,       # [1, R, CB, GQ]    f32 (q @ kp, sm_scale folded in)
    kcodes_ref,   # [1, WD, CHUNK]    int32  (WD = D // fpi)
    kscale_ref,   # [1, CB, D]        sideband dtype
    kmn_ref,      # [1, CB, D]
    kqt_ref,      # [1, R, CHUNK]     bf16
    vcodes_ref,   # [1, WD, CHUNK]    int32
    vscale_ref,   # [1, NGV, CHUNK]
    vmn_ref,      # [1, NGV, CHUNK]
    vqt_ref,      # [1, R, CHUNK]     bf16
    vpt_ref,      # [1, CB, R, D]     bf16
    kresid_ref,   # [1, G, D]         cache dtype
    vresid_ref,   # [1, G, D]
    # outputs
    out_ref,      # [1, GQ, D]   f32  (final normalized attention output)
    # scratch
    acc_ref, m_ref, l_ref,
    *, bits: int, group: int, v_group: int, blocks_per_chunk: int,
    ablate: frozenset = frozenset(),
):
    bh = pl.program_id(0)
    nc = pl.program_id(1)
    cb = blocks_per_chunk
    g = group
    chunk = cb * g
    bf = jnp.bfloat16
    f32 = jnp.float32
    gq, d = q_ref.shape[1], q_ref.shape[2]
    r = kqt_ref.shape[1]
    ngv = d // v_group

    @pl.when(nc == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, MASK_VAL)
        l_ref[:] = jnp.zeros_like(l_ref)

    comp_len = lens_ref[0]

    @pl.when(nc * chunk < comp_len)
    def _chunk():
        q = q_ref[0].astype(bf)                             # [GQ, D]

        # One-hot block expander E[c, t] = (t // g == c), [CB, CHUNK].
        crow = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk), 0)
        tcol = jax.lax.broadcasted_iota(jnp.int32, (cb, chunk), 1) // g
        expander = (crow == tcol).astype(bf)                # [CB, CHUNK]

        # ---- K dequant: codes * scale_exp (mins fold into score space) --
        if "noshift" in ablate:                 # profiling aid: skip unpack
            w = kcodes_ref[0]
            kcodes = jnp.concatenate([w] * (32 // bits), axis=0)
        else:
            kcodes = _unpack_words_i32(kcodes_ref[0], bits)  # [D, CHUNK] i32
        if "noexp" in ablate:                   # profiling aid: skip dequant
            k_deqt = kcodes.astype(bf)
        else:
            kscale = kscale_ref[0].astype(bf)               # [CB, D]
            scale_expt = _dot(kscale, expander,
                              (((0,), (0,))))               # [D, CHUNK] f32
            k_deqt = (kcodes.astype(f32) * scale_expt).astype(bf)

        # ---- scores: q @ k_deqT + q.mn per block + low-rank correction --
        s = _dot(q, k_deqt, (((1,), (0,))))                 # [GQ, CHUNK] f32
        if "nomn" not in ablate:
            # q.mn carries a large magnitude; keep it f32 end-to-end (a bf16
            # round here is a systematic per-block bias that doesn't cancel).
            qmn = _dot_f32(q_ref[0], kmn_ref[0].astype(f32),
                           (((1,), (1,))))                  # [GQ, CB] f32
            qmn_exp = jnp.concatenate(
                [jnp.broadcast_to(qmn[:, c:c + 1], (gq, g))
                 for c in range(cb)], axis=1)               # [GQ, CHUNK] f32
            s = s + qmn_exp
        kqt = kqt_ref[0]                                    # [R, CHUNK] bf16
        for ri in range(r if "nolr" not in ablate else 0):
            qp_r = qp_ref[0, ri].astype(bf)                 # [CB, GQ]
            qp_exp = _dot(qp_r, expander, (((0,), (0,))))   # [GQ, CHUNK] f32
            s = s + qp_exp * kqt[ri:ri + 1, :].astype(f32)

        # ---- masking: padding prefix and beyond-comp_len tail -----------
        pad0 = pad_start_ref[bh]
        tok = nc * chunk + jax.lax.broadcasted_iota(jnp.int32, (gq, chunk), 1)
        s = jnp.where((tok >= pad0) & (tok < comp_len), s, MASK_VAL)

        # ---- online softmax ---------------------------------------------
        m_prev = m_ref[:, :1]                               # [GQ, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(s > MASK_VAL / 2, jnp.exp(s - m_new), 0.0)  # [GQ,CHUNK]
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        p_bf = p.astype(bf)

        # ---- PV with V scale/mn FOLDED INTO p (no dequant tensor) -------
        # pv[., d in group i] = (p * vscale[i]) . codes[d, :] + (p . vmn[i])
        if "nov" in ablate:                     # profiling aid: skip V side
            pv = jnp.zeros((gq, d), f32)
        else:
            vcodes = _unpack_words_i32(vcodes_ref[0], bits).astype(bf)
            pv_parts = []
            for i in range(ngv):
                vs_i = vscale_ref[0, i:i + 1, :].astype(f32)  # [1, CHUNK]
                ps = (p * vs_i).astype(bf)                  # [GQ, CHUNK]
                pv_parts.append(_dot(
                    ps, vcodes[i * v_group:(i + 1) * v_group, :],
                    (((1,), (1,)))))                        # [GQ, v_group]
            pv = (jnp.concatenate(pv_parts, axis=-1) if ngv > 1
                  else pv_parts[0])                         # [GQ, D] f32
            if "nomn" not in ablate:
                # per-group mins: (p . vmn) expanded over the group's d-range
                # via a tiny static expander. f32 end-to-end — a bf16 round
                # here is a systematic per-group bias that doesn't cancel.
                pmn = _dot_f32(p, vmn_ref[0].astype(f32),
                               (((1,), (1,))))              # [GQ, NGV]
                grow = jax.lax.broadcasted_iota(jnp.int32, (ngv, d), 0)
                gcol = jax.lax.broadcasted_iota(
                    jnp.int32, (ngv, d), 1) // v_group
                vg_exp = (grow == gcol).astype(f32)         # [NGV, D]
                pv = pv + _dot_f32(pmn, vg_exp, (((1,), (0,))))

            # low-rank PV correction: sum_r ((p * vqt_r) @ E) @ vpt_r
            vqt = vqt_ref[0]                                # [R, CHUNK] bf16
            for ri in range(r if "nolr" not in ablate else 0):
                w_r = (p * vqt[ri:ri + 1, :].astype(f32)).astype(bf)
                wv_r = _dot(w_r, expander, (((1,), (1,))))  # [GQ, CB] f32
                pv = pv + _dot(wv_r.astype(bf),
                               vpt_ref[0, :, ri, :],
                               (((1,), (0,))))              # [GQ, D]

        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(nc == pl.num_programs(1) - 1)
    def _finalize():
        # Residual (uncompressed) tier + final normalization, in-kernel.
        resid_len = lens_ref[1]
        q = q_ref[0].astype(bf)
        kr = kresid_ref[0].astype(bf)                       # [G, D]
        sr = _dot(q, kr, (((1,), (1,))))                    # [GQ, G] f32
        rcol = jax.lax.broadcasted_iota(jnp.int32, (gq, g), 1)
        sr = jnp.where(rcol < resid_len, sr, MASK_VAL)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(sr, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        pr = jnp.where(sr > MASK_VAL / 2, jnp.exp(sr - m_new), 0.0)
        l_tot = l_ref[:, :1] * alpha + jnp.sum(pr, axis=-1, keepdims=True)
        vr = vresid_ref[0].astype(bf)                       # [G, D]
        pv_r = _dot(pr.astype(bf), vr, (((1,), (0,))))      # [GQ, D] f32
        acc = acc_ref[:] * alpha + pv_r
        out_ref[0] = acc / l_tot                            # [GQ, D] f32


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group", "v_group", "blocks_per_chunk",
                     "interpret", "ablate"),
)
def decode_attention(
    lens: jax.Array,         # int32 [2] = (comp_len, resid_len)
    pad_start: jax.Array,    # int32 [BH]
    q: jax.Array,            # [BH, GQ, D] f32 — sm_scale already folded in
    qp: jax.Array,           # [BH, R, NB, GQ] f32 — q @ kp, sm_scale folded
    k_codes: jax.Array,      # [BH, D//fpi, T] int32 (word-major transposed)
    k_scale: jax.Array,      # [BH, NB, D]
    k_mn: jax.Array,         # [BH, NB, D]
    kqt: jax.Array,          # [BH, R, T]
    v_codes: jax.Array,      # [BH, D//fpi, T] int32
    v_scale: jax.Array,      # [BH, NGV, T]
    v_mn: jax.Array,         # [BH, NGV, T]
    vqt: jax.Array,          # [BH, R, T]
    vpt: jax.Array,          # [BH, NB, R, D]
    k_resid: jax.Array,      # [BH, G, D]
    v_resid: jax.Array,      # [BH, G, D]
    *,
    bits: int,
    group: int,
    v_group: int,
    blocks_per_chunk: int = 16,
    interpret: bool = False,
    ablate: frozenset = frozenset(),
):
    """Fused flash-decode over the two-tier compressed cache.

    Returns the normalized attention output [BH, GQ, D] f32 (both tiers).
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
        blocks_per_chunk=cb, ablate=ablate)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, nc),
            in_specs=[
                pl.BlockSpec((1, gq, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, r, cb, gq), lambda i, j, *_: (i, 0, j, 0)),
                pl.BlockSpec((1, wd, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, cb, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, cb, d), lambda i, j, *_: (i, j, 0)),
                pl.BlockSpec((1, r, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, wd, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, ngv, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, ngv, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, r, chunk), lambda i, j, *_: (i, 0, j)),
                pl.BlockSpec((1, cb, r, d), lambda i, j, *_: (i, j, 0, 0)),
                pl.BlockSpec((1, group, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, group, d), lambda i, j, *_: (i, 0, 0)),
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
        out_shape=[
            jax.ShapeDtypeStruct((bh, gq, d), jnp.float32),
        ],
        interpret=interpret,
    )(
        lens, pad_start,
        q, qp, k_codes, k_scale, k_mn, kqt, v_codes, v_scale, v_mn, vqt, vpt,
        k_resid, v_resid,
    )
    return out[0]


def attend_fused(
    spec,
    cache,
    q: jax.Array,            # [B, Hq, Qn, D]
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    blocks_per_chunk: int = 16,
    interpret: bool = False,
    ablate: frozenset = frozenset(),
) -> jax.Array:
    """Drop-in replacement for gear_tpu.cache.attend using the Pallas fused
    kernel for both tiers (packed prefix + residual) of the cache."""
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
    qp = jnp.einsum("bhqd,bhndr->bhrnq", qf, kp)  # [B,H,R,NB,GQ]
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

    lens = jnp.stack([cache.comp_len.astype(jnp.int32),
                      cache.resid_len.astype(jnp.int32)])

    out = decode_attention(
        lens,
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
        flat(cache.k_resid),
        flat(cache.v_resid),
        bits=spec.bits, group=spec.group, v_group=spec.v_group,
        blocks_per_chunk=blocks_per_chunk, interpret=interpret,
        ablate=ablate,
    )

    out = out.reshape(b, hkv, gq_pad, d)[:, :, :gq_n]
    return out.reshape(b, hq, qn, d).astype(q.dtype)
