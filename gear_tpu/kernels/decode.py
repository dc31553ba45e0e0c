"""Pallas TPU kernel: fused compressed-KV decode attention (v6).

Replaces the reference's CUDA ``bgemv4/bgemv2_kernel_outer_dim``
(cuda_supported_gear/quant/csrc/gemv_cuda.cu:264-434) and its out-of-kernel
low-rank correction (modeling_llamagear.py:54-111) with ONE kernel that
streams the packed int32 codes from HBM and, per chunk in VMEM:

  unpack (full-lane shifts) -> QK^T as per-block dots with the per-block K
  scale FOLDED INTO q (mins fold into score space as ``q . mn``; no
  dequantized K tile) -> in-kernel low-rank score correction (tiny per-rank
  ``q @ P`` dots + lane-broadcast expansion) -> online softmax -> PV against
  the packed V codes with the per-token V scale/min FOLDED INTO the
  attention weights (no dequantized V tensor either) -> low-rank PV
  correction (VPU block sums) -> at the last chunk, the fp residual tier
  and the final softmax normalization, emitting the finished output.

Design rule learned from scripts/gemv_probe.py on v5e: decode-GEMV is bound
by the MXU weight port (~128 weight elements/cycle regardless of dtype and
M<=128), so the kernel moves EXACTLY 2*D*chunk weight elements per chunk
(the K and V code tiles) through the MXU and nothing else — every
scale/min/low-rank expansion runs on the VPU or as a tiny-weight dot.

Layout (see gear_tpu.cache): K and V codes are bit-packed along the head
dim and stored word-major TRANSPOSED ([D/fpi, T] int32, time in lanes) — the
packing dim is decoupled from the quantization-grouping dim, so unpack is
full-lane shifts + a sublane concat producing channel-major [D, chunk]
tiles. K scales per (time-block, channel) [NB, D] fold into q per block; V
scales per (token, d-group) [NGV, T] fold into the attention weights. All
matmuls run in bf16 with f32 accumulation (codes <= 255 are exact in bf16).
Low-rank factors are stored transposed: kqt/vqt [R, T], kpt/vpt [NB, R, D].

Mosaic pitfalls observed on v5e and respected here: no bf16 broadcasts of
1-row slices (row-broadcast multiplies run in f32); no bf16 minor-dim-insert
reshapes; block last-two dims are (mult of 8, mult of 128) or equal to the
array dims; f32 dots at DEFAULT precision are a single bf16 MXU pass (use
HIGHEST where a systematic round would bias a whole block).

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


_REP_MASK = {2: 0x03030303, 4: 0x0F0F0F0F}


def _unpack_parts_bf16(words_t, bits: int, interpret: bool = False):
    """[WD, chunk] int32 words -> vpb bf16 part tiles [D/vpb, chunk]; part m
    holds channels [m*D/vpb, (m+1)*D/vpb) in order (no concat relayout).

    BYTE-STRIDED layout (quant.pack_codes_bytestrided): byte 4w+k of a
    row's byte-array is channel 4w+k's m-th bit-field for channel
    ``(4w+k) + m * D/vpb``. On TPU, ``pltpu.bitcast(int32[W, C], int8)``
    expands SUBLANES in byte order, so each bit-field plane is ONE int32
    shift + ONE replicated mask on the quarter-size word tile, bitcast to
    int8 rows that are already in channel order — ~5x fewer VPU ops than
    per-element shift/mask/concat unpack (the old strided layout).
    """
    vpb = 8 // bits
    parts = []
    for m in range(vpb):
        wm = words_t if m == 0 else jax.lax.shift_right_logical(
            pltpu.bitcast(words_t, jnp.uint32), jnp.uint32(m * bits))
        if bits != 8:
            wm = pltpu.bitcast(wm, jnp.int32) & jnp.int32(_REP_MASK[bits])
        else:
            wm = pltpu.bitcast(wm, jnp.int32)
        if interpret:
            b = jax.lax.bitcast_convert_type(wm, jnp.int8)  # [W, C, 4]
            b = jnp.moveaxis(b, -1, 1).reshape(
                wm.shape[0] * 4, wm.shape[1])
        else:
            b = pltpu.bitcast(wm, jnp.int8)                 # [4W, C]
        v = b.astype(jnp.bfloat16)
        if bits == 8:
            # int8 bitcast is signed; 8-bit codes span [0, 255]
            v = jnp.where(v < 0, v + 256.0, v)
        parts.append(v)
    return parts


def _unpack_words_bf16(words_t, bits: int, interpret: bool = False):
    """[WD, chunk] int32 words -> [D, chunk] bf16 codes, channel-major."""
    parts = _unpack_parts_bf16(words_t, bits, interpret=interpret)
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


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


def _b(ref, nd):
    """Read a block ref, stripping leading singleton block dims down to
    ``nd`` dims (dense blocks carry one leading 1, paged pool blocks two)."""
    idx = (0,) * (len(ref.shape) - nd)
    return ref[idx] if idx else ref[...]


def _decode_kernel(
    # scalar prefetch
    lens_ref,          # int32 [NSEQ, 2] = per-sequence (comp_len, resid_len)
    pad_start_ref,     # int32 [BH]
    # inputs (VMEM blocks; paged pool blocks carry an extra leading 1)
    q_ref,        # [1, GQ, D]        f32 (sm_scale folded in)
    kpt_ref,      # [1, CB, R, D]     bf16 (K low-rank P factor, transposed)
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
    hkv: int = 1, interpret: bool = False,
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
    r = kqt_ref.shape[-2]
    ngv = d // v_group

    @pl.when(nc == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, MASK_VAL)
        l_ref[:] = jnp.zeros_like(l_ref)

    comp_len = lens_ref[bh // hkv, 0]

    def _chunk():
        q = q_ref[0].astype(bf)                             # [GQ, D]

        # ---- K scores with the per-block scale FOLDED INTO q -------------
        # s[:, t in block c] = (q * kscale[c]) . codes[:, t] + q . kmn[c].
        # No dequantized K tile is ever materialized. Per-block small dots,
        # q.mn and low-rank expansions via lane broadcasts: measured FASTER
        # on v5e than the expander-matmul forms (v8 experiment regressed
        # 217us -> 230-268us at 8k ctx; see commit log).
        if "noshift" in ablate:                 # profiling aid: skip unpack
            w = _b(kcodes_ref, 2)
            vpb = 8 // bits if bits != 8 else 1
            part = jnp.concatenate(
                [w] * (d // vpb // w.shape[0]), axis=0).astype(bf)
            kparts = [part] * vpb
        else:
            kparts = _unpack_parts_bf16(_b(kcodes_ref, 2), bits,
                                        interpret=interpret)
        dq = d // len(kparts)     # channels per unpacked part
        qf32 = q_ref[0]                                     # [GQ, D] f32
        kscale = _b(kscale_ref, 2).astype(f32)              # [CB, D]
        s_parts = []
        for c in range(cb):
            qs_c = (qf32 * kscale[c:c + 1, :]).astype(bf)   # [GQ, D]
            # the nibble parts feed the dots DIRECTLY (channel ranges
            # [m*dq, (m+1)*dq)); no [D, CHUNK] concat relayout.
            s_c = _dot(qs_c[:, :dq], kparts[0][:, c * g:(c + 1) * g],
                       (((1,), (0,))))                      # [GQ, g] f32
            for m in range(1, len(kparts)):
                s_c = s_c + _dot(qs_c[:, m * dq:(m + 1) * dq],
                                 kparts[m][:, c * g:(c + 1) * g],
                                 (((1,), (0,))))
            s_parts.append(s_c)
        s = jnp.concatenate(s_parts, axis=1)                # [GQ, CHUNK] f32
        if "nomn" not in ablate:
            # q.mn carries a large magnitude; keep it f32 end-to-end (a bf16
            # round here is a systematic per-block bias that doesn't cancel).
            qmn = _dot_f32(q_ref[0], _b(kmn_ref, 2).astype(f32),
                           (((1,), (1,))))                  # [GQ, CB] f32
            qmn_exp = jnp.concatenate(
                [jnp.broadcast_to(qmn[:, c:c + 1], (gq, g))
                 for c in range(cb)], axis=1)               # [GQ, CHUNK] f32
            s = s + qmn_exp
        # Low-rank score correction. qp = q @ P is computed IN-KERNEL per
        # rank as a tiny dot, then expanded across each block's tokens with
        # lane broadcasts.
        kqt = _b(kqt_ref, 2)                                # [R, CHUNK] bf16
        for ri in range(r if "nolr" not in ablate else 0):
            kpt_r = _b(kpt_ref, 3)[:, ri, :]                # [CB, D] bf16
            qp_r = _dot(q, kpt_r, (((1,), (1,))))           # [GQ, CB] f32
            qp_exp = jnp.concatenate(
                [jnp.broadcast_to(qp_r[:, c:c + 1], (gq, g))
                 for c in range(cb)], axis=1)               # [GQ, CHUNK] f32
            s = s + qp_exp * kqt[ri:ri + 1, :].astype(f32)

        # ---- masking: padding prefix and beyond-comp_len tail -----------
        if "nomask" not in ablate:  # profiling aid
            pad0 = pad_start_ref[bh]
            tok = nc * chunk + jax.lax.broadcasted_iota(
                jnp.int32, (gq, chunk), 1)
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
            vparts = _unpack_parts_bf16(_b(vcodes_ref, 2), bits,
                                        interpret=interpret)
            dqv = d // len(vparts)
            if v_group % dqv == 0:
                # part boundaries align with d-groups: slice parts directly
                def vrows(i):
                    lo_part, n_parts = (i * v_group) // dqv, v_group // dqv
                    return (jnp.concatenate(
                        vparts[lo_part:lo_part + n_parts], axis=0)
                        if n_parts > 1 else vparts[lo_part])
            else:
                vcodes = jnp.concatenate(vparts, axis=0)    # [D, CHUNK]

                def vrows(i):
                    return vcodes[i * v_group:(i + 1) * v_group, :]
            pv_parts = []
            for i in range(ngv):
                vs_i = _b(vscale_ref, 2)[i:i + 1, :].astype(f32)
                ps = (p * vs_i).astype(bf)                  # [GQ, CHUNK]
                pv_parts.append(_dot(ps, vrows(i),
                                     (((1,), (1,)))))       # [GQ, v_group]
            pv = (jnp.concatenate(pv_parts, axis=-1) if ngv > 1
                  else pv_parts[0])                         # [GQ, D] f32
            if "nomn" not in ablate:
                # per-group mins: (p . vmn) expanded over the group's d-range
                # via a tiny static expander. f32 end-to-end — a bf16 round
                # here is a systematic per-group bias that doesn't cancel.
                pmn = _dot_f32(p, _b(vmn_ref, 2).astype(f32),
                               (((1,), (1,))))              # [GQ, NGV]
                grow = jax.lax.broadcasted_iota(jnp.int32, (ngv, d), 0)
                gcol = jax.lax.broadcasted_iota(
                    jnp.int32, (ngv, d), 1) // v_group
                vg_exp = (grow == gcol).astype(f32)         # [NGV, D]
                pv = pv + _dot_f32(pmn, vg_exp, (((1,), (0,))))

            # low-rank PV correction: sum_r blocksum(p * vqt_r) @ vpt_r.
            # The per-block sums run on the VPU (lane-slice reductions).
            vqt = _b(vqt_ref, 2)                            # [R, CHUNK] bf16
            for ri in range(r if "nolr" not in ablate else 0):
                w_r = p * vqt[ri:ri + 1, :].astype(f32)     # [GQ, CHUNK] f32
                wv_r = jnp.concatenate(
                    [jnp.sum(w_r[:, c * g:(c + 1) * g], axis=1,
                             keepdims=True) for c in range(cb)],
                    axis=1)                                 # [GQ, CB] f32
                pv = pv + _dot(wv_r.astype(bf),
                               _b(vpt_ref, 3)[:, ri, :],
                               (((1,), (0,))))              # [GQ, D]

        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    if "nopred" in ablate:  # profiling aid: unconditional chunk execution
        _chunk()
    else:
        pl.when(nc * chunk < comp_len)(_chunk)

    @pl.when(nc == pl.num_programs(1) - 1)
    def _finalize():
        # Residual (uncompressed) tier + final normalization, in-kernel.
        resid_len = lens_ref[bh // hkv, 1]
        q = q_ref[0].astype(bf)
        kr = _b(kresid_ref, 2).astype(bf)                   # [G, D]
        sr = _dot(q, kr, (((1,), (1,))))                    # [GQ, G] f32
        rcol = jax.lax.broadcasted_iota(jnp.int32, (gq, g), 1)
        sr = jnp.where(rcol < resid_len, sr, MASK_VAL)

        m_prev = m_ref[:, :1]
        m_cur = jnp.max(sr, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        pr = jnp.where(sr > MASK_VAL / 2, jnp.exp(sr - m_new), 0.0)
        l_tot = l_ref[:, :1] * alpha + jnp.sum(pr, axis=-1, keepdims=True)
        vr = _b(vresid_ref, 2).astype(bf)                   # [G, D]
        pv_r = _dot(pr.astype(bf), vr, (((1,), (0,))))      # [GQ, D] f32
        acc = acc_ref[:] * alpha + pv_r
        out_ref[0] = acc / l_tot                            # [GQ, D] f32


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group", "v_group", "blocks_per_chunk",
                     "hkv", "interpret", "ablate"),
)
def decode_attention(
    lens: jax.Array,         # int32 [B, 2] = per-seq (comp_len, resid_len)
    pad_start: jax.Array,    # int32 [BH]
    q: jax.Array,            # [BH, GQ, D] f32 — sm_scale already folded in
    kpt: jax.Array,          # [BH, NB, R, D] K low-rank P factor (transposed)
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
    hkv: int = 1,
    interpret: bool = False,
    ablate: frozenset = frozenset(),
):
    """Fused flash-decode over the two-tier compressed cache.

    Returns the normalized attention output [BH, GQ, D] f32 (both tiers).
    ``hkv`` = kv heads per sequence (row i of the BH axis belongs to
    sequence i // hkv of ``lens``).
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
        blocks_per_chunk=cb, hkv=hkv, interpret=interpret, ablate=ablate)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, nc),
            in_specs=[
                pl.BlockSpec((1, gq, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, cb, r, d), lambda i, j, *_: (i, j, 0, 0)),
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
        q, kpt, k_codes, k_scale, k_mn, kqt, v_codes, v_scale, v_mn, vqt,
        vpt, k_resid, v_resid,
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
    kernel for both tiers (packed prefix + residual) of the cache.

    COO outliers (spec.outliers_per_block > 0) fall back to the XLA attend
    path, which restores them exactly — the reference's own fused CUDA path
    never implemented its outlier slots (modeling_llamagear.py:458-466,
    always None); here the capability exists but costs the Pallas fast
    path (in-kernel scatter-free outlier folding is future work)."""
    from .. import cache as _cache_mod0
    if spec.outliers_per_block:
        return _cache_mod0.attend(spec, cache, q, sm_scale=sm_scale,
                                  pad_start=pad_start)
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

    # int8 bases are dequantized to bf16 views for the kernel (kernel-native
    # int8 base reads are a later optimization); HBM residency stays int8.
    kpt_in = _cache_mod.base_kpt(spec, cache).astype(jnp.bfloat16) \
        if spec.base_bits == 8 else cache.kpt.astype(jnp.bfloat16)
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

    lens = jnp.broadcast_to(
        jnp.stack([cache.comp_len.astype(jnp.int32),
                   cache.resid_len.astype(jnp.int32)])[None, :], (b, 2))

    out = decode_attention(
        lens,
        pad_bh,
        flat(qf), flat(kpt_in),
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
        blocks_per_chunk=blocks_per_chunk, hkv=hkv, interpret=interpret,
        ablate=ablate,
    )

    out = out.reshape(b, hkv, gq_pad, d)[:, :, :gq_n]
    return out.reshape(b, hq, qn, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Paged variant: same kernel, pool-indexed DMA via scalar-prefetch block
# tables (the TPU-native paged-attention pattern — the index_map reads the
# table to pick which physical page each grid step streams).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("bits", "group", "v_group", "page_blocks", "hkv",
                     "interpret"),
)
def decode_attention_paged(
    lens: jax.Array,         # int32 [B, 2] per-seq (comp_len, resid_len)
    pad_start: jax.Array,    # int32 [BH]
    block_table: jax.Array,  # int32 [B, MAXP] physical page per logical page
    q: jax.Array,            # [BH, GQ, D] f32 — sm_scale folded in
    kpt: jax.Array,          # [P, H, PB, R, D] pool leaves ----------------
    k_codes: jax.Array,      # [P, H, D//fpi, PT] int32
    k_scale: jax.Array,      # [P, H, PB, D]
    k_mn: jax.Array,         # [P, H, PB, D]
    kqt: jax.Array,          # [P, H, R, PT]
    v_codes: jax.Array,      # [P, H, D//fpi, PT] int32
    v_scale: jax.Array,      # [P, H, NGV, PT]
    v_mn: jax.Array,         # [P, H, NGV, PT]
    vqt: jax.Array,          # [P, H, R, PT]
    vpt: jax.Array,          # [P, H, PB, R, D] ------------------------------
    k_resid: jax.Array,      # [B, H, G, D] per-seq residual tier
    v_resid: jax.Array,      # [B, H, G, D]
    *,
    bits: int,
    group: int,
    v_group: int,
    page_blocks: int,
    hkv: int,
    interpret: bool = False,
):
    """Fused flash-decode directly over the physical page pool.

    One grid step streams one page; the scalar-prefetched ``block_table``
    drives the DMA source page, so no gather/copy of pages ever happens.
    Unallocated table tail entries must be clamped to a valid page id (the
    kernel masks them off via comp_len).
    """
    bh, gq, d = q.shape
    maxp = block_table.shape[1]
    cb = page_blocks
    chunk = cb * group
    r = kqt.shape[2]
    wd = d // (32 // bits)
    ngv = d // v_group

    def kernel(lens_ref, pad_ref, bt_ref, *args):
        # bt_ref drives the index_maps only; the kernel body never reads it.
        _decode_kernel(lens_ref, pad_ref, *args,
                       bits=bits, group=group, v_group=v_group,
                       blocks_per_chunk=cb, hkv=hkv, interpret=interpret)

    def tok(i, j, lens_, pad_, bt_):
        return (bt_[i // hkv, j], i % hkv, 0, 0)

    def blk(i, j, lens_, pad_, bt_):
        return (bt_[i // hkv, j], i % hkv, 0, 0, 0)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bh, maxp),
            in_specs=[
                pl.BlockSpec((1, gq, d), lambda i, j, *_: (i, 0, 0)),
                pl.BlockSpec((1, 1, cb, r, d), blk),
                pl.BlockSpec((1, 1, wd, chunk), tok),
                pl.BlockSpec((1, 1, cb, d), tok),
                pl.BlockSpec((1, 1, cb, d), tok),
                pl.BlockSpec((1, 1, r, chunk), tok),
                pl.BlockSpec((1, 1, wd, chunk), tok),
                pl.BlockSpec((1, 1, ngv, chunk), tok),
                pl.BlockSpec((1, 1, ngv, chunk), tok),
                pl.BlockSpec((1, 1, r, chunk), tok),
                pl.BlockSpec((1, 1, cb, r, d), blk),
                pl.BlockSpec((1, 1, group, d),
                             lambda i, j, *_: (i // hkv, i % hkv, 0, 0)),
                pl.BlockSpec((1, 1, group, d),
                             lambda i, j, *_: (i // hkv, i % hkv, 0, 0)),
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
        lens, pad_start, block_table,
        q, kpt, k_codes, k_scale, k_mn, kqt, v_codes, v_scale, v_mn, vqt,
        vpt, k_resid, v_resid,
    )
    return out[0]


def attend_paged(
    pspec,
    pool,
    seqs,
    q: jax.Array,            # [B, Hq, Qn, D]
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention for a batch of paged sequences (gear_tpu.paged).

    Per-sequence lengths (continuous batching) are native here — each row
    of ``seqs`` masks by its own comp_len/resid_len.
    """
    spec = pspec.spec
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

    lens = jnp.stack([seqs.comp_len.astype(jnp.int32),
                      seqs.resid_len.astype(jnp.int32)], axis=1)  # [B, 2]
    bt = jnp.maximum(seqs.block_table.astype(jnp.int32), 0)

    out = decode_attention_paged(
        lens, pad_bh, bt,
        qf.reshape(bhn, gq_pad, d),
        pool.kpt.astype(jnp.bfloat16),
        pool.k_codes, pool.k_scale, pool.k_mn,
        pool.kqt.astype(jnp.bfloat16),
        pool.v_codes, pool.v_scale, pool.v_mn,
        pool.vqt.astype(jnp.bfloat16),
        pool.vpt.astype(jnp.bfloat16),
        seqs.k_resid, seqs.v_resid,
        bits=spec.bits, group=spec.group, v_group=spec.v_group,
        page_blocks=pspec.page_blocks, hkv=hkv, interpret=interpret,
    )
    out = out.reshape(b, hkv, gq_pad, d)[:, :, :gq_n]
    return out.reshape(b, hq, qn, d).astype(q.dtype)

