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


def _dotb(a, b, dims):
    """Dot rounded to bf16 — for the exact one-hot selector/expander folds
    into the dequant tiles (Mosaic requires a 32-bit matmul accumulator;
    the round is a separate pre-dot VPU op that pipelines away)."""
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)


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
    # then, positionally (VMEM blocks; paged pool blocks carry an extra
    # leading 1):
    #   q_ref,        [1, GQ, D]        f32 (sm_scale folded in)
    #   kpt_ref,      [1, CB, R, D]     bf16 (K low-rank P factor, transposed)
    #   kcodes_ref,   [1, WD, CHUNK]    int32  (WD = D // fpi)
    #   kscale_ref,   [1, CB, D]        sideband dtype
    #   kmn_ref,      [1, CB, D]
    #   kqt_ref,      [1, R, CHUNK]     bf16
    #   vcodes_ref,   [1, WD, CHUNK]    int32
    #   vscale_ref,   [1, NGV, CHUNK]
    #   vmn_ref,      [1, NGV, CHUNK]
    #   vqt_ref,      [1, R, CHUNK]     bf16
    #   vpt_ref,      [1, CB, R, D]     bf16
    #   kresid_ref,   [1, G, D]         cache dtype
    #   vresid_ref,   [1, G, D]
    #   [if ko: koi_ref, kov_ref, voi_ref, vov_ref — COO outlier deltas,
    #    idx packed 2x16-bit/int32 [1, KO//2, NB], values [1, KO, NB]
    #    (dense; lanes sliced per chunk) or [1, 1, KO(/2), PB] (paged)]
    #   out_ref,      [1, GQ, D]   f32  (final normalized attention output)
    #   acc_ref, m_ref, l_ref  (VMEM scratch)
    *args,
    bits: int, group: int, v_group: int, blocks_per_chunk: int,
    hkv: int = 1, ko: int = 0, interpret: bool = False,
    ablate: frozenset = frozenset(),
):
    if ko:
        (q_ref, kpt_ref, kcodes_ref, kscale_ref, kmn_ref, kqt_ref,
         vcodes_ref, vscale_ref, vmn_ref, vqt_ref, vpt_ref,
         kresid_ref, vresid_ref,
         koi_ref, kov_ref, voi_ref, vov_ref,
         out_ref, acc_ref, m_ref, l_ref) = args
    else:
        (q_ref, kpt_ref, kcodes_ref, kscale_ref, kmn_ref, kqt_ref,
         vcodes_ref, vscale_ref, vmn_ref, vqt_ref, vpt_ref,
         kresid_ref, vresid_ref,
         out_ref, acc_ref, m_ref, l_ref) = args
        koi_ref = kov_ref = voi_ref = vov_ref = None
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

    def _split_oidx(oidx):
        """Flat block index [CB, KO] -> (t_local, d) int32 tiles."""
        if d & (d - 1) == 0:
            t_loc = jax.lax.shift_right_logical(oidx, d.bit_length() - 1)
        else:
            t_loc = oidx // d
        return t_loc, oidx - t_loc * d

    def _ochunk(oref, vref):
        """Outlier idx/val tiles for THIS chunk: [CB, KO] each.

        Block-major storage: this chunk's blocks are a SUBLANE slice (lane
        slices would need 128-aligned starts). idx arrives packed
        two-16-bit-per-int32 ([., KO//2]); unpacking is one mask + one
        logical shift + a lane concat (order-preserving: word j holds
        entries j and j + KO/2)."""
        if vref.shape[-2] != cb:  # dense layout: rows cover all NB blocks
            lead = (0,) * (len(oref.shape) - 2)
            oi = oref[lead + (pl.ds(nc * cb, cb), slice(None))]
            ov = vref[lead + (pl.ds(nc * cb, cb), slice(None))]
        else:
            oi = _b(oref, 2)
            ov = _b(vref, 2)
        lo = oi & jnp.int32(0xFFFF)
        hi = pltpu.bitcast(
            jax.lax.shift_right_logical(pltpu.bitcast(oi, jnp.uint32),
                                        jnp.uint32(16)), jnp.int32)
        return jnp.concatenate([lo, hi], axis=1), ov.astype(f32)

    @pl.when(nc == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, MASK_VAL)
        l_ref[:] = jnp.zeros_like(l_ref)

    comp_len = lens_ref[bh // hkv, 0]

    def _chunk():
        if "nok" in ablate:  # profiling aid: IO/launch floor (no K scores)
            _chunk_nok()
            return
        q = q_ref[0].astype(bf)                             # [GQ, D]
        use_lr = r > 0 and "nolr" not in ablate
        use_mn = "nomn" not in ablate

        # ---- dequantized K tile in VMEM — everything PRE-dot -------------
        # v17 design (profiling table in docs/STATUS.md): any full-size op
        # placed AFTER a score dot serializes with the online-softmax
        # recurrence across chunks (~0.1-0.3us per op per grid step); work
        # placed BEFORE the dot pipelines with the previous chunk's softmax
        # and the next chunk's DMA. So the kernel materializes
        # kdeq [D, CHUNK] bf16 = codes * scale + mn + low-rank correction
        # + COO outlier deltas entirely pre-dot: the scale/mn expansions
        # are one-hot selector matmuls (exact; no Mosaic bf16 row-broadcast
        # pitfalls), the low-rank term is one [CB*R, D]x[CB*R, CHUNK]
        # contraction against block-masked kqt rows, and outliers are
        # per-block one-hot pair dots. Each fold costs one bf16 rounding
        # per K element — the same rounding class as the bf16 flash
        # baseline's K/V tiles. The score dot is then a single
        # [GQ, D] x [D, CHUNK] pass and the post-dot chain is flash-minimal
        # (mask -> softmax -> accumulate).
        if "noshift" in ablate:                 # profiling aid: skip unpack
            w = _b(kcodes_ref, 2)
            vpb = 8 // bits if bits != 8 else 1
            part = jnp.concatenate(
                [w] * (d // vpb // w.shape[0]), axis=0).astype(bf)
            kparts = [part] * vpb
        else:
            kparts = _unpack_parts_bf16(_b(kcodes_ref, 2), bits,
                                        interpret=interpret)
        kcat = (jnp.concatenate(kparts, axis=0)
                if len(kparts) > 1 else kparts[0])          # [D, CHUNK]
        # block selector: esel[c, t] = (t // g == c)
        esel = (jax.lax.broadcasted_iota(jnp.int32, (cb, chunk), 0)
                == jax.lax.broadcasted_iota(
                    jnp.int32, (cb, chunk), 1) // g).astype(bf)
        scale_rep = _dotb(_b(kscale_ref, 2).astype(bf), esel,
                          (((0,), (0,))))                   # [D, CHUNK] bf16
        kdeq = kcat * scale_rep
        if use_mn:
            kdeq = kdeq + _dotb(_b(kmn_ref, 2).astype(bf), esel,
                                (((0,), (0,))))
        kqt = _b(kqt_ref, 2)                                # [R, CHUNK] bf16
        if use_lr:
            # K_corr[d, t] = sum_r kpt[c(t), r, d] * kqt[r, t]: contract the
            # (block, rank) axis of the P factors against block-masked,
            # rank-tiled kqt rows.
            kptflat = _b(kpt_ref, 3).reshape(cb * r, d)     # [CB*R, D]
            wlr = jnp.broadcast_to(
                kqt[None], (cb, r, chunk)).reshape(cb * r, chunk)
            lrsel = (jax.lax.broadcasted_iota(
                         jnp.int32, (cb * r, chunk), 0) // r
                     == jax.lax.broadcasted_iota(
                         jnp.int32, (cb * r, chunk), 1) // g)
            wlr = jnp.where(lrsel, wlr, 0)                  # [CB*R, CHUNK]
            kdeq = kdeq + _dotb(kptflat, wlr, (((0,), (0,))))
        # COO outlier deltas: kdeq[d_o, t_o] += delta_o, scatter-free — per
        # block a one-hot d-gather x one-hot t-scatter pair dot. Replaces
        # the reference's never-implemented fused outlier slots
        # (modeling_llamagear.py:458-466).
        if ko:
            koi, kov = _ochunk(koi_ref, kov_ref)            # [CB, KO]
            kt_loc, kd_col = _split_oidx(koi)
            iota_kd = jax.lax.broadcasted_iota(jnp.int32, (d, ko), 0)
            iota_kg = jax.lax.broadcasted_iota(jnp.int32, (g, ko), 0)
            dk_parts = []
            for c in range(cb):
                gd = jnp.where(kd_col[c:c + 1, :] == iota_kd,
                               kov[c:c + 1, :], 0.0).astype(bf)   # [D, KO]
                wt = (kt_loc[c:c + 1, :] == iota_kg).astype(bf)   # [g, KO]
                dk_parts.append(_dotb(gd, wt, (((1,), (1,)))))    # [D, g]
            kdeq = kdeq + jnp.concatenate(dk_parts, axis=1)

        s = _dot(q, kdeq, (((1,), (0,))))                   # [GQ, CHUNK] f32

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
        if "noexp" in ablate:  # profiling aid: transcendental cost
            alpha = (m_prev - m_new) * 0.01 + 1.0
            p = jnp.where(s > MASK_VAL / 2, (s - m_new) * 0.01 + 1.0, 0.0)
        else:
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(s > MASK_VAL / 2, jnp.exp(s - m_new),
                          0.0)                              # [GQ, CHUNK]
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        p_bf = p.astype(bf)

        # ---- PV against the dequantized V tile (same pre-dot scheme) ----
        # vdeq [D, CHUNK] bf16 = codes * scale + mn + low-rank + outliers;
        # per-(token, d-group) scale/mn rows expand via a one-hot selector
        # dot (group i covers rows [i*v_group, (i+1)*v_group)).
        if "nov" in ablate:                     # profiling aid: skip V side
            pv = jnp.zeros((gq, d), f32)
        else:
            vparts = _unpack_parts_bf16(_b(vcodes_ref, 2), bits,
                                        interpret=interpret)
            vcat = (jnp.concatenate(vparts, axis=0)
                    if len(vparts) > 1 else vparts[0])      # [D, CHUNK]
            vgsel = (jax.lax.broadcasted_iota(jnp.int32, (ngv, d), 0)
                     == jax.lax.broadcasted_iota(
                         jnp.int32, (ngv, d), 1) // v_group).astype(bf)
            vs_rep = _dotb(vgsel, _b(vscale_ref, 2).astype(bf),
                           (((0,), (0,))))                  # [D, CHUNK]
            vdeq = vcat * vs_rep
            if use_mn:
                vdeq = vdeq + _dotb(vgsel, _b(vmn_ref, 2).astype(bf),
                                    (((0,), (0,))))
            vqt = _b(vqt_ref, 2)                            # [R, CHUNK] bf16
            if use_lr:
                vptflat = _b(vpt_ref, 3).reshape(cb * r, d)  # [CB*R, D]
                wvlr = jnp.broadcast_to(
                    vqt[None], (cb, r, chunk)).reshape(cb * r, chunk)
                wvlr = jnp.where(lrsel, wvlr, 0)
                vdeq = vdeq + _dotb(vptflat, wvlr, (((0,), (0,))))
            if ko:
                voi, vov = _ochunk(voi_ref, vov_ref)        # [CB, KO]
                vt_loc, vd_col = _split_oidx(voi)
                iota_vd = jax.lax.broadcasted_iota(jnp.int32, (d, ko), 0)
                iota_vg = jax.lax.broadcasted_iota(jnp.int32, (g, ko), 0)
                dv_parts = []
                for c in range(cb):
                    gd = jnp.where(vd_col[c:c + 1, :] == iota_vd,
                                   vov[c:c + 1, :], 0.0).astype(bf)
                    wt = (vt_loc[c:c + 1, :] == iota_vg).astype(bf)
                    dv_parts.append(_dotb(gd, wt, (((1,), (1,)))))
                vdeq = vdeq + jnp.concatenate(dv_parts, axis=1)

            pv = _dot(p_bf, vdeq, (((1,), (1,))))           # [GQ, D] f32

        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    def _chunk_nok():
        # touch each input tile once; no matmuls, no softmax chain — the
        # residual cost is block DMA + grid-step launch overhead.
        touch = (jnp.sum(_b(kcodes_ref, 2)[:1, :1])
                 + jnp.sum(_b(vcodes_ref, 2)[:1, :1])).astype(f32)
        acc_ref[:] = acc_ref[:] + touch
        m_ref[:] = jnp.maximum(m_ref[:], 0.0)
        l_ref[:] = l_ref[:] + 1.0

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
    lens: jax.Array,         # int32 [B, 3] per-seq (comp, resid, prefill)
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
    k_out_idx: jax.Array | None = None,   # int32 [BH, NB, KO//2] (packed)
    k_out_val: jax.Array | None = None,   # [BH, KO, NB] delta values
    v_out_idx: jax.Array | None = None,
    v_out_val: jax.Array | None = None,
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
    sequence i // hkv of ``lens``). COO outlier corrections (GEAR ``left``)
    are folded in-kernel when the k/v_out arrays are given.
    """
    bh, gq, d = q.shape
    t = kqt.shape[2]
    nb = t // group
    ko = 0 if k_out_idx is None else 2 * k_out_idx.shape[2]
    # Chunk size: cb blocks of `group` tokens. The k_scale block is
    # [cb, D], so cb must be a multiple of 8 or equal nb (TPU tiling rule).
    cb = min(blocks_per_chunk, nb)
    while nb % cb:
        cb -= 1
    if cb % 8 and cb != nb:
        cb = nb  # fall back to one chunk
    if ko and cb % 16 and cb != nb:
        # outlier tiles are sublane-sliced per chunk; bf16 delta rows need
        # 16-aligned starts
        cb = next((c for c in range(min(blocks_per_chunk, nb), 15, -1)
                   if nb % c == 0 and c % 16 == 0), nb)
    nc = nb // cb
    r = kqt.shape[1]
    wd = d // (32 // bits)
    ngv = d // v_group
    chunk = cb * group

    kernel = functools.partial(
        _decode_kernel, bits=bits, group=group, v_group=v_group,
        blocks_per_chunk=cb, hkv=hkv, ko=ko, interpret=interpret,
        ablate=ablate)

    in_specs = [
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
    ]
    inputs = [lens, pad_start,
              q, kpt, k_codes, k_scale, k_mn, kqt, v_codes, v_scale, v_mn,
              vqt, vpt, k_resid, v_resid]
    if ko:
        # full [NB, KO(/2)] tiles per head; constant across j so Pallas only
        # DMAs them once per head — the kernel sublane-slices its chunk.
        in_specs += [
            pl.BlockSpec((1, nb, ko // 2), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, nb, ko), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, nb, ko // 2), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((1, nb, ko), lambda i, j, *_: (i, 0, 0)),
        ]
        inputs += [k_out_idx, k_out_val, v_out_idx, v_out_val]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh, nc),
            in_specs=in_specs,
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
    )(*inputs)
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

    COO outliers (spec.outliers_per_block > 0) are folded IN-KERNEL as
    one-hot gather/scatter dots over the stored deltas — the full GEAR
    recipe (quant + low-rank + outliers) in one HBM pass. The reference's
    fused CUDA path never implemented its outlier slots
    (modeling_llamagear.py:458-466, always None); this surpasses it."""
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
                   cache.resid_len.astype(jnp.int32),
                   cache.prefill_len.astype(jnp.int32)])[None, :], (b, 3))


    if spec.outliers_per_block:
        outlier_args = (flat(cache.k_out_idx), flat(cache.k_out_val),
                        flat(cache.v_out_idx), flat(cache.v_out_val))
    else:
        outlier_args = (None, None, None, None)

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
        *outlier_args,
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
    lens: jax.Array,         # int32 [B, 3] per-seq (comp, resid, prefill)
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
    k_out_idx: jax.Array | None = None,   # int32 [P, H, PB, KO//2]
    k_out_val: jax.Array | None = None,   # [P, H, KO, PB] delta values
    v_out_idx: jax.Array | None = None,
    v_out_val: jax.Array | None = None,
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
    kernel masks them off via comp_len). COO outlier deltas ride along as
    per-page tiles when given.
    """
    bh, gq, d = q.shape
    maxp = block_table.shape[1]
    cb = page_blocks
    chunk = cb * group
    r = kqt.shape[2]
    wd = d // (32 // bits)
    ngv = d // v_group
    ko = 0 if k_out_idx is None else 2 * k_out_idx.shape[3]

    def kernel(lens_ref, pad_ref, bt_ref, *args):
        # bt_ref drives the index_maps only; the kernel body never reads it.
        _decode_kernel(lens_ref, pad_ref, *args,
                       bits=bits, group=group, v_group=v_group,
                       blocks_per_chunk=cb, hkv=hkv, ko=ko,
                       interpret=interpret)

    def tok(i, j, lens_, pad_, bt_):
        return (bt_[i // hkv, j], i % hkv, 0, 0)

    def blk(i, j, lens_, pad_, bt_):
        return (bt_[i // hkv, j], i % hkv, 0, 0, 0)

    in_specs = [
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
    ]
    inputs = [lens, pad_start, block_table,
              q, kpt, k_codes, k_scale, k_mn, kqt, v_codes, v_scale, v_mn,
              vqt, vpt, k_resid, v_resid]
    if ko:
        in_specs += [
            pl.BlockSpec((1, 1, cb, ko // 2), tok),
            pl.BlockSpec((1, 1, cb, ko), tok),
            pl.BlockSpec((1, 1, cb, ko // 2), tok),
            pl.BlockSpec((1, 1, cb, ko), tok),
        ]
        inputs += [k_out_idx, k_out_val, v_out_idx, v_out_val]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bh, maxp),
            in_specs=in_specs,
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
    )(*inputs)
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
                      seqs.resid_len.astype(jnp.int32),
                      seqs.prefill_len.astype(jnp.int32)], axis=1)  # [B, 3]
    bt = jnp.maximum(seqs.block_table.astype(jnp.int32), 0)

    if spec.base_bits == 8:
        # dequantize the int8 pool bases to bf16 views for the kernel
        # (HBM residency stays int8; kernel-native int8 base reads are a
        # later optimization — mirrors the dense attend_fused path).
        kpt_in = (pool.kpt.astype(jnp.float32)
                  * pool.kpt_scale[..., None]).astype(jnp.bfloat16)
        vpt_in = (pool.vpt.astype(jnp.float32)
                  * pool.vpt_scale[..., None]).astype(jnp.bfloat16)
        kqt_in = (pool.kqt.astype(jnp.float32)
                  * jnp.repeat(pool.kqt_scale, spec.group, axis=-1)
                  ).astype(jnp.bfloat16)
        vqt_in = (pool.vqt.astype(jnp.float32)
                  * jnp.repeat(pool.vqt_scale, spec.group, axis=-1)
                  ).astype(jnp.bfloat16)
    else:
        kpt_in = pool.kpt.astype(jnp.bfloat16)
        vpt_in = pool.vpt.astype(jnp.bfloat16)
        kqt_in = pool.kqt.astype(jnp.bfloat16)
        vqt_in = pool.vqt.astype(jnp.bfloat16)

    if spec.outliers_per_block:
        outlier_args = (pool.k_out_idx, pool.k_out_val,
                        pool.v_out_idx, pool.v_out_val)
    else:
        outlier_args = (None, None, None, None)

    out = decode_attention_paged(
        lens, pad_bh, bt,
        qf.reshape(bhn, gq_pad, d),
        kpt_in,
        pool.k_codes, pool.k_scale, pool.k_mn,
        kqt_in,
        pool.v_codes, pool.v_scale, pool.v_mn,
        vqt_in,
        vpt_in,
        seqs.k_resid, seqs.v_resid,
        *outlier_args,
        bits=spec.bits, group=spec.group, v_group=spec.v_group,
        page_blocks=pspec.page_blocks, hkv=hkv, interpret=interpret,
    )
    out = out.reshape(b, hkv, gq_pad, d)[:, :, :gq_n]
    return out.reshape(b, hq, qn, d).astype(q.dtype)

