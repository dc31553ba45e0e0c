"""Pallas TPU kernel: fused compressed-KV decode attention (v18).

Replaces the reference's CUDA ``bgemv4/bgemv2_kernel_outer_dim``
(cuda_supported_gear/quant/csrc/gemv_cuda.cu:264-434) and its out-of-kernel
low-rank correction (modeling_llamagear.py:54-111) with ONE kernel that
streams the packed int32 codes from HBM and computes the full GEAR recipe
(dequant + low-rank error + COO outliers + residual tier) in one pass.

v18 design rule — EVERYTHING IN SCORE SPACE. The kernel's work per chunk is
bounded by the shapes of its intermediates: any fold that materializes a
[D, CHUNK] tile costs a 128-row MXU pass (~8-16x the cost of the actual
[GQ<=8, .] attention GEMVs) or an equivalent VPU sweep. The v17 design
(pre-dot dequantized K/V tiles) paid that for scale, mn, low-rank AND
outliers on both tensors — measured 1.6-3.4x slower than the bf16 flash
baseline despite reading 2.6-8x fewer bytes. v18 keeps every fold in
[GQ, .] or [., small] shapes:

  K scores   s[gq,t] = sum_d (q*scale_c)[d]*code[d,t]   per-block GQ-row dots
           + (q . mn_c)                                  one [GQ,CB] dot
           + (q . P_c) . Q[:,t]                          dual-region low-rank
           + q[d_o] * delta_o at t_o                     per-block one-hot dots
  PV         pv[gq,d] = sum_t (p*vscale)[t]*code[d,t]    GQ-row dots
           + (p . vmn) per d-group + dual-region low-rank + outliers, same.

Dual-region low-rank: all prefill blocks share ONE P factor (replicated in
the cache, gear_tpu.cache.prefill), so chunks fully inside the prefill
region need a single [GQ,R]x[R,CHUNK] dot with q.P0 computed from the
chunk's first block; only chunks touching decode-flushed blocks (at most
the tail beyond ``prefill_len``) take the per-block path (lax.cond).

int8 low-rank bases (base_bits=8, reference true_poweriteration_quantized,
old_models/CompressUtils/TrueCompressFunction.py:166-207) are read DIRECTLY
by the kernel and dequantized in VMEM against their per-(block, rank)
scales — no bf16 base materialization in HBM per step.

Layout (see gear_tpu.cache): K and V codes are bit-packed along the head
dim and stored word-major TRANSPOSED ([D/fpi, T] int32, time in lanes) — the
packing dim is decoupled from the quantization-group dim, so unpack is
full-lane shifts + sublane-expanding int8 bitcasts. K scales per
(time-block, channel) [NB, D]; V scales per (token, d-group) [NGV, T].
Low-rank factors transposed: kqt/vqt [R, T]; kpt/vpt [NB, R, D]. All
matmuls run in bf16 with f32 accumulation (codes <= 255 exact in bf16).

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
    lens_ref,          # int32 [BH, 3] = (comp_len, resid_len, prefill_len)
    #                    per BH ROW (pre-expanded from per-seq outside, so
    #                    the kernel has no global-position dependence and
    #                    shards cleanly along BH)
    pad_start_ref,     # int32 [BH]
    # then, positionally (VMEM blocks; HB = heads_per_step heads batched per
    # grid step on the dense path; paged pool blocks instead carry two
    # leading singleton dims):
    #   q_ref,        [HB, GQ, D]       f32 (sm_scale folded in)
    #   kpt_ref,      [HB, CB, R, D]    bf16|int8 (K low-rank P, transposed)
    #   kcodes_ref,   [HB, WD, CHUNK]   int32  (WD = D // fpi)
    #   kscale_ref,   [HB, CB, D]       sideband dtype
    #   kmn_ref,      [HB, CB, D]
    #   kqt_ref,      [HB, R, CHUNK]    bf16|int8
    #   vcodes_ref,   [HB, WD, CHUNK]   int32
    #   vscale_ref,   [HB, NGV, CHUNK]
    #   vmn_ref,      [HB, NGV, CHUNK]
    #   vqt_ref,      [HB, R, CHUNK]    bf16|int8
    #   vpt_ref,      [HB, CB, R, D]    bf16|int8
    #   kresid_ref,   [HB, G, D]        cache dtype
    #   vresid_ref,   [HB, G, D]
    #   [if base8: kpts_ref/kqts_ref/vqts_ref/vpts_ref — f32 [HB, R, NB]
    #    per-(rank, block) base scales, FULL rows (P pre-transposed); the
    #    kernel roll-slices its chunk's columns. Paged: [1, 1, R, PB].]
    #   [if ko: koi_ref, kov_ref, voi_ref, vov_ref — COO outlier deltas,
    #    idx packed 2x16-bit/int32 [HB, NB, KO//2], values [HB, NB, KO]
    #    (dense; sublanes sliced per chunk) or [1, 1, CB, KO(/2)] (paged),
    #    then kob_ref, vob_ref — sorted-outlier boundary tables int32
    #    [HB, NB, 128] / [1, 1, CB, 128] (see cache._sort_outliers)]
    #   out_ref,      [HB, GQ, D]  f32  (final normalized attention output)
    #   acc_ref, m_ref, l_ref  (VMEM scratch, [HB*GQ, .])
    *args,
    bits: int, group: int, v_group: int, blocks_per_chunk: int,
    ko: int = 0, base8: bool = False, use_lr: bool = True,
    dual_region: bool = True, kcvt: bool = False, hb: int = 1,
    interpret: bool = False, ablate: frozenset = frozenset(),
):
    n_base = 13
    (q_ref, kpt_ref, kcodes_ref, kscale_ref, kmn_ref, kqt_ref,
     vcodes_ref, vscale_ref, vmn_ref, vqt_ref, vpt_ref,
     kresid_ref, vresid_ref) = args[:n_base]
    pos = n_base
    if base8:
        kpts_ref, kqts_ref, vqts_ref, vpts_ref = args[pos:pos + 4]
        pos += 4
    else:
        kpts_ref = kqts_ref = vqts_ref = vpts_ref = None
    if ko:
        (koi_ref, kov_ref, voi_ref, vov_ref) = args[pos:pos + 4]
        pos += 4
        # The K boundary table feeds only the opt-in "kseg" tile form
        # (measured slower than the one-hot scatter at hb>=4, STATUS r4) —
        # the canonical path skips its per-head [NB, 128] int32 DMA.
        if "kseg" in ablate:
            kob_ref = args[pos]
            pos += 1
        else:
            kob_ref = None
        vob_ref = args[pos]
        pos += 1
    else:
        koi_ref = kov_ref = voi_ref = vov_ref = None
        kob_ref = vob_ref = None
    out_ref, acc_ref, m_ref, l_ref = args[pos:pos + 4]

    nc = pl.program_id(1)
    cb = blocks_per_chunk
    g = group
    chunk = cb * g
    bf = jnp.bfloat16
    f32 = jnp.float32
    gq, d = q_ref.shape[-2], q_ref.shape[-1]
    r = kqt_ref.shape[-2]
    ngv = d // v_group
    use_lr = use_lr and r > 0 and "nolr" not in ablate
    use_mn = "nomn" not in ablate

    def _split_oidx(oidx):
        """Flat block index [CB, KO] -> (t_local, d) int32 tiles."""
        if d & (d - 1) == 0:
            t_loc = jax.lax.shift_right_logical(oidx, d.bit_length() - 1)
        else:
            t_loc = oidx // d
        return t_loc, oidx - t_loc * d

    @pl.when(nc == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, MASK_VAL)
        l_ref[:] = jnp.zeros_like(l_ref)

    def _head(h):
        """Emit one batched head's chunk (and finalize) work. ``h`` indexes
        the leading HB dim of the dense blocks (paged blocks: HB == 1 and
        two leading singletons — ``sl`` strips either form)."""
        bh = pl.program_id(0) * hb + h

        def sl(ref, nd):
            lead = len(ref.shape) - nd
            if lead == 0:
                return ref[...]
            if ref.shape[0] == 1 and lead >= 2:
                # paged pool block: [1(page), HB, ...] — head is axis 1
                return ref[(0, h) + (0,) * (lead - 2)]
            return ref[(h,) + (0,) * (lead - 1)]

        def _ochunk(oref, vref):
            """Outlier idx/val tiles for THIS chunk: [CB, KO] each.

            Block-major storage: this chunk's blocks are a SUBLANE slice
            (lane slices would need 128-aligned starts). idx arrives packed
            two-16-bit-per-int32 ([., KO//2]); unpacking is one mask + one
            logical shift + a lane concat (order-preserving: word j holds
            entries j and j + KO/2)."""
            if vref.shape[-2] != cb:  # dense layout: rows cover all NB
                lead = len(oref.shape) - 2
                pre = ((h,) + (0,) * (lead - 1))[:lead]
                oi = oref[pre + (pl.ds(nc * cb, cb), slice(None))]
                ov = vref[pre + (pl.ds(nc * cb, cb), slice(None))]
            else:
                oi = sl(oref, 2)
                ov = sl(vref, 2)
            lo = oi & jnp.int32(0xFFFF)
            hi = pltpu.bitcast(
                jax.lax.shift_right_logical(pltpu.bitcast(oi, jnp.uint32),
                                            jnp.uint32(16)), jnp.int32)
            return jnp.concatenate([lo, hi], axis=1), ov.astype(f32)

        def _bchunk(bref):
            """Boundary-table rows for THIS chunk: [CB, 128] int32."""
            if bref.shape[-2] != cb:  # dense layout: rows cover all NB
                lead = len(bref.shape) - 2
                pre = ((h,) + (0,) * (lead - 1))[:lead]
                return bref[pre + (pl.ds(nc * cb, cb), slice(None))]
            return sl(bref, 2)

        def _cumsum_windows(wins, u_tri):
            """Per-128-window inclusive running sums of the outlier value
            windows. The cumsum is ONE MXU dot with a constant
            lower-triangular matrix per window — same pass count as the
            one-hot scatter dots it replaces, but no data-dependent VPU
            one-hot builds. Window sums are LOCAL; the cross-window offsets
            come back as [GQ, 1] prefix columns so the triangular dots have
            no serial carry chain between them (the r4 chained form
            serialized the MXU: STATUS r4 finding 3) — the gather side adds
            its window's prefix scalar instead."""
            sums = [_dot(w, u_tri, (((1,), (0,)))) for w in wins]
            prefixes, run = [None], None
            for sw in sums[:-1]:
                tot = sw[:, 127:128]                      # [GQ, 1]
                run = tot if run is None else run + tot
                prefixes.append(run)
            return sums, prefixes

        def _gather_bnd_diff(s_wins, e_row):
            """Segmented sums from running sums: gather each boundary's
            running total and difference against the previous boundary.
            ``e_row`` [1, 128] int32 with e[t] = (# entries with key <= t)
            - 1; returns [GQ, 128] per-key contributions."""
            sums, prefixes = s_wins
            eb = jnp.broadcast_to(e_row, (gq, 128))
            gsel = jnp.take_along_axis(
                sums[0], jnp.clip(eb, 0, 127), axis=1)
            for i in range(1, len(sums)):
                gi = jnp.take_along_axis(
                    sums[i], jnp.clip(eb - 128 * i, 0, 127), axis=1)
                gsel = jnp.where(eb >= 128 * i, gi + prefixes[i], gsel)
            gsel = jnp.where(eb < 0, 0.0, gsel)
            if interpret:
                prev = jnp.roll(gsel, 1, axis=1)
            else:
                prev = pltpu.roll(gsel, 1, 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (gq, 128), 1)
            prev = jnp.where(lane == 0, 0.0, prev)
            return gsel - prev

        def _chunk_cols(tile, width):
            """Columns [nc*width, (nc+1)*width) of a full-lane-row scale
            tile. Dense blocks carry the FULL [R, NB] row (a [R, cb] block
            would violate Mosaic's lane-dim tiling constraint); paged blocks
            already arrive per-page (lanes == width) and pass through. The
            dynamic lane slice is a rotate + static slice (Mosaic forbids
            unaligned dynamic lane starts)."""
            nb_l = tile.shape[-1]
            if nb_l == width:
                return tile
            start = nc * width
            if interpret:
                return jax.lax.dynamic_slice_in_dim(tile, start, width, 1)
            return pltpu.roll(tile, jax.lax.rem(nb_l - start, nb_l),
                              1)[:, :width]

        def _deq_qt(qt_ref, qts_ref):
            """Low-rank Q factor chunk [R, CHUNK] -> bf16 (int8 x per-block
            scale when base8). Per-block scales expand to per-token lanes
            via a one-hot dot ([R,CB]x[CB,CHUNK]) — a broadcast+minor-dim
            reshape does not lower on Mosaic."""
            qt = sl(qt_ref, 2)
            if not base8:
                return qt.astype(bf)
            qs = _chunk_cols(sl(qts_ref, 2), cb)             # [R, CB] f32
            ee = (jax.lax.broadcasted_iota(jnp.int32, (cb, chunk), 1) // g
                  == jax.lax.broadcasted_iota(
                      jnp.int32, (cb, chunk), 0)).astype(bf)
            qs_rep = _dot(qs.astype(bf), ee, (((1,), (0,))))  # [R, CHUNK] f32
            return (qt.astype(f32) * qs_rep).astype(bf)

        def _deq_p(pt_ref, pts_ref, c):
            """Low-rank P factor for block c -> [R, D] bf16."""
            p = sl(pt_ref, 3)[c].astype(f32)                 # [R, D]
            if base8:
                ps = _chunk_cols(sl(pts_ref, 2), cb)         # [R, CB] f32
                p = p * ps[:, c:c + 1]                       # [R, 1] f32
            return p.astype(bf)

        comp_len = lens_ref[bh, 0]
        prefill_len = lens_ref[bh, 2]
        rows = slice(h * gq, (h + 1) * gq)

        def _chunk(fast):
            # ``fast`` (STATIC python bool — the two variants are dispatched
            # by disjoint pl.when predicates below, NEVER lax.cond: Mosaic
            # lowers value-returning lax.cond to execute-both-and-select, so
            # a cond-based dual-region always paid the slow path; measured
            # +56us/step at INT2 8k. pl.when side-effect regions do branch.)
            if "nok" in ablate:  # profiling aid: IO/launch floor
                _chunk_nok()
                return
            q32 = sl(q_ref, 2)                               # [GQ, D] f32
            q_bf = q32.astype(bf)

            # ---- unpacked K codes (bf16, channel-major) ------------------
            if "noshift" in ablate:             # profiling aid: skip unpack
                w = sl(kcodes_ref, 2)
                vpb = 8 // bits if bits != 8 else 1
                part = jnp.concatenate(
                    [w] * (d // vpb // w.shape[0]), axis=0).astype(bf)
                kparts = [part] * vpb
            else:
                kparts = _unpack_parts_bf16(sl(kcodes_ref, 2), bits,
                                            interpret=interpret)
            kcat = (jnp.concatenate(kparts, axis=0)
                    if len(kparts) > 1 else kparts[0])       # [D, CHUNK]

            # ---- score pieces: scale folds into q -------------------------
            kscale = sl(kscale_ref, 2).astype(f32)           # [CB, D]
            if use_mn:
                mnq = _dot_f32(q32, sl(kmn_ref, 2).astype(f32),
                               (((1,), (1,))))               # [GQ, CB]
            # Sorted-boundary eligibility: the q/p gather sides need d==128
            # full-lane windows (hardware lane gather); the segmented-sum
            # scatter replacement additionally needs the per-key boundary
            # tables, whose 128 lanes must cover the key range (tokens for
            # K: g <= 128; channels for V: d == 128).
            k_gather_ok = (bool(ko) and d == 128 and ko % 128 == 0
                           and "nobnd" not in ablate)
            v_gather_ok = (bool(ko) and d == 128 and ko % 128 == 0
                           and g in (64, 128) and chunk % 128 == 0
                           and "nobnd" not in ablate)
            # K boundary form: per-block contributions are g-lane tiles; a
            # bare per-block segmented-sum emits [GQ, 128] tiles that must
            # be SLICED to [GQ, g] (misaligned concat relayouts — measured
            # slower than the one-hot scatter at hb>=4). The tile form
            # instead processes 128//g consecutive blocks per tile with a
            # combined boundary row (block w's boundaries offset by w*KO
            # into the tile-cumulative running sum), emitting ALIGNED
            # [GQ, 128] tiles and zero data-dependent one-hot builds.
            # Measured on v5e (8k ctx INT2 canonical, hb=4, in-run): the
            # tile form is 215.5us vs 197.1 for K one-hot + V boundary —
            # the 4-deep cross-window carry chain serializes worse than
            # the [g,128] one-hot builds cost. Keep it opt-in ("kseg").
            k_tile_ok = (k_gather_ok and g in (64, 128)
                         and chunk % 128 == 0 and "kseg" in ablate
                         and not {"noseg", "nokseg"} & ablate)
            v_bnd_ok = v_gather_ok and not {"noseg", "novseg"} & ablate
            if ko:
                koi, kov = _ochunk(koi_ref, kov_ref)         # [CB, KO]
                kt_loc, kd_col = _split_oidx(koi)
                if k_tile_ok or v_bnd_ok:
                    # constant inclusive-prefix matrix: u_tri[o, j] = o <= j
                    u_tri = (jax.lax.broadcasted_iota(
                                 jnp.int32, (128, 128), 0)
                             <= jax.lax.broadcasted_iota(
                                 jnp.int32, (128, 128), 1)).astype(bf)
                if k_tile_ok:
                    kob = _bchunk(kob_ref)                   # [CB, 128]
                else:
                    iota_dko = jax.lax.broadcasted_iota(
                        jnp.int32, (d, ko), 0)
                    iota_gko = jax.lax.broadcasted_iota(
                        jnp.int32, (g, ko), 0)

            def _k_ko_corr():
                """[GQ, CHUNK] outlier score correction in aligned 128-lane
                tiles (one tile = 128//g consecutive blocks)."""
                rpb = 128 // g
                tiles = []
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
                for t0 in range(0, cb, rpb):
                    wins = []
                    for w in range(rpb):
                        c = t0 + w
                        for lo in range(0, ko, 128):
                            idx = kd_col[c:c + 1, lo:lo + 128]
                            qg = jnp.take_along_axis(
                                q32, jnp.broadcast_to(idx, (gq, 128)),
                                axis=1)
                            wins.append((qg * kov[c:c + 1, lo:lo + 128]
                                         ).astype(bf))
                    s_wins = _cumsum_windows(wins, u_tri)
                    if rpb == 1:
                        e = kob[t0:t0 + 1, :]
                    else:
                        # combined boundary row: lanes [0, g) from block
                        # t0, [g, 128) from block t0+1 shifted into place
                        # (roll + select — Mosaic rejects the equivalent
                        # lane concat) and offset by KO into the
                        # tile-cumulative running sum.
                        r0 = kob[t0:t0 + 1, :]
                        r1 = kob[t0 + 1:t0 + 2, :] + ko
                        if interpret:
                            r1 = jnp.roll(r1, g, axis=1)
                        else:
                            r1 = pltpu.roll(r1, g, 1)
                        e = jnp.where(lane < g, r0, r1)
                    tiles.append(_gather_bnd_diff(s_wins, e))
                return jnp.concatenate(tiles, axis=1)        # [GQ, CHUNK]

            def _k_outlier_piece(c):
                # q gathered at the outlier channels, folded with the
                # stored deltas, scattered to the outlier tokens (one-hot
                # dot). Replaces the reference's never-implemented fused
                # outlier slots (modeling_llamagear.py:458-466).
                #
                # Fully gather-based path: the gather side uses the
                # hardware lane gather (v5e: take_along_axis on exactly
                # [*, 128] f32 with same-width int32 indices; KO is padded
                # to a 128 multiple at build, spec.ko_store) and the
                # scatter side becomes running sums (one constant
                # triangular MXU dot per window) gathered at the sorted
                # per-token boundaries — NO data-dependent one-hot builds,
                # which dominated the outlier cost (docs/STATUS.md #6).
                if k_gather_ok:
                    # hybrid: hardware lane gather for q, one-hot token
                    # scatter dot (used when the tile form is ineligible
                    # or ablated off).
                    out = None
                    for lo in range(0, ko, 128):
                        idx = kd_col[c:c + 1, lo:lo + 128]   # [1, 128]
                        qg = jnp.take_along_axis(
                            q32, jnp.broadcast_to(idx, (gq, 128)), axis=1)
                        qgv = (qg * kov[c:c + 1, lo:lo + 128]).astype(bf)
                        wt = (kt_loc[c:c + 1, lo:lo + 128]
                              == iota_gko[:, :128]).astype(bf)
                        piece = _dot(qgv, wt, (((1,), (1,))))
                        out = piece if out is None else out + piece
                    return out                               # [GQ, g]
                oh_d = (kd_col[c:c + 1, :] == iota_dko).astype(bf)
                qg = _dot(q_bf, oh_d, (((1,), (0,))))        # [GQ, KO] f32
                qgv = (qg * kov[c:c + 1, :]).astype(bf)
                wt = (kt_loc[c:c + 1, :] == iota_gko).astype(bf)
                return _dot(qgv, wt, (((1,), (1,))))         # [GQ, g]

            def _scores_blockwise(include_ko):
                per_block_ko = include_ko and not k_tile_ok
                pieces = []
                for c in range(cb):
                    qs = (q32 * kscale[c:c + 1, :]).astype(bf)   # [GQ, D]
                    sc = _dot(qs, kcat[:, c * g:(c + 1) * g],
                              (((1,), (0,))))                # [GQ, g] f32
                    if use_mn:
                        sc = sc + mnq[:, c:c + 1]
                    if per_block_ko:
                        sc = sc + _k_outlier_piece(c)
                    pieces.append(sc)
                out = jnp.concatenate(pieces, axis=1)        # [GQ, CHUNK]
                if include_ko and k_tile_ok:
                    out = out + _k_ko_corr()
                return out

            def _k_lr_fast():
                # Whole chunk inside the prefill region: ONE shared P, and
                # the prefill qt scales are uniform per rank (absmax over
                # the whole span, cache._error_bases) — so fold BOTH base
                # scales into the tiny [R, D] P factor and feed the int8 qt
                # codes to the dot with a bare cast. No per-block scale
                # expansion (rolls / one-hot dots / full-width multiplies)
                # on the hot path.
                p0 = sl(kpt_ref, 3)[0].astype(f32)           # [R, D]
                if base8:
                    p0 = p0 * (sl(kpts_ref, 2)[:, 0:1]
                               * sl(kqts_ref, 2)[:, 0:1])    # [R, 1] f32
                qp0 = _dot(q_bf, p0.astype(bf), (((1,), (1,))))  # [GQ, R]
                kqt_bf = sl(kqt_ref, 2).astype(bf)           # cast only
                return _dot(qp0.astype(bf), kqt_bf, (((1,), (0,))))

            def _k_lr_slow():
                kqt_bf = _deq_qt(kqt_ref, kqts_ref)          # [R, CHUNK] bf
                ps = []
                for c in range(cb):
                    qpc = _dot(q_bf, _deq_p(kpt_ref, kpts_ref, c),
                               (((1,), (1,))))               # [GQ, R]
                    ps.append(_dot(qpc.astype(bf),
                                   kqt_bf[:, c * g:(c + 1) * g],
                                   (((1,), (0,)))))
                return jnp.concatenate(ps, axis=1)

            if kcvt and fast:
                # kcvt_prefill: every prefill block shares ONE [D] scale/mn
                # row, so a chunk inside the prefill region folds the scale
                # into q ONCE and takes a single flash-shaped score dot.
                qs0 = (q32 * kscale[0:1, :]).astype(bf)      # [GQ, D]
                s = _dot(qs0, kcat, (((1,), (0,))))          # [GQ, CHUNK]
                if use_mn:
                    s = s + mnq[:, 0:1]
                if ko:
                    s = s + (_k_ko_corr() if k_tile_ok else jnp.concatenate(
                        [_k_outlier_piece(c) for c in range(cb)], axis=1))
            else:
                s = _scores_blockwise(bool(ko))
            if use_lr:
                s = s + (_k_lr_fast() if fast else _k_lr_slow())

            # ---- masking: padding prefix and beyond-comp_len tail --------
            if "nomask" not in ablate:  # profiling aid
                pad0 = pad_start_ref[bh]
                tok = nc * chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (gq, chunk), 1)
                s = jnp.where((tok >= pad0) & (tok < comp_len), s, MASK_VAL)

            # ---- online softmax ------------------------------------------
            m_prev = m_ref[rows, :1]                         # [GQ, 1]
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            if "noexp" in ablate:  # profiling aid: transcendental cost
                alpha = (m_prev - m_new) * 0.01 + 1.0
                p = jnp.where(s > MASK_VAL / 2,
                              (s - m_new) * 0.01 + 1.0, 0.0)
            else:
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.where(s > MASK_VAL / 2, jnp.exp(s - m_new),
                              0.0)                           # [GQ, CHUNK]
            l_new = (l_ref[rows, :1] * alpha
                     + jnp.sum(p, axis=-1, keepdims=True))
            p_bf = p.astype(bf)

            # ---- PV in weight space: V scale folds into p ----------------
            if "nov" in ablate:                 # profiling aid: skip V side
                pv = jnp.zeros((gq, d), f32)
            else:
                vparts = _unpack_parts_bf16(sl(vcodes_ref, 2), bits,
                                            interpret=interpret)
                vcat = (jnp.concatenate(vparts, axis=0)
                        if len(vparts) > 1 else vparts[0])   # [D, CHUNK]
                vscale = sl(vscale_ref, 2).astype(f32)       # [NGV, CHUNK]
                pvs = []
                for gv in range(ngv):
                    pw = (p * vscale[gv:gv + 1, :]).astype(bf)
                    pvs.append(_dot(pw,
                                    vcat[gv * v_group:(gv + 1) * v_group, :],
                                    (((1,), (1,)))))         # [GQ, v_group]
                pv = jnp.concatenate(pvs, axis=1) if ngv > 1 else pvs[0]
                if use_mn:
                    mv = _dot_f32(p, sl(vmn_ref, 2).astype(f32),
                                  (((1,), (1,))))            # [GQ, NGV]
                    if ngv == 1:
                        pv = pv + mv[:, :1]
                    else:
                        pv = pv + jnp.concatenate(
                            [jnp.broadcast_to(mv[:, i:i + 1], (gq, v_group))
                             for i in range(ngv)], axis=1)
                if use_lr:
                    def _vlr_fast(_):
                        # mirror of _k_lr_fast: per-rank base scales folded
                        # into the tiny P factor; int8 qt codes cast-only.
                        vqt_bf = sl(vqt_ref, 2).astype(bf)
                        u = _dot(p_bf, vqt_bf, (((1,), (1,))))   # [GQ, R]
                        p0v = sl(vpt_ref, 3)[0].astype(f32)      # [R, D]
                        if base8:
                            p0v = p0v * (sl(vpts_ref, 2)[:, 0:1]
                                         * sl(vqts_ref, 2)[:, 0:1])
                        return _dot(u.astype(bf), p0v.astype(bf),
                                    (((1,), (0,))))          # [GQ, D]

                    def _vlr_slow(_):
                        vqt_bf = _deq_qt(vqt_ref, vqts_ref)  # [R, CHUNK]
                        accv = jnp.zeros((gq, d), f32)
                        for c in range(cb):
                            u_c = _dot(p_bf[:, c * g:(c + 1) * g],
                                       vqt_bf[:, c * g:(c + 1) * g],
                                       (((1,), (1,))))       # [GQ, R]
                            accv = accv + _dot(u_c.astype(bf),
                                               _deq_p(vpt_ref, vpts_ref, c),
                                               (((1,), (0,))))
                        return accv

                    pv = pv + (_vlr_fast(0) if fast else _vlr_slow(0))
                if ko:
                    voi, vov = _ochunk(voi_ref, vov_ref)     # [CB, KO]
                    vt_loc, vd_col = _split_oidx(voi)
                    if v_bnd_ok:
                        vob = _bchunk(vob_ref)               # [CB, 128]
                    else:
                        iota_dko = jax.lax.broadcasted_iota(
                            jnp.int32, (d, ko), 0)
                        iota_gko = jax.lax.broadcasted_iota(
                            jnp.int32, (g, ko), 0)
                    # Mirror of _k_outlier_piece: the attention weights at
                    # the outlier tokens come from a [GQ, 128] f32 window
                    # of p covering block c (hardware lane gather, offset
                    # (c*g) % 128); entries are sorted by CHANNEL, so the
                    # per-channel contribution is the boundary-gathered
                    # running-sum difference — lands directly on the d=128
                    # output lanes, no [D, KO] one-hot builds.
                    for c in range(cb):
                        if v_gather_ok:
                            w0 = (c * g) // 128 * 128
                            off = (c * g) % 128
                            win = p[:, w0:w0 + 128]          # f32 [GQ, 128]
                            wins = []
                            for lo in range(0, ko, 128):
                                idx = vt_loc[c:c + 1, lo:lo + 128] + off
                                pg = jnp.take_along_axis(
                                    win, jnp.broadcast_to(idx, (gq, 128)),
                                    axis=1)
                                wins.append(
                                    (pg * vov[c:c + 1, lo:lo + 128]
                                     ).astype(bf))
                            if v_bnd_ok:
                                s_wins = _cumsum_windows(wins, u_tri)
                                pv = pv + _gather_bnd_diff(s_wins,
                                                           vob[c:c + 1, :])
                                continue
                            # "noseg" ablation: one-hot channel scatter
                            for i, lo in enumerate(range(0, ko, 128)):
                                oh_d = (vd_col[c:c + 1, lo:lo + 128]
                                        == iota_dko[:, :128]).astype(bf)
                                pv = pv + _dot(wins[i], oh_d,
                                               (((1,), (1,))))
                            continue
                        wt = (vt_loc[c:c + 1, :] == iota_gko).astype(bf)
                        pg = _dot(p_bf[:, c * g:(c + 1) * g], wt,
                                  (((1,), (0,))))            # [GQ, KO] f32
                        pgv = (pg * vov[c:c + 1, :]).astype(bf)
                        oh_d = (vd_col[c:c + 1, :] == iota_dko).astype(bf)
                        pv = pv + _dot(pgv, oh_d, (((1,), (1,))))

            acc_ref[rows] = acc_ref[rows] * alpha + pv
            m_ref[rows] = jnp.broadcast_to(m_new, (gq, m_ref.shape[1]))
            l_ref[rows] = jnp.broadcast_to(l_new, (gq, l_ref.shape[1]))

        def _chunk_nok():
            # touch each input tile once; no matmuls, no softmax chain —
            # the residual cost is block DMA + grid-step launch overhead.
            touch = (jnp.sum(sl(kcodes_ref, 2)[:1, :1])
                     + jnp.sum(sl(vcodes_ref, 2)[:1, :1])).astype(f32)
            acc_ref[rows] = acc_ref[rows] + touch
            m_ref[rows] = jnp.maximum(m_ref[rows], 0.0)
            l_ref[rows] = l_ref[rows] + 1.0

        valid = nc * chunk < comp_len
        dual = (dual_region and (use_lr or kcvt)
                and not ({"ffast", "fslow", "nopred"} & ablate))
        if "nopred" in ablate:  # profiling aid: unconditional execution
            _chunk("ffast" in ablate)
        elif dual:
            in_pre = (nc + 1) * chunk <= prefill_len
            pl.when(jnp.logical_and(valid, in_pre))(
                functools.partial(_chunk, True))
            pl.when(jnp.logical_and(valid, jnp.logical_not(in_pre)))(
                functools.partial(_chunk, False))
        else:
            pl.when(valid)(functools.partial(_chunk, "ffast" in ablate))

        @pl.when(nc == pl.num_programs(1) - 1)
        def _finalize():
            # Residual (uncompressed) tier + final normalization, in-kernel.
            resid_len = lens_ref[bh, 1]
            q = sl(q_ref, 2).astype(jnp.bfloat16)
            kr = sl(kresid_ref, 2).astype(jnp.bfloat16)      # [G, D]
            sr = _dot(q, kr, (((1,), (1,))))                 # [GQ, G] f32
            rcol = jax.lax.broadcasted_iota(jnp.int32, (gq, g), 1)
            sr = jnp.where(rcol < resid_len, sr, MASK_VAL)

            m_prev = m_ref[rows, :1]
            m_cur = jnp.max(sr, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_new)
            pr = jnp.where(sr > MASK_VAL / 2, jnp.exp(sr - m_new), 0.0)
            l_tot = (l_ref[rows, :1] * alpha
                     + jnp.sum(pr, axis=-1, keepdims=True))
            vr = sl(vresid_ref, 2).astype(jnp.bfloat16)      # [G, D]
            pv_r = _dot(pr.astype(jnp.bfloat16), vr, (((1,), (0,))))
            acc = acc_ref[rows] * alpha + pv_r
            if hb == 1:
                out_ref[(0,) * (len(out_ref.shape) - 2)] = acc / l_tot
            else:
                out_ref[h] = acc / l_tot                     # [GQ, D] f32

    for h_i in range(hb):
        _head(h_i)


def _decode_attention_call(
    inputs: tuple,
    *,
    bits: int, group: int, v_group: int, blocks_per_chunk: int,
    base8: bool, use_lr: bool, dual_region: bool, kcvt: bool,
    heads_per_step: int, ko_present: bool, interpret: bool,
    ablate: frozenset,
):
    """Build and run the pallas_call. EVERY static decision derives from the
    input shapes, so the same function lowers correctly on per-shard local
    shapes inside the custom_partitioning below."""
    (lens_bh, pad_start, q, kpt, k_codes, k_scale, k_mn, kqt,
     v_codes, v_scale, v_mn, vqt, vpt, k_resid, v_resid) = inputs[:15]
    rest = list(inputs[15:])
    scale_in = rest[:4] if base8 else []
    out_in = rest[4:] if base8 else rest
    bh, gq, d = q.shape
    t = kqt.shape[2]
    nb = t // group
    ko = 0 if not ko_present else 2 * out_in[0].shape[2]
    hb = max(1, min(heads_per_step, bh))
    while bh % hb:
        hb -= 1
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
        blocks_per_chunk=cb, ko=ko, base8=base8, use_lr=use_lr,
        dual_region=dual_region, kcvt=kcvt, hb=hb, interpret=interpret,
        ablate=ablate)

    in_specs = [
        pl.BlockSpec((hb, gq, d), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((hb, cb, r, d), lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((hb, wd, chunk), lambda i, j, *_: (i, 0, j)),
        pl.BlockSpec((hb, cb, d), lambda i, j, *_: (i, j, 0)),
        pl.BlockSpec((hb, cb, d), lambda i, j, *_: (i, j, 0)),
        pl.BlockSpec((hb, r, chunk), lambda i, j, *_: (i, 0, j)),
        pl.BlockSpec((hb, wd, chunk), lambda i, j, *_: (i, 0, j)),
        pl.BlockSpec((hb, ngv, chunk), lambda i, j, *_: (i, 0, j)),
        pl.BlockSpec((hb, ngv, chunk), lambda i, j, *_: (i, 0, j)),
        pl.BlockSpec((hb, r, chunk), lambda i, j, *_: (i, 0, j)),
        pl.BlockSpec((hb, cb, r, d), lambda i, j, *_: (i, j, 0, 0)),
        pl.BlockSpec((hb, group, d), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((hb, group, d), lambda i, j, *_: (i, 0, 0)),
    ]
    if base8:
        # full [R, NB] rows, constant across j (DMA'd once per head); a
        # (r, cb) block would violate Mosaic's lane-dim tiling constraint
        # (cb < 128 and != NB) — the kernel roll-slices its chunk's columns.
        in_specs += [pl.BlockSpec((hb, r, nb), lambda i, j, *_: (i, 0, 0))
                     for _ in range(4)]
    if ko:
        # full [NB, KO(/2)] tiles per head; constant across j so Pallas only
        # DMAs them once per head — the kernel sublane-slices its chunk.
        # Boundary tables ride along the same way ([NB, 128] int32); the K
        # table only when the opt-in "kseg" tile form will read it.
        in_specs += [
            pl.BlockSpec((hb, nb, ko // 2), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((hb, nb, ko), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((hb, nb, ko // 2), lambda i, j, *_: (i, 0, 0)),
            pl.BlockSpec((hb, nb, ko), lambda i, j, *_: (i, 0, 0)),
        ]
        if "kseg" in ablate:
            in_specs += [pl.BlockSpec((hb, nb, 128),
                                      lambda i, j, *_: (i, 0, 0))]
        in_specs += [pl.BlockSpec((hb, nb, 128), lambda i, j, *_: (i, 0, 0))]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bh // hb, nc),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((hb, gq, d), lambda i, j, *_: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb * gq, d), jnp.float32),
                pltpu.VMEM((hb * gq, 128), jnp.float32),
                pltpu.VMEM((hb * gq, 128), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, gq, d), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    return out[0]


@functools.lru_cache(maxsize=None)
def _partitioned_decode(statics, arg_ranks: tuple):
    """custom_partitioning wrapper per static kernel config: every operand
    (and the output) shards along its leading BH axis, so under a TP mesh
    (cache leaves sharded on the kv-head axis) each device runs the kernel
    on its LOCAL heads with zero collectives — attention is head-local; the
    surrounding projections carry the psum. Works under both the shardy
    partitioner (sharding_rule) and classic GSPMD (infer/partition)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    kw = dict(zip(
        ("bits", "group", "v_group", "blocks_per_chunk", "base8", "use_lr",
         "dual_region", "kcvt", "heads_per_step", "ko_present", "interpret",
         "ablate"), statics))

    def impl(*tensors):
        return _decode_attention_call(tensors, **kw)

    f = custom_partitioning(impl)

    def _bh_axis(arg_shapes):
        sh = getattr(arg_shapes[2], "sharding", None)  # q
        spec = getattr(sh, "spec", None)
        return spec[0] if spec and len(spec) else None

    def infer(mesh, arg_shapes, result_shape):
        return NamedSharding(mesh, PartitionSpec(_bh_axis(arg_shapes),
                                                 None, None))

    def partition(mesh, arg_shapes, result_shape):
        ax = _bh_axis(arg_shapes)
        arg_sh = tuple(
            NamedSharding(mesh, PartitionSpec(ax, *([None] * (rank - 1))))
            for rank in arg_ranks)
        out_sh = NamedSharding(mesh, PartitionSpec(ax, None, None))
        return mesh, impl, out_sh, arg_sh

    # shardy rule: leading factor shared ("h"), all other dims unique;
    # output dims 1,2 reuse q's factor names.
    parts = []
    for i, rank in enumerate(arg_ranks):
        parts.append(" ".join(
            ["h"] + [f"a{i}x{j}" for j in range(1, rank)]))
    rule = ", ".join(parts) + " -> h a2x1 a2x2"
    f.def_partition(partition, infer_sharding_from_operands=infer,
                    sharding_rule=rule)
    return f


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group", "v_group", "blocks_per_chunk",
                     "hkv", "base8", "use_lr", "dual_region", "kcvt",
                     "heads_per_step", "interpret", "ablate"),
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
    kpt_scale: jax.Array | None = None,   # f32 [BH, R, NB] (pre-transposed)
    kqt_scale: jax.Array | None = None,   # f32 [BH, R, NB]
    vqt_scale: jax.Array | None = None,   # f32 [BH, R, NB]
    vpt_scale: jax.Array | None = None,   # f32 [BH, R, NB]
    k_out_idx: jax.Array | None = None,   # int32 [BH, NB, KO//2] (packed)
    k_out_val: jax.Array | None = None,   # [BH, NB, KO] delta values
    v_out_idx: jax.Array | None = None,
    v_out_val: jax.Array | None = None,
    k_out_bnd: jax.Array | None = None,   # int32 [BH, NB, 128] boundaries
    v_out_bnd: jax.Array | None = None,
    *,
    bits: int,
    group: int,
    v_group: int,
    blocks_per_chunk: int = 16,
    hkv: int = 1,
    base8: bool = False,
    use_lr: bool = True,
    dual_region: bool = True,
    kcvt: bool = False,
    heads_per_step: int = 1,
    interpret: bool = False,
    ablate: frozenset = frozenset(),
):
    """Fused flash-decode over the two-tier compressed cache.

    Returns the normalized attention output [BH, GQ, D] f32 (both tiers).
    ``hkv`` = kv heads per sequence (row i of the BH axis belongs to
    sequence i // hkv of ``lens``). COO outlier corrections (GEAR ``left``)
    are folded in-kernel when the k/v_out arrays are given; int8 low-rank
    bases ride directly when ``base8`` with their [BH, R, NB] scales.
    ``heads_per_step`` batches that many BH rows per grid step (amortizes
    per-step launch overhead and batches the code DMA — the per-head
    streams are small once compressed).

    The call is wrapped in a custom_partitioning that shards every operand
    (and the output) along the leading BH axis, so under a TP mesh each
    device runs the kernel on its local kv heads with zero collectives.
    """
    lens_bh = jnp.repeat(lens.astype(jnp.int32), hkv, axis=0)  # [BH, 3]
    inputs = [lens_bh, pad_start,
              q, kpt, k_codes, k_scale, k_mn, kqt, v_codes, v_scale, v_mn,
              vqt, vpt, k_resid, v_resid]
    if base8:
        inputs += [kpt_scale, kqt_scale, vqt_scale, vpt_scale]
    if k_out_idx is not None:
        inputs += [k_out_idx, k_out_val, v_out_idx, v_out_val]
        if "kseg" in ablate:
            inputs += [k_out_bnd]
        inputs += [v_out_bnd]

    statics = (bits, group, v_group, blocks_per_chunk, base8, use_lr,
               dual_region, kcvt, heads_per_step, k_out_idx is not None,
               interpret, ablate)
    f = _partitioned_decode(statics, tuple(x.ndim for x in inputs))
    return f(*inputs)


def attend_fused(
    spec,
    cache,
    q: jax.Array,            # [B, Hq, Qn, D]
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    window: int | None = None,
    blocks_per_chunk: int = 16,
    dual_region: bool = True,
    heads_per_step: int = 1,
    interpret: bool = False,
    ablate: frozenset = frozenset(),
) -> jax.Array:
    """Drop-in replacement for gear_tpu.cache.attend using the Pallas fused
    kernel for both tiers (packed prefix + residual) of the cache.

    COO outliers (spec.outliers_per_block > 0) are folded IN-KERNEL as
    one-hot gather/scatter dots over the stored deltas — the full GEAR
    recipe (quant + low-rank + outliers) in one HBM pass. The reference's
    fused CUDA path never implemented its outlier slots
    (modeling_llamagear.py:458-466); this surpasses it.

    ``window`` (Mistral sliding window at decode) folds into the kernel's
    pad_start masking of the compressed prefix — requires window >= group
    so the residual tier (at most ``group`` most-recent tokens) is always
    fully inside the window; chunks left of the window boundary are then
    masked off wholesale with no kernel change."""
    b, hq, qn, d = q.shape
    hkv = spec.num_kv_heads
    gq_n = (hq // hkv) * qn
    if sm_scale is None:
        sm_scale = d ** -0.5
    bhn = b * hkv

    qf = (q.reshape(b, hkv, gq_n, d) * sm_scale).astype(jnp.float32)
    # GQ padded to the f32 sublane tile (8).
    gq_pad = max(8, ((gq_n + 7) // 8) * 8)
    if gq_pad != gq_n:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, gq_pad - gq_n), (0, 0)))

    base8 = spec.base_bits == 8
    use_lr = max(spec.rank, spec.prefill_rank, spec.rank_v_eff,
                 spec.prefill_rank_v_eff) > 0

    flat = lambda x: x.reshape(bhn, *x.shape[2:])
    if pad_start is None:
        pad_bh = jnp.zeros((bhn,), jnp.int32)
    else:
        pad_bh = jnp.repeat(pad_start.astype(jnp.int32), hkv)
    if window is not None:
        if window < spec.group:
            raise ValueError(
                f"window {window} < group {spec.group}: the fused kernel "
                "masks the window via pad_start over the compressed prefix "
                "only; the residual tier (<= group tokens) must fit inside")
        total = cache.comp_len + cache.resid_len
        pad_bh = jnp.maximum(pad_bh, (total - window).astype(jnp.int32))

    lens = jnp.broadcast_to(
        jnp.stack([cache.comp_len.astype(jnp.int32),
                   cache.resid_len.astype(jnp.int32),
                   cache.prefill_len.astype(jnp.int32)])[None, :], (b, 3))

    if base8:
        # per-(rank, block) f32 scales, P scales pre-transposed to [R, NB]
        # so the kernel reads [R, 1] columns (no in-kernel transpose).
        scale_args = (flat(jnp.swapaxes(cache.kpt_scale, -1, -2)),
                      flat(cache.kqt_scale),
                      flat(cache.vqt_scale),
                      flat(jnp.swapaxes(cache.vpt_scale, -1, -2)))
    else:
        scale_args = (None, None, None, None)

    if spec.outliers_per_block:
        outlier_args = (flat(cache.k_out_idx), flat(cache.k_out_val),
                        flat(cache.v_out_idx), flat(cache.v_out_val),
                        flat(cache.k_out_bnd), flat(cache.v_out_bnd))
    else:
        outlier_args = (None, None, None, None, None, None)

    out = decode_attention(
        lens,
        pad_bh,
        flat(qf),
        flat(cache.kpt),
        flat(cache.k_codes),
        flat(cache.k_scale),
        flat(cache.k_mn),
        flat(cache.kqt),
        flat(cache.v_codes),
        flat(cache.v_scale),
        flat(cache.v_mn),
        flat(cache.vqt),
        flat(cache.vpt),
        flat(cache.k_resid),
        flat(cache.v_resid),
        *scale_args,
        *outlier_args,
        bits=spec.bits, group=spec.group, v_group=spec.v_group,
        blocks_per_chunk=blocks_per_chunk, hkv=hkv, base8=base8,
        use_lr=use_lr, dual_region=dual_region,
        kcvt=getattr(spec, "kcvt_prefill", False),
        heads_per_step=heads_per_step, interpret=interpret,
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
                     "base8", "use_lr", "kcvt", "heads_per_step",
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
    kpt_scale: jax.Array | None = None,   # f32 [P, H, R, PB] (pre-transposed)
    kqt_scale: jax.Array | None = None,   # f32 [P, H, R, PB]
    vqt_scale: jax.Array | None = None,
    vpt_scale: jax.Array | None = None,
    k_out_idx: jax.Array | None = None,   # int32 [P, H, PB, KO//2]
    k_out_val: jax.Array | None = None,   # [P, H, PB, KO] delta values
    v_out_idx: jax.Array | None = None,
    v_out_val: jax.Array | None = None,
    k_out_bnd: jax.Array | None = None,   # int32 [P, H, PB, 128]
    v_out_bnd: jax.Array | None = None,
    *,
    bits: int,
    group: int,
    v_group: int,
    page_blocks: int,
    hkv: int,
    base8: bool = False,
    use_lr: bool = True,
    kcvt: bool = False,
    heads_per_step: int = 1,
    interpret: bool = False,
):
    """Fused flash-decode directly over the physical page pool.

    One grid step streams one page; the scalar-prefetched ``block_table``
    drives the DMA source page, so no gather/copy of pages ever happens.
    Unallocated table tail entries must be clamped to a valid page id (the
    kernel masks them off via comp_len). COO outlier deltas ride along as
    per-page tiles when given. The dense kernel's dual-region dispatch works
    unchanged here: grid j is the LOGICAL page index, so the
    `(j+1)*page_tokens <= prefill_len` gate selects the fast shared-P path
    exactly for all-prefill pages (prefill_paged scatters the dense prefill
    — replicated P, uniform per-rank qt scales — page by page), and pages
    touching decode-flushed blocks take the per-block path.
    """
    bh, gq, d = q.shape
    maxp = block_table.shape[1]
    cb = page_blocks
    chunk = cb * group
    r = kqt.shape[2]
    wd = d // (32 // bits)
    ngv = d // v_group
    ko = 0 if k_out_idx is None else 2 * k_out_idx.shape[3]
    # heads batched per grid step must stay within one sequence's kv heads
    # (every batched row reads the same block-table row).
    hb = max(1, min(heads_per_step, hkv))
    while hkv % hb:
        hb -= 1

    lens_bh = jnp.repeat(lens.astype(jnp.int32), hkv, axis=0)  # [BH, 3]

    def kernel(lens_ref, pad_ref, bt_ref, *args):
        # bt_ref drives the index_maps only; the kernel body never reads it.
        _decode_kernel(lens_ref, pad_ref, *args,
                       bits=bits, group=group, v_group=v_group,
                       blocks_per_chunk=cb, ko=ko, base8=base8,
                       use_lr=use_lr, dual_region=True, kcvt=kcvt,
                       hb=hb, interpret=interpret)

    hpb = hkv // hb  # head-blocks per sequence

    def tok(i, j, lens_, pad_, bt_):
        return (bt_[i // hpb, j], i % hpb, 0, 0)

    def blk(i, j, lens_, pad_, bt_):
        return (bt_[i // hpb, j], i % hpb, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((hb, gq, d), lambda i, j, *_: (i, 0, 0)),
        pl.BlockSpec((1, hb, cb, r, d), blk),
        pl.BlockSpec((1, hb, wd, chunk), tok),
        pl.BlockSpec((1, hb, cb, d), tok),
        pl.BlockSpec((1, hb, cb, d), tok),
        pl.BlockSpec((1, hb, r, chunk), tok),
        pl.BlockSpec((1, hb, wd, chunk), tok),
        pl.BlockSpec((1, hb, ngv, chunk), tok),
        pl.BlockSpec((1, hb, ngv, chunk), tok),
        pl.BlockSpec((1, hb, r, chunk), tok),
        pl.BlockSpec((1, hb, cb, r, d), blk),
        pl.BlockSpec((1, hb, group, d),
                     lambda i, j, *_: (i // hpb, i % hpb, 0, 0)),
        pl.BlockSpec((1, hb, group, d),
                     lambda i, j, *_: (i // hpb, i % hpb, 0, 0)),
    ]
    inputs = [lens_bh, pad_start, block_table,
              q, kpt, k_codes, k_scale, k_mn, kqt, v_codes, v_scale, v_mn,
              vqt, vpt, k_resid, v_resid]
    if base8:
        in_specs += [pl.BlockSpec((1, hb, r, cb), tok) for _ in range(4)]
        inputs += [kpt_scale, kqt_scale, vqt_scale, vpt_scale]
    if ko:
        # no K boundary table: the paged kernel never takes the opt-in
        # "kseg" tile form (default ablate), so its DMA would be dead.
        in_specs += [
            pl.BlockSpec((1, hb, cb, ko // 2), tok),
            pl.BlockSpec((1, hb, cb, ko), tok),
            pl.BlockSpec((1, hb, cb, ko // 2), tok),
            pl.BlockSpec((1, hb, cb, ko), tok),
            pl.BlockSpec((1, hb, cb, 128), tok),
        ]
        inputs += [k_out_idx, k_out_val, v_out_idx, v_out_val,
                   v_out_bnd]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(bh // hb, maxp),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((hb, gq, d), lambda i, j, *_: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((hb * gq, d), jnp.float32),
                pltpu.VMEM((hb * gq, 128), jnp.float32),
                pltpu.VMEM((hb * gq, 128), jnp.float32),
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
    window: int | None = None,
    heads_per_step: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """Decode attention for a batch of paged sequences (gear_tpu.paged).

    Per-sequence lengths (continuous batching) are native here — each row
    of ``seqs`` masks by its own comp_len/resid_len. ``window`` folds into
    pad_start per sequence (see attend_fused; requires window >= group).
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
    if window is not None:
        if window < spec.group:
            raise ValueError(f"window {window} < group {spec.group}")
        total = (seqs.comp_len + seqs.resid_len).astype(jnp.int32)
        pad_bh = jnp.maximum(pad_bh, jnp.repeat(total - window, hkv))

    lens = jnp.stack([seqs.comp_len.astype(jnp.int32),
                      seqs.resid_len.astype(jnp.int32),
                      seqs.prefill_len.astype(jnp.int32)], axis=1)  # [B, 3]
    bt = jnp.maximum(seqs.block_table.astype(jnp.int32), 0)

    base8 = spec.base_bits == 8
    use_lr = max(spec.rank, spec.prefill_rank, spec.rank_v_eff,
                 spec.prefill_rank_v_eff) > 0
    if base8:
        scale_args = (jnp.swapaxes(pool.kpt_scale, -1, -2),
                      pool.kqt_scale,
                      pool.vqt_scale,
                      jnp.swapaxes(pool.vpt_scale, -1, -2))
    else:
        scale_args = (None, None, None, None)

    if spec.outliers_per_block:
        # k_out_bnd stays None: only the dense kernel's opt-in "kseg" tile
        # form reads it (ADVICE r4 — dead DMA otherwise).
        outlier_args = (pool.k_out_idx, pool.k_out_val,
                        pool.v_out_idx, pool.v_out_val,
                        None, pool.v_out_bnd)
    else:
        outlier_args = (None, None, None, None, None, None)

    out = decode_attention_paged(
        lens, pad_bh, bt,
        qf.reshape(bhn, gq_pad, d),
        pool.kpt,
        pool.k_codes, pool.k_scale, pool.k_mn,
        pool.kqt,
        pool.v_codes, pool.v_scale, pool.v_mn,
        pool.vqt,
        pool.vpt,
        seqs.k_resid, seqs.v_resid,
        *scale_args,
        *outlier_args,
        bits=spec.bits, group=spec.group, v_group=spec.v_group,
        page_blocks=pspec.page_blocks, hkv=hkv, base8=base8, use_lr=use_lr,
        kcvt=getattr(spec, "kcvt_prefill", False),
        heads_per_step=heads_per_step,
        interpret=interpret,
    )
    out = out.reshape(b, hkv, gq_pad, d)[:, :, :gq_n]
    return out.reshape(b, hq, qn, d).astype(q.dtype)
