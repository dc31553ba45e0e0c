"""Paged compressed KV cache: a physical page pool + per-sequence block
tables over the two-tier GEAR cache.

The reference has no paging (each sequence owns a dense cache; survey §2.2:
caches grow by torch.cat). For serving, dense per-slot caches waste HBM on
short sequences; this module decouples logical sequence positions from
physical storage the vLLM way, TPU-first:

  * one fixed page (``page_blocks`` quant blocks = ``page_blocks * group``
    tokens) holds every compressed leaf for that token range — packed K/V
    codes, scales/mins, and the low-rank bases — for ALL kv heads of one
    layer, so a page is a pytree slice ``pool.leaf[pid]``;
  * per-sequence state is a block table (int32 page ids, -1 = unallocated)
    plus the dense residual tier (``group`` tokens, tiny) and length
    scalars — appends touch only the residual until a flush writes one
    block into the tail page;
  * page allocation is a free list with refcounts (shared-prefix reuse) in
    native C++ (native/pager.cc) with a pure-python fallback;
  * attention gathers pages by table without host round trips:
    :func:`gather_dense` materializes the sequence view for the XLA path
    (and is the correctness reference); the Pallas kernel path reads pages
    directly via scalar-prefetch block tables (kernels/decode.py).

Shapes: pool leaves carry [P, H, ...] where the dense LayerCache carries
[B, H, ...]; the per-page token extent replaces max_len.
"""
from __future__ import annotations

import ctypes
import functools
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import cache as kvcache
from .cache import CacheSpec


@dataclass(frozen=True)
class PagedSpec:
    """Static description of a paged pool for one layer."""

    spec: CacheSpec          # per-sequence spec; max_len = logical capacity
    n_pages: int             # physical pages in the pool
    page_blocks: int = 16    # quant blocks per page (tokens = * group)

    def __post_init__(self):
        if self.spec.n_blocks % self.page_blocks:
            raise ValueError("max_len must be a multiple of the page extent")

    @property
    def page_tokens(self) -> int:
        return self.page_blocks * self.spec.group

    @property
    def max_pages_per_seq(self) -> int:
        return self.spec.n_blocks // self.page_blocks


@struct.dataclass
class PagePool:
    """Physical storage: every leaf has a leading page axis [P, H, ...]."""

    k_codes: jax.Array   # int32 [P, H, D//fpi, PT]
    k_scale: jax.Array   # [P, H, PB, D]
    k_mn: jax.Array      # [P, H, PB, D]
    v_codes: jax.Array   # int32 [P, H, D//fpi, PT]
    v_scale: jax.Array   # [P, H, NGV, PT]
    v_mn: jax.Array      # [P, H, NGV, PT]
    kpt: jax.Array       # [P, H, PB, R, D]
    kqt: jax.Array       # [P, H, R, PT]
    vpt: jax.Array       # [P, H, PB, R, D]
    vqt: jax.Array       # [P, H, R, PT]
    # COO outlier deltas, block-major with entries in lanes (cache.LayerCache
    # convention; idx packed two-16-bit-per-int32); zero-size when
    # outliers_per_block == 0.
    k_out_idx: jax.Array  # int32 [P, H, PB, KO // 2]
    k_out_val: jax.Array  # [P, H, PB, KO]
    v_out_idx: jax.Array  # int32 [P, H, PB, KO // 2]
    v_out_val: jax.Array  # [P, H, PB, KO]
    k_out_bnd: jax.Array  # int32 [P, H, PB, 128] sorted-outlier boundaries
    v_out_bnd: jax.Array  # int32 [P, H, PB, 128] (cache.LayerCache conv.)
    # int8-base scales (all-ones when base_bits == 16).
    kpt_scale: jax.Array  # [P, H, PB, R]
    kqt_scale: jax.Array  # [P, H, R, PB]
    vpt_scale: jax.Array  # [P, H, PB, R]
    vqt_scale: jax.Array  # [P, H, R, PB]


@struct.dataclass
class PagedSeqs:
    """Per-sequence logical state for a batch of B sequences."""

    block_table: jax.Array  # int32 [B, MAXP]; entries < 0 are unallocated
    comp_len: jax.Array     # int32 [B]
    resid_len: jax.Array    # int32 [B]
    prefill_len: jax.Array  # int32 [B] — prefix whose blocks share one P
    k_resid: jax.Array      # [B, H, group, D]
    v_resid: jax.Array      # [B, H, group, D]


def init_pool(pspec: PagedSpec) -> PagePool:
    s = pspec.spec
    p, h, d, pt, pb = (pspec.n_pages, s.num_kv_heads, s.head_dim,
                       pspec.page_tokens, pspec.page_blocks)
    sb, r = s.sideband_dtype, s.r_store
    base_dt = jnp.int8 if s.base_bits == 8 else s.dtype
    return PagePool(
        k_codes=jnp.zeros((p, h, s.v_words, pt), jnp.int32),
        k_scale=jnp.zeros((p, h, pb, d), sb),
        k_mn=jnp.zeros((p, h, pb, d), sb),
        v_codes=jnp.zeros((p, h, s.v_words, pt), jnp.int32),
        v_scale=jnp.zeros((p, h, s.v_groups_per_token, pt), sb),
        v_mn=jnp.zeros((p, h, s.v_groups_per_token, pt), sb),
        kpt=jnp.zeros((p, h, pb, r, d), base_dt),
        kqt=jnp.zeros((p, h, r, pt), base_dt),
        vpt=jnp.zeros((p, h, pb, r, d), base_dt),
        vqt=jnp.zeros((p, h, r, pt), base_dt),
        k_out_idx=jnp.zeros((p, h, pb, s.ko_store // 2), jnp.int32),
        k_out_val=jnp.zeros((p, h, pb, s.ko_store), s.dtype),
        v_out_idx=jnp.zeros((p, h, pb, s.ko_store // 2), jnp.int32),
        v_out_val=jnp.zeros((p, h, pb, s.ko_store), s.dtype),
        k_out_bnd=jnp.zeros((p, h, pb, s.bnd_lanes), jnp.int32),
        v_out_bnd=jnp.zeros((p, h, pb, s.bnd_lanes), jnp.int32),
        kpt_scale=jnp.ones((p, h, pb, r), jnp.float32),
        kqt_scale=jnp.ones((p, h, r, pb), jnp.float32),
        vpt_scale=jnp.ones((p, h, pb, r), jnp.float32),
        vqt_scale=jnp.ones((p, h, r, pb), jnp.float32),
    )


def init_seqs(pspec: PagedSpec, batch: int) -> PagedSeqs:
    s = pspec.spec
    return PagedSeqs(
        block_table=jnp.full((batch, pspec.max_pages_per_seq), -1, jnp.int32),
        comp_len=jnp.zeros((batch,), jnp.int32),
        resid_len=jnp.zeros((batch,), jnp.int32),
        prefill_len=jnp.zeros((batch,), jnp.int32),
        k_resid=jnp.zeros((batch, s.num_kv_heads, s.group, s.head_dim),
                          s.dtype),
        v_resid=jnp.zeros((batch, s.num_kv_heads, s.group, s.head_dim),
                          s.dtype),
    )


# ---------------------------------------------------------------------------
# Page allocator (native C++ with python fallback).
# ---------------------------------------------------------------------------

def _load_pager():
    path = Path(__file__).resolve().parents[1] / "native" / "libgearpager.so"
    if not path.exists():
        return None
    lib = ctypes.CDLL(str(path))
    lib.gear_pager_create.restype = ctypes.c_void_p
    lib.gear_pager_create.argtypes = [ctypes.c_int]
    lib.gear_pager_destroy.argtypes = [ctypes.c_void_p]
    lib.gear_pager_alloc.restype = ctypes.c_int
    lib.gear_pager_alloc.argtypes = [ctypes.c_void_p]
    lib.gear_pager_retain.restype = ctypes.c_int
    lib.gear_pager_retain.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gear_pager_release.restype = ctypes.c_int
    lib.gear_pager_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gear_pager_free_count.restype = ctypes.c_int
    lib.gear_pager_free_count.argtypes = [ctypes.c_void_p]
    return lib


_PAGER_LIB = None


class PageAllocator:
    """Refcounted page free-list. Native (native/pager.cc) when built."""

    def __init__(self, n_pages: int):
        global _PAGER_LIB
        if _PAGER_LIB is None:
            _PAGER_LIB = _load_pager() or False
        self._lib = _PAGER_LIB or None
        self.n_pages = n_pages
        if self._lib:
            self._h = self._lib.gear_pager_create(n_pages)
        else:
            self._free = list(range(n_pages - 1, -1, -1))
            self._refs = [0] * n_pages

    @property
    def native(self) -> bool:
        return self._lib is not None

    def alloc(self) -> int:
        """-> page id, or -1 if the pool is exhausted."""
        if self._lib:
            return self._lib.gear_pager_alloc(self._h)
        if not self._free:
            return -1
        pid = self._free.pop()
        self._refs[pid] = 1
        return pid

    def retain(self, pid: int) -> int:
        """Increment refcount (shared prefix). Returns new count or -1."""
        if self._lib:
            return self._lib.gear_pager_retain(self._h, pid)
        if self._refs[pid] <= 0:
            return -1
        self._refs[pid] += 1
        return self._refs[pid]

    def release(self, pid: int) -> int:
        """Decrement refcount; frees the page at zero. Returns new count."""
        if self._lib:
            return self._lib.gear_pager_release(self._h, pid)
        if self._refs[pid] <= 0:
            return -1
        self._refs[pid] -= 1
        if self._refs[pid] == 0:
            self._free.append(pid)
        return self._refs[pid]

    def free_count(self) -> int:
        if self._lib:
            return self._lib.gear_pager_free_count(self._h)
        return len(self._free)

    def __del__(self):
        if getattr(self, "_lib", None) and getattr(self, "_h", None):
            self._lib.gear_pager_destroy(self._h)


# ---------------------------------------------------------------------------
# Writing compressed blocks into pages.
# ---------------------------------------------------------------------------

def _scatter_prefix_into_pages(
    pspec: PagedSpec, pool: PagePool, dense: kvcache.LayerCache,
    row: int, page_ids: list[int], n_pages_used: int,
) -> PagePool:
    """Copy row ``row`` of a dense cache's compressed prefix into pages.

    Static python loop over pages (prefill-time only).
    """
    pt, pb = pspec.page_tokens, pspec.page_blocks
    upd = {}
    rows = [
        ("k_codes", dense.k_codes, 3, None),
        ("v_codes", dense.v_codes, 3, None),
        ("v_scale", dense.v_scale, 3, None),
        ("v_mn", dense.v_mn, 3, None),
        ("kqt", dense.kqt, 3, None),
        ("vqt", dense.vqt, 3, None),
        ("k_scale", dense.k_scale, None, 2),
        ("k_mn", dense.k_mn, None, 2),
        ("kpt", dense.kpt, None, 2),
        ("vpt", dense.vpt, None, 2),
        ("kpt_scale", dense.kpt_scale, None, 2),
        ("vpt_scale", dense.vpt_scale, None, 2),
        ("kqt_scale", dense.kqt_scale, None, 3),
        ("vqt_scale", dense.vqt_scale, None, 3),
    ]
    if pspec.spec.outliers_per_block:
        rows += [
            ("k_out_idx", dense.k_out_idx, None, 2),
            ("k_out_val", dense.k_out_val, None, 2),
            ("v_out_idx", dense.v_out_idx, None, 2),
            ("v_out_val", dense.v_out_val, None, 2),
            ("k_out_bnd", dense.k_out_bnd, None, 2),
            ("v_out_bnd", dense.v_out_bnd, None, 2),
        ]
    for leaf, dleaf, tok_axis, blk_axis in rows:
        arr = getattr(pool, leaf)
        for i in range(n_pages_used):
            pid = page_ids[i]
            if tok_axis is not None:
                sl = jax.lax.slice_in_dim(dleaf, i * pt, (i + 1) * pt,
                                          axis=tok_axis)
            else:
                sl = jax.lax.slice_in_dim(dleaf, i * pb, (i + 1) * pb,
                                          axis=blk_axis)
            arr = arr.at[pid].set(sl[row])
        upd[leaf] = arr
    return pool.replace(**upd)


def prefill_paged(
    pspec: PagedSpec,
    pool: PagePool,
    seqs: PagedSeqs,
    row: int,
    page_ids: list[int],
    k: jax.Array,            # [1, H, S, D]
    v: jax.Array,
    *,
    key: jax.Array | None = None,
    use_lowrank: bool = True,
) -> tuple[PagePool, PagedSeqs]:
    """Compress a prompt and place it into pages for sequence ``row``.

    ``page_ids`` must cover ceil((S // group) / page_blocks) pages (from
    :class:`PageAllocator`). The residual tail lands in the dense residual
    tier. Reuses the dense compression path (cache.prefill) then scatters.
    """
    s_len = k.shape[2]
    spec = pspec.spec
    dense = kvcache.prefill(spec, k, v, key=key, use_lowrank=use_lowrank)
    n_full_blocks = (s_len // spec.group)
    n_pages_used = -(-n_full_blocks // pspec.page_blocks) if n_full_blocks else 0
    if n_pages_used > len(page_ids):
        raise ValueError("not enough pages for prompt")
    pool = _scatter_prefix_into_pages(pspec, pool, dense, 0,
                                      page_ids, n_pages_used)
    bt = seqs.block_table.at[row, :n_pages_used].set(
        jnp.asarray(page_ids[:n_pages_used], jnp.int32))
    seqs = seqs.replace(
        block_table=bt,
        comp_len=seqs.comp_len.at[row].set(dense.comp_len),
        resid_len=seqs.resid_len.at[row].set(dense.resid_len),
        prefill_len=seqs.prefill_len.at[row].set(dense.prefill_len),
        k_resid=seqs.k_resid.at[row].set(dense.k_resid[0]),
        v_resid=seqs.v_resid.at[row].set(dense.v_resid[0]),
    )
    return pool, seqs


def append_paged(
    pspec: PagedSpec,
    pool: PagePool,
    seqs: PagedSeqs,
    k_new: jax.Array,        # [B, H, 1, D]
    v_new: jax.Array,
    *,
    key: jax.Array | None = None,
    use_lowrank: bool = True,
    live: jax.Array | None = None,   # bool [B]; False rows are parked
) -> tuple[PagePool, PagedSeqs]:
    """Append one decode step's K/V for every sequence (always run jitted —
    see _append_paged_impl)."""
    b = k_new.shape[0]
    if key is None:
        key = jax.random.PRNGKey(1)
    if live is None:
        live = jnp.ones((b,), bool)
    # The eager (apply_primitive) compilation path for the flush lax.cond
    # segfaults the XLA:CPU compiler (scatter/QR-heavy branch; same bug
    # class as the vmapped scatter noted in cache._extract_outliers), and
    # callers want one compiled step anyway — so the body is always jitted.
    return _append_paged_jit(pspec, use_lowrank, pool, seqs, k_new, v_new,
                             key, live)


@functools.partial(jax.jit, static_argnums=(0, 1))
def _append_paged_jit(pspec, use_lowrank, pool, seqs, k_new, v_new, key,
                      live):
    return _append_paged_impl(pspec, pool, seqs, k_new, v_new, key=key,
                              use_lowrank=use_lowrank, live=live)


def _append_paged_impl(
    pspec: PagedSpec,
    pool: PagePool,
    seqs: PagedSeqs,
    k_new: jax.Array,        # [B, H, 1, D]
    v_new: jax.Array,
    *,
    key: jax.Array,
    use_lowrank: bool = True,
    live: jax.Array | None = None,   # bool [B]; False rows are parked
) -> tuple[PagePool, PagedSeqs]:
    """Append one decode step's K/V for every sequence (jit-safe).

    Rows whose residual fills to ``group`` flush one compressed block into
    their tail page (the block table must already hold a page id there —
    the host preallocates the next page whenever comp_len crosses into it;
    see ServingEngine).

    ``live`` masks parked serving slots: a parked row's resid_len must not
    advance (otherwise, ``group`` steps after its request finished, it would
    flush a garbage block into whatever page its stale/parked block table
    points at — potentially a physical page now owned by a live request).
    Rows whose tail block-table entry is negative (unallocated) never flush
    either, regardless of ``live``.

    ``key`` may be a single PRNG key (folded per row by comp_len) or a
    per-row key array [B, 2] — per-row keys let a slot's flush chain match
    the dense engine's (split-per-slot) chain bit-exactly.
    """
    spec = pspec.spec
    b = k_new.shape[0]
    g = spec.group
    pb = pspec.page_blocks
    if key is None:
        key = jax.random.PRNGKey(1)
    if live is None:
        live = jnp.ones((b,), bool)

    i = seqs.resid_len  # [B]
    kr = seqs.k_resid
    vr = seqs.v_resid
    for rowi in range(b):
        # Parked rows park their write on the (masked-off) slot i instead of
        # advancing; the value is never visible because resid_len stays put.
        kr = kr.at[rowi, :, i[rowi]].set(
            jnp.where(live[rowi], k_new[rowi, :, 0].astype(spec.dtype),
                      kr[rowi, :, i[rowi]]))
        vr = vr.at[rowi, :, i[rowi]].set(
            jnp.where(live[rowi], v_new[rowi, :, 0].astype(spec.dtype),
                      vr[rowi, :, i[rowi]]))
    seqs = seqs.replace(k_resid=kr, v_resid=vr,
                        resid_len=i + live.astype(jnp.int32))

    def flush_row(pool, seqs, rowi, subkey):
        kb = seqs.k_resid[rowi:rowi + 1].astype(jnp.float32)
        vb = seqs.v_resid[rowi:rowi + 1].astype(jnp.float32)
        k_pack, k_scale, k_mn, ko_i, ko_v, ko_b = \
            kvcache._compress_k_block(spec, kb)
        v_pack, v_scale, v_mn, vo_i, vo_v, vo_b = \
            kvcache._compress_v_block(spec, vb)
        blk = seqs.comp_len[rowi] // g            # global block index
        pid = seqs.block_table[rowi, blk // pb]   # tail page
        off = blk % pb                            # block offset in page
        toff = off * g

        # Single dynamic_update_slice with the page id as a dynamic START
        # index — NOT ``arr.at[pid].set(...)``: a dynamic-index scatter (and
        # the arr[pid] gather it implies) inside this lax.cond segfaults the
        # XLA:CPU compiler (same bug class as the vmapped scatter noted in
        # cache._extract_outliers); DUS also avoids materializing the
        # gathered page.
        def upd_tok(arr, val):
            return jax.lax.dynamic_update_slice(
                arr, val.astype(arr.dtype), (pid, 0, 0, toff))

        def upd_blk(arr, val):
            return jax.lax.dynamic_update_slice(
                arr, val.astype(arr.dtype),
                (pid, 0, off) + (0,) * (arr.ndim - 3))

        def upd_blk_lane(arr, val):   # blocks-in-lanes leaves [P, H, X, PB]
            return jax.lax.dynamic_update_slice(
                arr, val.astype(arr.dtype), (pid, 0, 0, off))

        upd = dict(
            k_codes=upd_tok(pool.k_codes, k_pack),
            v_codes=upd_tok(pool.v_codes, v_pack),
            v_scale=upd_tok(pool.v_scale, v_scale),
            v_mn=upd_tok(pool.v_mn, v_mn),
            k_scale=upd_blk(pool.k_scale, k_scale),
            k_mn=upd_blk(pool.k_mn, k_mn),
        )
        if spec.outliers_per_block:
            upd.update(
                k_out_idx=upd_blk(pool.k_out_idx, ko_i),
                k_out_val=upd_blk(pool.k_out_val, ko_v),
                v_out_idx=upd_blk(pool.v_out_idx, vo_i),
                v_out_val=upd_blk(pool.v_out_val, vo_v),
                k_out_bnd=upd_blk(pool.k_out_bnd, ko_b),
                v_out_bnd=upd_blk(pool.v_out_bnd, vo_b),
            )
        if use_lowrank and max(spec.rank, spec.rank_v_eff) > 0:
            # Same key chain as the dense path (cache.append -> _flush) so a
            # paged sequence is bit-identical to its dense twin.
            kk, kv = jax.random.split(jax.random.fold_in(subkey, 0))
            k_hat = kvcache._dequant_k_block(spec, k_pack, k_scale, k_mn,
                                             ko_i, ko_v)
            v_hat = kvcache._dequant_v_block(spec, v_pack, v_scale, v_mn,
                                             vo_i, vo_v)
            kp1, kqt1, kps1, kqs1 = kvcache._error_bases(spec, kb, k_hat,
                                                         spec.rank, kk)
            vp1, vqt1, vps1, vqs1 = kvcache._error_bases(spec, vb, v_hat,
                                                         spec.rank_v_eff,
                                                         kv)
            upd.update(
                kqt=upd_tok(pool.kqt, kqt1),
                vqt=upd_tok(pool.vqt, vqt1),
                kpt=upd_blk(pool.kpt,
                            jnp.swapaxes(kp1, -1, -2)[:, :, None]),
                vpt=upd_blk(pool.vpt,
                            jnp.swapaxes(vp1, -1, -2)[:, :, None]),
            )
            if spec.base_bits == 8:
                upd.update(
                    kpt_scale=upd_blk(pool.kpt_scale, kps1[:, :, None]),
                    vpt_scale=upd_blk(pool.vpt_scale, vps1[:, :, None]),
                    kqt_scale=upd_blk_lane(pool.kqt_scale,
                                           kqs1[:, :, :, None]),
                    vqt_scale=upd_blk_lane(pool.vqt_scale,
                                           vqs1[:, :, :, None]),
                )
        new_pool = pool.replace(**upd)
        new_seqs = seqs.replace(
            comp_len=seqs.comp_len.at[rowi].add(g),
            resid_len=seqs.resid_len.at[rowi].set(0),
            k_resid=seqs.k_resid.at[rowi].set(
                jnp.zeros_like(seqs.k_resid[rowi])),
            v_resid=seqs.v_resid.at[rowi].set(
                jnp.zeros_like(seqs.v_resid[rowi])),
        )
        return new_pool, new_seqs

    per_row_keys = getattr(key, "ndim", 0) == 2
    for rowi in range(b):
        row_key = key[rowi] if per_row_keys else key
        subkey = jax.random.fold_in(row_key, seqs.comp_len[rowi])
        tail_pid = seqs.block_table[rowi, (seqs.comp_len[rowi] // g) // pb]
        pool, seqs = jax.lax.cond(
            (seqs.resid_len[rowi] == g) & live[rowi] & (tail_pid >= 0),
            lambda pl_, sq_, rowi=rowi, sk=subkey: flush_row(pl_, sq_, rowi, sk),
            lambda pl_, sq_: (pl_, sq_),
            pool, seqs,
        )
    return pool, seqs


# ---------------------------------------------------------------------------
# Attention over paged sequences.
# ---------------------------------------------------------------------------

def _gather_row(
    pspec: PagedSpec, pool: PagePool, bt_row: jax.Array,   # int32 [MAXP]
    comp_len, resid_len, prefill_len, k_resid, v_resid,     # per-row state
) -> kvcache.LayerCache:
    """Materialize one sequence's dense LayerCache (B=1) from its pages."""
    spec = pspec.spec
    safe_bt = jnp.maximum(bt_row, 0)                   # [MAXP]

    def gtok(leaf):   # [P,H,X,PT] -> [1,H,X,T]
        g = leaf[safe_bt]                              # [MAXP,H,X,PT]
        g = jnp.moveaxis(g, 0, 1)                      # [H,MAXP,X,PT]
        g = jnp.swapaxes(g, -2, -3)                    # [H,X,MAXP,PT]
        # explicit sizes (a -1 breaks on zero-size leaves, e.g. KO == 0)
        return g.reshape(*g.shape[:-2], g.shape[-2] * g.shape[-1])[None]

    def gblk(leaf):   # [P,H,PB,...] -> [1,H,NB,...]
        g = leaf[safe_bt]                              # [MAXP,H,PB,...]
        g = jnp.moveaxis(g, 0, 1)                      # [H,MAXP,PB,...]
        return g.reshape(g.shape[0], g.shape[1] * g.shape[2],
                         *g.shape[3:])[None]

    return kvcache.LayerCache(
        k_codes=gtok(pool.k_codes), k_scale=gblk(pool.k_scale),
        k_mn=gblk(pool.k_mn),
        v_codes=gtok(pool.v_codes), v_scale=gtok(pool.v_scale),
        v_mn=gtok(pool.v_mn),
        k_out_idx=gblk(pool.k_out_idx), k_out_val=gblk(pool.k_out_val),
        v_out_idx=gblk(pool.v_out_idx), v_out_val=gblk(pool.v_out_val),
        k_out_bnd=gblk(pool.k_out_bnd), v_out_bnd=gblk(pool.v_out_bnd),
        k_resid=k_resid[None], v_resid=v_resid[None],
        kpt=gblk(pool.kpt), kqt=gtok(pool.kqt),
        vpt=gblk(pool.vpt), vqt=gtok(pool.vqt),
        kpt_scale=gblk(pool.kpt_scale), kqt_scale=gtok(pool.kqt_scale),
        vpt_scale=gblk(pool.vpt_scale), vqt_scale=gtok(pool.vqt_scale),
        comp_len=comp_len,
        resid_len=resid_len,
        prefill_len=prefill_len,
    )


def gather_dense(
    pspec: PagedSpec, pool: PagePool, seqs: PagedSeqs, row: int = 0,
) -> kvcache.LayerCache:
    """Materialize one sequence's dense LayerCache from pages (XLA gather).

    The correctness reference for the paged Pallas kernel."""
    return _gather_row(pspec, pool, seqs.block_table[row],
                       seqs.comp_len[row], seqs.resid_len[row],
                       seqs.prefill_len[row],
                       seqs.k_resid[row], seqs.v_resid[row])


def attend_xla(
    pspec: PagedSpec,
    pool: PagePool,
    seqs: PagedSeqs,
    q: jax.Array,            # [B, Hq, Qn, D]
    *,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
    window: int | None = None,
) -> jax.Array:
    """XLA fallback decode attention over paged sequences with PER-ROW
    lengths (vmapped single-row gather + attend). The Pallas path
    (kernels.decode.attend_paged) reads pages without gathering."""
    spec = pspec.spec
    b = q.shape[0]
    if pad_start is None:
        pad_start = jnp.zeros((b,), jnp.int32)

    def one(bt_row, comp, resid, pre, kr, vr, q_row, pad_row):
        cache = _gather_row(pspec, pool, bt_row, comp, resid, pre, kr, vr)
        return kvcache.attend(spec, cache, q_row[None], sm_scale=sm_scale,
                              pad_start=pad_row[None], window=window)[0]

    return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
        seqs.block_table, seqs.comp_len, seqs.resid_len, seqs.prefill_len,
        seqs.k_resid, seqs.v_resid, q, pad_start.astype(jnp.int32))
