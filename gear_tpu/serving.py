"""Continuous-batching serving engine over per-slot compressed caches.

The reference serves via HF ``generate`` with static batches (survey §1);
requests in a batch all start and stop together. This engine gives every
sequence its own slot with independent cache lengths:

  * the slot-stacked cache is a LayerCache pytree with leaves
    [L, S, 1, H, ...] and per-slot length scalars [L, S] — one jitted decode
    step vmaps the whole model over slots, so sequences of different ages
    decode together (``lax.cond`` flushes become per-slot selects under
    vmap);
  * admission/slot bookkeeping lives in the native C++ scheduler
    (native/scheduler.cc, FCFS with a slot free-list) via ctypes;
  * a freed slot is immediately refilled by prefilling the next waiting
    request (bucketed compile reuse) and splicing its cache into the stack.

This is the single-host core; DP over hosts replicates engines behind a
router, and the compressed snapshot store (gear_tpu.runtime.kvstore) can
migrate a slot's cache across hosts in its wire format.
"""
from __future__ import annotations

import ctypes
import functools
from dataclasses import dataclass, field
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import cache as kvcache
from .config import CompressionConfig
from .models import llama


def _load_sched():
    path = Path(__file__).resolve().parents[1] / "native" / "libgearsched.so"
    if not path.exists():
        return None
    lib = ctypes.CDLL(str(path))
    lib.gear_sched_create.restype = ctypes.c_void_p
    lib.gear_sched_create.argtypes = [ctypes.c_int]
    lib.gear_sched_destroy.argtypes = [ctypes.c_void_p]
    for name, res, args in [
        ("gear_sched_add", ctypes.c_int,
         [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]),
        ("gear_sched_next_admission", ctypes.c_int64, [ctypes.c_void_p]),
        ("gear_sched_admit", ctypes.c_int, [ctypes.c_void_p, ctypes.c_int64]),
        ("gear_sched_step", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int]),
        ("gear_sched_preempt", ctypes.c_int64,
         [ctypes.c_void_p, ctypes.c_int, ctypes.c_int64]),
        ("gear_sched_finish", ctypes.c_int64, [ctypes.c_void_p, ctypes.c_int]),
        ("gear_sched_active", ctypes.c_int, [ctypes.c_void_p]),
        ("gear_sched_waiting", ctypes.c_int, [ctypes.c_void_p]),
        ("gear_sched_done", ctypes.c_int64, [ctypes.c_void_p]),
        ("gear_sched_slot_rid", ctypes.c_int64,
         [ctypes.c_void_p, ctypes.c_int]),
    ]:
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = args
    return lib


class _PySched:
    """Pure-python fallback mirroring native/scheduler.cc semantics."""

    def __init__(self, n_slots):
        self.waiting = []
        self.active = {}
        self.slots = [-1] * n_slots
        self.done_count = 0

    def add(self, rid, plen, max_new):
        self.waiting.append([rid, plen, max_new, 0])
        return 0

    def next_admission(self):
        if not self.waiting or -1 not in self.slots:
            return -1
        return self.waiting[0][0]

    def admit(self, rid):
        if not self.waiting or self.waiting[0][0] != rid:
            return -1
        slot = self.slots.index(-1)
        r = self.waiting.pop(0)
        self.slots[slot] = rid
        self.active[rid] = r
        return slot

    def step(self, slot):
        rid = self.slots[slot]
        if rid == -1:
            return -1
        r = self.active[rid]
        r[3] += 1
        return r[2] - r[3]

    def preempt(self, slot, new_plen):
        rid = self.slots[slot]
        if rid == -1:
            return -1
        r = self.active.pop(rid)
        self.slots[slot] = -1
        remaining = max(r[2] - r[3], 1)
        self.waiting.insert(0, [rid, new_plen, remaining, 0])
        return rid

    def finish(self, slot):
        rid = self.slots[slot]
        if rid == -1:
            return -1
        self.slots[slot] = -1
        del self.active[rid]
        self.done_count += 1
        return rid


class Scheduler:
    """Thin wrapper selecting the native scheduler when built."""

    def __init__(self, n_slots: int):
        self._lib = _load_sched()
        if self._lib is not None:
            self._h = self._lib.gear_sched_create(n_slots)
        else:
            self._py = _PySched(n_slots)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def add(self, rid, plen, max_new):
        if self._lib:
            return self._lib.gear_sched_add(self._h, rid, plen, max_new)
        return self._py.add(rid, plen, max_new)

    def next_admission(self):
        if self._lib:
            return self._lib.gear_sched_next_admission(self._h)
        return self._py.next_admission()

    def admit(self, rid):
        if self._lib:
            return self._lib.gear_sched_admit(self._h, rid)
        return self._py.admit(rid)

    def step(self, slot):
        if self._lib:
            return self._lib.gear_sched_step(self._h, slot)
        return self._py.step(slot)

    def preempt(self, slot, new_plen):
        """Free the slot and requeue its request at the FRONT of the waiting
        queue with its remaining token budget (recompute-style preemption)."""
        if self._lib:
            return self._lib.gear_sched_preempt(self._h, slot, new_plen)
        return self._py.preempt(slot, new_plen)

    def finish(self, slot):
        if self._lib:
            return self._lib.gear_sched_finish(self._h, slot)
        return self._py.finish(slot)

    def __del__(self):
        if getattr(self, "_lib", None) is not None:
            self._lib.gear_sched_destroy(self._h)


@dataclass
class Request:
    rid: int
    tokens: list[int]
    max_new: int
    out: list[int] = field(default_factory=list)
    done: bool = False
    folded: int = 0  # prefix of `out` already folded into `tokens` (preempt)


class ServingEngine:
    """Continuous batching over ``n_slots`` independent sequences."""

    def __init__(self, model_cfg: llama.ModelConfig, params, comp=None, *,
                 n_slots: int = 4, max_len: int = 512,
                 eos_token_id: int | None = None, pad_token_id: int = 0):
        self.cfg = model_cfg
        self.params = params
        self.comp = comp or CompressionConfig(num_layers=model_cfg.num_layers)
        lcomp = self.comp.layer(0)
        self.spec = model_cfg.cache_spec(1, max_len, lcomp)  # per-slot B=1
        self.n_slots = n_slots
        self.max_len = max_len
        self.eos = eos_token_id
        self.pad_id = pad_token_id
        self.sched = Scheduler(n_slots)
        self.requests: dict[int, Request] = {}
        self._next_rid = 0
        self._slot_req: list[Request | None] = [None] * n_slots

        one = kvcache.init_stacked(self.spec, model_cfg.num_layers)
        self.caches = jax.tree.map(
            lambda x: jnp.broadcast_to(x[:, None], (x.shape[0], n_slots) + x.shape[1:]),
            one)
        self.cur_tok = jnp.zeros((n_slots,), jnp.int32)
        self.positions = jnp.zeros((n_slots,), jnp.int32)
        self.pad_start = jnp.zeros((n_slots,), jnp.int32)
        self.live = np.zeros((n_slots,), bool)
        self._prefill_fns = {}
        self._decode_fn = None

    # -- public API -----------------------------------------------------

    def submit(self, tokens: list[int], max_new: int) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self.requests[rid] = Request(rid, list(tokens), max_new)
        self.sched.add(rid, len(tokens), max_new)
        return rid

    def run(self, max_steps: int = 10_000) -> dict[int, list[int]]:
        """Drive admissions + decode until all submitted requests finish."""
        for _ in range(max_steps):
            self._admit_all()
            if not self.live.any():
                break
            self._decode_once()
        return {rid: r.out for rid, r in self.requests.items() if r.done}

    # -- internals ------------------------------------------------------

    def _bucket(self, n: int) -> int:
        g = self.spec.group
        return min(((n + g - 1) // g) * g, self.max_len)

    def _get_prefill(self, s: int):
        if s not in self._prefill_fns:
            cfg, spec = self.cfg, self.spec

            @jax.jit
            def run(params, tokens, mask, prng):
                positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
                return llama.forward_prefill(
                    params, cfg, tokens, positions, mask, spec,
                    compress=True, prng=prng)

            self._prefill_fns[s] = run
        return self._prefill_fns[s]

    def _get_decode(self):
        if self._decode_fn is None:
            cfg, spec = self.cfg, self.spec

            def one_slot(caches, token, position, pad_start, prng):
                logits, caches = llama.forward_decode(
                    params_c, cfg, token[None], position[None], caches,
                    spec=spec, compress=True, pad_start=pad_start[None],
                    prng=prng)
                return jnp.argmax(logits[0], axis=-1).astype(jnp.int32), caches

            params_c = self.params

            # caches donated: the serving loop reassigns them every step
            # (without donation each step copies every slot's full cache)
            @functools.partial(jax.jit, donate_argnums=(0,))
            def step(caches, tokens, positions, pad_starts, prng):
                keys = jax.random.split(prng, tokens.shape[0])
                return jax.vmap(one_slot, in_axes=(1, 0, 0, 0, 0),
                                out_axes=(0, 1))(
                    caches, tokens, positions, pad_starts, keys)

            self._decode_fn = step
        return self._decode_fn

    def _admit_all(self):
        while True:
            rid = self.sched.next_admission()
            if rid == -1:
                break
            slot = self.sched.admit(rid)
            req = self.requests[rid]
            self._slot_req[slot] = req
            s = self._bucket(len(req.tokens))
            toks = req.tokens[-s:]
            tokens = np.full((1, s), self.pad_id, np.int32)
            mask = np.zeros((1, s), np.int32)
            tokens[0, s - len(toks):] = toks
            mask[0, s - len(toks):] = 1
            logits, caches1 = self._get_prefill(s)(
                self.params, jnp.asarray(tokens), jnp.asarray(mask),
                jax.random.PRNGKey(rid))
            first = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            # Splice the fresh cache into this slot. Prefill cache capacity
            # equals spec capacity, so leaves line up exactly.
            self.caches = jax.tree.map(
                lambda full, one: full.at[:, slot].set(one), self.caches,
                caches1)
            self.cur_tok = self.cur_tok.at[slot].set(first)
            self.positions = self.positions.at[slot].set(len(toks))
            self.pad_start = self.pad_start.at[slot].set(s - len(toks))
            self.live[slot] = True
            req.out.append(int(first))
            self._after_emit(slot, req)

    def _decode_once(self):
        step = self._get_decode()
        nxt, self.caches = step(self.caches, self.cur_tok, self.positions,
                                self.pad_start, jax.random.PRNGKey(7))
        self.positions = self.positions + 1
        self.cur_tok = nxt
        toks = np.asarray(nxt)
        for slot in range(self.n_slots):
            req = self._slot_req[slot]
            if req is None or req.done:
                continue
            req.out.append(int(toks[slot]))
            self._after_emit(slot, req)

    def _after_emit(self, slot: int, req: Request):
        remaining = self.sched.step(slot)
        hit_eos = self.eos is not None and req.out and req.out[-1] == self.eos
        if remaining <= 0 or hit_eos:
            req.done = True
            self.sched.finish(slot)
            self._slot_req[slot] = None
            self.live[slot] = False


class PagedServingEngine:
    """Continuous batching over a SHARED physical page pool (gear_tpu.paged).

    vs :class:`ServingEngine` (per-slot dense caches, vmapped decode):
      * HBM is pooled — short sequences don't reserve max_len of cache;
      * one decode pass serves all slots with PER-SLOT lengths natively
        (no vmap); the Pallas paged kernel streams pages by block table;
      * pages are refcounted (native/pager.cc) so admissions can share
        prompt-prefix pages.

    Host-side page lifecycle: admission allocates ceil(prompt_blocks /
    page_blocks) pages; before every decode step the engine preallocates a
    slot's next page when its upcoming flush would cross into it; finishing
    a request releases its pages.
    """

    def __init__(self, model_cfg: llama.ModelConfig, params, comp=None, *,
                 n_slots: int = 4, max_len: int = 512, n_pages: int = 64,
                 page_blocks: int = 2, eos_token_id: int | None = None,
                 pad_token_id: int = 0, attn_impl: str = "xla"):
        from . import paged as paged_mod
        self._paged = paged_mod
        self.cfg = model_cfg
        self.params = params
        self.comp = comp or CompressionConfig(num_layers=model_cfg.num_layers)
        lcomp = self.comp.layer(0)
        self.spec = model_cfg.cache_spec(1, max_len, lcomp)
        self.pspec = paged_mod.PagedSpec(spec=self.spec, n_pages=n_pages,
                                         page_blocks=page_blocks)
        self.n_slots = n_slots
        self.max_len = max_len
        self.eos = eos_token_id
        self.pad_id = pad_token_id
        self.attn_impl = attn_impl
        self.sched = Scheduler(n_slots)
        self.alloc = paged_mod.PageAllocator(n_pages)
        self.requests: dict[int, Request] = {}
        self._next_rid = 0
        self._slot_req: list[Request | None] = [None] * n_slots
        self._slot_pages: list[list[int]] = [[] for _ in range(n_slots)]

        L = model_cfg.num_layers
        one_pool = paged_mod.init_pool(self.pspec)
        self.pools = jax.tree.map(
            lambda x: jnp.zeros((L,) + x.shape, x.dtype), one_pool)
        g = self.spec.group
        h, d = self.spec.num_kv_heads, self.spec.head_dim
        self.seqs = paged_mod.PagedSeqs(
            block_table=jnp.full((n_slots, self.pspec.max_pages_per_seq),
                                 -1, jnp.int32),
            comp_len=jnp.zeros((n_slots,), jnp.int32),
            resid_len=jnp.ones((n_slots,), jnp.int32),  # 1 zero-token: no NaN
            prefill_len=jnp.zeros((n_slots,), jnp.int32),
            k_resid=jnp.zeros((L, n_slots, h, g, d), self.spec.dtype),
            v_resid=jnp.zeros((L, n_slots, h, g, d), self.spec.dtype),
        )
        self.cur_tok = jnp.zeros((n_slots,), jnp.int32)
        self.positions = jnp.zeros((n_slots,), jnp.int32)
        self.pad_start = jnp.zeros((n_slots,), jnp.int32)
        self.live = np.zeros((n_slots,), bool)
        self._prefill_fns = {}
        self._decode_fn = None
        # host mirrors of per-slot lengths for page preallocation
        self._host_comp = [0] * n_slots
        self._host_resid = [0] * n_slots

    # -- public API -----------------------------------------------------

    def submit(self, tokens: list[int], max_new: int) -> int:
        rid = self._next_rid
        self._next_rid += 1
        self.requests[rid] = Request(rid, list(tokens), max_new)
        self.sched.add(rid, len(tokens), max_new)
        return rid

    def run(self, max_steps: int = 10_000) -> dict[int, list[int]]:
        for _ in range(max_steps):
            self._admit_all()
            if not self.live.any():
                break
            self._prealloc_pages()
            self._decode_once()
        return {rid: r.out for rid, r in self.requests.items() if r.done}

    # -- internals ------------------------------------------------------

    def _bucket(self, n: int) -> int:
        g = self.spec.group
        return min(((n + g - 1) // g) * g, self.max_len)

    def _get_prefill(self, s: int):
        if s not in self._prefill_fns:
            cfg, spec = self.cfg, self.spec

            @jax.jit
            def run(params, tokens, mask, prng):
                positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
                return llama.forward_prefill(
                    params, cfg, tokens, positions, mask, spec,
                    compress=True, prng=prng)

            self._prefill_fns[s] = run
        return self._prefill_fns[s]

    def _get_decode(self):
        if self._decode_fn is None:
            cfg, pspec, impl = self.cfg, self.pspec, self.attn_impl
            params_c = self.params

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step(pools, seqs, tokens, positions, pad_starts, live, prng):
                logits, pools, seqs = llama.forward_decode_paged(
                    params_c, cfg, tokens, positions, pools, seqs,
                    pspec=pspec, pad_start=pad_starts, prng=prng,
                    attn_impl=impl, live=live)
                return (jnp.argmax(logits, axis=-1).astype(jnp.int32),
                        pools, seqs)

            self._decode_fn = step
        return self._decode_fn

    def _splice_slot(self, slot: int, caches1, page_ids: list[int],
                     plen: int, pad0: int):
        """Scatter a fresh dense prefill cache (leaves [L,1,...]) into pages
        and point this slot's table/lengths at it."""
        pb = self.pspec.page_blocks
        g = self.spec.group
        # prefill caches are layer-stacked; lengths are equal across layers
        comp0 = int(np.asarray(caches1.comp_len)[0])
        resid0 = int(np.asarray(caches1.resid_len)[0])
        n_blk = comp0 // g
        n_pages_used = -(-n_blk // pb) if n_blk else 0
        assert n_pages_used <= len(page_ids)

        pools = self.pools
        L = self.cfg.num_layers
        for layer in range(L):
            lpool = jax.tree.map(lambda x: x[layer], pools)
            ldense = jax.tree.map(lambda x: x[layer], caches1)
            lpool = self._paged._scatter_prefix_into_pages(
                self.pspec, lpool, ldense, 0, page_ids, n_pages_used)
            pools = jax.tree.map(
                lambda full, one, layer=layer: full.at[layer].set(one),
                pools, lpool)
        self.pools = pools

        maxp = self.pspec.max_pages_per_seq
        row = np.full((maxp,), -1, np.int32)
        row[:n_pages_used] = page_ids[:n_pages_used]
        self.seqs = self.seqs.replace(
            block_table=self.seqs.block_table.at[slot].set(jnp.asarray(row)),
            comp_len=self.seqs.comp_len.at[slot].set(comp0),
            resid_len=self.seqs.resid_len.at[slot].set(resid0),
            prefill_len=self.seqs.prefill_len.at[slot].set(
                int(np.asarray(caches1.prefill_len)[0])),
            k_resid=self.seqs.k_resid.at[:, slot].set(caches1.k_resid[:, 0]),
            v_resid=self.seqs.v_resid.at[:, slot].set(caches1.v_resid[:, 0]),
        )
        self._host_comp[slot] = comp0
        self._host_resid[slot] = resid0

    def _admit_all(self):
        while True:
            rid = self.sched.next_admission()
            if rid == -1:
                break
            req = self.requests[rid]
            s = self._bucket(len(req.tokens))
            n_pages_needed = -(-(s // self.spec.group)
                               // self.pspec.page_blocks)
            if self.alloc.free_count() < n_pages_needed + 1:
                break  # wait for pages to free up
            slot = self.sched.admit(rid)
            self._slot_req[slot] = req
            toks = req.tokens[-s:]
            tokens = np.full((1, s), self.pad_id, np.int32)
            mask = np.zeros((1, s), np.int32)
            tokens[0, s - len(toks):] = toks
            mask[0, s - len(toks):] = 1
            logits, caches1 = self._get_prefill(s)(
                self.params, jnp.asarray(tokens), jnp.asarray(mask),
                jax.random.PRNGKey(rid))
            ids = [self.alloc.alloc() for _ in range(n_pages_needed)]
            assert -1 not in ids
            self._slot_pages[slot] = ids
            self._splice_slot(slot, caches1, ids, len(toks), s - len(toks))
            first = jnp.argmax(logits[0, -1]).astype(jnp.int32)
            self.cur_tok = self.cur_tok.at[slot].set(first)
            self.positions = self.positions.at[slot].set(len(toks))
            self.pad_start = self.pad_start.at[slot].set(s - len(toks))
            self.live[slot] = True
            req.out.append(int(first))
            self._after_emit(slot, req)

    def _prealloc_pages(self):
        """Ensure the page a slot's NEXT flush writes into is allocated.

        On pool exhaustion, apply BACKPRESSURE instead of crashing: preempt
        a live slot (release its pages, requeue the request with its
        generated prefix as the new prompt) until the allocation succeeds.
        """
        g = self.spec.group
        pb = self.pspec.page_blocks
        for slot in range(self.n_slots):
            if not self.live[slot]:
                continue
            if self._host_resid[slot] + 1 == g:  # this step will flush
                pidx = (self._host_comp[slot] // g) // pb
                if (pidx >= len(self._slot_pages[slot])
                        and pidx < self.pspec.max_pages_per_seq):
                    pid = self.alloc.alloc()
                    while pid == -1:
                        victim = self._pick_preempt_victim(exclude=slot)
                        if victim is None:
                            # nothing left to evict but this slot itself
                            self._preempt(slot)
                            break
                        self._preempt(victim)
                        pid = self.alloc.alloc()
                    if not self.live[slot]:
                        continue  # self-preempted above
                    assert pid != -1, "page pool exhausted after preemption"
                    self._slot_pages[slot].append(pid)
                    self.seqs = self.seqs.replace(
                        block_table=self.seqs.block_table
                        .at[slot, pidx].set(pid))

    def _pick_preempt_victim(self, exclude: int) -> int | None:
        """Pick the live slot holding the most pages (frees the most HBM);
        ties go to the most recently admitted (highest slot id)."""
        best, best_pages = None, 0
        for slot in range(self.n_slots):
            if slot == exclude or not self.live[slot]:
                continue
            if len(self._slot_pages[slot]) >= best_pages:
                best, best_pages = slot, len(self._slot_pages[slot])
        return best

    def _preempt(self, slot: int):
        """Release a slot's pages and requeue its request (generated tokens
        become part of the prompt so no work is lost — vLLM-style
        recompute preemption). The scheduler requeues it at the FRONT of
        the waiting queue with its remaining token budget."""
        req = self._slot_req[slot]
        # Continue from everything generated so far; re-admission prefills
        # the full (possibly bucketed/truncated) context again.
        req.tokens = req.tokens + req.out[req.folded:]
        req.folded = len(req.out)
        self.sched.preempt(slot, len(req.tokens))
        self._park_slot(slot)

    def _decode_once(self):
        step = self._get_decode()
        nxt, self.pools, self.seqs = step(
            self.pools, self.seqs, self.cur_tok, self.positions,
            self.pad_start, jnp.asarray(self.live), jax.random.PRNGKey(7))
        self.positions = self.positions + 1
        self.cur_tok = nxt
        toks = np.asarray(nxt)
        for slot in range(self.n_slots):
            if self._slot_req[slot] is not None:
                if self._host_resid[slot] + 1 == self.spec.group:
                    self._host_comp[slot] += self.spec.group
                    self._host_resid[slot] = 0
                else:
                    self._host_resid[slot] += 1
            req = self._slot_req[slot]
            if req is None or req.done:
                continue
            req.out.append(int(toks[slot]))
            self._after_emit(slot, req)

    def _after_emit(self, slot: int, req: Request):
        remaining = self.sched.step(slot)
        hit_eos = self.eos is not None and req.out and req.out[-1] == self.eos
        if remaining <= 0 or hit_eos:
            req.done = True
            self.sched.finish(slot)
            self._park_slot(slot)

    def _park_slot(self, slot: int):
        """Free a slot's pages and reset its device state. Parked slots are
        masked out of append/flush by the decode step's ``live`` mask, and
        their block table holds -1 (= unallocated; append_paged never
        flushes to a negative page id)."""
        self._slot_req[slot] = None
        self.live[slot] = False
        for pid in self._slot_pages[slot]:
            self.alloc.release(pid)
        self._slot_pages[slot] = []
        # park the slot on a harmless state (1 zero residual token)
        self.seqs = self.seqs.replace(
            block_table=self.seqs.block_table.at[slot].set(
                jnp.full((self.pspec.max_pages_per_seq,), -1, jnp.int32)),
            comp_len=self.seqs.comp_len.at[slot].set(0),
            resid_len=self.seqs.resid_len.at[slot].set(1),
            prefill_len=self.seqs.prefill_len.at[slot].set(0),
            k_resid=self.seqs.k_resid.at[:, slot].set(0),
            v_resid=self.seqs.v_resid.at[:, slot].set(0),
        )
        self._host_comp[slot] = 0
        self._host_resid[slot] = 1
