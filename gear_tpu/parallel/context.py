"""Sequence (context) parallelism: compressed-KV-sharded decode attention.

The reference has NO sequence parallelism (survey §2.5) — long contexts are
bounded by one device's memory. The TPU build shards the COMPRESSED prefix
along time across a ``seq`` mesh axis: each device holds T/n blocks of
packed codes + scales + low-rank bases, computes a partial flash-attention
state against its shard, and the states merge with one tiny psum-style
collective (online-softmax merge). The wire format is O(B*Hq*D) floats per
step — the KV itself never moves, which is the whole point of compressing
it in place.

The residual (uncompressed) tier lives on the LAST shard, which is also the
only shard that absorbs newly appended tokens; flush-produced blocks land in
that shard's local prefix. Rebalancing shards is a host-level operation
between generations (not needed within one).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .. import cache as kvcache
from ..cache import CacheSpec, LayerCache


def shard_spec(spec: CacheSpec, n_shards: int) -> CacheSpec:
    """The per-device CacheSpec for a seq-sharded cache."""
    if spec.max_len % (n_shards * spec.group):
        raise ValueError("max_len must divide evenly into seq shards of "
                         "whole groups")
    import dataclasses

    return dataclasses.replace(spec, max_len=spec.max_len // n_shards)


def split_cache(spec: CacheSpec, cache: LayerCache, n_shards: int
                ) -> LayerCache:
    """Split a single-device LayerCache into per-shard caches stacked on a
    leading shard axis (for device_put onto the ``seq`` mesh axis).

    Time-sharded leaves: k_codes/v_codes [.., WD, T], v_scale/v_mn
    [.., NGV, T], kqt/vqt [.., R, T] split on their last axis; k_scale/k_mn
    [.., NB, D] and kp/vpt [.., NB, ..] on the block axis. The residual tier
    and resid_len go to the LAST shard only; comp_len becomes per-shard
    local lengths.
    """
    ls = spec.max_len // n_shards
    nbs = ls // spec.group

    def split_t(x, axis):
        return jnp.stack(jnp.split(x, n_shards, axis=axis))

    shard_ids = jnp.arange(n_shards, dtype=jnp.int32)
    local_comp = jnp.clip(cache.comp_len - shard_ids * ls, 0, ls)
    is_last = (shard_ids == n_shards - 1).astype(jnp.int32)
    zeros_resid = jnp.zeros_like(cache.k_resid)
    return LayerCache(
        k_codes=split_t(cache.k_codes, 3),
        k_scale=split_t(cache.k_scale, 2),
        k_mn=split_t(cache.k_mn, 2),
        v_codes=split_t(cache.v_codes, 3),
        v_scale=split_t(cache.v_scale, 3),
        v_mn=split_t(cache.v_mn, 3),
        k_resid=jnp.stack([
            jnp.where(i == n_shards - 1, cache.k_resid, zeros_resid)
            for i in range(n_shards)]),
        v_resid=jnp.stack([
            jnp.where(i == n_shards - 1, cache.v_resid, zeros_resid)
            for i in range(n_shards)]),
        k_out_idx=split_t(cache.k_out_idx, 2),
        k_out_val=split_t(cache.k_out_val, 2),
        v_out_idx=split_t(cache.v_out_idx, 2),
        v_out_val=split_t(cache.v_out_val, 2),
        k_out_bnd=split_t(cache.k_out_bnd, 2),
        v_out_bnd=split_t(cache.v_out_bnd, 2),
        kpt=split_t(cache.kpt, 2),
        kqt=split_t(cache.kqt, 3),
        vpt=split_t(cache.vpt, 2),
        vqt=split_t(cache.vqt, 3),
        kpt_scale=split_t(cache.kpt_scale, 2),
        kqt_scale=split_t(cache.kqt_scale, 3),
        vpt_scale=split_t(cache.vpt_scale, 2),
        vqt_scale=split_t(cache.vqt_scale, 3),
        comp_len=local_comp,
        resid_len=cache.resid_len * is_last,
        prefill_len=jnp.clip(cache.prefill_len - shard_ids * ls, 0, ls),
    )


def seq_sharded_attend(
    spec: CacheSpec,
    sharded_cache: LayerCache,   # leaves with leading shard axis
    q: jax.Array,                # [B, Hq, Qn, D] replicated
    mesh: Mesh,
    *,
    axis: str = "seq",
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
) -> jax.Array:
    """Decode attention over a seq-sharded compressed cache.

    Each device computes a partial flash state on its local shard; partials
    merge with psum/pmax collectives over the ``seq`` axis. q and the output
    are replicated over the axis.
    """
    n_shards = mesh.shape[axis]
    lspec = shard_spec(spec, n_shards)
    ls = lspec.max_len
    if pad_start is None:
        pad_start = jnp.zeros((q.shape[0],), jnp.int32)

    cache_specs = jax.tree.map(lambda _: P(axis), sharded_cache)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(cache_specs, P(), P()),
        out_specs=P(),
    )
    def run(local_cache, q_rep, pad_rep):
        local_cache = jax.tree.map(lambda x: x[0], local_cache)
        shard_id = jax.lax.axis_index(axis)
        acc, m, l = kvcache.attend_partial(
            lspec, local_cache, q_rep, sm_scale=sm_scale,
            pad_start=pad_rep, token_offset=shard_id * ls)
        # online-softmax merge across the seq axis
        m_tot = jax.lax.pmax(m, axis)
        a = jnp.where(m > -1e29, jnp.exp(m - m_tot), 0.0)
        num = jax.lax.psum(acc * a[..., None], axis)
        den = jax.lax.psum(l * a, axis)
        return (num / den[..., None]).astype(q_rep.dtype)

    return run(sharded_cache, q, pad_start)


def seq_sharded_append_attend(
    spec: CacheSpec,
    sharded_cache: LayerCache,   # leaves with leading shard axis
    k_new: jax.Array,            # [B, H, 1, D] replicated
    v_new: jax.Array,
    q: jax.Array,                # [B, Hq, Qn, D] replicated
    mesh: Mesh,
    *,
    axis: str = "seq",
    key: jax.Array | None = None,
    use_lowrank: bool = True,
    sm_scale: float | None = None,
    pad_start: jax.Array | None = None,
):
    """One decode step over a seq-sharded cache: append the new token on the
    LAST shard (residual tier + local flush), then partial-attend + merge.

    Returns (attention output [B, Hq, Qn, D] replicated, updated cache).
    The flush PRNG chain folds the GLOBAL position, so generations match the
    unsharded engine token-for-token.
    """
    n_shards = mesh.shape[axis]
    lspec = shard_spec(spec, n_shards)
    ls = lspec.max_len
    if pad_start is None:
        pad_start = jnp.zeros((q.shape[0],), jnp.int32)
    if key is None:
        key = jax.random.PRNGKey(1)

    cache_specs = jax.tree.map(lambda _: P(axis), sharded_cache)

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(cache_specs, P(), P(), P(), P(), P()),
        out_specs=(P(), cache_specs),
    )
    def run(local_cache, k1, v1, q_rep, pad_rep, key_rep):
        local = jax.tree.map(lambda x: x[0], local_cache)
        shard_id = jax.lax.axis_index(axis)
        is_last = shard_id == n_shards - 1

        # -- append on the last shard ---------------------------------------
        # Flush PRNG folds the TOTAL compressed tokens (psum over shards) —
        # the same value the unsharded cache.append folds — so generations
        # match the unsharded engine token-for-token.
        total_comp = jax.lax.psum(local.comp_len, axis)
        akey = jax.random.fold_in(key_rep, total_comp)
        i = local.resid_len
        appended = local.replace(
            k_resid=jax.lax.dynamic_update_slice(
                local.k_resid, k1.astype(lspec.dtype), (0, 0, i, 0)),
            v_resid=jax.lax.dynamic_update_slice(
                local.v_resid, v1.astype(lspec.dtype), (0, 0, i, 0)),
            resid_len=i + 1,
        )
        def _fl(c):
            out = kvcache._flush(lspec, c, akey, use_lowrank)
            # _flush writes a CONSTANT 0 resid_len; derive it from the
            # varying input so both cond branches type-match under
            # shard_map's varying-axis checks.
            return out.replace(resid_len=c.resid_len * 0)

        appended = jax.lax.cond(
            appended.resid_len == lspec.group, _fl, lambda c: c, appended)
        local = jax.tree.map(
            lambda upd, old: jnp.where(is_last, upd, old), appended, local)

        # -- partial flash attention + online-softmax merge ----------------
        acc, m, l = kvcache.attend_partial(
            lspec, local, q_rep, sm_scale=sm_scale,
            pad_start=pad_rep, token_offset=shard_id * ls)
        m_tot = jax.lax.pmax(m, axis)
        a = jnp.where(m > -1e29, jnp.exp(m - m_tot), 0.0)
        num = jax.lax.psum(acc * a[..., None], axis)
        den = jax.lax.psum(l * a, axis)
        out = (num / den[..., None]).astype(q_rep.dtype)
        return out, jax.tree.map(lambda x: x[None], local)

    return run(sharded_cache, k_new, v_new, q, pad_start, key)
