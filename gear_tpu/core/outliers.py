"""Sparse outlier extraction/restoration with static shapes.

Behavioral reference (semantics only):
  - reference: GenerationBench/GenerationTest/GEARLM/Simulated/compress_function.py:261-333
    (gears_channelQ / gears_tokenQ): per row of a 3-D view, the k smallest and
    k largest entries are replaced by the row mean before quantization and
    restored exactly afterwards, with k = total_elems * sparsity / rows / 2.

TPU-native differences: k is a STATIC python int (computed from config and
shapes at trace time) so everything stays jit-compatible; extraction uses
``jax.lax.top_k`` and restoration is a batched scatter.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Outliers(NamedTuple):
    """Fixed-size COO record of extracted outliers (per row of [..., n]).

    values/indices: [..., 2*k] — first k are the smallest entries, last k the
    largest. Empty (k == 0) records have trailing dim 0.
    """

    values: jax.Array
    indices: jax.Array  # int32


def outlier_k(total_elems: int, rows: int, sparsity: float) -> int:
    """k per row per side, mirroring the reference formula
    ``int(total * sparsity) / rows / 2`` (compress_function.py:227-229)."""
    return int(int(total_elems * sparsity) / rows / 2)


def extract(x: jax.Array, k: int) -> tuple[jax.Array, Outliers]:
    """Replace the k smallest and k largest entries per row with the row mean.

    x: [..., n]. Returns (x_cleaned, Outliers) with static shapes.
    """
    if k == 0:
        empty = jnp.zeros((*x.shape[:-1], 0))
        return x, Outliers(empty.astype(x.dtype), empty.astype(jnp.int32))
    lo_v, lo_i = jax.lax.top_k(-x, k)
    hi_v, hi_i = jax.lax.top_k(x, k)
    values = jnp.concatenate([-lo_v, hi_v], axis=-1)
    indices = jnp.concatenate([lo_i, hi_i], axis=-1).astype(jnp.int32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    fill = jnp.broadcast_to(mean, indices.shape).astype(x.dtype)
    cleaned = _scatter_last(x, indices, fill)
    return cleaned, Outliers(values, indices)


def restore(x: jax.Array, outliers: Outliers) -> jax.Array:
    """Write the exact outlier values back into their positions."""
    if outliers.values.shape[-1] == 0:
        return x
    return _scatter_last(x, outliers.indices, outliers.values.astype(x.dtype))


def _scatter_last(x: jax.Array, idx: jax.Array, vals: jax.Array) -> jax.Array:
    """Batched scatter along the last dim: x[..., idx[..., j]] = vals[..., j]."""
    flat_x = x.reshape(-1, x.shape[-1])
    flat_i = idx.reshape(-1, idx.shape[-1])
    flat_v = vals.reshape(-1, vals.shape[-1])

    def row(xr, ir, vr):
        return xr.at[ir].set(vr)

    out = jax.vmap(row)(flat_x, flat_i, flat_v)
    return out.reshape(x.shape)
