"""Device-mesh sharding for weights, activations, and the compressed cache.

The reference is single-process/single-node (survey §2.5: no torch.distributed
anywhere; `accelerate device_map` only places layers). The TPU build scales
via ``jax.sharding``: annotate shardings on a Mesh, let XLA insert the
collectives over ICI.

Axes:
  * ``data``  — batch dim of activations and every cache leaf;
  * ``model`` — tensor parallelism: attention heads (and the ffn hidden dim)
    column-sharded; ``wo``/``wd`` row-sharded so XLA inserts the standard
    all-reduce pair per block. Every compressed-cache leaf (packed codes,
    scales, low-rank bases, residual ring) is sharded on its kv-head axis, so
    the wire format of any cross-device KV movement is the COMPRESSED
    representation — the key bandwidth win (survey §2.5).

Sequence parallelism for long contexts shards the packed KV along time
(axis ``seq``) — see gear_tpu.parallel.context (ring decode).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..cache import LayerCache
from ..models.llama import RawLayerCache


def make_mesh(data: int = 1, model: int = 1, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def param_pspecs(params: dict) -> dict:
    """PartitionSpec tree matching gear_tpu.models.llama param layout.

    Layer weights carry a leading stacked-layer axis (never sharded).
    """
    specs = {
        "embed": P(None, None),            # replicated (vocab gathers are rare)
        "layers": {
            "attn_norm": P(None, None),
            "mlp_norm": P(None, None),
            "wq": P(None, None, "model"),  # column-parallel (heads)
            "wk": P(None, None, "model"),
            "wv": P(None, None, "model"),
            "wo": P(None, "model", None),  # row-parallel -> psum
            "wg": P(None, None, "model"),
            "wu": P(None, None, "model"),
            "wd": P(None, "model", None),
        },
        "final_norm": P(None),
    }
    if "lm_head" in params:
        specs["lm_head"] = P(None, "model")
    return specs


def cache_pspecs(stacked: bool = True) -> LayerCache:
    """PartitionSpecs for every LayerCache leaf: batch on ``data``, kv-head
    axis on ``model``; scalar lengths replicated."""
    lead = (None,) if stacked else ()

    def ps(*rest):
        return P(*lead, "data", "model", *rest)

    scalar = P(*lead) if stacked else P()
    return LayerCache(
        k_codes=ps(None, None), k_scale=ps(None, None), k_mn=ps(None, None),
        v_codes=ps(None, None), v_scale=ps(None, None), v_mn=ps(None, None),
        k_resid=ps(None, None), v_resid=ps(None, None),
        k_out_idx=ps(None, None), k_out_val=ps(None, None),
        v_out_idx=ps(None, None), v_out_val=ps(None, None),
        k_out_bnd=ps(None, None), v_out_bnd=ps(None, None),
        kpt=ps(None, None, None), kqt=ps(None, None),
        vpt=ps(None, None, None), vqt=ps(None, None),
        kpt_scale=ps(None, None), kqt_scale=ps(None, None),
        vpt_scale=ps(None, None), vqt_scale=ps(None, None),
        comp_len=scalar, resid_len=scalar, prefill_len=scalar,
    )


def raw_cache_pspecs(stacked: bool = True) -> RawLayerCache:
    lead = (None,) if stacked else ()
    return RawLayerCache(
        k=P(*lead, "data", "model", None, None),
        v=P(*lead, "data", "model", None, None),
        length=P(*lead) if stacked else P(),
    )


def shard_params(mesh: Mesh, params: dict) -> dict:
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_cache(mesh: Mesh, caches, stacked: bool = True):
    specs = cache_pspecs(stacked)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), caches, specs
    )


def named(mesh: Mesh, tree_specs):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), tree_specs,
        is_leaf=lambda s: isinstance(s, P),
    )
