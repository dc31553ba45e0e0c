"""Bisect the 16k-ctx Pallas lowering failure (runs on the real TPU).

Compiles (a) the pack/prefill path and (b) the fused decode kernel at
max_len 16384 separately, tiny B/H, printing which one trips the Mosaic
block-shape constraint and its full traceback.
"""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gear_tpu import cache as C
from gear_tpu.kernels import decode as K

MCTX = 16384
spec = C.CacheSpec(batch=1, num_kv_heads=2, head_dim=128, max_len=MCTX,
                   bits=2, group=64, rank=2, prefill_rank=2,
                   lowrank_loop=3, base_bits=8, v_group_size=128,
                   dtype=jnp.bfloat16, sideband_dtype=jnp.bfloat16)
pre = MCTX - 92
kk, kv = jax.random.split(jax.random.PRNGKey(0))
k = jax.random.normal(kk, (1, 2, pre, 128), jnp.float32) * 0.3
v = jax.random.normal(kv, (1, 2, pre, 128), jnp.float32) * 0.3

try:
    cache = C.prefill(spec, k, v)
    np.asarray(cache.comp_len)
    print("PREFILL OK", flush=True)
except Exception:
    print("PREFILL FAILED:", flush=True)
    traceback.print_exc()
    sys.exit(1)

q = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 1, 128), jnp.float32
                      ).astype(jnp.bfloat16)
for cb, hb in ((16, 1), (16, 2), (32, 2)):
    try:
        out = K.attend_fused(spec, cache, q, blocks_per_chunk=cb,
                             heads_per_step=hb)
        np.asarray(out)
        print(f"ATTEND cb={cb} hb={hb} OK", flush=True)
    except Exception:
        print(f"ATTEND cb={cb} hb={hb} FAILED:", flush=True)
        traceback.print_exc()
