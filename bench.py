"""Headline benchmark: fused compressed-KV decode attention vs fp16 baseline.

Measures the BASELINE.json north-star component on the real TPU chip: decode
attention over an INT4 + rank-4 compressed KV cache at 8k context and
Llama-2-7B attention shapes (32 heads, head_dim 128), against uncompressed
bf16 attention — the reference's speed protocol is the analogous fused-path
generate timing (cuda_supported_gear/test.py:25-37,95-102).

Prints ONE JSON line:
  {"metric": ..., "value": tokens/s/chip (attention path, full 32-layer
   model equivalent), "unit": "tok/s", "vs_baseline": speedup vs bf16}
"""
import json
import signal
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def _watchdog(seconds: int = 540):
    """The tunneled TPU runtime can wedge (device ops hang indefinitely);
    emit a diagnostic JSON line instead of hanging the driver."""
    def fire(signum, frame):
        print(json.dumps({
            "metric": "decode attention tok/s/chip (INT4+rank4 KV, 8k ctx)",
            "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
            "error": f"watchdog: TPU unresponsive after {seconds}s",
        }))
        sys.stdout.flush()
        import os
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def main():
    _watchdog()
    from gear_tpu import cache as C
    from gear_tpu.kernels import decode as K
    from gear_tpu.models import llama as L

    CTX = 8192
    HEADS = 32          # llama-2-7b: MHA
    HEAD_DIM = 128
    LAYERS = 32
    N = 300

    rng = np.random.default_rng(0)
    spec = C.CacheSpec(batch=1, num_kv_heads=HEADS, head_dim=HEAD_DIM,
                       max_len=CTX, bits=4, group=64, rank=4, prefill_rank=4,
                       lowrank_loop=3, dtype=jnp.bfloat16,
                       sideband_dtype=jnp.bfloat16)
    shape = (1, HEADS, CTX, HEAD_DIM)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cache = C.prefill(spec, k, v)
    jax.block_until_ready(cache)
    rc = L.raw_prefill(spec, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    q = jnp.asarray(
        rng.standard_normal((1, HEADS, 1, HEAD_DIM)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def bench(f, c, q):
        @jax.jit
        def loop(cache, q):
            def body(i, x):
                return f(cache, x + i * 1e-9).astype(q.dtype)
            return jax.lax.fori_loop(0, N, body, q)
        # NOTE: on the tunneled runtime block_until_ready does not actually
        # wait; a device->host fetch is the only reliable sync.
        np.asarray(loop(c, q))  # compile + warm
        best = None
        for trial in range(3):
            q2 = q + (trial + 1) * 0.01
            np.asarray(q2)
            t0 = time.time()
            np.asarray(loop(c, q2))
            dt = (time.time() - t0) / N
            best = dt if best is None else min(best, dt)
        return best

    dt_fused = bench(
        lambda c, x: K.attend_fused(spec, c, x, blocks_per_chunk=16), cache, q)
    dt_bf16 = bench(lambda c, x: L.raw_attend(spec, c, x), rc, q)

    # Sanity: fused output tracks the XLA reference on this cache.
    got = np.asarray(
        K.attend_fused(spec, cache, q, blocks_per_chunk=16), np.float32)
    want = np.asarray(C.attend(spec, cache, q), np.float32)
    rel = float(np.abs(got - want).mean() / np.abs(want).mean())
    assert np.isfinite(got).all() and rel < 0.05, f"kernel mismatch: {rel}"

    # Attention-path decode tokens/s for a 32-layer model equivalent.
    tok_s = 1.0 / (dt_fused * LAYERS)
    print(json.dumps({
        "metric": ("decode attention tok/s/chip (INT4+rank4 KV, 8k ctx, "
                   "llama2-7b shapes, 32-layer equivalent, pallas fused)"),
        "value": round(tok_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(dt_bf16 / dt_fused, 3),
        "us_per_step_fused": round(dt_fused * 1e6, 1),
        "us_per_step_bf16": round(dt_bf16 * 1e6, 1),
        "kv_mb_compressed": round(spec.bytes_compressed() / 1e6, 1),
        "kv_mb_bf16": round(spec.bytes_fp16_baseline() / 1e6, 1),
        "kv_compression": round(
            spec.bytes_fp16_baseline() / spec.bytes_compressed(), 2),
        "kernel_rel_err": round(rel, 4),
    }))


if __name__ == "__main__":
    main()
