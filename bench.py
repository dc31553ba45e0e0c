"""Headline benchmark: fused compressed-KV decode vs bf16 baseline (real TPU).

Measures the BASELINE.json north-star components on the real chip, in
priority order (the SIGALRM watchdog emits whatever is done if the tunneled
TPU wedges mid-run):

  1. HEADLINE — decode attention at 8k context, Llama-2-7B attention shapes
     (32 heads, head_dim 128), INT2 GEARL-KIVI: bit2 / group64 / rank2 /
     loop3, int8 low-rank bases, per-token V quant over the full head dim.
     This mirrors the reference's OWN speed protocol config ``gearlKIVI``
     (cuda_supported_gear/test.py:30-37) — its fused CUDA path never ran
     outliers (modeling_llamagear.py:458-466, slots always None), so GEARL
     is the apples-to-apples speed recipe. Baseline = uncompressed bf16 XLA
     attention.
  2. INT2 GEAR canonical ACCURACY config (+2% exact COO outliers,
     prefill_rank 4 — run_template_llama2-13b.sh:4): the full recipe in ONE
     Pallas pass, beyond the reference's fused path.
  3. A REAL 16-layer model decode loop (2048 hidden, MLP + scan + sampling
     path included) fused vs bf16 — tok/s from an actual forward pass.
  4. INT4 GEARL (round-1 continuity config).

Prints ONE JSON line; "value"/"vs_baseline" refer to metric 1.
"""
import json
import signal
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

HB = 4   # kernel heads_per_step (amortizes grid-step overhead; see kbench)
CB = 32  # blocks_per_chunk (2048-token chunks measured fastest at 8k ctx)

RESULT = {
    "metric": ("decode attention tok/s/chip (INT2 GEARL-KIVI, the reference "
               "speed-protocol config: rank2+int8 bases, 8k ctx, llama2-7b "
               "shapes, 32-layer equivalent, pallas fused)"),
    "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
}


def _watchdog(seconds: int = 530):
    """The tunneled TPU runtime can wedge (device ops hang indefinitely);
    emit what we have instead of hanging the driver."""
    def fire(signum, frame):
        RESULT["error"] = f"watchdog: TPU unresponsive after {seconds}s"
        print(json.dumps(RESULT))
        sys.stdout.flush()
        import os
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def bench_loop(f, c, q, n):
    """Time n calls of f(c, q) under one jit fori_loop.

    The remote runtime MEMOIZES pointer-identical executions and
    block_until_ready can return early — every iteration perturbs the
    input and the only reliable sync is a device->host fetch.
    """
    @jax.jit
    def loop(cache, q):
        def body(i, x):
            return f(cache, x + i * 1e-9).astype(q.dtype)
        return jax.lax.fori_loop(0, n, body, q)
    np.asarray(loop(c, q))  # compile + warm
    best = None
    for trial in range(3):
        q2 = q + (trial + 1) * 0.01
        np.asarray(q2)
        t0 = time.time()
        np.asarray(loop(c, q2))
        dt = (time.time() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


CTX, HEADS, HEAD_DIM, LAYERS, N = 8192, 32, 128, 32, 250


def make_specs():
    from gear_tpu import cache as C

    base = dict(batch=1, num_kv_heads=HEADS, head_dim=HEAD_DIM, max_len=CTX,
                group=64, lowrank_loop=3, dtype=jnp.bfloat16,
                sideband_dtype=jnp.bfloat16)
    # reference speed protocol (gearlKIVI, test.py:30-37) at int8 bases
    spec_gearl2 = C.CacheSpec(bits=2, rank=2, prefill_rank=2, base_bits=8,
                              v_group_size=128, **base)
    # reference canonical accuracy config (run_template_llama2-13b.sh:4)
    spec_gear2 = C.CacheSpec(bits=2, rank=2, prefill_rank=4, base_bits=8,
                             outliers_per_block=164, v_group_size=128, **base)
    # GEARL-KCVT (run_template_llama2-13b.sh:8): whole-span K scales ->
    # single flash-shaped score dot per prefill chunk (fastest config)
    spec_gearlkcvt2 = C.CacheSpec(bits=2, rank=2, prefill_rank=2,
                                  base_bits=8, v_group_size=128,
                                  kcvt_prefill=True, **base)
    spec_gearl4 = C.CacheSpec(bits=4, rank=4, prefill_rank=4, **base)
    return spec_gearl2, spec_gear2, spec_gearlkcvt2, spec_gearl4


def attention_config(name, spec, k, v, q, dt_bf16):
    from gear_tpu import cache as C
    from gear_tpu.kernels import decode as K

    cache = C.prefill(spec, k, v)
    np.asarray(cache.comp_len)
    dt = bench_loop(
        lambda c, x, s=spec: K.attend_fused(s, c, x, blocks_per_chunk=CB,
                                            heads_per_step=HB),
        cache, q, N)
    got = np.asarray(K.attend_fused(spec, cache, q, blocks_per_chunk=CB,
                                    heads_per_step=HB), np.float32)
    want = np.asarray(C.attend(spec, cache, q), np.float32)
    rel = float(np.abs(got - want).mean() / np.abs(want).mean())
    assert np.isfinite(got).all() and rel < 0.05, f"{name} mismatch {rel}"
    RESULT[f"us_per_step_{name}"] = round(dt * 1e6, 1)
    RESULT[f"kernel_rel_err_{name}"] = round(rel, 4)
    RESULT[f"kv_compression_{name}"] = round(
        spec.bytes_fp16_baseline() / spec.bytes_compressed(), 2)
    RESULT[f"tok_s_{name}"] = round(1.0 / (dt * LAYERS), 1)
    RESULT[f"vs_baseline_{name}"] = round(dt_bf16 / dt, 3)


def model_bench(rng):
    """Real forward-pass decode: 16 layers, MLP + scan + logits included,
    one residual-tier flush sampled inside the timed window."""
    from gear_tpu import cache as C
    from gear_tpu.models import llama as L

    cfg = L.ModelConfig(vocab_size=32000, hidden_size=2048,
                        intermediate_size=5632, num_layers=16,
                        num_heads=16, num_kv_heads=16, head_dim=128,
                        max_position_embeddings=8192)
    MCTX, PRE, MN = 8192, 8100, 40
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    spec = C.CacheSpec(batch=1, num_kv_heads=16, head_dim=128, max_len=MCTX,
                       bits=2, group=64, rank=2, prefill_rank=2,
                       lowrank_loop=3, base_bits=8,
                       v_group_size=128, dtype=jnp.bfloat16,
                       sideband_dtype=jnp.bfloat16)
    kv_shape = (1, 16, PRE, 128)
    k = jnp.asarray(rng.standard_normal(kv_shape).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.standard_normal(kv_shape).astype(np.float32) * 0.3)

    def run(compress, attn_impl):
        if compress:
            one = C.prefill(spec, k, v)
        else:
            one = L.raw_prefill(spec, k.astype(jnp.bfloat16),
                                v.astype(jnp.bfloat16))
        caches = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None],
                                       (cfg.num_layers,) + x.shape), one)

        @jax.jit
        def steps(params, caches, tok0):
            def body(carry, i):
                tok, caches = carry
                logits, caches = L.forward_decode(
                    params, cfg, tok, jnp.full((1,), PRE, jnp.int32) + i,
                    caches, spec=spec, compress=compress,
                    attn_impl=attn_impl)
                return (jnp.argmax(logits, -1).astype(jnp.int32), caches), 0
            (tok, caches), _ = jax.lax.scan(
                body, (tok0, caches), jnp.arange(MN, dtype=jnp.int32))
            return tok
        tok0 = jnp.zeros((1,), jnp.int32)
        np.asarray(steps(params, caches, tok0))  # compile + warm
        best = None
        for trial in range(2):
            t1 = jnp.full((1,), trial + 3, jnp.int32)
            np.asarray(t1)
            t0 = time.time()
            np.asarray(steps(params, caches, t1))
            dt = (time.time() - t0) / MN
            best = dt if best is None else min(best, dt)
        return best

    dt_fused = run(True, "pallas")
    dt_raw = run(False, "xla")
    return {
        "model_tok_s_fused": round(1.0 / dt_fused, 1),
        "model_tok_s_bf16": round(1.0 / dt_raw, 1),
        "model_vs_baseline": round(dt_raw / dt_fused, 3),
        "model_config": "16L x 2048h, 8k ctx, INT2 GEARL, B=1",
    }


def main():
    _watchdog()
    rng = np.random.default_rng(0)
    from gear_tpu import cache as C
    from gear_tpu.models import llama as L

    spec_gearl2, spec_gear2, spec_gearlkcvt2, spec_gearl4 = make_specs()
    shape = (1, HEADS, CTX, HEAD_DIM)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    q = jnp.asarray(
        rng.standard_normal((1, HEADS, 1, HEAD_DIM)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # bf16 baseline (uncompressed XLA attention)
    rc = L.raw_prefill(spec_gearl4, k.astype(jnp.bfloat16),
                       v.astype(jnp.bfloat16))
    np.asarray(rc.k[0, 0, 0, :1])
    dt_bf16 = bench_loop(lambda c, x: L.raw_attend(spec_gearl4, c, x),
                         rc, q, N)
    RESULT["us_per_step_bf16"] = round(dt_bf16 * 1e6, 1)
    del rc

    # 1. headline
    attention_config("int2_gearl", spec_gearl2, k, v, q, dt_bf16)
    RESULT["value"] = RESULT["tok_s_int2_gearl"]
    RESULT["vs_baseline"] = RESULT["vs_baseline_int2_gearl"]
    # 2. canonical accuracy config with outliers
    try:
        attention_config("int2_gear", spec_gear2, k, v, q, dt_bf16)
    except Exception as e:
        RESULT["int2_gear_error"] = repr(e)[:200]
    # 2b. GEARL-KCVT (fastest reference config)
    try:
        attention_config("int2_gearl_kcvt", spec_gearlkcvt2, k, v, q, dt_bf16)
    except Exception as e:
        RESULT["int2_gearl_kcvt_error"] = repr(e)[:200]
    # 3. INT4 continuity config (cheap — attention only)
    try:
        attention_config("int4_gearl", spec_gearl4, k, v, q, dt_bf16)
    except Exception as e:
        RESULT["int4_gearl_error"] = repr(e)[:200]
    # 4. full-model decode loop (heaviest remote compile — goes last so the
    # watchdog can only ever cost this one)
    try:
        RESULT.update(model_bench(rng))
    except Exception as e:  # model-level is additive; never lose the line
        RESULT["model_error"] = repr(e)[:200]
    print(json.dumps(RESULT))


if __name__ == "__main__":
    main()
