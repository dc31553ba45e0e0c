"""Headline benchmark: fused compressed-KV decode vs bf16 baseline (real TPU).

Measures the BASELINE.json north-star components on the real chip. Hardened
against the tunneled-TPU failure mode where a wedged device hangs every op
(including h2d) indefinitely. Failure economics (VERDICT r4 task 1):

  * the CHEAP stages run FIRST: bf16 baseline (compiles in seconds) and an
    H=8 headline rung — so even a run that dies in a later cold Mosaic
    compile records a complete ratio;
  * every stage runs under its OWN alarm sub-budget, and the cumulative
    RESULT line is printed+flushed after EVERY stage AND at every phase
    transition (prefill / compile / timing) — a timeout record says
    WHERE it died ("phase": "int2_gearl:compile t=212s"), distinguishing
    a slow compile from a wedge;
  * the JAX persistent compilation cache is enabled (repo-local .jax_cache)
    so a bench run after an in-session warm run hits warm compiles;
  * on the first in-stage hang the script emits and exits: once one op
    wedges, every later op queues behind it (observed r2/r3), so burning
    the remaining budgets is pure loss;
  * health probes are GRACEFUL children (internal alarm, os._exit before
    the parent would SIGKILL them) spaced ~200s apart — a SIGKILLed TPU
    client can itself re-wedge the device (ADVICE r4).

Stage order (reference speed protocol: cuda_supported_gear/test.py:25-37,
95-102 — batch generate wall-clock on a fused INT2 gearlKIVI config):
  1. bf16 baseline, H=8 rung -> us_per_step_bf16_h8 (seconds-cheap).
  2. HEADLINE H=8 rung — INT2 GEARL-KIVI (bit2/group64/rank2/loop3, int8
     bases, per-token V over the full head dim): vs_baseline_int2_gearl_h8.
     The reference's fused CUDA path never ran outliers
     (modeling_llamagear.py:458-466, slots always None), so GEARL is the
     apples-to-apples speed recipe. Baseline = uncompressed bf16 XLA attn.
  3. bf16 at H=32 (llama-2-7b attention shapes) -> us_per_step_bf16.
  4. HEADLINE at H=32 -> value + vs_baseline (falls back to the H=8 rung
     if this stage dies).
  5. Model E2E: 8-layer decode loop (MLP + scan + sampling included),
     B=1 @ 8k ctx, then the reference-protocol batch-8 variant
     (batch 8, 1k-token prefill, test.py:25-37).
  6. INT2 GEAR canonical ACCURACY config at H=32 (+2% exact COO outliers,
     prefill_rank 4 — run_template_llama2-13b.sh:4): the full recipe in ONE
     Pallas pass, beyond the reference's fused path.
  7. GEARL-KCVT (run_template_llama2-13b.sh:8), INT4 GEARL, paged-pool
     kernel (vs dense) with whatever budget remains.

Every attention stage also emits its roofline: sol_us (speed-of-light at
v5e HBM bandwidth), pct_sol, and effective gbps (BASELINE.md kernel
efficiency row; gear_tpu/profiling.py).

Prints cumulative JSON lines; the LAST line is the record.
"""
import json
import os
import signal
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

if os.environ.get("BENCH_CPU"):  # smoke-test mode (tests/test_bench_smoke.py)
    import jax
    jax.config.update("jax_platforms", "cpu")

if not os.environ.get("BENCH_NO_JAX_CACHE") and not os.environ.get("BENCH_CPU"):
    # Persistent compile cache: survives process restarts client-side. On
    # the axon tunnel executable serialization may be unsupported — failures
    # are warnings, never fatal.
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

INTERPRET = bool(os.environ.get("BENCH_CPU"))  # Pallas interpret on CPU
HB = 4   # kernel heads_per_step (amortizes grid-step overhead; see kbench)
CB = 32  # blocks_per_chunk (2048-token chunks measured fastest at 8k ctx)

T0 = time.time()
GLOBAL_BUDGET = 545  # driver gives ~590s

RESULT = {
    "metric": ("decode attention tok/s/chip (INT2 GEARL-KIVI, the reference "
               "speed-protocol config: rank2+int8 bases, 8k ctx, llama2-7b "
               "shapes, 32-layer equivalent, pallas fused)"),
    "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
}


def emit():
    print(json.dumps(RESULT))
    sys.stdout.flush()


def emit_and_exit(code=0):
    emit()
    import os
    os._exit(code)


_STAGE = {"name": "init", "budget": 0}


def heartbeat(phase):
    """Record + emit where the current stage is, so a timeout record
    distinguishes 'compiling at t=212s' from 'wedged at h2d'."""
    RESULT["phase"] = f"{_STAGE['name']}:{phase} t={int(time.time() - T0)}s"
    emit()


def _on_alarm(signum, frame):
    # A Python exception raised here would stay pending while a hung device
    # call keeps blocking (handlers run, but the C call never returns), and
    # once one op wedges every later op queues behind it — so the only
    # useful move on timeout is: record, emit, exit. (Direct emit from the
    # handler is proven to work on this tunnel — r2/r3 watchdog lines.)
    name = _STAGE["name"]
    RESULT[f"{name}_error"] = f"timeout after {_STAGE['budget']}s"
    RESULT["error"] = f"device hung or still busy in stage {name!r}"
    emit_and_exit()


signal.signal(signal.SIGALRM, _on_alarm)


def remaining():
    return GLOBAL_BUDGET - (time.time() - T0)


def run_stage(name, budget_s, fn, min_s=45):
    """Run fn under min(budget_s, remaining-global) seconds. On timeout the
    device is assumed wedged (all later ops would queue behind the hung
    one): the alarm handler emits what we have and exits. Python-level
    exceptions are recorded and the next stage still runs.

    If the remaining global budget cannot fit even ``min_s`` of the stage,
    exit CLEANLY between stages instead of starting it — an alarm exit
    mid-device-op is a killed client and can re-wedge the device for the
    NEXT run (observed r5 attempt 3), a clean exit cannot."""
    budget = int(min(budget_s, remaining()))
    if budget <= min_s:
        RESULT.setdefault("note", "global budget exhausted before " + name)
        emit_and_exit()
    _STAGE.update(name=name, budget=budget)
    heartbeat("init")
    signal.alarm(budget)
    t0 = time.time()
    try:
        fn()
        return True
    except Exception as e:  # noqa: BLE001 — never lose the line
        RESULT[f"{name}_error"] = repr(e)[:200]
        return False
    finally:
        signal.alarm(0)
        RESULT.pop("phase", None)
        RESULT[f"s_{name}"] = round(time.time() - t0, 1)
        emit()


def health_probe():
    """Backend init + one tiny device round trip. ~5s healthy (+20-30s once
    for backend init); minutes-to-never when the tunnel is wedged."""
    import jax  # noqa: F401
    import jax.numpy as jnp
    x = jnp.full((128, 128), 1.0 + (time.time() % 7))  # defeat memoization
    y = np.asarray(x @ x)
    assert np.isfinite(y).all()


def bench_loop(f, c, q, n, on_compiled=None):
    """Time n calls of f(c, q) under one jit fori_loop.

    The remote runtime MEMOIZES pointer-identical executions and
    block_until_ready can return early — every iteration perturbs the
    input and the only reliable sync is a device->host fetch.
    """
    import jax

    @jax.jit
    def loop(cache, q):
        def body(i, x):
            return f(cache, x + i * 1e-9).astype(q.dtype)
        return jax.lax.fori_loop(0, n, body, q)
    np.asarray(loop(c, q))  # compile + warm
    if on_compiled:
        on_compiled()
    best = None
    for trial in range(3):
        q2 = q + (trial + 1) * 0.01
        np.asarray(q2)
        t0 = time.time()
        np.asarray(loop(c, q2))
        dt = (time.time() - t0) / n
        best = dt if best is None else min(best, dt)
    return best


CTX = int(os.environ.get("BENCH_CTX", 8192))
HEADS = int(os.environ.get("BENCH_HEADS", 32))
H8 = min(8, HEADS)  # first-rung head count (small compile, in-run anchor)
HEAD_DIM, LAYERS = 128, 32
N = int(os.environ.get("BENCH_N", 250))


def make_spec(heads=None, **kw):
    import jax.numpy as jnp
    from gear_tpu import cache as C
    base = dict(batch=1, num_kv_heads=heads or HEADS, head_dim=HEAD_DIM,
                max_len=CTX, group=64, lowrank_loop=3, dtype=jnp.bfloat16,
                sideband_dtype=jnp.bfloat16)
    base.update(kw)
    return C.CacheSpec(**base)


class Ctx:
    """Shared device tensors, built lazily inside the first stage.

    Generated ON DEVICE (jax.random) — an h2d of the 67 MB numpy arrays
    costs 200+ seconds over the tunnel (~0.3 MB/s effective; round-4
    finding: the headline stage was h2d-dominated, not compile-dominated).
    """
    k = v = q = None

    @classmethod
    def init(cls):
        import jax
        import jax.numpy as jnp
        if cls.k is not None:
            return
        shape = (1, HEADS, CTX, HEAD_DIM)
        kk, kv, kq = jax.random.split(jax.random.PRNGKey(0), 3)
        cls.k = jax.random.normal(kk, shape, jnp.float32)
        cls.v = jax.random.normal(kv, shape, jnp.float32)
        cls.q = jax.random.normal(
            kq, (1, HEADS, 1, HEAD_DIM), jnp.float32).astype(jnp.bfloat16)
        np.asarray(cls.q)  # materialize before timing anything

    @classmethod
    def at_heads(cls, h):
        cls.init()
        if h == HEADS:
            return cls.k, cls.v, cls.q
        return cls.k[:, :h], cls.v[:, :h], cls.q[:, :h]


def _suffix(heads):
    return "" if heads == HEADS else f"_h{heads}"


def _roofline_keys(name, spec, dt, q_heads, compressed=True):
    from gear_tpu import profiling as P
    roof = (P.decode_attention_roofline(spec, 1, q_heads)
            if compressed else
            P.raw_decode_attention_roofline(spec, 1, q_heads))
    RESULT[f"sol_us_{name}"] = round(roof.sol_time_s * 1e6, 1)
    RESULT[f"pct_sol_{name}"] = round(100 * roof.efficiency(dt), 1)
    RESULT[f"gbps_{name}"] = round(roof.bytes_accessed / dt / 1e9, 1)


def attention_config(name, spec, heads):
    from gear_tpu import cache as C
    from gear_tpu.kernels import decode as K

    k, v, q = Ctx.at_heads(heads)
    heartbeat("prefill")
    cache = C.prefill(spec, k, v)
    np.asarray(cache.comp_len)
    heartbeat("compile")
    dt = bench_loop(
        lambda c, x, s=spec: K.attend_fused(s, c, x, blocks_per_chunk=CB,
                                            heads_per_step=HB,
                                            interpret=INTERPRET),
        cache, q, N, on_compiled=lambda: heartbeat("timing"))
    RESULT[f"us_per_step_{name}"] = round(dt * 1e6, 1)
    emit()  # timing is on the record before the (compile-heavy) check
    # Correctness check: the XLA C.attend reference is its own multi-minute
    # cold compile at H=32 — run it only with budget left (the H=8 rung
    # always checks: same kernel math, cheap reference compile).
    if INTERPRET or remaining() > 100 or heads <= 8:
        heartbeat("check")
        got = np.asarray(K.attend_fused(spec, cache, q, blocks_per_chunk=CB,
                                        heads_per_step=HB,
                                        interpret=INTERPRET), np.float32)
        want = np.asarray(C.attend(spec, cache, q), np.float32)
        rel = float(np.abs(got - want).mean() / np.abs(want).mean())
        assert np.isfinite(got).all() and rel < 0.05, f"{name} mismatch {rel}"
        RESULT[f"kernel_rel_err_{name}"] = round(rel, 4)
    else:
        RESULT[f"check_skipped_{name}"] = True
    RESULT[f"kv_compression_{name}"] = round(
        spec.bytes_fp16_baseline() / spec.bytes_compressed(), 2)
    RESULT[f"tok_s_{name}"] = round(1.0 / (dt * LAYERS), 1)
    _roofline_keys(name, spec, dt, heads)
    base_key = f"us_per_step_bf16{_suffix(heads)}"
    if RESULT.get(base_key):
        RESULT[f"vs_baseline_{name}"] = round(
            RESULT[base_key] / RESULT[f"us_per_step_{name}"], 3)
    _update_headline()


def _update_headline():
    """value/vs_baseline from the best rung available (H=32 preferred)."""
    for suf in ("", f"_h{H8}"):
        ts = RESULT.get(f"tok_s_int2_gearl{suf}")
        vb = RESULT.get(f"vs_baseline_int2_gearl{suf}")
        if ts:
            RESULT["value"] = ts
            if vb:
                RESULT["vs_baseline"] = vb
            RESULT["headline_rung"] = f"int2_gearl{suf}"
            return


def stage_bf16(heads):
    from gear_tpu.models import llama as L
    import jax.numpy as jnp

    k, v, q = Ctx.at_heads(heads)
    spec = make_spec(heads=heads, bits=4, rank=4, prefill_rank=4)
    heartbeat("prefill")
    rc = L.raw_prefill(spec, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    np.asarray(rc.k[0, 0, 0, :1])
    heartbeat("compile")
    dt = bench_loop(lambda c, x: L.raw_attend(spec, c, x), rc, q, N,
                    on_compiled=lambda: heartbeat("timing"))
    name = f"bf16{_suffix(heads)}"
    RESULT[f"us_per_step_{name}"] = round(dt * 1e6, 1)
    _roofline_keys(name, spec, dt, heads, compressed=False)
    # backfill vs_baseline for same-rung stages that already ran
    for cfg in ("int2_gearl", "int2_gear", "int2_gear_o128",
                "int2_gearl_kcvt", "int4_gearl"):
        key = f"us_per_step_{cfg}{_suffix(heads)}"
        if key in RESULT:
            RESULT[f"vs_baseline_{cfg}{_suffix(heads)}"] = round(
                RESULT[f"us_per_step_{name}"] / RESULT[key], 3)
    _update_headline()


def stage_headline(heads):
    spec = make_spec(heads=heads, bits=2, rank=2, prefill_rank=2,
                     base_bits=8, v_group_size=128)
    attention_config(f"int2_gearl{_suffix(heads)}", spec, heads)


def stage_gear_outliers(heads):
    spec = make_spec(heads=heads, bits=2, rank=2, prefill_rank=4,
                     base_bits=8, outliers_per_block=164, v_group_size=128)
    attention_config(f"int2_gear{_suffix(heads)}", spec, heads)


def stage_gear_o128(heads):
    """GEAR with 128 outliers/block (1.56% vs the canonical 2%): KO fits
    one 128-lane window per tensor, halving the K gather/scatter and V
    boundary work — measured >=1.1x vs bf16 at H=32 where the canonical
    164 (padded to 256) sits just under parity (kbench r5)."""
    spec = make_spec(heads=heads, bits=2, rank=2, prefill_rank=4,
                     base_bits=8, outliers_per_block=128, v_group_size=128)
    attention_config(f"int2_gear_o128{_suffix(heads)}", spec, heads)


def stage_kcvt(heads):
    spec = make_spec(heads=heads, bits=2, rank=2, prefill_rank=2,
                     base_bits=8, v_group_size=128, kcvt_prefill=True)
    attention_config(f"int2_gearl_kcvt{_suffix(heads)}", spec, heads)


def stage_int4(heads):
    spec = make_spec(heads=heads, bits=4, rank=4, prefill_rank=4)
    attention_config(f"int4_gearl{_suffix(heads)}", spec, heads)


def stage_paged(heads):
    """Paged-pool kernel at the headline config/shapes vs the dense kernel
    (VERDICT r4 task 5: the paged path had zero hardware numbers)."""
    from gear_tpu import paged as PG
    from gear_tpu.kernels import decode as K

    k, v, q = Ctx.at_heads(heads)
    spec = make_spec(heads=heads, bits=2, rank=2, prefill_rank=2,
                     base_bits=8, v_group_size=128)
    pb = min(int(os.environ.get("BENCH_PAGED_PB", 16)), spec.n_blocks)
    pspec = PG.PagedSpec(spec=spec, n_pages=spec.n_blocks // pb,
                         page_blocks=pb)
    heartbeat("prefill")
    pool = PG.init_pool(pspec)
    seqs = PG.init_seqs(pspec, batch=1)
    al = PG.PageAllocator(pspec.n_pages)
    ids = [al.alloc() for _ in range(pspec.max_pages_per_seq)]
    pool, seqs = PG.prefill_paged(pspec, pool, seqs, 0, ids, k, v)
    np.asarray(seqs.comp_len)
    heartbeat("compile")
    dt = bench_loop(
        lambda st, x: K.attend_paged(pspec, st[0], st[1], x,
                                     heads_per_step=HB,
                                     interpret=INTERPRET),
        (pool, seqs), q, N, on_compiled=lambda: heartbeat("timing"))
    name = f"paged_int2_gearl{_suffix(heads)}"
    RESULT[f"us_per_step_{name}"] = round(dt * 1e6, 1)
    _roofline_keys(name, spec, dt, heads)
    dense = RESULT.get(f"us_per_step_int2_gearl{_suffix(heads)}")
    if dense:
        RESULT["paged_vs_dense"] = round(dense / (dt * 1e6), 3)


def stage_model(hidden=2048, inter=5632, heads=16, kv_heads=16,
                layers_env="BENCH_MODEL_LAYERS", tag="model"):
    """Real forward-pass decode: MLP + scan + logits included. B=1 @ 8k
    ctx, then the reference speed protocol's batch-8 variant (1k-token
    prefill, cuda_supported_gear/test.py:25-37)."""
    import jax
    import jax.numpy as jnp
    from gear_tpu import cache as C
    from gear_tpu.models import llama as L

    NL = int(os.environ.get(layers_env, 8))
    MCTX = int(os.environ.get("BENCH_MODEL_CTX", 8192))
    cfg = L.ModelConfig(vocab_size=32000, hidden_size=hidden,
                        intermediate_size=inter, num_layers=NL,
                        num_heads=heads, num_kv_heads=kv_heads, head_dim=128,
                        max_position_embeddings=max(MCTX, 2048))
    MN = int(os.environ.get("BENCH_MODEL_STEPS", 40))
    params = L.init_params(jax.random.PRNGKey(0), cfg)

    def run(compress, attn_impl, batch, mctx, label):
        pre = mctx - 92
        spec = C.CacheSpec(batch=batch, num_kv_heads=kv_heads, head_dim=128,
                           max_len=mctx, bits=2, group=64, rank=2,
                           prefill_rank=2, lowrank_loop=3, base_bits=8,
                           v_group_size=128, dtype=jnp.bfloat16,
                           sideband_dtype=jnp.bfloat16)
        kv_shape = (batch, kv_heads, pre, 128)
        kk, kv = jax.random.split(jax.random.PRNGKey(7))
        k = jax.random.normal(kk, kv_shape, jnp.float32) * 0.3
        v = jax.random.normal(kv, kv_shape, jnp.float32) * 0.3
        heartbeat(f"{label}:prefill")
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
                    params, cfg, tok, jnp.full((batch,), pre, jnp.int32) + i,
                    caches, spec=spec, compress=compress,
                    attn_impl=attn_impl,
                    append_kv=not os.environ.get("BENCH_MODEL_NO_APPEND"))
                return (jnp.argmax(logits, -1).astype(jnp.int32), caches), 0
            (tok, caches), _ = jax.lax.scan(
                body, (tok0, caches), jnp.arange(MN, dtype=jnp.int32))
            return tok
        tok0 = jnp.zeros((batch,), jnp.int32)
        heartbeat(f"{label}:compile")
        np.asarray(steps(params, caches, tok0))  # compile + warm
        heartbeat(f"{label}:timing")
        best = None
        for trial in range(2):
            t1 = jnp.full((batch,), trial + 3, jnp.int32)
            np.asarray(t1)
            t0 = time.time()
            np.asarray(steps(params, caches, t1))
            dt = (time.time() - t0) / MN
            best = dt if best is None else min(best, dt)
        return best

    fused_impl = os.environ.get(
        "BENCH_MODEL_FUSED_IMPL",
        "pallas_interpret" if INTERPRET else "pallas@4")
    dt_fused = run(True, fused_impl, 1, MCTX, "b1")
    RESULT[f"{tag}_tok_s_fused"] = round(1.0 / dt_fused, 1)
    RESULT[f"{tag}_config"] = (
        f"{NL}L x {hidden}h x {heads}q/{kv_heads}kv, {MCTX} ctx, "
        "INT2 GEARL, B=1")
    emit()
    dt_raw = run(False, "xla", 1, MCTX, "b1_bf16")
    RESULT[f"{tag}_tok_s_bf16"] = round(1.0 / dt_raw, 1)
    RESULT[f"{tag}_vs_baseline"] = round(dt_raw / dt_fused, 3)


def stage_model_7b():
    """Llama-2-7B layer shapes (hidden 4096, 32 heads of 128): the
    attention-dominated regime the north-star targets — 8 such layers at
    8k ctx, B=1 (full 32-layer 7B exceeds one v5e's HBM with f32 init)."""
    stage_model(hidden=4096, inter=11008, heads=32, kv_heads=32,
                layers_env="BENCH_MODEL7B_LAYERS", tag="model7b")


def stage_model_b8():
    """Reference protocol mirror: batch 8, ~1k prefill (test.py:25-37)."""
    import jax
    import jax.numpy as jnp
    from gear_tpu import cache as C
    from gear_tpu.models import llama as L

    NL = int(os.environ.get("BENCH_MODEL_LAYERS", 8))
    B8CTX = int(os.environ.get("BENCH_MODEL_B8_CTX", 1536))
    cfg = L.ModelConfig(vocab_size=32000, hidden_size=2048,
                        intermediate_size=5632, num_layers=NL,
                        num_heads=16, num_kv_heads=16, head_dim=128,
                        max_position_embeddings=max(B8CTX, 2048))
    MN = int(os.environ.get("BENCH_MODEL_STEPS", 40))
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    pre = B8CTX - 92

    def run(compress, attn_impl, label):
        spec = C.CacheSpec(batch=8, num_kv_heads=16, head_dim=128,
                           max_len=B8CTX, bits=2, group=64, rank=2,
                           prefill_rank=2, lowrank_loop=3, base_bits=8,
                           v_group_size=128, dtype=jnp.bfloat16,
                           sideband_dtype=jnp.bfloat16)
        kv_shape = (8, 16, pre, 128)
        kk, kv = jax.random.split(jax.random.PRNGKey(9))
        k = jax.random.normal(kk, kv_shape, jnp.float32) * 0.3
        v = jax.random.normal(kv, kv_shape, jnp.float32) * 0.3
        heartbeat(f"{label}:prefill")
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
                    params, cfg, tok, jnp.full((8,), pre, jnp.int32) + i,
                    caches, spec=spec, compress=compress,
                    attn_impl=attn_impl)
                return (jnp.argmax(logits, -1).astype(jnp.int32), caches), 0
            (tok, caches), _ = jax.lax.scan(
                body, (tok0, caches), jnp.arange(MN, dtype=jnp.int32))
            return tok
        tok0 = jnp.zeros((8,), jnp.int32)
        heartbeat(f"{label}:compile")
        np.asarray(steps(params, caches, tok0))
        heartbeat(f"{label}:timing")
        best = None
        for trial in range(2):
            t1 = jnp.full((8,), trial + 3, jnp.int32)
            np.asarray(t1)
            t0 = time.time()
            np.asarray(steps(params, caches, t1))
            dt = (time.time() - t0) / MN
            best = dt if best is None else min(best, dt)
        return best

    fused_impl = "pallas_interpret" if INTERPRET else "pallas@4"
    dt_fused = run(True, fused_impl, "b8")
    # sequences/s across the batch (the reference reports batch wall-clock)
    RESULT["model_b8_tok_s_fused"] = round(8.0 / dt_fused, 1)
    RESULT["model_b8_config"] = f"{NL}L x 2048h, B=8, {pre} prefill"
    # The reference's batch-8 protocol reports peak memory alongside
    # wall-clock (test.py:99): at short ctx the compressed path's win is
    # KV footprint (larger feasible batch), not per-step latency.
    spec_mem = C.CacheSpec(batch=8, num_kv_heads=16, head_dim=128,
                           max_len=B8CTX, bits=2, group=64, rank=2,
                           prefill_rank=2, lowrank_loop=3, base_bits=8,
                           v_group_size=128, dtype=jnp.bfloat16,
                           sideband_dtype=jnp.bfloat16)
    RESULT["model_b8_kv_mb_fused"] = round(
        NL * spec_mem.bytes_compressed() / 1e6, 1)
    RESULT["model_b8_kv_mb_bf16"] = round(
        NL * spec_mem.bytes_fp16_baseline() / 1e6, 1)
    emit()
    dt_raw = run(False, "xla", "b8_bf16")
    RESULT["model_b8_tok_s_bf16"] = round(8.0 / dt_raw, 1)
    RESULT["model_b8_vs_baseline"] = round(dt_raw / dt_fused, 3)


def graceful_probe_child(timeout_s):
    """One health probe in a child that exits GRACEFULLY on its own alarm
    (an externally SIGKILLed TPU client can re-wedge the device — ADVICE
    r4). The parent timeout is a backstop 10s later."""
    import subprocess
    code = (
        "import os, signal, time\n"
        f"signal.signal(signal.SIGALRM, lambda *a: os._exit(3))\n"
        f"signal.alarm({timeout_s})\n"
        "import numpy as np, jax.numpy as jnp\n"
        "x = jnp.full((128,128), 1.0 + (time.time() % 7))\n"
        "print(float(np.asarray(x @ x).sum()))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s + 10, capture_output=True,
                           cwd=REPO)
        return r.returncode == 0
    except Exception:
        return False


def health_gate():
    """Two graceful probes, ~200s apart (wedges oscillate; a probe storm
    prolongs them). Returns True on the first healthy probe."""
    _STAGE.update(name="health", budget=0)
    t0 = time.time()
    if graceful_probe_child(90):
        RESULT["health_attempts"] = 1
        RESULT["s_health"] = round(time.time() - t0, 1)
        return True
    wake = T0 + 280
    if wake - time.time() > 0 and remaining() > 200:
        time.sleep(wake - time.time())
    ok = graceful_probe_child(90)
    RESULT["health_attempts"] = 2
    RESULT["s_health"] = round(time.time() - t0, 1)
    return ok


def main():
    if os.environ.get("BENCH_CPU"):
        ok = run_stage("health", 120, health_probe)
    else:
        ok = health_gate()
        emit()
    if not ok:
        RESULT["error"] = "device unhealthy at start (all probes hung)"
        emit_and_exit()
    # Cheap-first stage order: a complete H=8 ratio lands within ~2 min
    # warm / ~6 min cold; H=32 and the model stages upgrade the record
    # with whatever budget remains. run_stage clamps to remaining().
    # BENCH_ONLY=name1,name2 runs a subset (in-session compile warming of
    # one expensive stage under a dedicated budget).
    stages = [
        (f"bf16{_suffix(H8)}", 70, lambda: stage_bf16(H8)),
        (f"int2_gearl{_suffix(H8)}", 230, lambda: stage_headline(H8)),
    ]
    if H8 != HEADS:
        stages += [
            ("bf16", 60, lambda: stage_bf16(HEADS)),
            ("int2_gearl", 140, lambda: stage_headline(HEADS)),
        ]
    stages += [
        ("model", 130, stage_model),
    ]
    if not INTERPRET:  # 4096-hidden interpret run would dwarf the smoke
        stages += [("model_7b", 110, stage_model_7b)]
    stages += [
        # interpret-mode smoke runs share CPUs with xdist workers — the
        # B=8 interpret stage needs contention headroom (observed flake)
        ("model_b8", 170 if INTERPRET else 80, stage_model_b8),
        ("int2_gear", 130, lambda: stage_gear_outliers(HEADS)),
        ("int2_gear_o128", 80, lambda: stage_gear_o128(HEADS)),
        ("int2_gearl_kcvt", 60, lambda: stage_kcvt(HEADS)),
        ("int4_gearl", 60, lambda: stage_int4(HEADS)),
        ("paged", 70, lambda: stage_paged(HEADS)),
    ]
    only = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}
    for name, budget, fn in stages:
        if only and name not in only:
            continue
        run_stage(name, max(budget, remaining() - 15) if only else budget,
                  fn)
    emit()


if __name__ == "__main__":
    main()
