"""Headline benchmark: fused compressed-KV decode vs bf16 baseline (real TPU).

Measures the BASELINE.json north-star components on the real chip. Hardened
against the tunneled-TPU failure mode where a wedged device hangs every op
(including h2d) indefinitely:

  * a HEALTH PROBE (tiny matmul, short alarm) runs before anything else;
    if the device is wedged the script emits an error JSON and exits fast;
  * every stage runs under its OWN alarm sub-budget, and the cumulative
    RESULT line is printed+flushed after EVERY stage — the driver's record
    keeps whatever finished, no matter where a later stage dies;
  * the HEADLINE config runs FIRST (its us/step is meaningful alone); the
    bf16 baseline runs second and vs_baseline is backfilled;
  * on the first in-stage hang the script emits and exits: once one op
    wedges, every later op queues behind it (observed r2/r3), so burning
    the remaining budgets is pure loss.

Stage order (reference speed protocol: cuda_supported_gear/test.py:25-37,
95-102 — batch generate wall-clock on a fused INT2 gearlKIVI config):
  1. HEADLINE — decode attention at 8k context, Llama-2-7B attention shapes
     (32 heads, head_dim 128), INT2 GEARL-KIVI: bit2 / group64 / rank2 /
     loop3, int8 low-rank bases, per-token V quant over the full head dim.
     The reference's fused CUDA path never ran outliers
     (modeling_llamagear.py:458-466, slots always None), so GEARL is the
     apples-to-apples speed recipe. Baseline = uncompressed bf16 XLA attn.
  2. bf16 baseline -> vs_baseline backfill.
  3. INT2 GEAR canonical ACCURACY config (+2% exact COO outliers,
     prefill_rank 4 — run_template_llama2-13b.sh:4): the full recipe in ONE
     Pallas pass, beyond the reference's fused path.
  4. GEARL-KCVT (run_template_llama2-13b.sh:8) — fastest config.
  5. INT4 GEARL (round-1 continuity config).
  6. A REAL 16-layer model decode loop (MLP + scan + sampling included).

Prints cumulative JSON lines; the LAST line is the record.
"""
import json
import os
import signal
import sys
import time

import numpy as np

if os.environ.get("BENCH_CPU"):  # smoke-test mode (tests/test_bench_smoke.py)
    import jax
    jax.config.update("jax_platforms", "cpu")

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


_STAGE = {"name": "init", "budget": 0, "retry_left": 0}


def _on_alarm(signum, frame):
    # A Python exception raised here would stay pending while a hung device
    # call keeps blocking (handlers run, but the C call never returns), and
    # once one op wedges every later op queues behind it — so the only
    # useful move on timeout is: record, emit, exit. (Direct emit from the
    # handler is proven to work on this tunnel — r2/r3 watchdog lines.)
    name = _STAGE["name"]
    RESULT[f"{name}_error"] = f"timeout after {_STAGE['budget']}s"
    if _STAGE["retry_left"] > 0:
        RESULT["error"] = "device wedged at start (health probe hung)"
    else:
        RESULT["error"] = f"device hung in stage {name!r}"
    emit_and_exit()


signal.signal(signal.SIGALRM, _on_alarm)


def remaining():
    return GLOBAL_BUDGET - (time.time() - T0)


def run_stage(name, budget_s, fn):
    """Run fn under min(budget_s, remaining-global) seconds. On timeout the
    device is assumed wedged (all later ops would queue behind the hung
    one): the alarm handler emits what we have and exits. Python-level
    exceptions are recorded and the next stage still runs."""
    budget = int(min(budget_s, remaining()))
    if budget <= 5:
        RESULT.setdefault("error", "global budget exhausted before " + name)
        emit_and_exit()
    _STAGE.update(name=name, budget=budget)
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
        RESULT[f"s_{name}"] = round(time.time() - t0, 1)
        emit()


def health_probe():
    """Backend init + one tiny device round trip. ~5s healthy (+20-30s once
    for backend init); minutes-to-never when the tunnel is wedged."""
    import jax
    import jax.numpy as jnp
    x = jnp.full((128, 128), 1.0 + (time.time() % 7))  # defeat memoization
    y = np.asarray(x @ x)
    assert np.isfinite(y).all()


def bench_loop(f, c, q, n):
    """Time n calls of f(c, q) under one jit fori_loop.

    The remote runtime MEMOIZES pointer-identical executions and
    block_until_ready can return early — every iteration perturbs the
    input and the only reliable sync is a device->host fetch.
    """
    import jax
    import numpy as np

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


CTX = int(os.environ.get("BENCH_CTX", 8192))
HEADS = int(os.environ.get("BENCH_HEADS", 32))
HEAD_DIM, LAYERS = 128, 32
N = int(os.environ.get("BENCH_N", 250))


def make_spec(**kw):
    import jax.numpy as jnp
    from gear_tpu import cache as C
    base = dict(batch=1, num_kv_heads=HEADS, head_dim=HEAD_DIM, max_len=CTX,
                group=64, lowrank_loop=3, dtype=jnp.bfloat16,
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
    dt_bf16 = None

    @classmethod
    def init(cls):
        import jax
        import jax.numpy as jnp
        shape = (1, HEADS, CTX, HEAD_DIM)
        kk, kv, kq = jax.random.split(jax.random.PRNGKey(0), 3)
        cls.k = jax.random.normal(kk, shape, jnp.float32)
        cls.v = jax.random.normal(kv, shape, jnp.float32)
        cls.q = jax.random.normal(
            kq, (1, HEADS, 1, HEAD_DIM), jnp.float32).astype(jnp.bfloat16)
        np.asarray(cls.q)  # materialize before timing anything


def attention_config(name, spec):
    from gear_tpu import cache as C
    from gear_tpu.kernels import decode as K

    cache = C.prefill(spec, Ctx.k, Ctx.v)
    np.asarray(cache.comp_len)
    dt = bench_loop(
        lambda c, x, s=spec: K.attend_fused(s, c, x, blocks_per_chunk=CB,
                                            heads_per_step=HB,
                                            interpret=INTERPRET),
        cache, Ctx.q, N)
    got = np.asarray(K.attend_fused(spec, cache, Ctx.q, blocks_per_chunk=CB,
                                    heads_per_step=HB, interpret=INTERPRET),
                     np.float32)
    want = np.asarray(C.attend(spec, cache, Ctx.q), np.float32)
    rel = float(np.abs(got - want).mean() / np.abs(want).mean())
    assert np.isfinite(got).all() and rel < 0.05, f"{name} mismatch {rel}"
    RESULT[f"us_per_step_{name}"] = round(dt * 1e6, 1)
    RESULT[f"kernel_rel_err_{name}"] = round(rel, 4)
    RESULT[f"kv_compression_{name}"] = round(
        spec.bytes_fp16_baseline() / spec.bytes_compressed(), 2)
    RESULT[f"tok_s_{name}"] = round(1.0 / (dt * LAYERS), 1)
    if RESULT.get("us_per_step_bf16"):
        RESULT[f"vs_baseline_{name}"] = round(
            RESULT["us_per_step_bf16"] / RESULT[f"us_per_step_{name}"], 3)


def stage_headline():
    Ctx.init()
    spec = make_spec(bits=2, rank=2, prefill_rank=2, base_bits=8,
                     v_group_size=128)
    attention_config("int2_gearl", spec)
    RESULT["value"] = RESULT["tok_s_int2_gearl"]


def stage_bf16():
    from gear_tpu import cache as C
    from gear_tpu.models import llama as L
    import jax.numpy as jnp

    spec = make_spec(bits=4, rank=4, prefill_rank=4)
    rc = L.raw_prefill(spec, Ctx.k.astype(jnp.bfloat16),
                       Ctx.v.astype(jnp.bfloat16))
    np.asarray(rc.k[0, 0, 0, :1])
    dt = bench_loop(lambda c, x: L.raw_attend(spec, c, x), rc, Ctx.q, N)
    RESULT["us_per_step_bf16"] = round(dt * 1e6, 1)
    # backfill vs_baseline for stages that already ran
    for name in ("int2_gearl", "int2_gear", "int2_gearl_kcvt", "int4_gearl"):
        key = f"us_per_step_{name}"
        if key in RESULT:
            RESULT[f"vs_baseline_{name}"] = round(
                RESULT["us_per_step_bf16"] / RESULT[key], 3)
    if "vs_baseline_int2_gearl" in RESULT:
        RESULT["vs_baseline"] = RESULT["vs_baseline_int2_gearl"]


def stage_gear_outliers():
    spec = make_spec(bits=2, rank=2, prefill_rank=4, base_bits=8,
                     outliers_per_block=164, v_group_size=128)
    attention_config("int2_gear", spec)


def stage_kcvt():
    spec = make_spec(bits=2, rank=2, prefill_rank=2, base_bits=8,
                     v_group_size=128, kcvt_prefill=True)
    attention_config("int2_gearl_kcvt", spec)


def stage_int4():
    spec = make_spec(bits=4, rank=4, prefill_rank=4)
    attention_config("int4_gearl", spec)


def stage_model():
    """Real forward-pass decode: 16 layers, MLP + scan + logits included."""
    import jax
    import jax.numpy as jnp
    from gear_tpu import cache as C
    from gear_tpu.models import llama as L

    rng = np.random.default_rng(1)
    NL = int(os.environ.get("BENCH_MODEL_LAYERS", 16))
    MCTX = int(os.environ.get("BENCH_MODEL_CTX", 8192))
    cfg = L.ModelConfig(vocab_size=32000, hidden_size=2048,
                        intermediate_size=5632, num_layers=NL,
                        num_heads=16, num_kv_heads=16, head_dim=128,
                        max_position_embeddings=MCTX)
    PRE, MN = MCTX - 92, int(os.environ.get("BENCH_MODEL_STEPS", 40))
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    spec = C.CacheSpec(batch=1, num_kv_heads=16, head_dim=128, max_len=MCTX,
                       bits=2, group=64, rank=2, prefill_rank=2,
                       lowrank_loop=3, base_bits=8,
                       v_group_size=128, dtype=jnp.bfloat16,
                       sideband_dtype=jnp.bfloat16)
    kv_shape = (1, 16, PRE, 128)
    kk, kv = jax.random.split(jax.random.PRNGKey(7))
    k = jax.random.normal(kk, kv_shape, jnp.float32) * 0.3
    v = jax.random.normal(kv, kv_shape, jnp.float32) * 0.3

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

    dt_fused = run(True, "pallas_interpret" if INTERPRET else "pallas@4")
    RESULT["model_tok_s_fused"] = round(1.0 / dt_fused, 1)
    RESULT["model_config"] = "16L x 2048h, 8k ctx, INT2 GEARL, B=1"
    emit()
    dt_raw = run(False, "xla")
    RESULT["model_tok_s_bf16"] = round(1.0 / dt_raw, 1)
    RESULT["model_vs_baseline"] = round(dt_raw / dt_fused, 3)


def subprocess_health_loop(total_budget=390, probe_s=80, gap_s=75):
    """Probe device health in CLEAN SUBPROCESSES, retrying across the budget.

    The tunnel's wedge OSCILLATES (short healthy windows between long
    wedges, observed round 4) and a hung in-process probe poisons this
    process (the C call never returns; only os._exit escapes) — so each
    probe is a child process killed on timeout, and one bench invocation
    gets several shots at catching a healthy window. Returns True on the
    first healthy probe."""
    import subprocess
    t_end = time.time() + min(total_budget, remaining() - 120)
    attempt = 0
    while time.time() < t_end:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import numpy as np, jax.numpy as jnp;"
                 "import time;"
                 "x = jnp.full((128,128), 1.0 + (time.time() % 7));"
                 "print(float(np.asarray(x @ x).sum()))"],
                timeout=probe_s, capture_output=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            if r.returncode == 0:
                RESULT["health_attempts"] = attempt
                return True
        except subprocess.TimeoutExpired:
            pass
        RESULT["health_attempts"] = attempt
        if time.time() + gap_s + probe_s < t_end:
            time.sleep(gap_s)
        else:
            break
    return False


def main():
    # Health gate: label a start-of-run wedge distinctly so the record says
    # "never healthy" rather than "hung mid-benchmark".
    if os.environ.get("BENCH_CPU"):
        ok = run_stage("health", 120, health_probe)
    else:
        _STAGE.update(name="health", budget=0)
        ok = subprocess_health_loop()
    if not ok:
        RESULT["error"] = "device unhealthy at start (all probes hung)"
        emit_and_exit()
    _STAGE["retry_left"] = 0
    # Headline gets the big budget: after a tunnel-terminal restart the
    # server compile cache is COLD and the prefill pack kernel + decode
    # kernel Mosaic compiles alone take 2-6 min (observed round 4: a 240s
    # budget starved the stage right after a recovery). bf16 compiles are
    # cheap; later stages reuse the warmed kernels at different configs.
    run_stage("int2_gearl", 300, stage_headline)
    run_stage("bf16", 90, stage_bf16)
    run_stage("int2_gear", 170, stage_gear_outliers)
    run_stage("int2_gearl_kcvt", 70, stage_kcvt)
    run_stage("int4_gearl", 70, stage_int4)
    run_stage("model", remaining() - 10, stage_model)
    emit()


if __name__ == "__main__":
    main()
