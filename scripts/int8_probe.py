"""Probe: does the v5e MXU stream int8 weights at 2x the bf16 rate, and can
Pallas/Mosaic express int8 x int8 -> int32 dots?

Motivation (round-2 kernel design): decode attention at B=1/GQ<=8 is bound
by the MXU weight port (~128 weight ELEMENTS/cycle for bf16 — measured in
scripts/gemv_probe.py), so the fused compressed kernel can only beat the
bf16 flash baseline by lowering MXU *element* traffic. v5e peak int8 TOPS is
2x its bf16 TFLOPS, so int8 weights may stream at 256/cycle. If so, keeping
the unpacked KV codes as int8 (they already materialize as int8 via the
byte-strided bitcast) and quantizing q / attention-weights to int8 halves
the dominant cost.

Run on the real chip: timeout 570 python scripts/int8_probe.py
"""
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def watchdog(seconds):
    def fire(signum, frame):
        print(f"WATCHDOG: TPU unresponsive after {seconds}s", flush=True)
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


H, M, D, T = 32, 8, 128, 8192   # batched decode-gemv shape
N = 100


def bench(name, fn, *args):
    @jax.jit
    def loop(*a):
        # N dependent iterations, varying the activation each time (the
        # remote runtime memoizes pointer-identical executions).
        acc = fn(a[0], *a[1:]).astype(jnp.float32)

        def body(i, carry):
            acc, x = carry
            x = x + jnp.ones((), x.dtype)
            out = fn(x, *a[1:])
            return (acc + out.astype(acc.dtype), x)

        acc, _ = jax.lax.fori_loop(0, N, body, (acc, a[0]))
        return acc
    t0 = time.time()
    np.asarray(loop(*args))
    print(f"{name}: compiled in {time.time()-t0:.1f}s", flush=True)
    best = None
    for trial in range(3):
        a0 = args[0] + (trial + 1)
        np.asarray(a0)
        t0 = time.time()
        np.asarray(loop(a0, *args[1:]))
        dt = (time.time() - t0) / N
        best = dt if best is None else min(best, dt)
    welts = H * D * T
    rate = welts / best / 1e9
    print(f"{name}: {best*1e6:.1f} us/iter  ({rate:.0f} Gelem/s weight stream)",
          flush=True)
    return best


def main():
    watchdog(560)
    rng = np.random.default_rng(0)
    # health probe
    t0 = time.time()
    np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    print(f"health: ok in {time.time()-t0:.1f}s", flush=True)

    qf = jnp.asarray(rng.standard_normal((H, M, D)).astype(np.float32))
    kbf = jnp.asarray(rng.standard_normal((H, D, T)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    k8 = jnp.asarray(rng.integers(-127, 127, (H, D, T)).astype(np.int8))
    q8 = jnp.asarray(rng.integers(-127, 127, (H, M, D)).astype(np.int8))

    which = sys.argv[1:] or ["xla_bf16", "xla_int8", "pl_bf16", "pl_int8"]

    if "xla_bf16" in which:
        bench("xla bf16xbf16",
              lambda q, k: jax.lax.dot_general(
                  q.astype(jnp.bfloat16), k,
                  (((2,), (1,)), ((0,), (0,))),
                  preferred_element_type=jnp.float32), qf, kbf)
    if "xla_int8" in which:
        bench("xla int8xint8",
              lambda q, k: jax.lax.dot_general(
                  q, k, (((2,), (1,)), ((0,), (0,))),
                  preferred_element_type=jnp.int32), q8, k8)

    # Pallas versions: grid over heads, one dot per step.
    def mk_pallas(act_dt, out_dt):
        def kern(q_ref, k_ref, o_ref):
            o_ref[0] = jax.lax.dot_general(
                q_ref[0], k_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=out_dt)

        @jax.jit
        def run(q, k):
            return pl.pallas_call(
                kern,
                grid=(H,),
                in_specs=[
                    pl.BlockSpec((1, M, D), lambda i: (i, 0, 0)),
                    pl.BlockSpec((1, D, T), lambda i: (i, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, M, T), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((H, M, T), out_dt),
            )(q, k)
        return run

    if "pl_bf16" in which:
        runp = mk_pallas(jnp.bfloat16, jnp.float32)
        bench("pallas bf16", lambda q, k: runp(q.astype(jnp.bfloat16), k),
              qf, kbf)
    if "pl_int8" in which:
        runp8 = mk_pallas(jnp.int8, jnp.int32)
        try:
            bench("pallas int8", runp8, q8, k8)
        except Exception as e:
            print(f"pallas int8 FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
