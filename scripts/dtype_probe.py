"""Probe sub-byte dtype support in Pallas/Mosaic on this chip.

  i4cast   int4 input block -> astype(bf16) -> dot   (native unpack?)
  i4dot    dot_general(bf16 q, int4 k) directly (mixed dtype)
  i8cast   int8 input -> astype(bf16) -> dot         (latency-mode storage)
  manual   int32 packed -> shift/mask unpack -> dot  (current kernel path)

Prints correctness (vs numpy) + us/sweep over [H=8, T=8192, D=128].
"""
import os
import signal
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, T, D, CHUNK = 8, 8192, 128, 1024
N_ITER = 300


def watchdog(seconds):
    def fire(signum, frame):
        print(f"WATCHDOG fired after {seconds}s", flush=True)
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def _dot(a, b):
    return jax.lax.dot_general(a, b, ((((1,), (0,))), ((), ())),
                               preferred_element_type=jnp.float32)


def _unpack(words, bits=4):
    fpi = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    w = words.astype(jnp.uint32)
    parts = [((w >> jnp.uint32(j * bits)) & mask).astype(jnp.int32)
             for j in range(fpi)]
    return jnp.concatenate(parts, axis=0)


def make(mode):
    nc = T // CHUNK

    def kernel(q_ref, k_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        q = q_ref[0].astype(jnp.bfloat16)
        if mode == "manual":
            k = _unpack(k_ref[0]).astype(jnp.bfloat16)
        elif mode == "i4dot":
            k = k_ref[0]
        else:
            k = k_ref[0].astype(jnp.bfloat16)
        s = _dot(q, k)                                      # [GQ, CHUNK]
        acc_ref[:] += jnp.sum(s, axis=-1, keepdims=True) * jnp.ones(
            (1, 128), jnp.float32)

    if mode in ("i4cast", "i4dot"):
        kdt, krows = jnp.int4, D
    elif mode == "i8cast":
        kdt, krows = jnp.int8, D
    else:
        kdt, krows = jnp.int32, D // 8

    @jax.jit
    def run(q, k):
        return pl.pallas_call(
            kernel,
            grid=(H, nc),
            in_specs=[
                pl.BlockSpec((1, 8, D), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, krows, CHUNK), lambda i, j: (i, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, 8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )(q, k)
    return run, kdt, krows


def main():
    watchdog(560)
    rng = np.random.default_rng(0)
    modes = sys.argv[1:] or ["i8cast", "i4cast", "i4dot", "manual"]
    codes = rng.integers(0, 8, (H, D, T), np.int32)  # int4-safe range
    q_np = rng.standard_normal((H, 8, D)).astype(np.float32)
    want = np.einsum("hqd,hdt->hq", q_np, codes.astype(np.float32))

    for mode in modes:
        try:
            run, kdt, krows = make(mode)
            q = jnp.asarray(q_np).astype(jnp.bfloat16)
            if mode == "manual":
                from gear_tpu.core import quant
                packed = quant.pack_codes_strided(
                    jnp.asarray(codes).swapaxes(-1, -2), 4)  # [H,T,WD]
                k = jnp.asarray(packed).swapaxes(-1, -2)     # [H,WD,T]
            else:
                k = jnp.asarray(codes).astype(kdt)

            out = np.asarray(run(q, k))[:, :, 0]
            rel = np.abs(out - want).mean() / np.abs(want).mean()

            @jax.jit
            def loop(q, k):
                def body(i, acc):
                    qq = q + (acc * 1e-30 + i * 1e-9).astype(q.dtype)
                    return acc + run(qq, k)[0, 0, 0]
                return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0))

            np.asarray(loop(q, k))
            best = None
            for t_i in range(3):
                q2 = q * (1.0 + 0.01 * (t_i + 1))
                np.asarray(q2)
                t0 = time.time()
                np.asarray(loop(q2, k))
                dt = (time.time() - t0) / N_ITER
                best = dt if best is None else min(best, dt)
            print(f"{mode}: {best*1e6:.1f} us/sweep  rel={rel:.4f}",
                  flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
