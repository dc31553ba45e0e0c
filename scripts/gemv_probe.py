"""Probe the decode-GEMV wall on the real chip.

Measures the raw rate of candidate inner loops for scores s = q @ K^T over
[H=8, T=8192, D=128] (the 8k-ctx bench shape), stripped of softmax/PV:

  dot8     bf16 MXU dot [8,128]@[128,1024] per chunk        (v5's inner op)
  dot8c4   same with 4096-token chunks (fewer grid steps)
  dot128   bf16 MXU dot [128,128]@[128,1024] (M=128): if time == dot8 the
           GEMV is weight-load-bound and M is free
  int8dot  int8 MXU dot, preferred int32 accum (2x rate if int8 path real)
  vpu1     GQ=1 VPU mul + sublane-reduce (no MXU)
  f32dot   f32 MXU dot (XLA-baseline-equivalent rate)

Each prints us per full sweep over the 8-head x 8192-token cache side.
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


def watchdog(seconds):
    def fire(signum, frame):
        print(f"WATCHDOG fired after {seconds}s", flush=True)
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


H, T, D = 8, 8192, 128
N_ITER = 400


def make_probe(mode, chunk):
    nc = T // chunk

    def kernel(q_ref, k_ref, out_ref, acc_ref):
        nc_i = pl.program_id(1)

        @pl.when(nc_i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        if mode in ("dot8", "dot128", "dot8c4"):
            q = q_ref[0].astype(jnp.bfloat16)
            k = k_ref[0].astype(jnp.bfloat16)
            s = jax.lax.dot_general(q, k, ((((1,), (0,))), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.sum(s, axis=-1, keepdims=True) * jnp.ones(
                (1, 128), jnp.float32)
        elif mode == "f32dot":
            q = q_ref[0].astype(jnp.float32)
            k = k_ref[0].astype(jnp.float32)
            s = jax.lax.dot_general(q, k, ((((1,), (0,))), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc_ref[:] += jnp.sum(s, axis=-1, keepdims=True) * jnp.ones(
                (1, 128), jnp.float32)
        elif mode == "int8dot":
            q = q_ref[0].astype(jnp.int8)
            k = k_ref[0].astype(jnp.int8)
            s = jax.lax.dot_general(q, k, ((((1,), (0,))), ((), ())),
                                    preferred_element_type=jnp.int32)
            acc_ref[:] += (jnp.sum(s, axis=-1, keepdims=True)
                           .astype(jnp.float32) * jnp.ones((1, 128),
                                                           jnp.float32))
        elif mode == "vpu1":
            # q stored transposed [D, 8]; use col 0. K [D, CHUNK].
            qc = q_ref[0, :, 0:1].astype(jnp.float32)        # [D, 1]
            k = k_ref[0].astype(jnp.float32)                 # [D, CHUNK]
            s = jnp.sum(qc * k, axis=0, keepdims=True)       # [1, CHUNK]
            acc_ref[0:1, :] += jnp.sum(
                s, axis=-1, keepdims=True) * jnp.ones((1, 128), jnp.float32)

    gq = {"dot128": 128}.get(mode, 8)
    qshape = (H, D, 8) if mode == "vpu1" else (H, gq, D)
    kshape = (H, D, T) if mode == "vpu1" else (H, D, T)
    if mode == "vpu1":
        kblock = (1, D, chunk)
        kmap = lambda i, j: (i, 0, j)
    else:
        kblock = (1, D, chunk)
        kmap = lambda i, j: (i, 0, j)

    @jax.jit
    def run(q, k):
        out = pl.pallas_call(
            kernel,
            grid=(H, nc),
            in_specs=[
                pl.BlockSpec((1,) + qshape[1:], lambda i, j: (i, 0, 0)),
                pl.BlockSpec(kblock, kmap),
            ],
            out_specs=pl.BlockSpec((1, gq, 128), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, gq, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((gq, 128), jnp.float32)],
        )(q, k)
        return out

    return run, qshape, kshape


def main():
    watchdog(560)
    rng = np.random.default_rng(0)
    modes = sys.argv[1:] or ["dot8", "dot8c4", "dot128", "int8dot", "vpu1",
                             "f32dot"]
    for mode in modes:
        chunk = 4096 if mode == "dot8c4" else 1024
        run, qshape, kshape = make_probe(mode, chunk)
        dt_k = jnp.int8 if mode == "int8dot" else jnp.bfloat16
        q = jnp.asarray(rng.standard_normal(qshape), dtype=jnp.float32
                        ).astype(dt_k if mode == "int8dot" else jnp.bfloat16)
        if mode == "int8dot":
            q = jnp.asarray(
                rng.integers(-127, 127, qshape, np.int32)).astype(jnp.int8)
            k = jnp.asarray(
                rng.integers(-127, 127, kshape, np.int32)).astype(jnp.int8)
        else:
            k = jnp.asarray(rng.standard_normal(kshape), dtype=jnp.float32
                            ).astype(jnp.bfloat16)

        @jax.jit
        def loop(q, k):
            def body(i, acc):
                qq = q + (acc * 1e-30 + i * 1e-9).astype(q.dtype)
                return acc + run(qq, k)[0, 0, 0]
            return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0))

        np.asarray(loop(q, k))
        best = None
        for t_i in range(3):
            k2 = k  # same k; vary q to defeat memoization
            q2 = q + np.int8(t_i + 1) if mode == "int8dot" else (
                q * (1.0 + 0.01 * (t_i + 1)))
            np.asarray(q2)
            t0 = time.time()
            np.asarray(loop(q2, k2))
            dt = (time.time() - t0) / N_ITER
            best = dt if best is None else min(best, dt)
        # effective MAC rate over the real (unpadded) work
        macs = H * T * D * (1 if mode == "vpu1" else 8)
        print(f"{mode}: {best*1e6:.1f} us/sweep  "
              f"({macs/best/1e9:.0f} G MAC/s)", flush=True)


if __name__ == "__main__":
    main()
