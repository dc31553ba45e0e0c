"""Bisect the fused-kernel overhead vs the 65us/side GEMV floor.

Variants (all over H=8 heads, T=8192 tokens, D=128, chunk 1024):
  dot1       score dot only, K side                      (floor: ~65us)
  twodots    independent K and V dots, no dependency     (~130us if additive)
  dotchain   K dot -> scale p -> V dot (data dependency, no softmax)
  softchain  K dot -> online softmax -> V dot            (flash equivalent)
  unpackdot  int32 codes -> unpack int4 -> K dot         (unpack cost)
  folddots   16 per-block K dots with q-fold             (small-dot overhead)
  mxu8       8 sequential tiny dots per chunk on the same K tile
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
        print(f"WATCHDOG fired after {seconds}s", flush=True)
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


H, T, D, CHUNK = 8, 8192, 128, 1024
G = 64
CB = CHUNK // G
N_ITER = 300
WD = 16  # D // fpi for int4


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
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
    int_codes = mode == "unpackdot"

    def kernel(q_ref, k_ref, v_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        bf = jnp.bfloat16
        q = q_ref[0].astype(bf)
        if int_codes:
            k = _unpack(k_ref[0]).astype(bf)
        else:
            k = k_ref[0].astype(bf)                          # [D, CHUNK]

        if mode in ("dot1", "unpackdot"):
            s = _dot(q, k, (((1,), (0,))))
            acc_ref[:] += jnp.sum(s, axis=-1, keepdims=True) * jnp.ones(
                (1, 128), jnp.float32)
        elif mode == "twodots":
            v = v_ref[0].astype(bf)
            s = _dot(q, k, (((1,), (0,))))
            s2 = _dot(q, v, (((1,), (0,))))
            acc_ref[:] += jnp.sum(s + s2, axis=-1, keepdims=True) * jnp.ones(
                (1, 128), jnp.float32)
        elif mode == "dotchain":
            v = v_ref[0].astype(bf)
            s = _dot(q, k, (((1,), (0,))))
            p = (s * 1e-3).astype(bf)                        # [GQ, CHUNK]
            pv = _dot(p, v, (((1,), (1,))))                  # [GQ, D]
            acc_ref[:] += pv
        elif mode == "softchain":
            v = v_ref[0].astype(bf)
            s = _dot(q, k, (((1,), (0,))))
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m).astype(bf)
            pv = _dot(p, v, (((1,), (1,))))
            acc_ref[:] += pv
        elif mode in ("folddots", "mxu8"):
            qf = q_ref[0]
            s_parts = []
            nblk = CB if mode == "folddots" else 8
            w = CHUNK // nblk
            for c in range(nblk):
                qs = (qf * (1.0 + c)).astype(bf) if mode == "folddots" else q
                s_parts.append(_dot(qs, k[:, c * w:(c + 1) * w],
                                    (((1,), (0,)))))
            s = jnp.concatenate(s_parts, axis=1)
            acc_ref[:] += jnp.sum(s, axis=-1, keepdims=True) * jnp.ones(
                (1, 128), jnp.float32)

    kdt = jnp.int32 if int_codes else jnp.bfloat16
    krows = WD if int_codes else D

    @jax.jit
    def run(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(H, nc),
            in_specs=[
                pl.BlockSpec((1, 8, D), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, krows, CHUNK), lambda i, j: (i, 0, j)),
                pl.BlockSpec((1, D, CHUNK), lambda i, j: (i, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, 8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )(q, k, v)

    return run, kdt, krows


def main():
    watchdog(560)
    rng = np.random.default_rng(0)
    modes = sys.argv[1:] or ["dot1", "twodots", "dotchain", "softchain",
                             "unpackdot", "folddots", "mxu8"]
    v = jnp.asarray(rng.standard_normal((H, D, T)), dtype=jnp.float32
                    ).astype(jnp.bfloat16)
    for mode in modes:
        run, kdt, krows = make(mode)
        if kdt == jnp.int32:
            k = jnp.asarray(rng.integers(0, 2**31 - 1, (H, krows, T),
                                         np.int64).astype(np.int32))
        else:
            k = jnp.asarray(rng.standard_normal((H, krows, T)),
                            dtype=jnp.float32).astype(jnp.bfloat16)
        q = jnp.asarray(rng.standard_normal((H, 8, D)), dtype=jnp.float32
                        ).astype(jnp.bfloat16)

        @jax.jit
        def loop(q, k, v):
            def body(i, acc):
                qq = q + (acc * 1e-30 + i * 1e-9).astype(q.dtype)
                return acc + run(qq, k, v)[0, 0, 0]
            return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0))

        np.asarray(loop(q, k, v))
        best = None
        for t_i in range(3):
            q2 = q * (1.0 + 0.01 * (t_i + 1))
            np.asarray(q2)
            t0 = time.time()
            np.asarray(loop(q2, k, v))
            dt = (time.time() - t0) / N_ITER
            best = dt if best is None else min(best, dt)
        print(f"{mode}: {best*1e6:.1f} us/sweep", flush=True)


if __name__ == "__main__":
    main()
