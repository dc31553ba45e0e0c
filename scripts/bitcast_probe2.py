"""bitcast unpack, round 2: int32 pre-shift + packed-i8 bitcast + 3D dot.

v9 nibble path (no int8 shifts):
    lo3 = bitcast(w, i8) & 15          # [WD, CHUNK, 4] i8
    hi3 = bitcast(w >> 4, i8) & 15     # int32 shift, then bitcast
    s = dot(q_lo3 [GQ, WD, 4], lo3, contract {WD, 4})
      + dot(q_hi3, hi3, contract {WD, 4})
with byte-strided packing: byte k of word w = ch(4w+k) | ch(4w+k+64) << 4.
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

H, T, D, CHUNK = 8, 8192, 128, 1024
N_ITER = 300
WD = D // 8


def watchdog(seconds):
    def fire(signum, frame):
        print(f"WATCHDOG after {seconds}s", flush=True)
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def probe_shape():
    w = np.zeros((8, 128), np.int32)
    for row in range(8):
        w[row, :] = ((4 * row + 3) << 24 | (4 * row + 2) << 16 |
                     (4 * row + 1) << 8 | (4 * row))
    wj = jnp.asarray(w)

    def kernel(x_ref, o_ref):
        b = pltpu.bitcast(x_ref[...], jnp.int8)
        pl.debug_print("bitcast ndim={}", len(b.shape))
        v = b.astype(jnp.int32)
        # write flattened info: rows = original sublanes, minor dim content
        if len(b.shape) == 3:
            o_ref[...] = v[:, :, 0] * 1000 + v[:, :, 1]
        else:
            o_ref[...] = v[:8, :128]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(wj)
    o = np.asarray(out)
    print("probe col0 per row (k0*1000+k1 if 3d):", o[:, 0].tolist(),
          flush=True)


def _dot3(a, b):
    # contract dims {1,2} of a with {0,2} of b -> [GQ, CHUNK]
    return jax.lax.dot_general(
        a, b, ((((1, 2), (0, 2))), ((), ())),
        preferred_element_type=jnp.float32)


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def make_timing(mode):
    nc = T // CHUNK

    def kernel(q_ref, k_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        bf = jnp.bfloat16
        q = q_ref[0].astype(bf)
        w = k_ref[0]
        if mode == "old":
            mask = jnp.uint32(15)
            wu = w.astype(jnp.uint32)
            parts = [((wu >> jnp.uint32(4 * j2)) & mask).astype(jnp.int32)
                     for j2 in range(8)]
            k = jnp.concatenate(parts, axis=0).astype(bf)
            s = _dot(q, k, (((1,), (0,))))
        else:
            nib = jnp.int32(0x0F0F0F0F)
            lo = pltpu.bitcast(w & nib, jnp.int8).astype(bf)   # [64, CHUNK]
            hi = pltpu.bitcast(
                jax.lax.shift_right_logical(w, 4) & nib,
                jnp.int8).astype(bf)                           # [64, CHUNK]
            s = (_dot(q[:, :64], lo, (((1,), (0,))))
                 + _dot(q[:, 64:], hi, (((1,), (0,)))))
        acc_ref[:] += jnp.sum(s, axis=-1, keepdims=True) * jnp.ones(
            (1, 128), jnp.float32)
        out_ref[:] = acc_ref[:][None]

    @jax.jit
    def run(q, k):
        return pl.pallas_call(
            kernel,
            grid=(H, nc),
            in_specs=[
                pl.BlockSpec((1, 8, D), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, WD, CHUNK), lambda i, j: (i, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((H, 8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )(q, k)
    return run


def main():
    watchdog(560)
    try:
        probe_shape()
    except Exception as e:
        print("shape probe FAILED:", str(e)[:300], flush=True)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (H, D, T), np.int64)
    q_np = rng.standard_normal((H, 8, D)).astype(np.float32)

    words_old = np.zeros((H, WD, T), np.int64)
    for j in range(8):
        words_old |= codes[:, j * WD:(j + 1) * WD, :] << (4 * j)
    words_old = words_old.astype(np.uint32).view(np.int32)

    byte_vals = (codes[:, :64, :] | (codes[:, 64:, :] << 4))  # ch c | c+64
    words_v9 = np.zeros((H, WD, T), np.int64)
    for k in range(4):
        words_v9 |= byte_vals[:, k::4, :].astype(np.int64) << (8 * k)
    words_v9 = words_v9.astype(np.uint32).view(np.int32)

    want = np.einsum("hqd,hdt->hq", q_np, codes.astype(np.float32))

    for mode, words in (("old", words_old), ("v9", words_v9)):
        try:
            run = make_timing(mode)
            q = jnp.asarray(q_np).astype(jnp.bfloat16)
            k = jnp.asarray(words)
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
            print(f"{mode}: {best*1e6:.1f} us/sweep  rel={rel:.5f}",
                  flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__} {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
