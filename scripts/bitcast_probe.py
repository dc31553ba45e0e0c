"""Probe pltpu.bitcast i32->i8 semantics + int8 nibble ops on this chip.

1. shape/order: bitcast a known int32 pattern, print what comes out
2. v9 unpack correctness: byte-strided nibble extract vs reference
3. timing: v9 unpack+dot vs current shift-unpack+dot (H=8, T=8192)
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


def watchdog(seconds):
    def fire(signum, frame):
        print(f"WATCHDOG after {seconds}s", flush=True)
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def probe_shape():
    # word w at lane t = (4w+3)<<24 | (4w+2)<<16 | (4w+1)<<8 | (4w+0)
    # i.e. byte k of word w == 4w + k (little-endian)
    w = np.zeros((8, 128), np.int32)
    for row in range(8):
        w[row, :] = ((4 * row + 3) << 24 | (4 * row + 2) << 16 |
                     (4 * row + 1) << 8 | (4 * row))
    wj = jnp.asarray(w)

    def kernel(x_ref, o_ref):
        b = pltpu.bitcast(x_ref[...], jnp.int8)
        o_ref[...] = b.astype(jnp.int32)[:32, :128]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
    )(wj)
    o = np.asarray(out)
    print("bitcast i32->i8 result shape probe (first col of each row):")
    print(" col0 of rows 0..31:", o[:32, 0].tolist(), flush=True)
    # if row r == value r -> sublane-expanded in order 4w+k


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def make_timing(mode):
    nc = T // CHUNK
    WD = D // 8

    def kernel(q_ref, k_ref, out_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        bf = jnp.bfloat16
        q = q_ref[0].astype(bf)
        if mode == "old":
            mask = jnp.uint32(15)
            w = k_ref[0].astype(jnp.uint32)
            parts = [((w >> jnp.uint32(4 * j2)) & mask).astype(jnp.int32)
                     for j2 in range(8)]
            k = jnp.concatenate(parts, axis=0).astype(bf)    # [D, CHUNK]
            s = _dot(q, k, (((1,), (0,))))
        else:  # v9 nibble path
            b = pltpu.bitcast(k_ref[0], jnp.int8)            # [4*WD, CHUNK]?
            lo = (b & jnp.int8(15)).astype(bf)               # [64, CHUNK]
            hi = ((b >> 4) & jnp.int8(15)).astype(bf)
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
    probe_shape()

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (H, D, T), np.int64)
    q_np = rng.standard_normal((H, 8, D)).astype(np.float32)

    # old packing: strided (field j of word w = channel j*WD + w)
    WD = D // 8
    words_old = np.zeros((H, WD, T), np.int64)
    for j in range(8):
        words_old |= codes[:, j * WD:(j + 1) * WD, :] << (4 * j)
    words_old = words_old.astype(np.uint32).view(np.int32)

    # v9 byte-strided packing: byte k of word w = ch (4w+k) | ch (4w+k+64)<<4
    words_v9 = np.zeros((H, WD, T), np.int64)
    for k in range(4):
        lo = codes[:, 0 * 64:, :][:, 3::4, :] if False else None
    byte_vals = (codes[:, :64, :] | (codes[:, 64:, :] << 4))  # [H, 64, T]
    for k in range(4):
        words_v9 |= byte_vals[:, k::4, :].astype(np.int64) << (8 * k)
    words_v9 = words_v9.astype(np.uint32).view(np.int32)
    # byte (w, k) should be channel c = 4w + k -> byte_vals row 4w+k
    # byte_vals[:, k::4] picks rows k, k+4, ... = c for w=0,1,...  OK

    want = np.einsum("hqd,hdt->hq", q_np, codes.astype(np.float32))

    for mode, words in (("old", words_old), ("v9", words_v9)):
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
        print(f"{mode}: {best*1e6:.1f} us/sweep  rel={rel:.5f}", flush=True)


if __name__ == "__main__":
    main()
