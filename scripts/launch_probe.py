"""Measure the fixed per-pallas-launch floor and per-grid-step cost.

  trivial    grid (1,1), 1 tile in/out — pure launch cost
  h1/h8/h16  dot1 sweep with H heads (8/64/128 grid steps, data scales)
  xla        the same GEMV as one XLA einsum (launch floor for XLA ops)
  back2back  two trivial pallas launches chained in one jit iteration
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

T, D = 8192, 128
N_ITER = 300


def watchdog(seconds):
    def fire(signum, frame):
        print(f"WATCHDOG fired after {seconds}s", flush=True)
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def trivial():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)
    return run, jnp.ones((8, 128), jnp.float32)


def dot_sweep(h):
    def kernel(q_ref, k_ref, o_ref, acc_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)
        s = jax.lax.dot_general(
            q_ref[0].astype(jnp.bfloat16), k_ref[0].astype(jnp.bfloat16),
            ((((1,), (0,))), ((), ())), preferred_element_type=jnp.float32)
        acc_ref[:] += jnp.sum(s, axis=-1, keepdims=True) * jnp.ones(
            (1, 128), jnp.float32)
        o_ref[:] = acc_ref[:][None]

    @jax.jit
    def run(q, k):
        return pl.pallas_call(
            kernel,
            grid=(h, T // 1024),
            in_specs=[
                pl.BlockSpec((1, 8, D), lambda i, j: (i, 0, 0)),
                pl.BlockSpec((1, D, 1024), lambda i, j: (i, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((h, 8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
        )(q, k)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((h, 8, D)), jnp.float32
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((h, D, T)), jnp.float32
                    ).astype(jnp.bfloat16)
    return run, (q, k)


def bench(name, run, args):
    if not isinstance(args, tuple):
        args = (args,)

    @jax.jit
    def loop(*a):
        def body(i, acc):
            a2 = (a[0] + (acc * 1e-30 + i * 1e-9).astype(a[0].dtype),) + a[1:]
            out = run(*a2)
            return acc + out.reshape(-1)[0]
        return jax.lax.fori_loop(0, N_ITER, body, jnp.float32(0))

    np.asarray(loop(*args))
    best = None
    for t_i in range(3):
        a2 = tuple(x * (1.0 + 0.01 * (t_i + 1)) for x in args)
        for x in a2:
            np.asarray(x)
        t0 = time.time()
        np.asarray(loop(*a2))
        dt = (time.time() - t0) / N_ITER
        best = dt if best is None else min(best, dt)
    print(f"{name}: {best*1e6:.1f} us/iter", flush=True)


def main():
    watchdog(560)
    run, x = trivial()
    bench("trivial", run, x)

    run2, x2 = trivial()

    @jax.jit
    def two(x):
        return run(x) + run2(x * 1.5)
    bench("back2back", two, x)

    for h in (1, 8, 16):
        r, a = dot_sweep(h)
        bench(f"h{h}", r, a)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((8, 8, D)), jnp.float32
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((8, D, T)), jnp.float32
                    ).astype(jnp.bfloat16)

    @jax.jit
    def xla(q, k):
        return jnp.einsum("hqd,hdt->hqt", q.astype(jnp.float32),
                          k.astype(jnp.float32)).sum(-1)
    bench("xla", xla, (q, k))


if __name__ == "__main__":
    main()
