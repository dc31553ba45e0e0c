"""Probe pltpu.roll semantics on the real chip: static and program_id-derived
dynamic lane shifts on an [8, 128] f32 tile.

Question: does roll(x, s, axis=1)[.., 0] == x[.., s] (left-rotate) or
x[.., -s] (right-rotate, jnp.roll convention)?
"""
import signal
import sys


def watchdog(seconds=120):
    def fire(signum, frame):
        print(f"WEDGED after {seconds}s", flush=True)
        import os
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


def main():
    watchdog()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_static(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 16, 1)

    def k_dyn(x_ref, o_ref):
        j = pl.program_id(0)
        o_ref[...] = pltpu.roll(x_ref[...], j * 16, 1)

    x = jnp.broadcast_to(jnp.arange(128, dtype=jnp.float32)[None, :], (8, 128))

    out = pl.pallas_call(
        k_static, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
    print("static roll(+16): lane0 =", float(np.asarray(out)[0, 0]),
          "(112 -> jnp.roll/right-rotate; 16 -> left-rotate)", flush=True)

    out2 = pl.pallas_call(
        k_dyn,
        grid=(2,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(x)
    o = np.asarray(out2)
    print("dyn roll(j*16): j=0 lane0 =", float(o[0, 0]),
          " j=1 lane0 =", float(o[8, 0]), flush=True)


if __name__ == "__main__":
    main()
