"""Quick TPU-tunnel health probe: exits 0 and prints OK if a tiny matmul
round-trips within the timeout, else exits 2 (wedged/unreachable).

Usage: timeout 90 python scripts/tpu_health.py [seconds]
"""
import os
import signal
import sys
import time


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 75

    def fire(signum, frame):
        print(f"WEDGED: no response in {budget}s", flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, fire)
    signal.alarm(budget)
    import numpy as np
    import jax.numpy as jnp
    t0 = time.time()
    x = np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))
    print(f"OK: matmul round-trip in {time.time()-t0:.1f}s "
          f"(sum={float(x.sum()):.0f})", flush=True)


if __name__ == "__main__":
    main()
