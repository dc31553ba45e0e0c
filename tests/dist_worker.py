"""Multi-process distributed worker (driven by test_distributed.py).

Each of 2 processes owns 4 virtual CPU devices; jax.distributed.initialize
(via gear_tpu.parallel.distributed.initialize_from_env, coordinator env
vars) joins them into one 8-device run. The worker builds
pod_mesh(model_parallel=2), runs a compressed prefill + one decode append +
attend step sharded data x model across BOTH processes, and process 0
writes the replicated output to the path in argv[1].

This exercises the real multi-host code path the single-process mesh tests
cannot (SURVEY §2.5 communication-backend obligation): cross-process mesh
construction, GSPMD partitioning over a multi-process mesh, and the DCN
coordination barrier.
"""
import functools
import json
import os
import sys

import numpy as np


def main():
    out_path = sys.argv[1]
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=4")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_platforms", "cpu")
    from gear_tpu.parallel import distributed as dist

    dist.initialize_from_env()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P
    from gear_tpu import cache as C

    mesh = dist.pod_mesh(model_parallel=2, seq_parallel=1)
    assert dict(mesh.shape) == {"data": 4, "seq": 1, "model": 2}

    B, H, T, D = 4, 4, 256, 128
    spec = C.CacheSpec(batch=B, num_kv_heads=H, head_dim=D, max_len=T,
                       bits=4, group=64, rank=2, prefill_rank=2,
                       lowrank_loop=2, dtype=jnp.float32,
                       sideband_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pre = 192
    k = rng.standard_normal((B, H, pre, D)).astype(np.float32)
    v = rng.standard_normal((B, H, pre, D)).astype(np.float32)
    k1 = rng.standard_normal((B, H, 1, D)).astype(np.float32)
    v1 = rng.standard_normal((B, H, 1, D)).astype(np.float32)
    q = rng.standard_normal((B, H, 1, D)).astype(np.float32)

    sh = NamedSharding(mesh, P("data", "model", None, None))

    def dev(x):
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    out_sh = NamedSharding(mesh, P())

    @functools.partial(jax.jit, out_shardings=out_sh)
    def step(k, v, k1, v1, q):
        cache = C.prefill(spec, k, v)
        cache = C.append(spec, cache, k1, v1, key=jax.random.PRNGKey(0))
        return C.attend(spec, cache, q)

    out = np.asarray(step(dev(k), dev(v), dev(k1), dev(v1), dev(q)))
    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"shape": list(out.shape),
                       "out": out.astype(np.float64).reshape(-1).tolist()},
                      f)
    multihost_utils.sync_global_devices("gear_tpu_dist_worker_done")


if __name__ == "__main__":
    main()
