"""Aux subsystems: faults, profiling roofline, distributed mesh builder."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gear_tpu import profiling
from gear_tpu.parallel import distributed
from gear_tpu.runtime import faults


def test_faults_detects_nan():
    tree = {"a": jnp.ones((4, 4)), "b": jnp.asarray([1.0, jnp.nan])}
    assert not bool(faults.tree_is_finite(tree))
    with pytest.raises(FloatingPointError):
        faults.check_or_raise(tree, "unit-test")
    clean = {"a": jnp.ones((2,)), "i": jnp.arange(3)}  # int leaf ignored
    assert bool(faults.tree_is_finite(clean))
    faults.check_or_raise(clean)


def test_faults_guard_in_jit():
    @jax.jit
    def f(x):
        return faults.guard({"x": x}, "jit")["x"] * 2
    out = f(jnp.ones((4,)))
    np.testing.assert_allclose(np.asarray(out), 2.0)


def test_roofline_accounting():
    from gear_tpu.cache import CacheSpec
    spec = CacheSpec(batch=1, num_kv_heads=8, head_dim=128, max_len=8192,
                     bits=4, group=64, rank=4, prefill_rank=4,
                     dtype=jnp.bfloat16, sideband_dtype=jnp.bfloat16)
    roof = profiling.decode_attention_roofline(spec, batch=1, q_heads=32)
    # INT4 cache ~13 MB at 819 GB/s -> ~16 us memory floor; memory-bound.
    assert 5e-6 < roof.sol_time_s < 5e-5
    assert roof.mem_time_s > roof.compute_time_s
    assert 0 < roof.efficiency(roof.sol_time_s * 2) == 0.5


def test_pod_mesh_shapes():
    n = jax.device_count()
    if n < 8:
        pytest.skip("needs 8 devices")
    mesh = distributed.pod_mesh(model_parallel=4, seq_parallel=1)
    assert dict(mesh.shape) == {"data": 2, "seq": 1, "model": 4}
    mesh2 = distributed.pod_mesh(model_parallel=2, seq_parallel=2)
    assert dict(mesh2.shape) == {"data": 2, "seq": 2, "model": 2}
    with pytest.raises(ValueError):
        distributed.pod_mesh(model_parallel=3)
    assert "mesh" in distributed.describe(mesh)


def test_timeit_sync():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((128, 128))
    dt = profiling.timeit(f, x, iters=2)
    assert dt > 0
