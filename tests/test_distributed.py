"""pod_mesh topology logic on the virtual 8-device CPU backend (the
multi-host init itself needs a real pod; survey §2.5)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gear_tpu.parallel import distributed as dist


def test_pod_mesh_shapes():
    mesh = dist.pod_mesh(model_parallel=4)
    assert dict(mesh.shape) == {"data": 2, "seq": 1, "model": 4}
    mesh2 = dist.pod_mesh(model_parallel=2, seq_parallel=2)
    assert dict(mesh2.shape) == {"data": 2, "seq": 2, "model": 2}
    # model axis innermost: one model group = consecutive devices (ICI)
    devs = mesh.devices
    assert [d.id for d in devs[0, 0]] == [0, 1, 2, 3]


def test_pod_mesh_indivisible_raises():
    with pytest.raises(ValueError):
        dist.pod_mesh(model_parallel=3)


def test_pod_mesh_collective_runs():
    """A psum over the model axis executes on the virtual mesh."""
    mesh = dist.pod_mesh(model_parallel=4)
    x = jnp.arange(8.0).reshape(2, 4)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "model")))

    def f(v):
        return jax.lax.psum(v, "model")

    out = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=P("data", "model"),
                      out_specs=P("data", None)))(xs)
    want = x.sum(axis=1, keepdims=True).repeat(1, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want))


def test_describe():
    mesh = dist.pod_mesh(model_parallel=8)
    s = dist.describe(mesh)
    assert "8 devices" in s
