"""pod_mesh topology logic on the virtual 8-device CPU backend, plus a REAL
multi-process jax.distributed run (2 processes x 4 CPU devices each) driving
initialize_from_env + pod_mesh + a cross-process prefill/decode step
(survey §2.5 communication-backend obligation; VERDICT r4 task 6)."""
import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gear_tpu.parallel import distributed as dist

TESTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS)


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


@pytest.mark.slow
def test_multiprocess_prefill_decode(tmp_path):
    """2 OS processes x 4 CPU devices, joined by jax.distributed.initialize
    through initialize_from_env's coordinator env vars; pod_mesh(model=2)
    spans both processes, and one compressed prefill + append + attend step
    sharded (data, model) must match the single-process result."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    out_path = tmp_path / "dist_out.json"
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=REPO,
        )
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(TESTS, "dist_worker.py"),
             str(out_path)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        errs.append(err)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
    got = json.loads(out_path.read_text())
    out = np.asarray(got["out"], np.float32).reshape(got["shape"])

    # single-process reference (same seeds/spec as the worker)
    from gear_tpu import cache as C
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
    cache = C.prefill(spec, jnp.asarray(k), jnp.asarray(v))
    cache = C.append(spec, cache, jnp.asarray(k1), jnp.asarray(v1),
                     key=jax.random.PRNGKey(0))
    want = np.asarray(C.attend(spec, cache, jnp.asarray(q)))
    assert out.shape == want.shape
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)
