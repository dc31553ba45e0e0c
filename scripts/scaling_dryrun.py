"""Scaling validation on a virtual 8-device mesh (BASELINE.md scaling axis).

Real multi-chip hardware is not reachable from this sandbox (one v5e chip
behind a tunnel), so the scaling evidence is functional: for each mesh
width, the TP / SP / DP decode programs must compile, execute, and produce
token-identical generations vs the single-device engine. The driver's
``dryrun_multichip`` covers the compile path; this script records the
full-generation equivalence table to runs/scaling_dryrun.json.

Usage: python scripts/scaling_dryrun.py
"""
import json
import os
import sys
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from gear_tpu.config import CompressionConfig  # noqa: E402
from gear_tpu.engine import EngineConfig, InferenceEngine  # noqa: E402
from gear_tpu.models import llama  # noqa: E402


def build(batch=1):
    cfg = llama.ModelConfig(vocab_size=256, hidden_size=128,
                            intermediate_size=256, num_layers=2,
                            num_heads=8, num_kv_heads=8, head_dim=32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    comp = CompressionConfig(num_layers=2, compress_method="GEARL",
                             quantize_bit=8, group_size=64, rank=2,
                             prefill_rank=2, loop=2)
    return InferenceEngine(cfg, params, comp,
                           EngineConfig(max_len=256, mode="fused"),
                           batch_size=batch)


def _multihost_row():
    """>=2-host scaling evidence (BASELINE.md scaling axis): a REAL
    2-process jax.distributed run (2 x 4 virtual CPU devices, coordinator
    over localhost DCN) whose cross-process (data, model)-sharded
    prefill+decode step must match the single-process result. Reuses
    tests/dist_worker.py (tests/test_distributed.py asserts the same)."""
    import socket
    import subprocess
    import tempfile

    repo = Path(__file__).resolve().parent.parent
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    with tempfile.TemporaryDirectory() as td:
        out_path = Path(td) / "out.json"
        procs = []
        for pid in range(2):
            env = dict(os.environ)
            env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                       JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                       PYTHONPATH=str(repo))
            procs.append(subprocess.Popen(
                [sys.executable, str(repo / "tests" / "dist_worker.py"),
                 str(out_path)], env=env, cwd=str(repo),
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE))
        ok = all(p.wait(timeout=300) == 0 for p in procs)
        got = json.loads(out_path.read_text()) if ok else None

    if ok:
        import jax.numpy as jnp
        from gear_tpu import cache as C
        out = np.asarray(got["out"], np.float32).reshape(got["shape"])
        spec = C.CacheSpec(batch=4, num_kv_heads=4, head_dim=128,
                           max_len=256, bits=4, group=64, rank=2,
                           prefill_rank=2, lowrank_loop=2,
                           dtype=jnp.float32, sideband_dtype=jnp.float32)
        rng2 = np.random.default_rng(0)
        k = rng2.standard_normal((4, 4, 192, 128)).astype(np.float32)
        v = rng2.standard_normal((4, 4, 192, 128)).astype(np.float32)
        k1 = rng2.standard_normal((4, 4, 1, 128)).astype(np.float32)
        v1 = rng2.standard_normal((4, 4, 1, 128)).astype(np.float32)
        q = rng2.standard_normal((4, 4, 1, 128)).astype(np.float32)
        cache = C.prefill(spec, jnp.asarray(k), jnp.asarray(v))
        cache = C.append(spec, cache, jnp.asarray(k1), jnp.asarray(v1),
                         key=jax.random.PRNGKey(0))
        want = np.asarray(C.attend(spec, cache, jnp.asarray(q)))
        ok = bool(np.allclose(out, want, rtol=2e-4, atol=2e-4))
    return {"strategy": "MULTIHOST(TPx2 over 2 processes)", "ways": 2,
            "exact": ok}


def main():
    prompts = [[1, 2, 3, 4, 5, 6, 7]]
    t0 = time.time()
    ref = build().generate(prompts, 12)
    rows = []

    for tp in (2, 4, 8):
        eng = build()
        eng.shard(Mesh(np.array(jax.devices()[:tp]).reshape(1, tp),
                       ("data", "model")))
        out = eng.generate(prompts, 12)
        rows.append({"strategy": "TP", "ways": tp, "exact": out == ref})

    for sp in (2, 4):
        eng = build()
        eng.shard_seq(Mesh(np.array(jax.devices()[:sp]), ("seq",)))
        out = eng.generate(prompts, 12)
        rows.append({"strategy": "SP", "ways": sp, "exact": out == ref})

    for dp in (2, 4):
        eng = build(batch=dp)
        eng.shard(Mesh(np.array(jax.devices()[:dp]).reshape(dp, 1),
                       ("data", "model")))
        out = eng.generate(prompts * dp, 12)
        rows.append({"strategy": "DP", "ways": dp,
                     "exact": all(o == ref[0] for o in out)})

    rows.append(_multihost_row())

    payload = {
        "protocol": ("virtual 8-device CPU mesh; generation must be "
                     "token-identical to the 1-device engine"),
        "reference_tokens": ref[0],
        "rows": rows,
        "all_exact": all(r["exact"] for r in rows),
        "wall_s": round(time.time() - t0, 1),
    }
    out_dir = Path(__file__).resolve().parent.parent / "runs"
    out_dir.mkdir(exist_ok=True)
    with open(out_dir / "scaling_dryrun.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    assert payload["all_exact"], "scaling mismatch"


if __name__ == "__main__":
    main()
