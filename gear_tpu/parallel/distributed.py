"""Multi-host initialization and topology-aware mesh construction.

The reference has no distributed backend at all (survey §2.5: no
NCCL/MPI/Gloo; `accelerate device_map` only places layers within one
process). The TPU equivalent: `jax.distributed.initialize` over DCN for
host coordination, a mesh whose `model` (and optional `seq`) axes stay
within a host's ICI domain while `data` spans hosts, and XLA collectives
carrying the COMPRESSED representation (packed int words + sidebands +
rank-r bases) as the wire format for any KV movement.

Single-chip sandboxes can't exercise multi-host paths; the 8-device CPU
mesh (tests/) and `__graft_entry__.dryrun_multichip` validate the sharding
programs, and this module is the production entry.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_from_env(**kw) -> None:
    """Multi-host init. On TPU pods jax.distributed picks coordinator and
    process indices up from the TPU metadata; env overrides supported
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    args = {}
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        args = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    args.update(kw)
    jax.distributed.initialize(**args)


def pod_mesh(model_parallel: int, seq_parallel: int = 1,
             devices=None) -> Mesh:
    """(data, seq, model) mesh: `model` innermost so tensor-parallel
    collectives ride ICI within a host; `data` spans hosts over DCN.

    Device order follows jax.devices(), which enumerates local-first —
    keeping model groups on-host for standard host/chip topologies.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % (model_parallel * seq_parallel):
        raise ValueError(
            f"{n} devices not divisible by model*seq = "
            f"{model_parallel * seq_parallel}")
    data = n // (model_parallel * seq_parallel)
    arr = np.asarray(devices).reshape(data, seq_parallel, model_parallel)
    return Mesh(arr, ("data", "seq", "model"))


def describe(mesh: Mesh) -> str:
    n_local = jax.local_device_count()
    return (f"mesh {dict(mesh.shape)} over {mesh.devices.size} devices, "
            f"{jax.process_count()} hosts x {n_local} local")
