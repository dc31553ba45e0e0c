"""Profiling and roofline accounting.

The reference's only tooling is a vendored timeit with CUDA sync
(cuda_supported_gear/quant/timeit_v2.py) and peak-memory prints (test.py:99).
Here: jax.profiler trace capture, a D2H-synced timer that works on remote
TPU runtimes (plain ``block_until_ready`` can return early over the axon
tunnel — see .claude/skills/verify/SKILL.md), and an analytic roofline for
the fused decode kernel so measured GB/s can be judged against
speed-of-light per chip.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 3, inner: int = 1) -> float:
    """Median wall time of fn(*args) with a D2H fetch as the sync point.

    Vary args slightly across iters yourself if the runtime memoizes
    identical calls. ``inner`` divides the result (for on-device loops).
    """
    times = []
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # warm + sync
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append((time.time() - t0) / inner)
    return float(np.median(times))


# -- hardware model ---------------------------------------------------------

@dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float       # HBM bandwidth, GB/s
    bf16_tflops: float    # MXU peak, TFLOP/s
    vmem_mb: float = 16.0


TPU_V5E = ChipSpec("tpu_v5e", hbm_gbps=819.0, bf16_tflops=197.0)
TPU_V4 = ChipSpec("tpu_v4", hbm_gbps=1228.0, bf16_tflops=275.0)


@dataclass
class Roofline:
    bytes_accessed: int
    flops: int
    chip: ChipSpec

    @property
    def mem_time_s(self) -> float:
        return self.bytes_accessed / (self.chip.hbm_gbps * 1e9)

    @property
    def compute_time_s(self) -> float:
        return self.flops / (self.chip.bf16_tflops * 1e12)

    @property
    def sol_time_s(self) -> float:
        return max(self.mem_time_s, self.compute_time_s)

    def efficiency(self, measured_s: float) -> float:
        """Fraction of speed-of-light achieved."""
        return self.sol_time_s / measured_s


def decode_attention_roofline(spec, batch: int, q_heads: int,
                              chip: ChipSpec = TPU_V5E) -> Roofline:
    """Roofline for one fused decode-attention step over a full cache.

    Bytes = the compressed cache (read once — the kernel's one-HBM-pass
    contract) + q/out; FLOPs = QK^T + PV + low-rank + dequant-fold ops.
    """
    t, d = spec.max_len, spec.head_dim
    h = spec.num_kv_heads
    gq = q_heads // h
    b = batch
    bytes_accessed = spec.bytes_compressed() + 2 * b * q_heads * d * 4
    flops = 2 * b * q_heads * t * d * 2          # QK^T + PV
    flops += 2 * b * q_heads * t * spec.r_store * 2  # low-rank corrections
    flops += b * h * t * d * 2 * 2               # scale folds (VPU)
    return Roofline(bytes_accessed, int(flops), chip)


def raw_decode_attention_roofline(spec, batch: int, q_heads: int,
                                  chip: ChipSpec = TPU_V5E) -> Roofline:
    """Roofline for one uncompressed bf16 decode-attention step (the
    baseline the north-star ratio is taken against): bytes = full bf16
    K+V read once + q/out; FLOPs = QK^T + PV."""
    t, d = spec.max_len, spec.head_dim
    b = batch
    bytes_accessed = spec.bytes_fp16_baseline() + 2 * b * q_heads * d * 4
    flops = 2 * b * q_heads * t * d * 2
    return Roofline(bytes_accessed, int(flops), chip)


def report(label: str, measured_s: float, roof: Roofline) -> str:
    eff = roof.efficiency(measured_s)
    return (f"{label}: {measured_s*1e6:.1f} us "
            f"(SoL {roof.sol_time_s*1e6:.1f} us, {eff*100:.0f}% of "
            f"{roof.chip.name} speed-of-light; "
            f"{roof.bytes_accessed/measured_s/1e9:.0f} GB/s effective)")
