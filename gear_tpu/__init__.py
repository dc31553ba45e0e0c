"""gear-tpu: TPU-native quantized-inference engine with GEAR KV-cache compression.

A from-scratch JAX/XLA/Pallas implementation of the GEAR recipe
(arXiv:2403.05527): ultra-low-bit group-wise KV quantization (per-channel keys
/ per-token values), a streaming rank-r power-iteration approximation of the
quantization residual, and a sparse outlier matrix — fused into the TPU
attention decode path, sharded over device meshes.
"""
from .config import CompressionConfig, LayerCompressionConfig  # noqa: F401

__version__ = "0.2.0"


def __getattr__(name):
    # Lazy top-level API (keeps `import gear_tpu` light; the reference's
    # GEARLM/__init__.py:1-9 eagerly imports every model fork).
    import importlib

    lazy = {
        "GearLM": ("gear_tpu.api", "GearLM"),
        "InferenceEngine": ("gear_tpu.engine", "InferenceEngine"),
        "EngineConfig": ("gear_tpu.engine", "EngineConfig"),
        "CacheSpec": ("gear_tpu.cache", "CacheSpec"),
        "LayerCache": ("gear_tpu.cache", "LayerCache"),
        "ServingEngine": ("gear_tpu.serving", "ServingEngine"),
        "PagedServingEngine": ("gear_tpu.serving", "PagedServingEngine"),
        "ModelConfig": ("gear_tpu.models.llama", "ModelConfig"),
    }
    if name in lazy:
        mod, attr = lazy[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'gear_tpu' has no attribute {name!r}")
