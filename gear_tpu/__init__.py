"""gear-tpu: TPU-native quantized-inference engine with GEAR KV-cache compression.

A from-scratch JAX/XLA/Pallas implementation of the GEAR recipe
(arXiv:2403.05527): ultra-low-bit group-wise KV quantization (per-channel keys
/ per-token values), a streaming rank-r power-iteration approximation of the
quantization residual, and a sparse outlier matrix — fused into the TPU
attention decode path, sharded over device meshes.
"""
from .config import CompressionConfig, LayerCompressionConfig  # noqa: F401

__version__ = "0.1.0"
