"""Mistral support: an architecture delta of the functional Llama.

Behavioral reference: GenerationBench/GenerationTest/GEARLM/Simulated/
modeling_mistral.py — the reference's Mistral fork is the Llama fork with
GQA (repeat_kv after cache update, :765-766) and sliding-window attention;
the compression hook is identical (:678-762). Here the same holds by
construction: gear_tpu.models.llama implements GQA and sliding-window
prefill natively, so Mistral is a ModelConfig + the shared forward/cache.

Decode applies the sliding window as a mask over the compressed cache
(forward_decode passes cfg.sliding_window into cache.attend /
attend_fused / raw_attend), matching HF Mistral's decode-time window
mask. The cache itself never evicts by window (neither does the
reference) — the window is a mask, bounded by ``max_len`` storage. The
fused kernel folds the window into its pad_start masking and requires
window >= spec.group (true for any real config: 4096 >> 64).
"""
from __future__ import annotations

from .llama import ModelConfig, forward_decode, forward_prefill, init_params  # noqa: F401


def mistral_7b() -> ModelConfig:
    return ModelConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_layers=32, num_heads=32, num_kv_heads=8, head_dim=128,
        rope_theta=10000.0, max_position_embeddings=32768,
        sliding_window=4096,
    )


def tiny(**kw) -> ModelConfig:
    base = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                sliding_window=32, max_position_embeddings=512)
    base.update(kw)
    return ModelConfig(**base)
