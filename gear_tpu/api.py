"""Top-level drop-in API: load a HF checkpoint, generate with compression.

The reference exposes its recipe as drop-in ``*ForCausalLM`` classes
(GEARLM/__init__.py:1-9) that ride HF ``from_pretrained`` + ``generate``.
The TPU-native equivalent is :class:`GearLM`: one object that owns the
loaded weights and a compiled :class:`gear_tpu.engine.InferenceEngine`, with
the same two-call user story::

    from gear_tpu import GearLM, CompressionConfig

    lm = GearLM.from_pretrained(
        "/path/to/llama-checkpoint",
        CompressionConfig(compress_method="GEAR", quantize_bit=2, rank=2,
                          prefill_rank=4, left=0.02, num_layers=32),
        max_len=4096, batch_size=8)
    out_ids = lm.generate(prompt_ids, max_new_tokens=256)

Unlike the reference (which forks the whole HF model per method), the
compression recipe here is pure config: every method family
(GEAR/GEARL/KCVT/KIVI/UNIFORM/NONE, per-layer overrides) runs through the
same engine.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax

from .config import CompressionConfig
from .engine import EngineConfig, InferenceEngine
from .models import llama, loader


@dataclass
class GearLM:
    """Weights + compiled engine behind an HF-style generate API."""

    cfg: llama.ModelConfig
    params: dict
    comp: CompressionConfig
    engine_cfg: EngineConfig = field(default_factory=EngineConfig)
    batch_size: int = 1
    _engine: InferenceEngine | None = None

    @classmethod
    def from_pretrained(
        cls,
        model_dir: str,
        compression_config: CompressionConfig | None = None,
        *,
        max_len: int = 2048,
        batch_size: int = 1,
        mode: str | None = None,
        attn_impl: str | None = None,
        eos_token_id: int | None = None,
        pad_token_id: int = 0,
        temperature: float = 0.0,
        dtype=None,
    ) -> "GearLM":
        """Load a local HF Llama/Mistral-family checkpoint (safetensors or
        torch .bin, models/loader.py) and build the engine.

        ``mode`` defaults to the natural path for the config: ``fused``
        (true compression) unless the method needs the simulated hook.
        Reference analog: evaluation_gsm8k.py:409-452 model load +
        CompressionConfig build (:380-407).
        """
        cfg = loader.load_config(model_dir)
        kw = {} if dtype is None else {"dtype": dtype}
        cfg, params = loader.load_params(model_dir, cfg, **kw)
        if dtype is not None:
            cfg = cfg.__class__(**{**cfg.__dict__, "dtype": dtype})
        comp = compression_config or CompressionConfig(
            num_layers=cfg.num_layers)
        if mode is None:
            mode = "fused" if comp.compress_method != "NONE" else "raw"
        if attn_impl is None:
            # heads_per_step=4 measured fastest on v5e at 8k ctx (kbench);
            # clamp to the head count for small models.
            hb = min(4, cfg.num_kv_heads)
            attn_impl = (f"pallas@{hb}" if jax.default_backend() == "tpu"
                         else "xla")
        ecfg = EngineConfig(max_len=max_len, mode=mode,
                            eos_token_id=eos_token_id,
                            pad_token_id=pad_token_id,
                            temperature=temperature, attn_impl=attn_impl)
        return cls(cfg=cfg, params=params, comp=comp, engine_cfg=ecfg,
                   batch_size=batch_size)

    @property
    def engine(self) -> InferenceEngine:
        if self._engine is None:
            self._engine = InferenceEngine(
                self.cfg, self.params, self.comp, self.engine_cfg,
                batch_size=self.batch_size)
        return self._engine

    def shard(self, mesh) -> "GearLM":
        """Shard weights + caches over a device mesh (TP/DP axes)."""
        self.engine.shard(mesh)
        return self

    def generate(
        self,
        input_ids: Sequence[Sequence[int]] | Sequence[int],
        max_new_tokens: int = 128,
        *,
        prng: jax.Array | None = None,
        echo_prompt: bool = False,
    ) -> list[list[int]]:
        """Batch greedy/sampled generation (HF ``generate`` analog).

        Accepts one prompt (list of ints) or a batch; pads left like the
        reference harness (evaluation_gsm8k.py:463-529).
        """
        one = bool(input_ids) and isinstance(input_ids[0], int)
        batch = [list(input_ids)] if one else [list(t) for t in input_ids]
        if len(batch) != self.batch_size:
            raise ValueError(
                f"engine compiled for batch {self.batch_size}, "
                f"got {len(batch)} prompts")
        out = self.engine.generate(batch, max_new_tokens, prng=prng,
                                   echo_prompt=echo_prompt)
        return out[0] if one else out
