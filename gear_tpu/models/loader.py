"""Load HF Llama/Mistral checkpoints into gear_tpu param pytrees.

The reference loads weights via ``transformers.from_pretrained``
(GenerationTest/evaluation_gsm8k.py:409-452). Here we read safetensors /
torch .bin shards directly from a local directory into the functional param
layout of gear_tpu.models.llama (no network access required or attempted).

Name mapping (HF -> ours), per layer i:
  model.embed_tokens.weight                 -> embed
  model.layers.i.input_layernorm.weight     -> layers.attn_norm[i]
  model.layers.i.self_attn.{q,k,v}_proj.weight -> layers.w{q,k,v}[i] (transposed)
  model.layers.i.self_attn.o_proj.weight    -> layers.wo[i] (transposed)
  model.layers.i.post_attention_layernorm.weight -> layers.mlp_norm[i]
  model.layers.i.mlp.{gate,up,down}_proj.weight -> layers.w{g,u,d}[i] (transposed)
  model.norm.weight                         -> final_norm
  lm_head.weight                            -> lm_head (transposed)

HF stores Linear weights as [out, in]; our matmuls are x @ W so weights are
transposed on load.
"""
from __future__ import annotations

import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from .llama import ModelConfig


def _iter_tensors(model_dir: Path):
    """Yield (name, numpy array) from safetensors or torch .bin shards."""
    st_files = sorted(model_dir.glob("*.safetensors"))
    if st_files:
        try:
            from safetensors import safe_open  # type: ignore
        except ImportError:
            safe_open = None
        if safe_open is not None:
            for f in st_files:
                with safe_open(str(f), framework="np") as sf:
                    for name in sf.keys():
                        yield name, sf.get_tensor(name)
            return
        # Manual safetensors parsing (header is json; tensors are raw).
        for f in st_files:
            yield from _read_safetensors_manual(f)
        return
    bin_files = sorted(model_dir.glob("pytorch_model*.bin"))
    if not bin_files:
        raise FileNotFoundError(f"no safetensors/bin shards in {model_dir}")
    import torch

    for f in bin_files:
        state = torch.load(str(f), map_location="cpu", weights_only=True)
        for name, t in state.items():
            yield name, t.float().numpy()


_ST_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": None,  # bf16 special-cased
    "I32": np.int32, "I64": np.int64, "U8": np.uint8,
}


def _read_safetensors_manual(path: Path):
    with open(path, "rb") as f:
        header_len = int.from_bytes(f.read(8), "little")
        header = json.loads(f.read(header_len))
        base = 8 + header_len
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            start, end = meta["data_offsets"]
            f.seek(base + start)
            raw = f.read(end - start)
            dt = meta["dtype"]
            if dt == "BF16":
                u16 = np.frombuffer(raw, np.uint16).astype(np.uint32) << 16
                arr = u16.view(np.float32) if u16.dtype == np.float32 else \
                    np.frombuffer(u16.astype(np.uint32).tobytes(), np.float32)
                arr = arr.astype(np.float32)
            else:
                arr = np.frombuffer(raw, _ST_DTYPES[dt]).astype(np.float32)
            yield name, arr.reshape(meta["shape"])


def load_config(model_dir: str | os.PathLike) -> ModelConfig:
    with open(Path(model_dir) / "config.json") as f:
        return ModelConfig.from_hf(json.load(f))


def load_params(model_dir: str | os.PathLike, cfg: ModelConfig | None = None,
                dtype=jnp.bfloat16) -> tuple[ModelConfig, dict]:
    """Read a local HF checkpoint directory -> (ModelConfig, params pytree)."""
    model_dir = Path(model_dir)
    if cfg is None:
        cfg = load_config(model_dir)
    l = cfg.num_layers
    layers: dict[str, list] = {
        k: [None] * l
        for k in ("attn_norm", "mlp_norm", "wq", "wk", "wv", "wo",
                  "wg", "wu", "wd")
    }
    top: dict[str, np.ndarray] = {}

    name_map = {
        "input_layernorm.weight": ("attn_norm", False),
        "post_attention_layernorm.weight": ("mlp_norm", False),
        "self_attn.q_proj.weight": ("wq", True),
        "self_attn.k_proj.weight": ("wk", True),
        "self_attn.v_proj.weight": ("wv", True),
        "self_attn.o_proj.weight": ("wo", True),
        "mlp.gate_proj.weight": ("wg", True),
        "mlp.up_proj.weight": ("wu", True),
        "mlp.down_proj.weight": ("wd", True),
    }

    for name, arr in _iter_tensors(model_dir):
        if name == "model.embed_tokens.weight":
            top["embed"] = arr
        elif name == "model.norm.weight":
            top["final_norm"] = arr
        elif name == "lm_head.weight":
            top["lm_head"] = arr.T
        elif name.startswith("model.layers."):
            rest = name[len("model.layers."):]
            idx_s, _, tail = rest.partition(".")
            if tail in name_map:
                key, transpose = name_map[tail]
                layers[key][int(idx_s)] = arr.T if transpose else arr

    for key, vals in layers.items():
        missing = [i for i, v in enumerate(vals) if v is None]
        if missing:
            raise ValueError(f"missing layer tensors for {key}: {missing}")

    params = {
        "embed": jnp.asarray(top["embed"], dtype),
        "layers": {
            k: jnp.asarray(np.stack(v), dtype) for k, v in layers.items()
        },
        "final_norm": jnp.asarray(top["final_norm"], dtype),
    }
    if cfg.tie_word_embeddings:
        pass  # logits reuse embed
    elif "lm_head" in top:
        params["lm_head"] = jnp.asarray(top["lm_head"], dtype)
    else:
        raise ValueError("checkpoint has no lm_head and config does not tie")
    return cfg, params
