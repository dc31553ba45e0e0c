"""Export the in-sandbox-trained tiny_arith checkpoint to HF format.

Produces runs/tiny_arith_hf/ containing:
  config.json        — HF LlamaConfig keys (+ "gear_tpu_tokenizer": "char")
  model.safetensors  — HF tensor names, [out, in] Linear layout
  gsm8k_test.jsonl   — the synthetic GSM8K-style test split

so that ``python -m gear_tpu.eval.run`` (and any HF-checkpoint tooling that
reads safetensors) can load it with NO user-supplied paths — the turnkey
real-model smoke the reference's published path requires weights for
(evaluation_gsm8k.py:409-452). Round-trips through gear_tpu.models.loader.
"""
import json
import shutil
import struct
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

RUN_DIR = Path(__file__).resolve().parents[1] / "runs" / "tiny_arith"
OUT_DIR = Path(__file__).resolve().parents[1] / "runs" / "tiny_arith_hf"


def write_safetensors(path: Path, tensors: dict[str, np.ndarray]) -> None:
    """Minimal safetensors writer (format: 8-byte LE header len, JSON header
    with dtype/shape/data_offsets, then raw little-endian tensor bytes)."""
    header = {}
    offset = 0
    blobs = []
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        blob = arr.tobytes()
        header[name] = {"dtype": "F32", "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(blob)]}
        offset += len(blob)
        blobs.append(blob)
    hjson = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for blob in blobs:
            f.write(blob)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env
    from gear_tpu.eval import synth

    kw = json.loads((RUN_DIR / "model.json").read_text())
    params = synth.load_params(RUN_DIR / "params.pkl")

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "vocab_size": kw["vocab_size"],
        "hidden_size": kw["hidden_size"],
        "intermediate_size": kw["intermediate_size"],
        "num_hidden_layers": kw["num_layers"],
        "num_attention_heads": kw["num_heads"],
        "num_key_value_heads": kw["num_kv_heads"],
        "head_dim": kw["head_dim"],
        "max_position_embeddings": kw["max_position_embeddings"],
        "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "torch_dtype": "float32",
        "gear_tpu_tokenizer": "char",   # no HF tokenizer files: use
                                        # gear_tpu.eval.synth.CharTokenizer
    }
    (OUT_DIR / "config.json").write_text(json.dumps(cfg, indent=2))

    def np32(x):
        return np.asarray(x, np.float32)

    tensors = {
        "model.embed_tokens.weight": np32(params["embed"]),
        "model.norm.weight": np32(params["final_norm"]),
        "lm_head.weight": np32(params["lm_head"]).T,
    }
    lay = params["layers"]
    name_map = {   # ours -> (HF tail, transpose back to [out, in])
        "attn_norm": ("input_layernorm.weight", False),
        "mlp_norm": ("post_attention_layernorm.weight", False),
        "wq": ("self_attn.q_proj.weight", True),
        "wk": ("self_attn.k_proj.weight", True),
        "wv": ("self_attn.v_proj.weight", True),
        "wo": ("self_attn.o_proj.weight", True),
        "wg": ("mlp.gate_proj.weight", True),
        "wu": ("mlp.up_proj.weight", True),
        "wd": ("mlp.down_proj.weight", True),
    }
    for ours, (tail, tr) in name_map.items():
        stacked = np32(lay[ours])
        for i in range(kw["num_layers"]):
            arr = stacked[i].T if tr else stacked[i]
            tensors[f"model.layers.{i}.{tail}"] = arr
    write_safetensors(OUT_DIR / "model.safetensors", tensors)
    shutil.copy(RUN_DIR / "test.jsonl", OUT_DIR / "gsm8k_test.jsonl")

    # round-trip check through the loader
    from gear_tpu.models import loader
    import jax.numpy as jnp
    mcfg, re_params = loader.load_params(OUT_DIR, dtype=jnp.float32)
    ok = np.allclose(np.asarray(re_params["layers"]["wq"]),
                     np32(lay["wq"]), atol=1e-6)
    assert ok, "loader round-trip mismatch"
    print(f"exported {len(tensors)} tensors to {OUT_DIR} (round-trip OK)")


if __name__ == "__main__":
    main()
