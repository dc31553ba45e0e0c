"""Top-level drop-in API (gear_tpu.GearLM): the reference's GEARLM exports
(GEARLM/__init__.py:1-9) as one from_pretrained + generate facade."""
import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_llama_api")
    model.save_pretrained(path, safe_serialization=True)
    return path


def test_gearlm_generate_none_vs_gear(tiny_ckpt):
    import gear_tpu
    from gear_tpu import CompressionConfig

    prompt = [1, 17, 42, 99, 3, 7, 55, 21]

    lm_none = gear_tpu.GearLM.from_pretrained(
        tiny_ckpt, CompressionConfig(num_layers=2, compress_method="NONE"),
        max_len=128, dtype=jnp.float32)
    out_none = lm_none.generate(prompt, max_new_tokens=8)
    assert lm_none.engine_cfg.mode == "raw"
    assert len(out_none) == 8 and all(isinstance(t, int) for t in out_none)

    lm_gear = gear_tpu.GearLM.from_pretrained(
        tiny_ckpt,
        CompressionConfig(num_layers=2, compress_method="GEARL",
                          quantize_bit=8, rank=2, prefill_rank=2,
                          group_size=32),
        max_len=128, dtype=jnp.float32)
    assert lm_gear.engine_cfg.mode == "fused"
    out_gear = lm_gear.generate(prompt, max_new_tokens=8)
    assert len(out_gear) == 8
    # INT8 + rank-2 error correction on a tiny model: greedy tokens track
    # the uncompressed run closely (same class of check as the reference's
    # accuracy protocol — compressed vs NONE).
    agree = sum(a == b for a, b in zip(out_none, out_gear))
    assert agree >= 6, (out_none, out_gear)


def test_gearlm_batch_shape_guard(tiny_ckpt):
    import gear_tpu

    lm = gear_tpu.GearLM.from_pretrained(tiny_ckpt, max_len=64,
                                         batch_size=1, dtype=jnp.float32)
    with pytest.raises(ValueError):
        lm.generate([[1, 2], [3, 4]], max_new_tokens=2)
