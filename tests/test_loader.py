"""HF checkpoint loading parity: our functional Llama must reproduce
transformers' logits on a tiny random checkpoint (CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_hf_checkpoint(tmp_path_factory):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("tiny_llama")
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_loader_logits_match_transformers(tiny_hf_checkpoint):
    from gear_tpu.models import llama, loader

    path, hf_model = tiny_hf_checkpoint
    cfg, params = loader.load_params(path, dtype=jnp.float32)
    assert cfg.num_layers == 2 and cfg.num_kv_heads == 2

    tokens = np.array([[1, 17, 42, 99, 3, 7, 55, 21]], np.int64)
    with torch.no_grad():
        want = hf_model(torch.from_numpy(tokens)).logits.float().numpy()

    tok = jnp.asarray(tokens, jnp.int32)
    mask = jnp.ones_like(tok)
    positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
    cfgf = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})
    logits, _ = llama.forward_prefill(params, cfgf, tok, positions, mask, None)
    got = np.asarray(logits)

    # Same argmax everywhere and close logits.
    np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_loader_generation_matches_transformers(tiny_hf_checkpoint):
    """Greedy decode through our engine == HF generate on the same ckpt."""
    from gear_tpu.config import CompressionConfig
    from gear_tpu.engine import EngineConfig, InferenceEngine
    from gear_tpu.models import loader

    path, hf_model = tiny_hf_checkpoint
    cfg, params = loader.load_params(path, dtype=jnp.float32)
    cfgf = cfg.__class__(**{**cfg.__dict__, "dtype": jnp.float32})

    prompt = [1, 17, 42, 99, 3]
    with torch.no_grad():
        want = hf_model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
            pad_token_id=0).numpy()[0, len(prompt):].tolist()

    comp = CompressionConfig(num_layers=cfg.num_layers, compress_method="NONE")
    eng = InferenceEngine(cfgf, params, comp,
                          EngineConfig(max_len=128, mode="raw"), batch_size=1)
    got = eng.generate([prompt], 8)[0]
    assert got == want, f"ours={got} hf={want}"
