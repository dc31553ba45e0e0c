"""End-to-end eval CLI test on a tiny checkpoint + synthetic dataset."""
import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ckpt_and_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalcli")
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False)
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).save_pretrained(
        root / "ckpt", safe_serialization=True)
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(vocab={chr(i): i for i in range(32, 127)},
                               merges=[]))
    tok.pre_tokenizer = pre_tokenizers.Split("", "isolated")
    PreTrainedTokenizerFast(tokenizer_object=tok, eos_token="~",
                            pad_token="!").save_pretrained(root / "ckpt")
    with open(root / "gsm8k.jsonl", "w") as f:
        for i in range(3):
            f.write(json.dumps({"question": f"What is {i}+{i}?",
                                "answer": f"#### {2*i}"}) + "\n")
    return root


def test_cli_simulated_gear(ckpt_and_data):
    from gear_tpu.eval import run as evalrun

    root = ckpt_and_data
    evalrun.main([
        "--model", str(root / "ckpt"), "--task", "gsm8k",
        "--data", str(root / "gsm8k.jsonl"),
        "--compress_method", "GEAR", "--quantize_bit", "8",
        "--group_size", "16", "--streaming", "--mode", "simulated",
        "--batch_size", "2", "--max_new_tokens", "6", "--max_len", "128",
        "--limit", "3", "--out_dir", str(root / "out")])
    results = list((root / "out").glob("results_*.json"))
    assert results
    payload = json.loads(results[0].read_text())
    assert payload["results"][0]["n"] == 3
    assert payload["config"]["compress_method"] == "GEAR"
