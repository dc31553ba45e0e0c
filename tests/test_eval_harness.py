"""Eval harness tests with a mock generate function and an end-to-end tiny
model run (no network; datasets are synthetic)."""
import json

import pytest

from gear_tpu.eval import harness


def test_extract_last_number():
    assert harness.extract_last_number("so the answer is 42.") == "42"
    assert harness.extract_last_number("2,345 dollars total") == "2345"
    assert harness.extract_last_number("x = 3.5 then 7") == "7"
    assert harness.extract_last_number("no numbers") is None


def test_extract_gold_gsm8k():
    assert harness.extract_gold_gsm8k("blah blah\n#### 72") == "72"
    assert harness.extract_gold_gsm8k("#### 1,234") == "1234"


def test_extract_option_letter():
    assert harness.extract_option_letter("the answer is (B).") == "B"
    assert harness.extract_option_letter("So the answer is C") == "C"
    assert harness.extract_option_letter("pick (D) maybe") == "D"
    assert harness.extract_option_letter("dunno") is None


def test_numbers_equal():
    assert harness.numbers_equal("42", "42.0")
    assert not harness.numbers_equal("42", "43")
    assert not harness.numbers_equal(None, "1")


def test_run_eval_with_mock_engine(tmp_path):
    rows = [
        {"question": "2+2?", "answer": "it is\n#### 4"},
        {"question": "3+4?", "answer": "#### 7"},
        {"question": "5*5?", "answer": "#### 25"},
    ]

    def fake_gen(prompts, max_new):
        outs = []
        for p in prompts:
            if "2+2" in p:
                outs.append("2+2 = 4. The answer is 4\nQuestion: leak")
            elif "3+4" in p:
                outs.append("I think 8")  # wrong
            else:
                outs.append("25 is the answer: 25")
        return outs

    res = harness.run_eval(harness.GSM8K, rows, fake_gen, batch_size=2)
    assert res.n == 3 and res.correct == 2
    assert abs(res.accuracy - 2 / 3) < 1e-9

    out = harness.write_results([res], tmp_path, {"cfg": 1})
    payload = json.loads(out.read_text())
    assert payload["results"][0]["correct"] == 2
    assert 0 < payload["macro_accuracy"] < 1


def test_bbh_task_kinds():
    mc = harness.bbh_task("snarks", True)
    assert mc.match_fn(mc.pred_fn("the answer is (A)"), mc.gold_fn("(A)"))
    ff = harness.bbh_task("word_sorting", False)
    assert ff.match_fn(ff.pred_fn("the answer is apple banana."),
                       ff.gold_fn("apple banana"))


def test_engine_generate_fn_end_to_end():
    """Tiny model + real tokenizer-less path: use a trivial tokenizer stub."""
    import jax
    from gear_tpu.config import CompressionConfig
    from gear_tpu.engine import EngineConfig, InferenceEngine
    from gear_tpu.models import llama

    cfg = llama.ModelConfig.tiny()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    comp = CompressionConfig(num_layers=cfg.num_layers, compress_method="NONE")
    eng = InferenceEngine(cfg, params, comp,
                          EngineConfig(max_len=64, mode="raw"), batch_size=2)

    class Tok:
        def encode(self, s):
            return [ord(c) % 250 + 1 for c in s][:16]

        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(i) for i in ids)

    gen = harness.engine_generate_fn(eng, Tok())
    outs = gen(["hello world"], 4)  # single prompt padded to batch 2
    assert len(outs) == 1
    assert len(outs[0].split()) == 4
