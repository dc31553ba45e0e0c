"""Synthetic GSM8K-style arithmetic: dataset + char tokenizer + tiny trainer.

The sandbox has no model weights and no egress, so the reference's accuracy
protocol (GSM8K CoT accuracy, compressed vs FP16 — evaluation_gsm8k.py:380-452)
cannot run on Llama checkpoints here. This module reproduces the protocol
end-to-end on the largest model constructible in-sandbox: a character-level
Llama (same gear_tpu model code) TRAINED on templated arithmetic word
problems, evaluated with the same harness (eval/harness.py GSM8K task: last-
number extraction, '#### N' golds), with compression on vs off.

A trained model gives a *real* Δ-accuracy signal: quantization noise can flip
a computed digit, unlike a random-init model whose accuracy is 0 either way.
"""
from __future__ import annotations

import json
import random
from dataclasses import dataclass
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# Char tokenizer (HF-tokenizer-compatible surface for eval.harness).
# ---------------------------------------------------------------------------

_VOCAB = (
    "\n !\"#$%&'()*+,-./0123456789:;<=>?"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "abcdefghijklmnopqrstuvwxyz"
)


class CharTokenizer:
    """Byte-simple char tokenizer. id 0 = PAD, id 1 = UNK, chars from 2."""

    pad_token_id = 0
    unk_token_id = 1

    def __init__(self, vocab: str = _VOCAB):
        self.itos = ["<pad>", "<unk>"] + list(vocab)
        self.stoi = {c: i + 2 for i, c in enumerate(vocab)}

    @property
    def vocab_size(self) -> int:
        return len(self.itos)

    def encode(self, text: str) -> list[int]:
        return [self.stoi.get(c, 1) for c in text]

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i < 2:
                if not skip_special_tokens:
                    out.append(self.itos[i])
                continue
            out.append(self.itos[i])
        return "".join(out)


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

_NAMES = ["Tom", "Ann", "Sam", "Liz", "Max", "Joy", "Ben", "Eva"]
_ITEMS = ["apples", "coins", "books", "cards", "pens", "shells"]

_TEMPLATES = [
    # (question_fmt, cot_fn(a, b) -> (cot_text, answer))
    ("{n} has {a} {it}. {n} gets {b} more. How many {it} does {n} have now?",
     lambda a, b: (f"{a} + {b} = {a + b}.", a + b)),
    ("{n} has {a} {it}. {n} gives away {b}. How many {it} are left?",
     lambda a, b: (f"{a} - {b} = {a - b}.", a - b)),
    ("{n} has {a} bags with {b} {it} each. How many {it} in total?",
     lambda a, b: (f"{a} * {b} = {a * b}.", a * b)),
    ("{n} has {a} {it} and finds {b} more, then loses 3. How many now?",
     lambda a, b: (f"{a} + {b} = {a + b}. {a + b} - 3 = {a + b - 3}.",
                   a + b - 3)),
]


def make_problem(rng: random.Random) -> dict:
    t, cot_fn = _TEMPLATES[rng.randrange(len(_TEMPLATES))]
    name = _NAMES[rng.randrange(len(_NAMES))]
    item = _ITEMS[rng.randrange(len(_ITEMS))]
    # Small operand ranges: the in-sandbox model is a 4-layer char LM; the
    # protocol needs a high uncompressed baseline accuracy so compression
    # deltas carry signal (not generalization difficulty).
    if "each" in t:
        a, b = rng.randint(2, 9), rng.randint(2, 9)
    else:
        a, b = rng.randint(4, 19), rng.randint(2, 9)
        if a < b:
            a, b = b, a
    q = t.format(n=name, a=a, b=b, it=item)
    cot, ans = cot_fn(a, b)
    return {"question": q,
            "answer": f"{cot} #### {ans}",
            "completion": f"{cot} The answer is {ans}\n"}


def make_dataset(n: int, seed: int = 0) -> list[dict]:
    rng = random.Random(seed)
    return [make_problem(rng) for _ in range(n)]


def write_jsonl(rows: list[dict], path: str | Path):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


# The SAME template the eval harness prepends (harness.CoTTask default).
QUESTION_TEMPLATE = "Question: {q}\nLet's think step by step\n"


def render_example(row: dict) -> str:
    return QUESTION_TEMPLATE.format(q=row["question"]) + row["completion"]


# ---------------------------------------------------------------------------
# Trainer (next-token LM on the rendered examples)
# ---------------------------------------------------------------------------

@dataclass
class TrainSpec:
    seq_len: int = 160
    batch: int = 64
    steps: int = 1500
    lr: float = 1e-3
    warmup: int = 100
    seed: int = 0


def batches(rows, tok: CharTokenizer, spec: TrainSpec):
    """Yield (tokens [B,S], loss_mask [B,S]) forever; answer positions only
    are trained a bit harder by masking the question? — no: full-LM loss,
    simple and sufficient for this scale."""
    rng = np.random.default_rng(spec.seed)
    enc = [tok.encode(render_example(r))[: spec.seq_len] for r in rows]
    while True:
        idx = rng.integers(0, len(enc), spec.batch)
        x = np.zeros((spec.batch, spec.seq_len), np.int32)
        m = np.zeros((spec.batch, spec.seq_len), np.int32)
        for j, i in enumerate(idx):
            e = enc[i]
            x[j, : len(e)] = e
            m[j, : len(e)] = 1
        yield x, m


def train(cfg, params, rows, tok: CharTokenizer, spec: TrainSpec,
          log_every: int = 100, log=print):
    """AdamW next-token training of a gear_tpu llama on rendered examples.

    Right-padded batches; loss over non-pad next-token targets. Returns the
    trained params. Runs on whatever jax backend is active (TPU or CPU).
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import llama

    warmup = min(spec.warmup, max(spec.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, spec.lr, warmup, spec.steps + warmup, end_value=spec.lr * 0.1)
    opt = optax.adamw(sched, weight_decay=0.01)
    state = opt.init(params)

    def loss_fn(p, x, m):
        positions = jnp.cumsum(m, axis=1) - 1
        logits, _ = llama.forward_prefill(
            p, cfg, x, jnp.maximum(positions, 0), m, None, compress=False)
        logits = logits[:, :-1]
        targets = x[:, 1:]
        tmask = m[:, 1:].astype(jnp.float32)
        ll = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(ll, targets[..., None], axis=-1)[..., 0]
        return (nll * tmask).sum() / tmask.sum()

    @jax.jit
    def step(p, s, x, m):
        loss, grads = jax.value_and_grad(loss_fn)(p, x, m)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return p, s, loss

    it = batches(rows, tok, spec)
    for i in range(spec.steps):
        x, m = next(it)
        params, state, loss = step(params, state, jnp.asarray(x),
                                   jnp.asarray(m))
        if log_every and (i % log_every == 0 or i == spec.steps - 1):
            log(f"step {i}: loss {float(loss):.4f}")
    return params


def save_params(params, path: str | Path):
    import jax
    import pickle
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(jax.tree.map(lambda x: np.asarray(x), params), f)


def load_params(path: str | Path, dtype=None):
    import jax.numpy as jnp
    import pickle
    with open(path, "rb") as f:
        tree = pickle.load(f)
    import jax
    return jax.tree.map(
        lambda x: jnp.asarray(x, dtype) if dtype and x.dtype.kind == "f"
        else jnp.asarray(x), tree)
