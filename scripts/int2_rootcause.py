"""INT2-collapse root cause: reconstruction error of OUR compression vs the
REFERENCE torch implementation on the SAME KV tensors captured from the
tiny_arith model, plus signal-to-quant-error ratios per bit width.

Evidence backing runs/tiny_arith/ROOTCAUSE.md (VERDICT r3 task 4).
"""
import importlib.util, json, sys, os
from pathlib import Path
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import torch

REF = "/root/reference/GenerationBench/GenerationTest/GEARLM/Simulated/compress_function.py"
spec = importlib.util.spec_from_file_location("refsim", REF)
refsim = importlib.util.module_from_spec(spec); spec.loader.exec_module(refsim)

from gear_tpu.eval import synth
from gear_tpu.models import llama
from gear_tpu.core import simulated

RUN = Path(__file__).resolve().parents[1] / "runs" / "tiny_arith"
kw = json.loads((RUN / "model.json").read_text())
cfg = llama.ModelConfig(**kw)
params = synth.load_params(RUN / "params.pkl")
tok = synth.CharTokenizer()
rows = [json.loads(l) for l in (RUN / "test.jsonl").read_text().splitlines()][:4]
prompt = "Q: " + rows[0]["question"] + "\nA:"
ids = jnp.asarray([tok.encode(prompt * 6)])  # ~a few hundred tokens

# capture per-layer K/V from a real forward pass
caches = llama.forward_prefill_capture_kv if hasattr(llama, "forward_prefill_capture_kv") else None
# fall back: run forward_prefill with raw cache and read k/v leaves
from gear_tpu import cache as C
spec_raw = cfg.cache_spec(1, 512, __import__("gear_tpu.config", fromlist=["CompressionConfig"]).CompressionConfig(num_layers=cfg.num_layers).layer(0))
pos = jnp.arange(ids.shape[1])[None]
# use the model's raw prefill path
mask = jnp.ones_like(ids)
out = llama.forward_prefill(params, cfg, ids, pos, mask, spec_raw, compress=False)
logits, rawcaches = out
k = np.asarray(rawcaches.k[1][:, :, :ids.shape[1]], np.float32)  # layer 1
v = np.asarray(rawcaches.v[1][:, :, :ids.shape[1]], np.float32)
S = (k.shape[2] // 32) * 32
k, v = k[:, :, :S], v[:, :, :S]
print("KV shape", k.shape, "k std", k.std(), "v std", v.std())

def rel(a, b):
    return float(np.abs(a - b).mean() / np.abs(b).mean())

report = {"kv_shape": list(k.shape)}
for bits in (2, 4):
    ref_k = refsim.gears_channelQ(torch.from_numpy(k.copy()), bits, 32, 0.02).float().numpy()
    ref_v = refsim.gears_tokenQ(torch.from_numpy(v.copy()), bits, 32, 0.02).float().numpy()
    our_k = np.asarray(simulated.outlier_channel_quant(jnp.asarray(k), bits, 32, 0.02), np.float32)
    our_v = np.asarray(simulated.outlier_token_quant(jnp.asarray(v), bits, 32, 0.02), np.float32)
    report[f"int{bits}"] = {
        "ref_recon_relerr_k": rel(ref_k, k), "our_recon_relerr_k": rel(our_k, k),
        "ref_recon_relerr_v": rel(ref_v, v), "our_recon_relerr_v": rel(our_v, v),
        "ours_vs_ref_k": rel(our_k, ref_k), "ours_vs_ref_v": rel(our_v, ref_v),
    }
    print(bits, report[f"int{bits}"])
(RUN / "rootcause_recon.json").write_text(json.dumps(report, indent=2))
print("wrote", RUN / "rootcause_recon.json")
