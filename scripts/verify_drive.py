import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from gear_tpu.config import CompressionConfig
from gear_tpu.engine import EngineConfig, InferenceEngine
from gear_tpu.models import llama
cfg = llama.ModelConfig(vocab_size=512, hidden_size=128, intermediate_size=256,
                        num_layers=4, num_heads=8, num_kv_heads=4, head_dim=32)
params = llama.init_params(jax.random.PRNGKey(0), cfg)
comp = CompressionConfig(num_layers=cfg.num_layers, compress_method="GEARL",
                         quantize_bit=8, group_size=64, rank=2, prefill_rank=4, loop=2)
eng = InferenceEngine(cfg, params, comp, EngineConfig(max_len=256, mode="fused"), batch_size=2)
fused = eng.generate([[1,2,3,4,5,6,7],[10,11,12]], 40)
eng2 = InferenceEngine(cfg, params, comp, EngineConfig(max_len=256, mode="raw"), batch_size=2)
raw = eng2.generate([[1,2,3,4,5,6,7],[10,11,12]], 40)
print("VERIFY:", "MATCH" if fused == raw else "DIVERGED")
