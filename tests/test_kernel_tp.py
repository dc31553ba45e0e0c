"""Fused Pallas decode kernel under a TP mesh: the custom_partitioning on
decode_attention shards every operand along BH, so a sharded engine's
generation must be token-identical to the unsharded one (and the kernel
runs on local heads without collectives)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gear_tpu.config import CompressionConfig
from gear_tpu.engine import EngineConfig, InferenceEngine
from gear_tpu.models import llama


def _engine():
    cfg = llama.ModelConfig(vocab_size=256, hidden_size=128,
                            intermediate_size=256, num_layers=2,
                            num_heads=8, num_kv_heads=4, head_dim=32)
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    comp = CompressionConfig(num_layers=2, compress_method="GEARL",
                             quantize_bit=8, group_size=64, rank=2,
                             prefill_rank=2, loop=2)
    return InferenceEngine(
        cfg, params, comp,
        EngineConfig(max_len=128, mode="fused",
                     attn_impl="pallas_interpret"),
        batch_size=1)


def test_sharded_fused_kernel_matches_unsharded():
    out0 = _engine().generate([[1, 2, 3, 4, 5]], 8)
    eng = _engine()
    eng.shard(Mesh(np.array(jax.devices()).reshape(2, 4),
                   ("data", "model")))
    out1 = eng.generate([[1, 2, 3, 4, 5]], 8)
    assert out0 == out1
