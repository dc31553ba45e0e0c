"""bf16 flash-decode Pallas kernel vs the XLA raw attention (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from gear_tpu import cache as C
from gear_tpu.kernels import flash as F
from gear_tpu.models import llama as L


def mk_spec(**kw):
    base = dict(batch=2, num_kv_heads=2, head_dim=128, max_len=256, bits=4,
                group=64, rank=2, prefill_rank=4, lowrank_loop=3,
                dtype=jnp.float32, sideband_dtype=jnp.float32)
    base.update(kw)
    return C.CacheSpec(**base)


@pytest.mark.parametrize("s", [256, 193])
def test_flash_matches_raw_attend(rng, s):
    spec = mk_spec()
    shape = (spec.batch, spec.num_kv_heads, s, spec.head_dim)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    c = L.raw_prefill(spec, k, v)
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 4, 1, spec.head_dim)).astype(np.float32))
    want = L.raw_attend(spec, c, q)
    got = F.raw_attend_flash(spec, c, q, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)


def test_flash_pad_start(rng):
    spec = mk_spec()
    shape = (spec.batch, spec.num_kv_heads, 256, spec.head_dim)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    c = L.raw_prefill(spec, k, v)
    q = jnp.asarray(
        rng.standard_normal((spec.batch, 2, 1, spec.head_dim)).astype(np.float32))
    pad = jnp.asarray([0, 70], jnp.int32)
    want = L.raw_attend(spec, c, q, pad_start=pad)
    got = F.raw_attend_flash(spec, c, q, pad_start=pad, chunk=128,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=8e-3)
