"""Inference engine: bucketed prefill + single-compile decode loop.

The reference delegates generation to HF ``transformers.generate`` (survey §1:
"the reference does not implement its own decode loop"). Here the loop is
TPU-native: one jitted decode step (static shapes, compressed-cache append +
attend + lax.cond flush inside), a python driver that only syncs with the
device every ``sync_every`` steps, and left-padded batches like the
reference's eval harness (evaluation_gsm8k.py:463-529).

Modes:
  * ``fused``     — two-tier compressed cache (the speed+memory path).
  * ``raw``       — uncompressed bf16 cache (fp16-baseline parity).
  * ``simulated`` — raw cache + fake-quant recompression: whole prompt at
    prefill, then a sliding ``streaming_gap`` window during decode
    (stream_grouping semantics, modeling_llama_new.py:973-996) — the
    accuracy-measurement path.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import CompressionConfig
from .core import simulated
from .models import llama


@dataclass(frozen=True)
class EngineConfig:
    max_len: int = 2048
    mode: str = "fused"            # fused | raw | simulated | h2o | sink
    eos_token_id: int | None = None
    pad_token_id: int = 0
    temperature: float = 0.0       # 0 = greedy
    sync_every: int = 16           # host<->device sync cadence for early exit
    use_lowrank: bool = True
    attn_impl: str = "xla"         # fused-mode decode attention backend


class InferenceEngine:
    """Holds params + compiled prefill/decode functions for one model."""

    def __init__(
        self,
        model_cfg: llama.ModelConfig,
        params: dict,
        comp: CompressionConfig | None = None,
        engine_cfg: EngineConfig = EngineConfig(),
        batch_size: int = 1,
    ):
        self.cfg = model_cfg
        self.params = params
        self.comp = comp or CompressionConfig(num_layers=model_cfg.num_layers)
        self.ecfg = engine_cfg
        self.batch = batch_size
        lcomp = self.comp.layer(0)
        if engine_cfg.max_len % lcomp.group_size:
            raise ValueError("max_len must be a multiple of group_size")
        win = model_cfg.sliding_window
        if win is not None and win < lcomp.group_size:
            # attend/attend_fused would raise the same constraint only at
            # call time, mid-generation (decode.py window handling): the
            # residual tier (up to group_size most-recent tokens) must fit
            # entirely inside the attention window.
            raise ValueError(
                f"sliding_window {win} < group_size {lcomp.group_size}: "
                "the compressed cache masks the window over the packed "
                "prefix only; use group_size <= sliding_window")
        self.spec = model_cfg.cache_spec(batch_size, engine_cfg.max_len, lcomp)
        if engine_cfg.mode == "h2o":
            from . import h2o
            self.hspec = h2o.H2OSpec(
                batch=batch_size, num_kv_heads=model_cfg.num_kv_heads,
                head_dim=model_cfg.head_dim,
                budget=lcomp.important_size + lcomp.recent_size,
                important=lcomp.important_size, dtype=model_cfg.dtype)
        elif engine_cfg.mode == "sink":
            from . import sink
            self.sspec = sink.SinkSpec(
                batch=batch_size, num_kv_heads=model_cfg.num_kv_heads,
                head_dim=model_cfg.head_dim, num_sink=lcomp.sink_size,
                window=lcomp.window_size, rope_theta=model_cfg.rope_theta,
                dtype=model_cfg.dtype)
        self._prefill_fns: dict[int, Any] = {}
        self._decode_fn = None
        self._decode_seq_fn = None
        self._recompress_fn = None
        self.mesh = None
        self.seq_mesh = None
        self.seq_axis = "seq"

    def shard(self, mesh) -> "InferenceEngine":
        """Place params on a (data, model) mesh; caches inherit shardings
        through jit propagation plus explicit constraints in the dryrun path
        (gear_tpu.parallel.sharding for the rules)."""
        from .parallel import sharding as sh

        self.params = sh.shard_params(mesh, self.params)
        self.mesh = mesh
        return self

    def shard_seq(self, mesh, axis: str = "seq") -> "InferenceEngine":
        """Enable SEQUENCE-PARALLEL decode (context parallelism): after
        prefill the compressed KV splits along time over the mesh's ``axis``
        (parallel.context.split_cache) and every decode step runs
        llama.forward_decode_seqsharded — per-shard partial flash attention
        merged with one O(B*Hq*D) psum per layer. The compressed KV never
        moves between devices. fused mode only."""
        if self.ecfg.mode != "fused":
            raise ValueError("sequence-parallel decode requires mode='fused'")
        from .parallel import context as ctx

        ctx.shard_spec(self.spec, mesh.shape[axis])  # validate divisibility
        self.seq_mesh = mesh
        self.seq_axis = axis
        return self

    # -- bucketing ------------------------------------------------------

    def bucket_len(self, s: int) -> int:
        """Round up to a multiple of the quant group so left-padding always
        lands in the compressed prefix (keeps pad masking exact)."""
        g = self.spec.group
        b = ((s + g - 1) // g) * g
        if b > self.ecfg.max_len:
            raise ValueError(f"prompt length {s} exceeds max_len {self.ecfg.max_len}")
        return b

    @staticmethod
    def left_pad(token_lists: list[list[int]], pad_id: int, to_len: int):
        """-> (tokens [B,S] int32, mask [B,S] int32)."""
        b = len(token_lists)
        tokens = np.full((b, to_len), pad_id, np.int32)
        mask = np.zeros((b, to_len), np.int32)
        for i, t in enumerate(token_lists):
            t = t[-to_len:]
            tokens[i, to_len - len(t):] = t
            mask[i, to_len - len(t):] = 1
        return jnp.asarray(tokens), jnp.asarray(mask)

    # -- compiled stages ------------------------------------------------

    def _get_prefill(self, s: int):
        if s not in self._prefill_fns:
            mode = self.ecfg.mode
            spec = self.spec
            cfg = self.cfg
            lcomp = self.comp.layer(0)

            hspec = getattr(self, "hspec", None)
            sspec = getattr(self, "sspec", None)

            @jax.jit
            def run(params, tokens, mask, prng):
                positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
                if mode == "h2o":
                    if s > hspec.budget:
                        raise ValueError(
                            f"h2o mode: prompt bucket {s} exceeds the H2O "
                            f"budget {hspec.budget}")
                    return llama.forward_prefill_h2o(
                        params, cfg, tokens, positions, mask, hspec)
                if mode == "sink":
                    if s > sspec.capacity:
                        raise ValueError(
                            f"sink mode: prompt bucket {s} exceeds the sink "
                            f"capacity {sspec.capacity}")
                    return llama.forward_prefill_sink(
                        params, cfg, tokens, positions, mask, sspec)
                if mode == "simulated":
                    # Reference hook ordering (modeling_llama_new.py:944-1027):
                    # the prompt KV is fake-quant compressed INSIDE attention,
                    # pre-softmax — prompt logits and the first generated
                    # token see the compressed KV, and the compressed values
                    # are what gets cached.
                    hook = None
                    if lcomp.compress_method != "NONE" and lcomp.streaming:
                        def hook(k, v):
                            kc, vc = simulated.compress_kv(
                                k.astype(jnp.float32), v.astype(jnp.float32),
                                lcomp, prefill=True)
                            return kc.astype(k.dtype), vc.astype(v.dtype)
                    return llama.forward_prefill(
                        params, cfg, tokens, positions, mask, spec,
                        compress=False, prng=prng, kv_hook=hook)
                compress = mode == "fused"
                return llama.forward_prefill(
                    params, cfg, tokens, positions, mask, spec,
                    compress=compress, prng=prng)

            self._prefill_fns[s] = run
        return self._prefill_fns[s]

    def _get_decode(self):
        if self._decode_fn is None:
            spec = self.spec
            cfg = self.cfg
            mode = self.ecfg.mode
            temp = self.ecfg.temperature

            attn_impl = self.ecfg.attn_impl
            hspec = getattr(self, "hspec", None)
            sspec = getattr(self, "sspec", None)

            # caches are DONATED: without donation every decode step
            # allocates + copies the full compressed cache (all layers —
            # ~25 MB/layer at 8k/H=32), a per-step tax the generate loop's
            # linear caches-reassignment never needs.
            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, caches, token, position, pad_start, prng):
                if mode == "h2o":
                    logits, caches = llama.forward_decode_h2o(
                        params, cfg, token, position, caches, hspec=hspec)
                elif mode == "sink":
                    logits, caches = llama.forward_decode_sink(
                        params, cfg, token, position, caches, sspec=sspec)
                else:
                    logits, caches = llama.forward_decode(
                        params, cfg, token, position, caches,
                        spec=spec, compress=(mode == "fused"),
                        pad_start=pad_start, prng=prng, attn_impl=attn_impl)
                if temp > 0:
                    next_tok = jax.random.categorical(prng, logits / temp, axis=-1)
                else:
                    next_tok = jnp.argmax(logits, axis=-1)
                return next_tok.astype(jnp.int32), logits, caches

            self._decode_fn = step
        return self._decode_fn

    def _get_decode_seq(self):
        if self._decode_seq_fn is None:
            spec = self.spec
            cfg = self.cfg
            temp = self.ecfg.temperature
            mesh, axis = self.seq_mesh, self.seq_axis

            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, caches, token, position, pad_start, prng):
                logits, caches = llama.forward_decode_seqsharded(
                    params, cfg, token, position, caches, mesh,
                    spec=spec, axis=axis, pad_start=pad_start, prng=prng)
                if temp > 0:
                    next_tok = jax.random.categorical(
                        prng, logits / temp, axis=-1)
                else:
                    next_tok = jnp.argmax(logits, axis=-1)
                return next_tok.astype(jnp.int32), logits, caches

            self._decode_seq_fn = step
        return self._decode_seq_fn

    def _get_recompress(self):
        """Simulated-mode gap-triggered recompression.

        stream_grouping=True: only the newest ``gap`` tokens are compressed
        (reference modeling_llama_new.py:973-996). stream_grouping=False
        (reference default): the WHOLE cache is recompressed each trigger
        (:1006-1022) — implemented as one jit specialization per trigger
        length (a handful of compiles per generation)."""
        if self._recompress_fn is None:
            lcomp = self.comp.layer(0)
            gap = lcomp.streaming_gap

            if lcomp.stream_grouping:
                @jax.jit
                def recompress(caches, end):
                    start = end - gap

                    def one_layer(lc):
                        kw = jax.lax.dynamic_slice_in_dim(lc.k, start, gap, 2)
                        vw = jax.lax.dynamic_slice_in_dim(lc.v, start, gap, 2)
                        kc, vc = simulated.compress_kv(
                            kw.astype(jnp.float32), vw.astype(jnp.float32),
                            lcomp, prefill=False)
                        return lc.replace(
                            k=jax.lax.dynamic_update_slice_in_dim(
                                lc.k, kc.astype(lc.k.dtype), start, 2),
                            v=jax.lax.dynamic_update_slice_in_dim(
                                lc.v, vc.astype(lc.v.dtype), start, 2))

                    return jax.vmap(one_layer)(caches)

                self._recompress_fn = recompress
            else:
                fns: dict[int, Any] = {}

                def recompress(caches, end):
                    end = int(end)
                    if end not in fns:
                        @jax.jit
                        def full(caches):
                            def one_layer(lc):
                                kc, vc = simulated.compress_kv(
                                    lc.k[:, :, :end].astype(jnp.float32),
                                    lc.v[:, :, :end].astype(jnp.float32),
                                    lcomp, prefill=False)
                                return lc.replace(
                                    k=lc.k.at[:, :, :end].set(
                                        kc.astype(lc.k.dtype)),
                                    v=lc.v.at[:, :, :end].set(
                                        vc.astype(lc.v.dtype)))
                            return jax.vmap(one_layer)(caches)
                        fns[end] = full
                    return fns[end](caches)

                self._recompress_fn = recompress
        return self._recompress_fn

    # -- public API -----------------------------------------------------

    def generate(
        self,
        token_lists: list[list[int]],
        max_new_tokens: int,
        *,
        prng: jax.Array | None = None,
        echo_prompt: bool = False,
    ) -> list[list[int]]:
        """Greedy/sampled generation for a batch of prompts.

        Returns generated token ids per row (without the prompt unless
        ``echo_prompt``); stops early when every row hit eos.
        """
        assert len(token_lists) == self.batch, "batch size fixed at engine build"
        if prng is None:
            prng = jax.random.PRNGKey(0)
        s = self.bucket_len(max(len(t) for t in token_lists))
        tokens, mask = self.left_pad(token_lists, self.ecfg.pad_token_id, s)
        prefill = self._get_prefill(s)
        k1, k2 = jax.random.split(prng)
        logits, caches = prefill(self.params, tokens, mask, k1)

        pad_start = (s - mask.sum(axis=1)).astype(jnp.int32)
        prompt_len = mask.sum(axis=1).astype(jnp.int32)
        last_logits = logits[:, -1]
        if self.ecfg.temperature > 0:
            cur = jax.random.categorical(
                k2, last_logits / self.ecfg.temperature, axis=-1
            ).astype(jnp.int32)
        else:
            cur = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)

        if self.seq_mesh is not None:
            from .parallel import context as ctx

            n = self.seq_mesh.shape[self.seq_axis]
            caches = jax.vmap(
                lambda c: ctx.split_cache(self.spec, c, n))(caches)
            decode = self._get_decode_seq()
        else:
            decode = self._get_decode()
        lcomp = self.comp.layer(0)
        recompress = (
            self._get_recompress()
            if self.ecfg.mode == "simulated"
            and lcomp.streaming
            and lcomp.compress_method != "NONE"
            else None
        )

        eos = self.ecfg.eos_token_id
        done = jnp.zeros((self.batch,), bool)
        if eos is not None:
            done = done | (cur == eos)
        out = [cur]
        for step_i in range(max_new_tokens - 1):
            position = prompt_len + step_i
            k2, sub = jax.random.split(k2)
            nxt, _, caches = decode(
                self.params, caches, cur, position, pad_start, sub)
            if eos is not None:
                nxt = jnp.where(done, eos, nxt)
                done = done | (nxt == eos)
            out.append(nxt)
            cur = nxt
            if recompress is not None and (step_i + 1) % lcomp.streaming_gap == 0:
                caches = recompress(caches, s + step_i + 1)
            if eos is not None and (step_i + 1) % self.ecfg.sync_every == 0:
                if bool(done.all()):
                    break

        gen = np.stack([np.asarray(t) for t in out], axis=1)  # [B, T]
        results = []
        for i in range(self.batch):
            row = gen[i].tolist()
            if eos is not None and eos in row:
                row = row[: row.index(eos) + 1]
            results.append((token_lists[i] if echo_prompt else []) + row)
        return results
