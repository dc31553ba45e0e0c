"""Kernel micro-benchmark on the real TPU: fused decode vs bf16 baseline.

Usage: python scripts/kbench.py [variant ...]
  variants: base (bf16 XLA), fused8, fused16, fused32 (blocks_per_chunk)

Prints one line per variant: name, us/step, effective GB/s over the bytes
that variant must read per step. Carries a SIGALRM watchdog (the tunneled
runtime can wedge; see CLAUDE.md).
"""
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# Share the persistent compile cache with bench.py so in-session kbench
# warms the driver's later bench run (and vice versa).
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import jax.numpy as jnp


def watchdog(seconds):
    def fire(signum, frame):
        print(f"WATCHDOG: TPU unresponsive after {seconds}s", flush=True)
        import os
        os._exit(2)
    signal.signal(signal.SIGALRM, fire)
    signal.alarm(seconds)


HEADS = int(sys.argv[sys.argv.index("--heads") + 1]) if "--heads" in sys.argv else 8
WD = int(sys.argv[sys.argv.index("--watchdog") + 1]) if "--watchdog" in sys.argv else 560
CTX = 8192
D = 128
N = 200


def main():
    watchdog(WD)
    from gear_tpu import cache as C
    from gear_tpu.kernels import decode as K
    from gear_tpu.models import llama as L

    variants = [a for a in sys.argv[1:] if not a.startswith("--")
                and not a.isdigit()] or ["base", "fused8", "fused16"]

    rng = np.random.default_rng(0)
    spec = C.CacheSpec(batch=1, num_kv_heads=HEADS, head_dim=D,
                       max_len=CTX, bits=4, group=64, rank=4, prefill_rank=4,
                       lowrank_loop=3, dtype=jnp.bfloat16,
                       sideband_dtype=jnp.bfloat16)
    shape = (1, HEADS, CTX, D)
    k = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    cache = C.prefill(spec, k, v)
    np.asarray(cache.comp_len)
    rc = L.raw_prefill(spec, k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    np.asarray(rc.k[0, 0, 0, :1])
    q = jnp.asarray(rng.standard_normal((1, HEADS, 1, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    comp_bytes = spec.bytes_compressed()
    bf16_bytes = spec.bytes_fp16_baseline()

    def bench(name, f, c, q, nbytes):
        @jax.jit
        def loop(cache, q):
            def body(i, x):
                return f(cache, x + i * 1e-9).astype(q.dtype)
            return jax.lax.fori_loop(0, N, body, q)
        t0 = time.time()
        np.asarray(loop(c, q))  # compile + warm
        print(f"{name}: compiled+warm in {time.time()-t0:.1f}s", flush=True)
        best = None
        for trial in range(3):
            q2 = q + (trial + 1) * 0.01
            np.asarray(q2)
            t0 = time.time()
            np.asarray(loop(c, q2))
            dt = (time.time() - t0) / N
            best = dt if best is None else min(best, dt)
        gbs = nbytes / best / 1e9
        print(f"{name}: {best*1e6:.1f} us/step  {gbs:.0f} GB/s "
              f"({nbytes/1e6:.1f} MB)", flush=True)
        return best

    for name in variants:
        if name == "base":
            bench("base", lambda c, x: L.raw_attend(spec, c, x), rc, q,
                  bf16_bytes)
        elif name.startswith("flash"):
            from gear_tpu.kernels import flash as F
            ck = int(name[5:]) if len(name) > 5 else 1024
            bench(name,
                  lambda c, x, ck=ck: F.raw_attend_flash(spec, c, x, chunk=ck),
                  rc, q, bf16_bytes)
        elif name.startswith("paged"):
            # paged<page_blocks>: the paged-pool Pallas kernel, one sequence
            from gear_tpu import paged as PG
            pb = int(name[5:]) if len(name) > 5 else 16
            pspec = PG.PagedSpec(spec=spec, n_pages=spec.n_blocks // pb,
                                 page_blocks=pb)
            pool = PG.init_pool(pspec)
            seqs = PG.init_seqs(pspec, batch=1)
            al = PG.PageAllocator(pspec.n_pages)
            ids = [al.alloc() for _ in range(pspec.max_pages_per_seq)]
            pool, seqs = PG.prefill_paged(pspec, pool, seqs, 0, ids, k, v)
            np.asarray(seqs.comp_len)
            bench(name,
                  lambda st, x: K.attend_paged(pspec, st[0], st[1], x),
                  (pool, seqs), q, comp_bytes)
        elif name.startswith("gear"):
            # gear[l]<cb>[:bits|abl[+...]][@hb]
            #   gear  = full GEAR recipe (canonical 2% outliers, prefill_rank
            #           4) + int8 bases + v_group=D; INT2 unless :4
            #   gearl = the reference SPEED protocol config (gearlKIVI,
            #           test.py:30-37): INT2 g64 rank2 loop3, NO outliers
            # ':' section tokens: integers set bits, others are kernel
            # ablations (nolr, nomn, nov, nok, noshift, ...).
            is_l = name.startswith("gearl")
            spec_s = name[5 if is_l else 4:] or "16"
            spec_s, hb = (spec_s.split("@", 1) + ["1"])[:2]
            gbits, abl, kcvt = 2, [], False
            n_out = 0 if is_l else 164
            if ":" in spec_s:
                spec_s, mod_s = spec_s.split(":", 1)
                for tokn in mod_s.split("+"):
                    if tokn.isdigit():
                        gbits = int(tokn)
                    elif tokn == "c":
                        kcvt = True  # kcvt_prefill (whole-span K scales)
                    elif tokn.startswith("o") and tokn[1:].isdigit():
                        n_out = int(tokn[1:])  # outliers_per_block override
                    elif tokn:
                        abl.append(tokn)
            cbg = int(spec_s or "16")
            gspec = C.CacheSpec(
                batch=1, num_kv_heads=HEADS, head_dim=D, max_len=CTX,
                bits=gbits, group=64, rank=2,
                prefill_rank=2 if is_l else 4,
                lowrank_loop=3, base_bits=8,
                outliers_per_block=n_out,
                v_group_size=D, kcvt_prefill=kcvt, dtype=jnp.bfloat16,
                sideband_dtype=jnp.bfloat16)
            gcache = C.prefill(gspec, k, v)
            np.asarray(gcache.comp_len)
            bench(name,
                  lambda c, x, cb=cbg, hb=int(hb), a=frozenset(abl):
                      K.attend_fused(gspec, c, x, blocks_per_chunk=cb,
                                     heads_per_step=hb, ablate=a),
                  gcache, q, gspec.bytes_compressed())
        elif name.startswith("fused"):
            # fused<cb>[:abl1+abl2][@hb]  e.g. fused32:nolr+nov@4
            spec_s = name[5:]
            spec_s, hb = (spec_s.split("@", 1) + ["1"])[:2]
            abl = frozenset()
            if ":" in spec_s:
                spec_s, abl_s = spec_s.split(":", 1)
                abl = frozenset(abl_s.split("+"))
            cb = int(spec_s)
            bench(name,
                  lambda c, x, cb=cb, abl=abl, hb=int(hb): K.attend_fused(
                      spec, c, x, blocks_per_chunk=cb, ablate=abl,
                      heads_per_step=hb),
                  cache, q, comp_bytes)
        else:
            print(f"unknown variant {name}")

    # correctness spot-check on the last fused variant
    got = np.asarray(K.attend_fused(spec, cache, q, blocks_per_chunk=8),
                     np.float32)
    want = np.asarray(C.attend(spec, cache, q), np.float32)
    rel = float(np.abs(got - want).mean() / np.abs(want).mean())
    print(f"fused rel err vs XLA reference: {rel:.4f}", flush=True)

    if any(v.startswith("gear") and not v.startswith("gearl")
           for v in variants):
        # on-device spot check of the full-GEAR (outlier) kernel config at
        # a small T (fresh spec to keep the attend reference compile fast)
        gs = C.CacheSpec(batch=1, num_kv_heads=2, head_dim=D, max_len=1024,
                         bits=2, group=64, rank=2, prefill_rank=4,
                         lowrank_loop=3, base_bits=8, outliers_per_block=164,
                         v_group_size=D, kcvt_prefill=True,
                         dtype=jnp.bfloat16, sideband_dtype=jnp.bfloat16)
        kk = jnp.asarray(rng.standard_normal((1, 2, 1024, D)).astype(np.float32))
        vv = jnp.asarray(rng.standard_normal((1, 2, 1024, D)).astype(np.float32))
        gc = C.prefill(gs, kk, vv)
        qq = jnp.asarray(rng.standard_normal((1, 2, 1, D)).astype(np.float32))
        got = np.asarray(K.attend_fused(gs, gc, qq, blocks_per_chunk=16,
                                        heads_per_step=2), np.float32)
        want = np.asarray(C.attend(gs, gc, qq), np.float32)
        rel = float(np.abs(got - want).mean() / np.abs(want).mean())
        print(f"GEAR(outliers) rel err vs XLA reference: {rel:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
