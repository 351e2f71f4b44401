"""A/B: f32 vs bf16 group scales in the W4A16 decode kernel.

Scales are (K/128, N) f32 = 1/32 of the weight bytes (~250MB on the 8B
incl. lm_head); if the decode kernel has any DMA headroom left, bf16
scales buy ~0.15ms/token. The kernel consumes any float dtype (casts to
f32 per (1, BN) group row — free).

Run: timeout 1200 python benchmark/exp_scales_dtype.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig
from cpmcu_tpu.engine.engine import Engine, decode_segment

PROMPT = 128
SEG = 16
STEPS = 64


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=4096)
    from bench import make_params

    params = make_params(cfg, jax.random.PRNGKey(0))

    def cast_scales(p, dt):
        def go(d):
            if isinstance(d, dict):
                return {k: (v.astype(dt) if k == "s" else go(v))
                        for k, v in d.items()}
            return d
        return go(p)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        jax.clear_caches()
        engine = Engine(cfg, eng, cast_scales(params, dt))
        engine.prefill(ids)
        tok = jnp.asarray(1, jnp.int32)
        pos = jnp.asarray(PROMPT, jnp.int32)

        def run(nsegs, tok, pos):
            for _ in range(nsegs):
                engine.cache, toks, engine.key = decode_segment(
                    cfg, engine.params, engine.rope, engine.cache, tok, pos,
                    engine.key, k=SEG, temperature=0.0, top_k=0, top_p=1.0,
                    attn_impl=engine.attn_impl, sparse_select=False,
                    kv_span=engine.kv_bucket(2048),
                    unroll=engine.unroll_layers(1),
                )
                tok = toks[-1]
                pos = pos + SEG
            np.asarray(toks)
            return tok, pos

        tok, pos = run(1, tok, pos)
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            tok, pos = run(STEPS // SEG, tok, pos)
            best = max(best, STEPS / (time.time() - t0))
        print(json.dumps({"scales": name, "tok_s": round(best, 2),
                          "ms_per_tok": round(1e3 / best, 3)}), flush=True)
        del engine


if __name__ == "__main__":
    main()
