"""Decode quant-kernel tuning sweep (ku unroll x bn ladder) on the 8B.

Engine-level measurement only (per-op microbenchmarks are meaningless on
the tunnel); each variant mutates ops.quant.TUNE, clears the jit caches and
re-times the same decode loop. Prints one JSON line per variant.

Run: timeout 3000 python benchmark/exp_quant_tune.py
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

import cpmcu_tpu.ops.quant as Q
from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig
from cpmcu_tpu.engine.engine import Engine, decode_segment

PROMPT = 128
SEG = 16
STEPS = 64

VARIANTS = [
    {"name": "base", "ku": 1, "bn_ladder": (2048, 1536, 1024, 512)},
    {"name": "ku2", "ku": 2, "bn_ladder": (2048, 1536, 1024, 512)},
    {"name": "ku4", "ku": 4, "bn_ladder": (2048, 1536, 1024, 512)},
    {"name": "bn4096", "ku": 1, "bn_ladder": (4096, 2048, 1536, 1024, 512)},
    {"name": "ku2+bn4096", "ku": 2,
     "bn_ladder": (4096, 2048, 1536, 1024, 512)},
]


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=4096)
    from bench import make_params

    params = make_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()

    for var in VARIANTS:
        Q.TUNE["ku"] = var["ku"]
        Q.TUNE["bn_ladder"] = var["bn_ladder"]
        jax.clear_caches()
        engine = Engine(cfg, eng, params)
        engine.prefill(ids)

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
            np.asarray(toks)  # real sync
            return tok, pos

        tok = jnp.asarray(1, jnp.int32)
        pos = jnp.asarray(PROMPT, jnp.int32)
        tok, pos = run(1, tok, pos)  # compile + warm
        best = None
        for rep in range(3):
            t0 = time.time()
            tok, pos = run(STEPS // SEG, tok, pos)
            dt = time.time() - t0
            r = STEPS / dt
            best = max(best or 0, r)
        print(json.dumps({"variant": var["name"], "tok_s": round(best, 2),
                          "ms_per_tok": round(1e3 / best, 3)}), flush=True)
        del engine


if __name__ == "__main__":
    main()
