"""A/B the sparse-prefill tiling: g-split factor and query-tile width.

Engine-level (tile-size microbenchmarks do NOT transfer — CLAUDE.md): time
one 2048-token sparse prefill chunk at ~94K committed context for each
(gs, bt) variant via ops.sparse_flash.TUNE + jax.clear_caches().

Variants:
  * gs1-auto   — pre-round-2 behavior (bt = 1024/G = 64 for the 8B)
  * gs4-auto   — g-split default (bt = 256, same MXU rows; wins when visit
                 unions grow sublinearly in bt — real-checkpoint regime,
                 neutral under synthetic saturation)
  * gs1-bt256  — rows = 4096: one KV tile DMA serves 4x more query tokens
                 even under SATURATED unions (VMEM limit raised in-kernel)
  * gs1-bt128  — rows = 2048 middle point

Run: timeout 1800 python benchmark/exp_gsplit_ab.py
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

import cpmcu_tpu.ops.sparse_flash as SF
from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig

CTX = 94208
CHUNK = 2048

VARIANTS = [
    ("gs1-auto", {"prefill_gs": 1, "prefill_bt": 0}),
    ("gs4-auto", {"prefill_gs": 4, "prefill_bt": 0}),
    ("gs1-bt128", {"prefill_gs": 1, "prefill_bt": 128}),
    ("gs1-bt256", {"prefill_gs": 1, "prefill_bt": 256}),
]


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True,
                              apply_sparse=True)
    eng = EngineConfig(chunk_length=CHUNK, max_total_length=CTX + 8 * CHUNK)
    from bench import make_params
    from cpmcu_tpu.engine.engine import Engine

    params = make_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    for name, tune in VARIANTS:
        SF.TUNE.update(tune)
        jax.clear_caches()
        engine = Engine(cfg, eng, params)
        ids = rng.integers(0, cfg.vocab_size, size=CTX).tolist()
        engine.prefill(ids)

        chunk = rng.integers(0, cfg.vocab_size, size=CHUNK)
        t = []
        for i in range(4):
            pos = np.arange(CTX + i * CHUNK, CTX + (i + 1) * CHUNK,
                            dtype=np.int32)
            t0 = time.time()
            logits = engine._forward(
                jnp.asarray(chunk, jnp.int32), jnp.asarray(pos),
                logits_idx=jnp.asarray(CHUNK - 1, jnp.int32),
                logits_mode="index",
            )
            engine.commit(CHUNK, max_new=CHUNK)
            np.asarray(logits)
            t.append(time.time() - t0)
        best = min(t[1:])
        print(json.dumps({"variant": name,
                          "chunk_ms": round(1e3 * best, 1),
                          "prefill_tok_s": round(CHUNK / best, 1)}),
              flush=True)
        del engine


if __name__ == "__main__":
    main()
