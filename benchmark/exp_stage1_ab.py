"""A/B the stage-1 scorer at long-context prefill: XLA vs Pallas.

Engine-level: time one 2048-token sparse prefill chunk at ~96K committed
context with stage1_scores_auto forced to each path (jax.clear_caches +
fresh run per variant — the pjit cache otherwise replays the first
executable).

Run: timeout 1800 python benchmark/exp_stage1_ab.py
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

import cpmcu_tpu.ops.sparse as SP
from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig

CTX = 94208  # committed context before the timed chunks
CHUNK = 2048


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

    orig_auto = SP.stage1_scores_auto

    def force(which):
        if which == "xla":
            SP_auto = lambda q, c1, c2, a, b, **kw: SP.stage1_scores(
                q, c1, c2, a, b, **kw)
        else:
            from cpmcu_tpu.ops.sparse_stage1 import stage1_scores_pallas

            SP_auto = lambda q, c1, c2, a, b, **kw: (
                stage1_scores_pallas(q, c1, c2, a, b, **kw)
                if q.shape[0] >= 64 else SP.stage1_scores(q, c1, c2, a, b, **kw)
            )
        SP.stage1_scores_auto = SP_auto
        import cpmcu_tpu.layers.attention  # callers import from sparse at use

    for which in ("pallas", "xla"):
        force(which)
        jax.clear_caches()
        engine = Engine(cfg, eng, params)
        ids = rng.integers(0, cfg.vocab_size, size=CTX).tolist()
        engine.prefill(ids)  # builds the long context (sparse engaged late)

        chunk = rng.integers(0, cfg.vocab_size, size=CHUNK)
        # timed: 4 additional chunks at full context, sparse engaged
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
        best = min(t[1:])  # first timed chunk may compile
        print(json.dumps({"stage1": which,
                          "chunk_ms": round(1e3 * best, 1),
                          "prefill_tok_s": round(CHUNK / best, 1)}),
              flush=True)
        del engine
    SP.stage1_scores_auto = orig_auto


if __name__ == "__main__":
    main()
