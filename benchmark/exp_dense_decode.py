"""Dense 8B W4A16 decode microexperiment + profiler trace attempt.

Measures short-context decode tok/s (3 reps to see run-to-run noise) after
kernel changes, then tries jax.profiler.trace on one segment to find where
per-token time goes (works only if the axon platform supports tracing).

Run: timeout 1800 python benchmark/exp_dense_decode.py
"""

import dataclasses
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import MINICPM4_0_5B, MINICPM4_8B, EngineConfig
from cpmcu_tpu.engine.engine import Engine, decode_segment

PROMPT = 128
SEG = 8
REPS = 3
SEGS_PER_REP = 8


def main():
    if os.environ.get("CPMCU_BENCH_CONFIG") == "0.5b":
        cfg = MINICPM4_0_5B  # bf16 dense
    else:
        cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=4096)
    from bench import make_params

    params = make_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, eng, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
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

    tok, pos = run(2, tok, pos)  # compile + warm
    for rep in range(REPS):
        t0 = time.time()
        tok, pos = run(SEGS_PER_REP, tok, pos)
        dt = time.time() - t0
        n = SEGS_PER_REP * SEG
        print(json.dumps({"rep": rep, "tok_s": round(n / dt, 2),
                          "ms_per_tok": round(1e3 * dt / n, 3)}), flush=True)

    # profiler attempt
    trace_dir = "/tmp/jaxtrace"
    try:
        with jax.profiler.trace(trace_dir):
            tok, pos = run(2, tok, pos)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from exp_spec_profile import top_ops

        top_ops(trace_dir, n=24)
    except Exception as e:
        print(json.dumps({"trace_error": f"{type(e).__name__}: {e}"}), flush=True)


if __name__ == "__main__":
    main()
