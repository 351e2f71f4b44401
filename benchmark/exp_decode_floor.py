"""Dense decode floor analysis (VERDICT r3 task 2a).

Three measurements on the real chip:
  1. HBM read ceiling: time a reduction over the stacked W4 packs (the
     exact bytes the decode quant stream reads) — the practical bandwidth
     this chip/tunnel reaches, i.e. the true floor for the 5.6 ms/tok
     quant stream (the ledger's "~5.1 ms floor" assumed peak BW).
  2. decode_segment size sweep (8/16/32/64) at the bench's exact config
     (2048-token prompt): how much of the ~0.4 ms/tok inter-segment
     overhead bigger segments recover.
  3. per-rep tok/s at the best segment size, median of 5.

Run: timeout 1700 python benchmark/exp_decode_floor.py
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

PROMPT = 2048


def main():
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=4096)
    from bench import make_params

    params = make_params(cfg, jax.random.PRNGKey(0))

    # --- 1. HBM read ceiling over the actual weight bytes
    packs = []
    nbytes = 0
    for name in ("wqkv", "wq", "wk", "wv", "wo", "w_gateup", "w_gate",
                 "w_up", "w_down"):
        p = params["layers"].get(name)
        if p and "q" in p:
            packs.append(p["q"])
            packs.append(p["s"])
    if "q" in params.get("lm_head", {}):
        packs.append(params["lm_head"]["q"])
        packs.append(params["lm_head"]["s"])
    nbytes = sum(int(np.prod(p.shape)) * p.dtype.itemsize for p in packs)

    @jax.jit
    def read_all(ps):
        return sum(jnp.sum(p, dtype=jnp.float32)
                   if p.dtype != jnp.int32
                   else jnp.sum(p ^ 1, dtype=jnp.int32).astype(jnp.float32)
                   for p in ps)

    r = read_all(packs)
    np.asarray(r)
    reps = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(read_all(packs))
        reps.append(time.time() - t0)
    # NOTE: one fetch per rep -> includes one tunnel RTT; report min too
    t = float(np.median(reps))
    print(json.dumps({
        "read_bytes_mb": round(nbytes / 1e6, 1),
        "read_ms_median": round(t * 1e3, 3),
        "read_ms_min": round(min(reps) * 1e3, 3),
        "gb_s": round(nbytes / min(reps) / 1e9, 1),
    }), flush=True)

    # --- 2. segment size sweep
    engine = Engine(cfg, eng, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
    engine.prefill(ids)
    total = PROMPT + 1024
    sparse = engine.sparse_engaged()

    def run_loop(seg, n):
        tok = jnp.asarray(1, jnp.int32)
        pos = jnp.asarray(PROMPT, jnp.int32)
        done = 0
        while done < n:
            engine.cache, toks, engine.key = decode_segment(
                cfg, engine.params, engine.rope, engine.cache, tok, pos,
                engine.key, k=seg, temperature=0.0, top_k=0, top_p=1.0,
                attn_impl=engine.attn_impl, sparse_select=sparse,
                kv_span=engine.kv_bucket(total),
                unroll=engine.unroll_layers(1, total),
            )
            tok = toks[-1]
            pos = pos + seg
            done += seg
        np.asarray(toks)
        return done

    for seg in (8, 16, 32, 64):
        run_loop(seg, seg * 2)  # compile
        rates = []
        for _ in range(3):
            t0 = time.time()
            n = run_loop(seg, 64 if seg <= 64 else seg)
            rates.append(n / (time.time() - t0))
        print(json.dumps({"seg": seg,
                          "tok_s": [round(x, 2) for x in rates],
                          "ms_per_tok": round(1e3 / max(rates), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
