"""Profile 96K sparse decode segments; print the top device ops.

Run: timeout 2400 python benchmark/exp_sparse_profile.py
"""

import collections
import dataclasses
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig
from cpmcu_tpu.engine.engine import Engine, decode_segment

PROMPT = 96 * 1024
SEG = 8


def main():
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, apply_sparse=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=PROMPT + 2048)
    from bench import make_params

    params = make_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, eng, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
    engine.prefill(ids)

    def run(nsegs, tok, pos):
        for _ in range(nsegs):
            engine.cache, toks, engine.key = decode_segment(
                cfg, engine.params, engine.rope, engine.cache, tok, pos,
                engine.key, k=SEG, temperature=0.0, top_k=0, top_p=1.0,
                attn_impl=engine.attn_impl, sparse_select=True,
                kv_span=None, unroll=True,
            )
            tok = toks[-1]
            pos = pos + SEG
        np.asarray(toks)
        return tok, pos

    tok = jnp.asarray(1, jnp.int32)
    pos = jnp.asarray(PROMPT, jnp.int32)
    tok, pos = run(1, tok, pos)  # compile
    t0 = time.time()
    tok, pos = run(4, tok, pos)
    dt = time.time() - t0
    print(json.dumps({"tok_s": round(32 / dt, 2),
                      "ms_per_tok": round(dt / 32 * 1e3, 2)}), flush=True)

    trace_dir = "/tmp/jaxtrace_sparse"
    with jax.profiler.trace(trace_dir):
        tok, pos = run(2, tok, pos)

    path = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            names[(e["pid"], e.get("tid"))] = e["args"].get("name")
    ops = [e for e in ev if e.get("ph") == "X"
           and names.get((e["pid"], e.get("tid"))) == "XLA Ops"]
    agg = collections.Counter()
    cnt = collections.Counter()
    ex = {}
    for e in ops:
        n = re.sub(r"\d+", "#", e["name"])
        agg[n] += e["dur"]
        cnt[n] += 1
        ex.setdefault(n, e)
    print("TOP OPS (16 tokens):")
    for k, v in agg.most_common(24):
        a = ex[k].get("args") or {}
        src = a.get("source", "")
        ba = a.get("bytes_accessed", "")
        print(f"{v/1e3:9.2f} ms {cnt[k]:6d}  {k[:52]:52} {src[-40:]:40} {ba}",
              flush=True)


if __name__ == "__main__":
    main()
