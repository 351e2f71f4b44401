"""Profile the batched decode segment (B=8) on the 8B.

Run: timeout 1800 python benchmark/exp_batch_profile.py
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig
from cpmcu_tpu.engine.batch_engine import ContinuousBatchingEngine


def main():
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=8 * 2048)
    from bench import make_params

    params = make_params(cfg, jax.random.PRNGKey(0))
    be = ContinuousBatchingEngine(cfg, eng, params, max_batch=8)
    rng = np.random.default_rng(0)
    for _ in range(8):
        be.submit(rng.integers(0, cfg.vocab_size, size=512).tolist(),
                  max_new_tokens=64)
    be.run()  # warmup/compile
    for _ in range(8):
        be.submit(rng.integers(0, cfg.vocab_size, size=512).tolist(),
                  max_new_tokens=64)
    # time decode segments only: admit first, then measure step_segment
    be._admit([])
    t0 = time.time()
    n = 0
    while be.active:
        evs = be.step_segment(16)
        n += len(evs)
    dt = time.time() - t0
    print(json.dumps({"decode_tok_s": round(n / dt, 1),
                      "ms_per_step": round(1e3 * dt / (n / 8), 2)}), flush=True)

    for _ in range(8):
        be.submit(rng.integers(0, cfg.vocab_size, size=512).tolist(),
                  max_new_tokens=64)
    be._admit([])
    tdir = "/tmp/jaxtrace_batch"
    with jax.profiler.trace(tdir):
        be.step_segment(16)
        np.asarray(0)
    path = sorted(glob.glob(tdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            names[(e["pid"], e.get("tid"))] = e["args"].get("name")
    ops = [e for e in ev if e.get("ph") == "X"
           and names.get((e["pid"], e.get("tid"))) == "XLA Ops"]
    agg, cnt, ex = collections.Counter(), collections.Counter(), {}
    for e in ops:
        nm = re.sub(r"\d+", "#", e["name"])
        agg[nm] += e["dur"]
        cnt[nm] += 1
        ex.setdefault(nm, e)
    print("TOP OPS (16 steps x 8 slots):")
    for kname, val in agg.most_common(16):
        a = ex[kname].get("args") or {}
        print(f"{val/1e3:9.2f} ms {cnt[kname]:6d}  {kname[:52]:52} "
              f"{a.get('source','')[-42:]}", flush=True)


if __name__ == "__main__":
    main()
