"""Profile dense + sparse prefill; print chunk timings and top device ops.

Run: timeout 3000 python benchmark/exp_prefill_profile.py
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

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig
from cpmcu_tpu.engine.engine import Engine


def top_ops(trace_dir, label, n=14):
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
    agg, cnt, ex = collections.Counter(), collections.Counter(), {}
    for e in ops:
        nm = re.sub(r"\d+", "#", e["name"])
        agg[nm] += e["dur"]
        cnt[nm] += 1
        ex.setdefault(nm, e)
    print(f"TOP OPS [{label}]:")
    for k, v in agg.most_common(n):
        a = ex[k].get("args") or {}
        print(f"{v/1e3:9.2f} ms {cnt[k]:6d}  {k[:52]:52} "
              f"{a.get('source','')[-40:]}", flush=True)


def bench_prefill(cfg, prompt_len, label, trace=False):
    eng = EngineConfig(chunk_length=2048, max_total_length=prompt_len + 1024)
    from bench import make_params

    params = make_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, eng, params)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()
    engine.prefill(ids)  # compile
    engine.reset()
    t0 = time.time()
    engine.prefill(ids)
    dt = time.time() - t0
    print(json.dumps({label: round(prompt_len / dt, 1), "s": round(dt, 2)}),
          flush=True)
    if trace:
        engine.reset()
        tdir = f"/tmp/jaxtrace_prefill_{label}"
        with jax.profiler.trace(tdir):
            engine.prefill(ids)
        top_ops(tdir, label)


def main():
    cfg = dataclasses.replace(MINICPM4_8B, quant=True)
    bench_prefill(cfg, 8192, "dense-8K", trace=True)
    scfg = dataclasses.replace(cfg, apply_sparse=True)
    bench_prefill(scfg, 16384, "sparse-16K")
    bench_prefill(scfg, 96 * 1024, "sparse-96K", trace=True)


if __name__ == "__main__":
    main()
