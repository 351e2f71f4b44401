"""Batched-spec decomposition (VERDICT r3 task 6): where do the ~76 ms
rounds go at B=8 oracle accept (254 aggregate vs plain batching's 768)?

Measures in one process:
  A. plain ContinuousBatchingEngine decode aggregate (same-day anchor)
  B. BatchSpecEngine (eagle2, oracle accept) aggregate + wall ms/round
  C. device-op trace of one batched spec round -> TOP OPS

Run (TPU): timeout 2400 python benchmark/exp_r4e_batchspec.py [B]
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
import jax.numpy as jnp  # noqa: F401

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PROMPT = 512
STEPS = 64


def top_ops(trace_dir, n=18):
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
    tot = 0
    for e in ops:
        nm = re.sub(r"\d+", "#", e["name"])
        agg[nm] += e["dur"]
        cnt[nm] += 1
        tot += e["dur"]
        ex.setdefault(nm, e)
    print(f"TOP OPS (device total {tot/1e3:.1f} ms):")
    for k, v in agg.most_common(n):
        a = ex[k].get("args") or {}
        print(f"{v/1e3:9.2f} ms {cnt[k]:6d}  {k[:52]:52} "
              f"{a.get('source','')[-44:]}", flush=True)


def main():
    import bench as bench_mod
    from cpmcu_tpu.engine.batch_engine import ContinuousBatchingEngine
    from cpmcu_tpu.engine.batch_spec_engine import BatchSpecEngine
    from cpmcu_tpu.spec.eagle import EagleConfig

    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=B * 2048)
    params = bench_mod.make_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def submit_all(be):
        for _ in range(B):
            be.submit(rng.integers(0, cfg.vocab_size, size=PROMPT).tolist(),
                      max_new_tokens=STEPS)

    # ---- A: plain batching anchor ----
    be = ContinuousBatchingEngine(cfg, eng, params, max_batch=B)
    submit_all(be)
    be.run()
    submit_all(be)
    be._admit([])
    t0 = time.time()
    n = sum(len(v) for v in be.run().values())
    dt = time.time() - t0
    print(json.dumps({"plain_batch": B, "decode_tok_s": round(n / dt, 1)}),
          flush=True)
    del be

    # ---- B: batched eagle spec, oracle accept ----
    draft_cfg = dataclasses.replace(cfg, num_layers=1, quant_lmhead=False)
    ecfg = EagleConfig(model=draft_cfg, num_iter=2, topk_per_iter=10,
                       tree_size=12, window=0, use_input_norm=False,
                       use_attn_norm=True, frspec_vocab_size=0)
    params2, eparams = bench_mod._oracle_spec_pair(cfg, ecfg)
    bs = BatchSpecEngine(cfg, ecfg, eng, params2, eparams, max_batch=B)
    submit_all(bs)
    bs.run()
    submit_all(bs)
    bs._admit([])
    t0 = time.time()
    n = sum(len(v) for v in bs.run().values())
    dt = time.time() - t0
    rounds = max(1, getattr(bs, "_round_count", 0)) if hasattr(
        bs, "_round_count") else None
    out = {"spec_batch": B, "decode_tok_s": round(n / dt, 1),
           "mean_accept": round(bs.mean_accept_length(), 3)}
    print(json.dumps(out), flush=True)

    # wall ms/round via step_segment (non-pipelined single rounds)
    submit_all(bs)
    bs._admit([])
    for _ in range(3):
        bs.step_segment(1)  # warm
    reps = []
    for _ in range(8):
        t0 = time.time()
        ev = bs.step_segment(1)
        np.asarray(0)
        reps.append((time.time() - t0) * 1e3)
    print(json.dumps({"ms_per_round_unpipelined": round(
        float(np.median(reps)), 2), "reps": [round(r, 1) for r in reps]}),
        flush=True)

    # ---- C: trace one round ----
    tdir = "/tmp/jaxtrace_r4e_batchspec"
    with jax.profiler.trace(tdir):
        bs.step_segment(1)
        np.asarray(0)
    top_ops(tdir)


if __name__ == "__main__":
    main()
