"""Profile EAGLE-2 spec rounds (and optionally chain spec) on the 8B.

Run: timeout 2400 python benchmark/exp_spec_profile.py [chain]
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

PROMPT = 128


def top_ops(trace_dir, n=20):
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
    print("TOP OPS:")
    for k, v in agg.most_common(n):
        a = ex[k].get("args") or {}
        print(f"{v/1e3:9.2f} ms {cnt[k]:6d}  {k[:52]:52} "
              f"{a.get('source','')[-42:]}", flush=True)


def main():
    chain = len(sys.argv) > 1 and sys.argv[1] == "chain"
    cfg = dataclasses.replace(MINICPM4_8B, quant=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=4096)
    from bench import make_params
    from cpmcu_tpu.models import llama

    params = make_params(cfg, jax.random.PRNGKey(0))
    if chain:
        from cpmcu_tpu.engine.chain_engine import ChainSpecEngine

        draft_cfg = dataclasses.replace(
            cfg, num_layers=max(2, cfg.num_layers // 8), quant=False
        )
        dparams = llama.init_params(draft_cfg, jax.random.PRNGKey(1))
        engine = ChainSpecEngine(cfg, draft_cfg, eng, params, dparams)
    else:
        from cpmcu_tpu.engine.spec_engine import SpecEngine
        from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

        draft_cfg = dataclasses.replace(cfg, num_layers=1, quant=False)
        ecfg = EagleConfig(
            model=draft_cfg, num_iter=2, topk_per_iter=10, tree_size=12,
            window=1024, use_input_norm=True, use_attn_norm=True,
        )
        eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
        engine = SpecEngine(cfg, ecfg, eng, params, eparams)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
    engine.generate(ids, generation_length=8)  # compile
    engine.reset()
    toks, dt, _ = engine.generate(ids, generation_length=64)
    rounds = 64 / max(engine.mean_accept_length(), 1e-9)
    print(json.dumps({
        "mode": "chain" if chain else "eagle2",
        "tok_s": round((len(toks) - 1) / dt, 2),
        "ms_per_round": round(1e3 * dt / rounds, 2),
        "accept": round(engine.mean_accept_length(), 3),
    }), flush=True)

    # clean segment-only trace: no prefill contamination
    tdir = "/tmp/jaxtrace_spec" + ("_chain" if chain else "")
    import numpy as _np

    t0 = time.time()
    with jax.profiler.trace(tdir):
        rounds = engine._spec_rounds(1, 12)
        _np.asarray(0)  # flush
    dt = time.time() - t0
    print(json.dumps({"segment12_wall_ms": round(dt * 1e3, 1)}), flush=True)
    top_ops(tdir)


if __name__ == "__main__":
    main()
