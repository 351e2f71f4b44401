"""Profile hierarchical-spec outer rounds on the 8B (r2b measured 11.9 tok/s
= ~84 ms/round at accept=1, ~6x the eagle2 round — find where it goes).

Run: timeout 2400 python benchmark/exp_hier_profile.py
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig
from exp_spec_profile import top_ops

PROMPT = 128


def main():
    cfg = dataclasses.replace(MINICPM4_8B, quant=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=4096)
    from bench import make_params
    from cpmcu_tpu.engine.hier_engine import HierSpecEngine
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    params = make_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = dataclasses.replace(
        cfg, num_layers=max(2, cfg.num_layers // 8),
        hidden_size=1024, intermediate_size=4096, num_heads=16,
        head_dim=64, quant_lmhead=False,
    )
    dparams = make_params(draft_cfg, jax.random.PRNGKey(1))
    ecfg = EagleConfig(
        model=dataclasses.replace(draft_cfg, num_layers=1),
        num_iter=2, topk_per_iter=10, tree_size=12,
    )
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(2))
    engine = HierSpecEngine(
        cfg, draft_cfg, ecfg, eng, params, dparams, eparams,
        min_draft_length=8,
    )

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
    engine.generate(ids, generation_length=8)  # compile
    engine.reset()
    toks, dt, _ = engine.generate(ids, generation_length=48)
    rounds = len(engine.accept_lengths) or 48
    print(json.dumps({
        "mode": "hier",
        "tok_s": round((len(toks) - 1) / dt, 2),
        "ms_per_round": round(1e3 * dt / rounds, 2),
        "accept": round(engine.mean_accept_length(), 3),
        "inner_accept": round(engine.mean_inner_accept_length(), 3),
    }), flush=True)

    # trace one WARM fused segment (the path the bench actually runs —
    # hier_segment is already compiled by generate(); the per-round host
    # path would compile inside the trace and drown the data). generate()
    # leaves the inner drafter cache skewed ahead after its overshoot
    # rollback (ADVICE r2) — re-establish a clean state first.
    engine.reset()
    toks, _, _ = engine.generate(ids, generation_length=2)
    seg = max(1, getattr(eng, "spec_segment_size", 1))
    tdir = "/tmp/jaxtrace_hier"
    t0 = time.time()
    with jax.profiler.trace(tdir):
        rounds = engine._spec_rounds(int(toks[-1]), seg)
        np.asarray(engine.cache.length)  # real device sync
    dt = time.time() - t0
    print(json.dumps({"seg_rounds": seg,
                      "seg_wall_ms": round(dt * 1e3, 1),
                      "ms_per_round": round(dt * 1e3 / seg, 2)}), flush=True)
    top_ops(tdir, n=28)


if __name__ == "__main__":
    main()
