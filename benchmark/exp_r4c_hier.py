"""Hier spec: ONE clean measurement reconciling the r3 spread
(9.5 / 17.6 / 207 ms-per-round; VERDICT r3 task 5).

Measures, in one process: (a) engine.generate tok/s with segment/round call
counters, (b) fused hier_segment wall ms/round (3 reps, post-warmup),
(c) a device-op trace of one segment.

Run: timeout 2400 python benchmark/exp_r4c_hier.py [bf16|quant] [scan|unroll]
(second arg = inner-drafter layer-loop mode; default scan)
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp  # noqa: F401

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig

DRAFT = sys.argv[1] if len(sys.argv) > 1 else "quant"
INNER = "scan" if (len(sys.argv) < 3 or sys.argv[2] == "scan") else True
PROMPT = 2048
SEG = 12


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import bench as bench_mod

    bench_mod.HIER_DRAFT = DRAFT
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True)
    eng = EngineConfig(chunk_length=2048, max_total_length=PROMPT + 4096,
                       spec_segment_size=SEG)

    # build exactly the bench hier engine
    from cpmcu_tpu.engine.hier_engine import HierSpecEngine
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    params = bench_mod.make_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = dataclasses.replace(
        cfg, num_layers=max(2, cfg.num_layers // 8),
        hidden_size=1024, intermediate_size=4096, num_heads=16,
        head_dim=64, quant_lmhead=False,
        quant=cfg.quant and DRAFT == "quant",
    )
    dparams = bench_mod.make_params(draft_cfg, jax.random.PRNGKey(1))
    ecfg = EagleConfig(
        model=dataclasses.replace(draft_cfg, num_layers=1),
        num_iter=2, topk_per_iter=10, tree_size=12,
    )
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(2))
    engine = HierSpecEngine(cfg, draft_cfg, ecfg, eng, params, dparams,
                            eparams, min_draft_length=8, inner_unroll=INNER)

    # instrument: count fused-segment vs single-round calls
    counts = {"seg": 0, "single": 0}
    orig_rounds = engine._dispatch_rounds
    orig_round = engine._spec_round

    def wrap_rounds(root, k):
        counts["seg"] += 1
        return orig_rounds(root, k)

    def wrap_round(d0):
        counts["single"] += 1
        return orig_round(d0)

    engine._dispatch_rounds = wrap_rounds
    engine._spec_round = wrap_round

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
    engine.generate(ids, generation_length=8)  # warmup/compile
    engine.reset()
    counts["seg"] = counts["single"] = 0
    toks, decode_t, _ = engine.generate(ids, generation_length=193)
    rounds = len(engine.accept_lengths)
    print(json.dumps({
        "mode": f"generate[{DRAFT},{'scan' if INNER == 'scan' else 'unroll'}]", "tok_s": round((len(toks) - 1) / decode_t, 2),
        "ms_per_round": round(1e3 * decode_t / max(rounds, 1), 2),
        "accept": round(engine.mean_accept_length(), 3),
        "inner_accept": round(engine.mean_inner_accept_length(), 3),
        "segments": counts["seg"], "single_rounds": counts["single"],
        "rounds": rounds,
    }), flush=True)

    # clean fused-segment timing: warm state, steady reps
    engine.reset()
    engine.prefill(ids)
    toks, n = engine._spec_round(1)  # flush prefill-lag state
    d0 = toks[-1]

    def run_segments(k, d0):
        for _ in range(k):
            rr = engine._spec_rounds(d0, SEG)
            d0 = rr[-1][0][-1]
        return d0

    d0 = run_segments(1, d0)  # compile
    for rep in range(3):
        t0 = time.time()
        d0 = run_segments(2, d0)
        dt = time.time() - t0
        print(json.dumps({"rep": rep,
                          "seg_ms_per_round": round(1e3 * dt / (2 * SEG), 2)}),
              flush=True)

    tdir = "/tmp/jaxtrace_r4c_hier"
    with jax.profiler.trace(tdir):
        run_segments(1, d0)
    from exp_spec_profile import top_ops

    top_ops(tdir, n=26)


if __name__ == "__main__":
    main()
