"""Profile the full-stack round: W4A16 + InfLLM-v2 sparse + EAGLE-2/FR-Spec.

The reference's headline configuration (README.md:93-105). Measures
per-round cost at accept=1 (random weights) at PROMPT ctx, then traces a
segment and prints the top device ops.

Run: timeout 2400 python benchmark/exp_sparse_spec_profile.py [prompt_len]
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

PROMPT = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
SEG = 8


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True,
                              apply_sparse=True)
    eng = EngineConfig(chunk_length=2048,
                       max_total_length=PROMPT + 2048,
                       spec_segment_size=SEG)
    from bench import make_params
    from cpmcu_tpu.engine.spec_engine import SpecEngine
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    params = make_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = dataclasses.replace(cfg, num_layers=1, quant=False,
                                    quant_lmhead=False, apply_sparse=False)
    vfr = 32768
    ecfg = EagleConfig(
        model=draft_cfg, num_iter=2, topk_per_iter=10, tree_size=12,
        window=1024, use_input_norm=True, use_attn_norm=True,
        frspec_vocab_size=vfr,
    )
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    H = cfg.hidden_size
    eparams["lm_head"] = {"w": (jax.random.normal(
        jax.random.PRNGKey(2), (H, vfr), jnp.float32) * 0.02
    ).astype(cfg.jnp_dtype)}
    eparams["token_id_remap"] = jnp.arange(vfr, dtype=jnp.int32)
    engine = SpecEngine(cfg, ecfg, eng, params, eparams)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()
    t0 = time.time()
    engine.prefill(ids)
    print(json.dumps({"prefill_s": round(time.time() - t0, 1),
                      "prefill_tok_s": round(PROMPT / (time.time() - t0), 1)}),
          flush=True)

    # one unfused round to set up estate, then fused segments
    toks, _ = engine._spec_round(1)

    def run_segments(n):
        d0 = toks[-1]
        for _ in range(n):
            rounds = engine._spec_rounds(d0, SEG)
            d0 = rounds[-1][0][-1]
        return d0

    run_segments(1)  # compile
    for rep in range(3):
        t0 = time.time()
        run_segments(2)
        dt = time.time() - t0
        print(json.dumps({"rep": rep, "ms_per_round": round(1e3 * dt / (2 * SEG), 2),
                          "tok_s_at_accept1": round(2 * SEG / dt, 2)}), flush=True)

    trace_dir = "/tmp/jaxtrace_ss"
    try:
        with jax.profiler.trace(trace_dir):
            run_segments(1)
        from exp_spec_profile import top_ops

        top_ops(trace_dir, n=28)
    except Exception as e:
        print(json.dumps({"trace_error": f"{type(e).__name__}: {e}"}), flush=True)


if __name__ == "__main__":
    main()
