"""Round-4 profile A: the reference's REAL operating point on the realistic
checkpoint (VERDICT r3 tasks 1+4).

  A. 96K realistic sparse prefill: per-chunk timing curve + device-op trace
     of a late chunk (where selection spans the full context).
  B. 96K realistic full-stack decode (W4A16 + InfLLM-v2 + EAGLE-2/FR-Spec):
     measured accept + ms/round + device-op trace of one fused segment.
  C. quant-draft-head A/B at the same point (ms/round only).

Run: timeout 4000 python benchmark/exp_r4a_profile.py [prompt_len] [ABC]
(second arg selects sections, e.g. "B" to re-trace only the decode round)
"""

import dataclasses
import json
import os
import sys
import time

os.environ["CPMCU_REALISTIC"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import MINICPM4_8B, EngineConfig

PROMPT = int(sys.argv[1]) if len(sys.argv) > 1 else 96 * 1024
SECTIONS = sys.argv[2].upper() if len(sys.argv) > 2 else "ABC"
SEG = 12  # the bench headline's spec_segment_size
NOISE = 0.35


def section(name):
    print(f"=== {name} ===", flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from bench import make_params
    from exp_spec_profile import top_ops

    cfg = dataclasses.replace(MINICPM4_8B, quant=True, quant_lmhead=True,
                              apply_sparse=True)
    params = make_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=PROMPT).tolist()

    # ---------------- A: sparse prefill decomposition ----------------
    section("A: realistic sparse prefill")
    try:
        if "A" not in SECTIONS:
            raise RuntimeError("skipped")
        from cpmcu_tpu.engine.engine import Engine, chunk_width

        eng = EngineConfig(chunk_length=2048, max_total_length=PROMPT + 4096)
        engine = Engine(cfg, eng, params)
        t0 = time.time()
        engine.prefill(ids)  # compile
        print(json.dumps({"prefill_cold_s": round(time.time() - t0, 1)}),
              flush=True)
        engine.reset()
        t0 = time.time()
        engine.prefill(ids)
        dt = time.time() - t0
        print(json.dumps({"prefill_s": round(dt, 2),
                          "prefill_tok_s": round(PROMPT / dt, 1)}), flush=True)

        # per-chunk curve (sync each chunk; RTT ~ms vs ~0.5s chunks)
        engine.reset()
        C = eng.chunk_length
        times = []
        for i in range(0, PROMPT, C):
            n = min(PROMPT - i, C)
            cw = chunk_width(n, C)
            chunk = np.zeros((cw,), np.int32)
            chunk[:n] = ids[i:i + n]
            pos = np.arange(i, i + cw, dtype=np.int32)
            t0 = time.time()
            logits = engine._forward(jnp.asarray(chunk), jnp.asarray(pos),
                                     logits_idx=jnp.asarray(n - 1, jnp.int32),
                                     logits_mode="index")
            np.asarray(logits)
            times.append(time.time() - t0)
            engine.commit(n, max_new=cw)
        times = np.asarray(times)
        qs = [round(float(x) * 1e3, 1) for x in
              (times[0], times[len(times) // 4], times[len(times) // 2],
               times[3 * len(times) // 4], times[-1])]
        print(json.dumps({"chunk_ms_q0_q25_q50_q75_last": qs,
                          "sum_s": round(float(times.sum()), 2)}), flush=True)

        # trace a LATE chunk (selection spans ~94K of context)
        engine.cache = engine.cache.with_length(PROMPT - 2048)
        engine.host_len = PROMPT - 2048
        chunk = np.asarray(ids[-2048:], np.int32)
        pos = np.arange(PROMPT - 2048, PROMPT, dtype=np.int32)
        tdir = "/tmp/jaxtrace_r4a_prefill"
        with jax.profiler.trace(tdir):
            logits = engine._forward(jnp.asarray(chunk), jnp.asarray(pos),
                                     logits_idx=jnp.asarray(2047, jnp.int32),
                                     logits_mode="index")
            np.asarray(logits)
        top_ops(tdir, n=30)
        del engine
    except Exception as e:
        print(json.dumps({"A_error": f"{type(e).__name__}: {e}"}), flush=True)

    # ---------------- B: full-stack decode round ----------------
    section("B: full-stack decode (sparse 96K + eagle2 realistic)")
    try:
        if "B" not in SECTIONS:
            raise RuntimeError("skipped")
        from cpmcu_tpu.engine.spec_engine import SpecEngine
        from cpmcu_tpu.models.realistic import init_eagle_params_realistic
        from cpmcu_tpu.spec.eagle import EagleConfig

        eng = EngineConfig(chunk_length=2048, max_total_length=PROMPT + 4096,
                           spec_segment_size=SEG)
        draft_cfg = dataclasses.replace(cfg, num_layers=1, quant_lmhead=False)
        ecfg = EagleConfig(
            model=draft_cfg, num_iter=2, topk_per_iter=10, tree_size=12,
            window=1024, use_input_norm=True, use_attn_norm=True,
            frspec_vocab_size=32768,
        )
        eparams = init_eagle_params_realistic(ecfg, cfg, seed=0,
                                              drafter_noise=NOISE)
        engine = SpecEngine(cfg, ecfg, eng, params, eparams)
        engine.generate(ids, generation_length=8)  # warmup/compile
        engine.reset()
        toks, decode_t, prefill_t = engine.generate(ids, generation_length=192)
        print(json.dumps({
            "decode_tok_s": round((len(toks) - 1) / decode_t, 2),
            "mean_accept": round(engine.mean_accept_length(), 3),
            "prefill_tok_s": round(PROMPT / prefill_t, 1),
            "ms_per_round": round(1e3 * decode_t /
                                  max(1, len(engine.accept_lengths)), 2),
        }), flush=True)

        # fused-segment round timing at the post-generate state
        engine.reset()
        engine.prefill(ids)
        toks, _ = engine._spec_round(1)
        d0 = toks[-1]
        def run_segments(n, d0):
            for _ in range(n):
                rounds = engine._spec_rounds(d0, SEG)
                d0 = rounds[-1][0][-1]
            return d0
        d0 = run_segments(1, d0)  # compile
        for rep in range(3):
            t0 = time.time()
            d0 = run_segments(2, d0)
            dt = time.time() - t0
            print(json.dumps({"rep": rep,
                              "ms_per_round": round(1e3 * dt / (2 * SEG), 2)}),
                  flush=True)
        tdir = "/tmp/jaxtrace_r4a_round"
        with jax.profiler.trace(tdir):
            run_segments(1, d0)
        top_ops(tdir, n=30)
        del engine
    except Exception as e:
        print(json.dumps({"B_error": f"{type(e).__name__}: {e}"}), flush=True)

    # ---------------- C: quant draft head A/B ----------------
    section("C: quant-draft-head A/B (ms/round at 96K)")
    try:
        if "C" not in SECTIONS:
            raise RuntimeError("skipped")
        eparams = init_eagle_params_realistic(ecfg, cfg, seed=0,
                                              drafter_noise=NOISE,
                                              quant_head=True)
        engine = SpecEngine(cfg, ecfg, eng, params, eparams)
        engine.generate(ids, generation_length=8)
        engine.reset()
        toks, decode_t, _ = engine.generate(ids, generation_length=192)
        print(json.dumps({
            "qdh_decode_tok_s": round((len(toks) - 1) / decode_t, 2),
            "qdh_mean_accept": round(engine.mean_accept_length(), 3),
            "qdh_ms_per_round": round(1e3 * decode_t /
                                      max(1, len(engine.accept_lengths)), 2),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"C_error": f"{type(e).__name__}: {e}"}), flush=True)


if __name__ == "__main__":
    main()
