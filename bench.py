"""Benchmark driver — prints ONE JSON line with the headline metric.

Round-1 flagship: MiniCPM4-0.5B bf16 dense, greedy decode tok/s on one chip
(synthetic weights; no checkpoint is mounted in this image). The reference
headline (BASELINE.md) is 154.59 decode tok/s for MiniCPM4-8B W4A16 +
EAGLE/FR-Spec on an A100 — vs_baseline is reported against that number and
will become apples-to-apples when the W4A16 + spec stack lands in the bench.
"""

import argparse
import json
import sys
import time

import numpy as np


def bench_decode(cfg, eng, steps=64, warmup=8, prompt_len=128):
    import jax
    import jax.numpy as jnp

    from cpmcu_tpu.engine.engine import Engine, decode_segment
    from cpmcu_tpu.models import llama

    if cfg.quant:
        from cpmcu_tpu.models.quantize import init_params_quant

        params = init_params_quant(cfg, jax.random.PRNGKey(0))
    else:
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    engine = Engine(cfg, eng, params)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()

    engine.prefill(ids)  # includes compile
    t0 = time.time()
    engine.cache = engine.cache.with_length(0)
    engine.prefill(ids)
    prefill_time = time.time() - t0

    seg = engine.eng.decode_segment_size

    def run_segments(n):
        tok = jnp.asarray(1, jnp.int32)
        pos = jnp.asarray(prompt_len, jnp.int32)
        done = 0
        while done < n:
            engine.cache, toks, engine.key = decode_segment(
                cfg, params, engine.rope, engine.cache, tok, pos, engine.key,
                k=seg, temperature=0.0, top_k=0, top_p=1.0,
                attn_impl=engine.attn_impl,
            )
            tok = toks[-1]
            pos = pos + seg
            done += seg
        toks.block_until_ready()

    run_segments(warmup)  # compile
    start_len = int(engine.cache.length)
    t0 = time.time()
    run_segments(steps)
    decode_time = time.time() - t0
    steps_done = ((steps + seg - 1) // seg) * seg
    return {
        "decode_tok_s": steps_done / decode_time,
        "prefill_tok_s": prompt_len / prefill_time,
        "end_len": int(engine.cache.length) - start_len,
    }


def bench_spec(cfg, eng, steps=128, prompt_len=128):
    """Spec-mode throughput. With random weights the drafter is uninformed
    (accept ~1) — this measures per-round overhead, a lower bound; real
    checkpoints reach ~2.5 accept (BASELINE.md)."""
    import dataclasses

    import jax

    from cpmcu_tpu.engine.spec_engine import SpecEngine
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.models.quantize import init_params_quant
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    draft_cfg = dataclasses.replace(
        cfg, num_layers=1, quant=False, intermediate_size=cfg.intermediate_size
    )
    ecfg = EagleConfig(
        model=draft_cfg, num_iter=2, topk_per_iter=10, tree_size=12,
        window=1024, use_input_norm=True, use_attn_norm=True,
    )
    if cfg.quant:
        params = init_params_quant(cfg, jax.random.PRNGKey(0))
    else:
        params = llama.init_params(cfg, jax.random.PRNGKey(0))
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    engine = SpecEngine(cfg, ecfg, eng, params, eparams)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=prompt_len).tolist()
    # warmup/compile
    engine.generate(ids, generation_length=8)

    engine.reset()
    t0 = time.time()
    toks, decode_time, prefill_time = engine.generate(ids, generation_length=steps)
    total = time.time() - t0
    n = len(toks)
    return {
        "decode_tok_s": (n - 1) / max(decode_time, 1e-9),
        "prefill_tok_s": prompt_len / max(prefill_time, 1e-9),
        "mean_accept": engine.mean_accept_length(),
        "n_tokens": n,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--config", default="minicpm4-0.5b", choices=["minicpm4-0.5b", "minicpm4-8b"]
    )
    ap.add_argument("--quant", action="store_true", help="W4A16 weights")
    ap.add_argument("--spec", action="store_true", help="EAGLE tree speculation")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--max-len", type=int, default=2048)
    args = ap.parse_args()

    import dataclasses

    from cpmcu_tpu.core.config import MINICPM4_0_5B, MINICPM4_8B, EngineConfig

    cfg = {"minicpm4-0.5b": MINICPM4_0_5B, "minicpm4-8b": MINICPM4_8B}[args.config]
    if args.quant:
        cfg = dataclasses.replace(cfg, quant=True)
    eng = EngineConfig(chunk_length=512, max_total_length=args.max_len)

    try:
        baseline = 154.59  # reference decode tok/s (BASELINE.md; 8B W4A16+spec on A100)
        wt = "w4a16" if args.quant else "bf16"
        if args.spec:
            r = bench_spec(cfg, eng, steps=args.steps)
            extra = {
                "prefill_tok_s": round(r["prefill_tok_s"], 2),
                "mean_accept_length": round(r["mean_accept"], 3),
            }
            mode = "eagle-spec"
        else:
            r = bench_decode(cfg, eng, steps=args.steps)
            extra = {"prefill_tok_s": round(r["prefill_tok_s"], 2)}
            mode = "dense"
        print(
            json.dumps(
                {
                    "metric": f"{args.config}-{wt}-{mode} decode throughput (1 chip)",
                    "value": round(r["decode_tok_s"], 2),
                    "unit": "tok/s",
                    "vs_baseline": round(r["decode_tok_s"] / baseline, 4),
                    "extra": extra,
                }
            )
        )
    except Exception as e:  # never leave the driver without a JSON line
        print(json.dumps({"metric": "bench-error", "value": 0, "unit": "tok/s",
                          "vs_baseline": 0, "error": f"{type(e).__name__}: {e}"}))
        raise


if __name__ == "__main__":
    main()
