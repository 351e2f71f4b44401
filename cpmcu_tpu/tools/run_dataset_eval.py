"""Run the dataset benchmark end-to-end (serve.benchmark machinery).

The reference's benchmark-as-test path (cpmcu/common/benchmark.py:27-178 +
cpmcu/cli.py:436-567): load one of the seven jsonl datasets, generate per
question, record per-question prefill/decode tok/s (+ mean accept length for
spec engines), save a timestamped results json, and emit the CSV summary via
tools.analyze_performance.

No checkpoint ships in this image, so the default model is the synthetic
W4A16 8B with a byte-level tokenizer — the throughput numbers and the
machinery are real, the text is not (PERF.md synthetic-weights caveat).
A real checkpoint dir + tokenizer can be passed with --model-path.

Usage::

    python -m cpmcu_tpu.tools.run_dataset_eval --dataset specbench \
        --num-samples 8 --generation-length 64 [--spec]
"""

from __future__ import annotations

import argparse
import json
import os


class ByteTokenizer:
    """UTF-8 byte tokenizer (ids 0..255) for synthetic-weight eval runs."""

    eos_token_id = None
    chat_template = None

    def __init__(self, max_tokens: int = 0):
        self.max_tokens = max_tokens

    def encode(self, text: str):
        ids = list(text.encode("utf-8"))
        if self.max_tokens and len(ids) > self.max_tokens:
            ids = ids[-self.max_tokens:]
        return ids

    def decode(self, tokens, skip_special_tokens: bool = True):
        return bytes(int(t) % 256 for t in tokens).decode("utf-8",
                                                          errors="replace")


def build_engine(args):
    import dataclasses

    import jax

    from ..core.config import MINICPM4_0_5B, MINICPM4_8B, EngineConfig

    eng = EngineConfig(chunk_length=args.chunk_length,
                       max_total_length=args.max_total_length)
    if args.model_path:
        from ..serve.factory import create_engine

        engine, _tok = create_engine({
            "model_path": args.model_path,
            "chunk_length": args.chunk_length,
            "max_total_length": args.max_total_length,
        })
        return engine
    cfg = {"minicpm4-0.5b": MINICPM4_0_5B,
           "minicpm4-8b": MINICPM4_8B}[args.config]
    cfg = dataclasses.replace(cfg, quant=True, quant_lmhead=True)
    if args.spec:
        import jax.numpy as jnp

        from ..engine.spec_engine import SpecEngine
        from ..models import llama
        from ..models.quantize import init_params_quant
        from ..spec.eagle import EagleConfig, init_eagle_params

        # W4A16 drafter layers (reference headline eagle.w4a16_gm)
        draft_cfg = dataclasses.replace(cfg, num_layers=1,
                                        quant_lmhead=False)
        if args.oracle_accept:
            # oracle drafter: accept == num_iter+1 flows through the whole
            # accept-length bookkeeping (random drafters sit at ~1)
            from ..spec.oracle import oracle_spec_pair

            ecfg = EagleConfig(model=draft_cfg, num_iter=2,
                               topk_per_iter=10, tree_size=12, window=1024,
                               use_input_norm=False, use_attn_norm=True,
                               frspec_vocab_size=0)
            params, eparams = oracle_spec_pair(cfg, ecfg)
            return SpecEngine(cfg, ecfg, eng, params, eparams)
        params = init_params_quant(cfg, jax.random.PRNGKey(0))
        ecfg = EagleConfig(model=draft_cfg, num_iter=2, topk_per_iter=10,
                           tree_size=12, window=1024, use_input_norm=True,
                           use_attn_norm=True, frspec_vocab_size=32768)
        eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
        H = cfg.hidden_size
        eparams["lm_head"] = {"w": (jax.random.normal(
            jax.random.PRNGKey(2), (H, 32768), jnp.float32
        ) * 0.02).astype(cfg.jnp_dtype)}
        eparams["token_id_remap"] = jnp.arange(32768, dtype=jnp.int32)
        return SpecEngine(cfg, ecfg, eng, params, eparams)
    from ..engine.engine import Engine
    from ..models.quantize import init_params_quant

    params = init_params_quant(cfg, jax.random.PRNGKey(0))
    return Engine(cfg, eng, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", action="append", required=True,
                    help="one of serve.benchmark.DATASETS; repeatable")
    ap.add_argument("--config", default="minicpm4-8b",
                    choices=["minicpm4-0.5b", "minicpm4-8b"])
    ap.add_argument("--model-path", default="",
                    help="real checkpoint dir (uses serve.factory + HF "
                    "tokenizer) instead of synthetic weights")
    ap.add_argument("--spec", action="store_true",
                    help="EAGLE-2+FR-Spec engine (records accept lengths)")
    ap.add_argument("--oracle-accept", action="store_true",
                    help="with --spec: oracle drafter (accept == "
                    "num_iter+1 every round; best-case endpoint)")
    ap.add_argument("--no-warmup", dest="warmup", action="store_false",
                    default=True, help="skip the untimed warmup turn")
    ap.add_argument("--num-samples", type=int, default=8)
    ap.add_argument("--generation-length", type=int, default=64)
    ap.add_argument("--max-prompt-tokens", type=int, default=1024)
    ap.add_argument("--chunk-length", type=int, default=1024)
    ap.add_argument("--max-total-length", type=int, default=4096)
    ap.add_argument("--output-dir", default="benchmark/results")
    args = ap.parse_args()

    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from ..serve.benchmark import (
        load_dataset, run_dataset_evaluation, save_results,
    )
    from .analyze_performance import main as analyze_main

    engine = build_engine(args)
    if args.model_path:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    else:
        tokenizer = ByteTokenizer(max_tokens=args.max_prompt_tokens)
    model_name = args.model_path or f"{args.config}-synthetic"

    paths = []
    for ds in args.dataset:
        questions, n = load_dataset(ds)
        results = run_dataset_evaluation(
            engine, tokenizer, questions,
            generation_length=args.generation_length,
            num_samples=args.num_samples,
            warmup=args.warmup,
        )
        paths.append(save_results(results, args.output_dir, ds, model_name))

    analyze_main([*paths, "--output-csv",
                  os.path.join(args.output_dir, "summary.csv")])
    print(json.dumps({"results": paths}))


if __name__ == "__main__":
    main()
