"""Argument parsing shared by the CLI and the server.

Mirrors the reference's argparse groups and defaults
(cpmcu/common/args.py:22-155): model/system, speculative, sparse-attention,
generation, dataset, and server groups, with both kebab- and snake-case
aliases normalized onto one dest. TPU-specific additions (mesh axes, attn
impl) have no reference counterpart.
"""

from __future__ import annotations

import argparse


def _opt(group, name: str, **kw):
    """Add --kebab-case / --snake_case aliases for one dest."""
    kebab = f"--{name.replace('_', '-')}"
    snake = f"--{name}"
    names = [kebab] if kebab == snake else [kebab, snake]
    group.add_argument(*names, dest=name, **kw)


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if str(v).lower() in ("true", "1", "yes", "y", "on"):
        return True
    if str(v).lower() in ("false", "0", "no", "n", "off"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def add_model_config_args(parser: argparse.ArgumentParser):
    g = parser.add_argument_group("Model Configuration")
    _opt(g, "model_path", type=str, required=True,
         help="HF model path or local checkpoint directory")
    _opt(g, "draft_model_path", type=str, default=None,
         help="EAGLE draft model path (enables speculative decoding)")
    _opt(g, "dtype", type=str, default=None,
         choices=["float16", "bfloat16", "float32"],
         help="compute dtype (fp16 is promoted to bf16 on TPU)")

    s = parser.add_argument_group("System Configuration")
    _opt(s, "chunk_length", type=int, default=2048,
         help="prefill chunk length (default: 2048)")
    _opt(s, "memory_limit", type=float, default=0.8,
         help="fraction of HBM usable (default: 0.8)")
    _opt(s, "max_total_length", type=int, default=0,
         help="override the solved KV budget (0 = auto)")
    _opt(s, "attn_impl", type=str, default="auto",
         choices=["auto", "flash", "xla"], help="attention kernel backend")
    _opt(s, "decode_segment_size", type=int, default=16,
         help="tokens per fused decode program (CUDA-graph-replay analog)")
    _opt(s, "prefix_cache", type=str2bool, default=False, nargs="?",
         const=True,
         help="reuse KV of the longest token prefix shared with the "
              "previous request (lossless; multi-turn chat skips "
              "re-prefilling the history; dense + continuous-batching "
              "engines — spec engines ignore it)")
    _opt(s, "random_seed", type=int, default=0)
    _opt(s, "plain_output", type=str2bool, default=False, nargs="?", const=True)

    sp = parser.add_argument_group("Speculative Decoding")
    _opt(sp, "spec_window_size", type=int, default=1024,
         help="draft sliding window (default: 1024)")
    _opt(sp, "spec_num_iter", type=int, default=2)
    _opt(sp, "spec_topk_per_iter", type=int, default=10)
    _opt(sp, "spec_tree_size", type=int, default=12)
    _opt(sp, "frspec_vocab_size", type=int, default=32768,
         help="FR-Spec draft vocabulary size (0 disables)")
    _opt(sp, "frspec_path", type=str, default=None,
         help="frequency-ranked vocab file (.pt/.npy); defaults to "
              "freq_{size}.(npy|pt) in the draft model dir")
    _opt(sp, "spec_type", type=str, default="auto",
         choices=["auto", "eagle2", "eagle3"],
         help="EAGLE drafter version (auto-detected from draft config)")
    _opt(sp, "d2t_is_offset", type=str2bool, default=False, nargs="?",
         const=True,
         help="EAGLE-3 d2t stores offsets (t = d + d2t[d]) instead of a "
              "direct map")

    sa = parser.add_argument_group("Sparse Attention")
    _opt(sa, "sink_window_size", type=int, default=1)
    _opt(sa, "block_window_size", type=int, default=8)
    _opt(sa, "sparse_topk_k", type=int, default=64)
    _opt(sa, "sparse_switch", type=int, default=0)
    _opt(sa, "use_compress_lse", type=str2bool, default=True, nargs="?", const=True)
    _opt(sa, "apply_sparse", type=str2bool, default=None, nargs="?", const=True,
         help="force sparse attention on/off (default: auto-detect MiniCPM4)")

    y = parser.add_argument_group("Long Context")
    _opt(y, "apply_yarn", type=str2bool, default=None, nargs="?", const=True,
         help="apply the MiniCPM4 YARN factors (default: auto when the "
              "prompt exceeds the native context)")

    t = parser.add_argument_group("TPU Parallelism")
    _opt(t, "tp_size", type=int, default=1, help="tensor-parallel ways")
    _opt(t, "dp_size", type=int, default=1, help="data-parallel ways")
    return parser


def add_generation_args(parser: argparse.ArgumentParser):
    g = parser.add_argument_group("Generation")
    _opt(g, "prompt_text", type=str, default=None)
    _opt(g, "prompt_file", type=str, default=None)
    _opt(g, "generation_length", type=int, default=256)
    _opt(g, "temperature", type=float, default=0.0)
    _opt(g, "top_p", type=float, default=1.0)
    _opt(g, "top_k", type=int, default=0)
    _opt(g, "use_stream", type=str2bool, default=True, nargs="?", const=True)
    _opt(g, "use_chat_template", type=str2bool, default=True, nargs="?",
         const=True,
         help="apply the tokenizer chat template to the prompt")
    _opt(g, "ignore_eos", type=str2bool, default=False, nargs="?", const=True,
         help="keep generating past EOS (benchmark mode)")

    d = parser.add_argument_group("Dataset Evaluation")
    _opt(d, "dataset", type=str, default=None,
         choices=["mtbench", "specbench", "gsm8k", "qa", "wmt14", "rag",
                  "summarization"])
    _opt(d, "dataset_path", type=str, default=None)
    _opt(d, "num_samples", type=int, default=0, help="0 = all")
    _opt(d, "output_path", type=str, default=None,
         help="where to save json results")
    return parser


def add_server_args(parser: argparse.ArgumentParser):
    s = parser.add_argument_group("Server")
    _opt(s, "host", type=str, default="0.0.0.0")
    _opt(s, "port", type=int, default=8000)
    _opt(s, "max_batch", type=int, default=0,
         help="continuous-batching slots (0 = single-sequence engine, "
              "requests serialize like the reference server)")
    _opt(s, "batch_spec_policy", type=str, default="auto",
         choices=["auto", "force", "off"],
         help="speculation policy under continuous batching (beyond "
              "reference — it is batch-1 only): 'auto' serves PLAIN "
              "batching at max_batch>=2 (measured crossover: batching "
              "already amortizes the weight stream, so per-slot tree "
              "verify loses — PERF.md r4e table), 'force' keeps the "
              "batched EAGLE engine, 'off' always drops the drafter")
    return parser


def make_cli_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m cpmcu_tpu.cli",
        description="cpmcu_tpu generation CLI (reference: python -m cpmcu.cli)",
    )
    add_model_config_args(p)
    add_generation_args(p)
    return p


def make_server_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m cpmcu_tpu.server",
        description="OpenAI-compatible API server",
    )
    add_model_config_args(p)
    add_server_args(p)
    return p
