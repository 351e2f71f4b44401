"""Generation CLI: ``python -m cpmcu_tpu.cli``.

Parity with the reference CLI pipeline (cpmcu/cli.py:250-604): config
display -> model factory -> weight load -> prefill progress -> streamed
generation with stats, plus ``--dataset`` multi-turn evaluation.
"""

from __future__ import annotations

import sys
from typing import Optional

from .args import make_cli_parser
from .display import Display
from .logging import Logger, logger


def _resolve_prompt(args: dict, tokenizer) -> list:
    if args.get("prompt_file"):
        with open(args["prompt_file"], encoding="utf-8") as f:
            text = f.read()
    elif args.get("prompt_text"):
        text = args["prompt_text"]
    else:
        text = "Hello, how are you?"
    if (args.get("use_chat_template", True)
            and getattr(tokenizer, "chat_template", None)):
        return tokenizer.apply_chat_template(
            [{"role": "user", "content": text}],
            add_generation_prompt=True,
            tokenize=True,
        )
    return tokenizer.encode(text)


def run_generation(args: dict) -> int:
    from .factory import create_engine

    display = Display.get()
    display.show_config("Model", {
        "model_path": args["model_path"],
        "draft_model_path": args.get("draft_model_path"),
        "chunk_length": args.get("chunk_length", 2048),
        "memory_limit": args.get("memory_limit", 0.8),
        "attn_impl": args.get("attn_impl", "auto"),
        "temperature": args.get("temperature", 0.0),
    })

    engine, tokenizer = create_engine(args)
    if tokenizer is None:
        logger.error("no tokenizer found; use the library API for raw ids")
        return 2
    logger.info(f"max_total_length = {engine.max_total_length}")

    ids = _resolve_prompt(args, tokenizer)
    terminators = ([] if args.get("ignore_eos")
                   else [tokenizer.eos_token_id]
                   if tokenizer.eos_token_id is not None else [])
    gen_len = args.get("generation_length", 256)

    if args.get("dataset"):
        return run_dataset_evaluation(args, engine, tokenizer)

    stats = {}
    n_decoded = 0
    if args.get("use_stream", True):
        buf = []
        for item in engine.generate(
            ids, generation_length=gen_len, terminators=terminators,
            use_stream=True, progress_callback=display.progress_callback,
        ):
            tok = item["token"]
            if tok not in terminators:
                buf.append(tok)
                text = tokenizer.decode(buf, skip_special_tokens=True)
                # emit only whole decoded increments (multi-byte safety)
                if not text.endswith("�"):
                    display.stream_text(text[len(stats.get('_emitted', '')):])
                    stats['_emitted'] = text
            n_decoded += 1
            stats.update(item)
        display.stream_end()
    else:
        tokens, decode_time, prefill_time = engine.generate(
            ids, generation_length=gen_len, terminators=terminators,
            progress_callback=display.progress_callback,
        )
        print(tokenizer.decode(tokens, skip_special_tokens=True))
        n_decoded = len(tokens)
        stats = {"prefill_time": prefill_time, "decode_time": decode_time}

    summary = {
        "prompt_tokens": len(ids),
        "decode_tokens": n_decoded,
        "prefill_time": stats.get("prefill_time", 0.0),
        "decode_time": stats.get("decode_time", 0.0),
    }
    if hasattr(engine, "mean_accept_length"):
        summary["mean_accept_length"] = engine.mean_accept_length()
    display.show_generation_stats(summary)

    from ..utils.perf import perf_enabled, perf_summary

    if perf_enabled():
        print(perf_summary())
    return 0


def run_dataset_evaluation(args: dict, engine, tokenizer) -> int:
    from .benchmark import (
        load_dataset, run_dataset_evaluation as run_eval,
        save_results, summarize_results,
    )

    questions, _ = load_dataset(args["dataset"], args.get("dataset_path"))
    results = run_eval(
        engine, tokenizer, questions,
        generation_length=args.get("generation_length", 256),
        num_samples=args.get("num_samples", 0),
    )
    Display.get().show_config("Dataset summary", summarize_results(results))
    if args.get("output_path"):
        save_results(
            results, args["output_path"], args["dataset"], args["model_path"]
        )
    return 0


def main(argv: Optional[list] = None) -> int:
    args = vars(make_cli_parser().parse_args(argv))
    if args.get("plain_output"):
        Logger.get().plain = True
        Display.get().plain = True
    try:
        return run_generation(args)
    except FileNotFoundError as e:
        logger.error(str(e))
        return 2
    except MemoryError as e:
        logger.error(str(e))
        return 3
    except KeyboardInterrupt:
        logger.warning("interrupted")
        return 130


if __name__ == "__main__":
    sys.exit(main())
