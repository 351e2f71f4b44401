"""FR-Spec frequency-ranked vocabulary generator.

Port of scripts/fr_spec/gen_fr_index.py:9-89: count token frequencies over a
text corpus with the model tokenizer, rank ids by frequency, force the EOS
token into the head, and save the top-N id lists (freq_{N}.npy; the
reference saves torch .pt — both load through serve.factory.load_frspec_ids).

Usage::

    python -m cpmcu_tpu.tools.gen_fr_index --model-path <hf_dir> \
        --corpus wiki.txt --sizes 8192 16384 32768 --output-dir <dir>
"""

from __future__ import annotations

import argparse
import os
from typing import Iterable, Optional, Sequence

import numpy as np


def count_token_frequencies(
    tokenizer, texts: Iterable[str], vocab_size: int, max_tokens: int = 0
) -> np.ndarray:
    counts = np.zeros(vocab_size, np.int64)
    seen = 0
    for text in texts:
        if not text.strip():
            continue
        ids = tokenizer.encode(text)
        ids = np.asarray(ids, np.int64)
        ids = ids[(ids >= 0) & (ids < vocab_size)]
        counts += np.bincount(ids, minlength=vocab_size)
        seen += len(ids)
        if max_tokens and seen >= max_tokens:
            break
    return counts


def rank_ids(counts: np.ndarray, eos_token_id: Optional[int]) -> np.ndarray:
    """Frequency-descending ids with EOS forced to the front
    (gen_fr_index.py:62-74)."""
    order = np.argsort(-counts, kind="stable").astype(np.int32)
    if eos_token_id is not None:
        order = order[order != eos_token_id]
        order = np.concatenate([[np.int32(eos_token_id)], order])
    return order


def generate_fr_index(
    tokenizer,
    texts: Iterable[str],
    sizes: Sequence[int],
    output_dir: str,
    max_tokens: int = 0,
) -> dict:
    vocab_size = getattr(tokenizer, "vocab_size", None) or len(tokenizer)
    counts = count_token_frequencies(tokenizer, texts, vocab_size, max_tokens)
    ranked = rank_ids(counts, getattr(tokenizer, "eos_token_id", None))
    os.makedirs(output_dir, exist_ok=True)
    paths = {}
    for n in sizes:
        path = os.path.join(output_dir, f"freq_{n}.npy")
        np.save(path, ranked[:n])
        paths[n] = path
    return paths


def _iter_corpus(path: str):
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            yield line


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--corpus", required=True, help="plain-text corpus file")
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[8192, 16384, 32768])
    ap.add_argument("--output-dir", default=".")
    ap.add_argument("--max-tokens", type=int, default=0)
    args = ap.parse_args(argv)

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(args.model_path)
    paths = generate_fr_index(
        tokenizer, _iter_corpus(args.corpus), args.sizes,
        args.output_dir, args.max_tokens,
    )
    for n, p in paths.items():
        print(f"saved {p}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
