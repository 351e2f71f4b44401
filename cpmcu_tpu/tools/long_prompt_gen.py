"""Long-prompt generator for 100K+ context benchmarking.

Port of examples/long_prompt_gen.py:10-112: concatenate source files from a
directory tree into one huge "summarize this repository" prompt.
"""

from __future__ import annotations

import argparse
import os

EXTS = (".py", ".md", ".cuh", ".cu", ".h", ".hpp", ".cc", ".cpp", ".txt")
HEADER = (
    "Please read the following repository source files carefully and then "
    "write a detailed technical summary of the project architecture.\n\n"
)


def build_prompt(root: str, target_chars: int = 400_000) -> str:
    parts = [HEADER]
    total = len(HEADER)
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames
                       if d not in (".git", "__pycache__", "node_modules")]
        for fn in sorted(filenames):
            if not fn.endswith(EXTS):
                continue
            path = os.path.join(dirpath, fn)
            try:
                with open(path, encoding="utf-8", errors="replace") as f:
                    text = f.read()
            except OSError:
                continue
            block = f"\n===== FILE: {os.path.relpath(path, root)} =====\n{text}"
            parts.append(block)
            total += len(block)
            if total >= target_chars:
                parts.append("\n\nNow summarize the repository above.")
                return "".join(parts)
    parts.append("\n\nNow summarize the repository above.")
    return "".join(parts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=".")
    ap.add_argument("--target-chars", type=int, default=400_000)
    ap.add_argument("--output", default="long_prompt.txt")
    args = ap.parse_args(argv)
    prompt = build_prompt(args.root, args.target_chars)
    with open(args.output, "w", encoding="utf-8") as f:
        f.write(prompt)
    print(f"wrote {len(prompt)} chars to {args.output}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
