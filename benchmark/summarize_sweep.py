"""Summarize a run_r2_sweep.sh results file into a markdown table.

Usage: python benchmark/summarize_sweep.py [benchmark/results/r2_sweep.jsonl]

Each input line is {"mode": ..., "result": <bench.py JSON line or null>}.
Prints a markdown table (mode, metric, decode tok/s, vs_baseline, extras)
ready to paste into PERF.md, plus a failure list.
"""

from __future__ import annotations

import json
import sys


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    path = argv[0] if argv else "benchmark/results/r2_sweep.jsonl"
    rows, failed = [], []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            res = rec.get("result")
            if not res or res == "ok":
                (rows if res == "ok" else failed).append(
                    (rec.get("mode", "?"), res)
                )
                continue
            if isinstance(res, str):
                rows.append((rec["mode"], res))
                continue
            extra = res.get("extra", {}) or {}
            notes = ", ".join(
                f"{k}={v}" for k, v in extra.items() if k != "prefill_tok_s"
            )
            pf = extra.get("prefill_tok_s")
            rows.append((
                rec.get("mode", "?"),
                f"| {rec.get('mode','?')} | {res.get('value')} "
                f"{res.get('unit','')} | {res.get('vs_baseline')} | "
                f"{pf if pf is not None else ''} | {notes} |",
            ))
    print("| mode | decode | vs_baseline | prefill tok/s | notes |")
    print("|---|---|---|---|---|")
    for mode, row in rows:
        if isinstance(row, str) and row.startswith("|"):
            print(row)
        else:
            print(f"| {mode} | {row} | | | |")
    if failed:
        print()
        print("FAILED/TIMEOUT modes: " + ", ".join(m for m, _ in failed))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
