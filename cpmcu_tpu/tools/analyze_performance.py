"""Benchmark-results analyzer: json results -> CSV + console summary.

Port of benchmark/analyze_performance.py:15-110: walks result files saved by
serve.benchmark.save_results, extracts per-question prefill/decode tok/s and
accept lengths, writes a CSV and prints aggregate rows per (dataset, model).
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
from typing import Dict, List


def load_result_files(paths: List[str]) -> List[Dict]:
    files = []
    for p in paths:
        if os.path.isdir(p):
            files += sorted(glob.glob(os.path.join(p, "*.json")))
        else:
            files += sorted(glob.glob(p))
    out = []
    for f in files:
        try:
            with open(f) as fh:
                data = json.load(fh)
            data["_file"] = f
            out.append(data)
        except (json.JSONDecodeError, OSError):
            continue
    return out


def extract_rows(results: List[Dict]) -> List[Dict]:
    rows = []
    for run in results:
        for r in run.get("results", []):
            for ti, t in enumerate(r.get("turns", [])):
                rows.append({
                    "file": os.path.basename(run.get("_file", "")),
                    "dataset": run.get("dataset", ""),
                    "model": run.get("model", ""),
                    "question_id": r.get("question_id"),
                    "turn": ti,
                    "prefill_tok_s": round(t.get("prefill_tok_s", 0.0), 2),
                    "decode_tok_s": round(t.get("decode_tok_s", 0.0), 2),
                    "accept_length": round(t.get("accept_length", 0.0), 3),
                    "decode_tokens": t.get("decode_tokens", 0),
                })
    return rows


def aggregate(rows: List[Dict]) -> List[Dict]:
    groups: Dict[tuple, List[Dict]] = {}
    for row in rows:
        groups.setdefault((row["dataset"], row["model"]), []).append(row)
    out = []
    for (ds, model), rs in sorted(groups.items()):
        def mean(k):
            vals = [r[k] for r in rs if r[k]]
            return round(sum(vals) / len(vals), 2) if vals else 0.0

        out.append({
            "dataset": ds, "model": model, "turns": len(rs),
            "mean_prefill_tok_s": mean("prefill_tok_s"),
            "mean_decode_tok_s": mean("decode_tok_s"),
            "mean_accept_length": mean("accept_length"),
        })
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+", help="result json files or dirs")
    ap.add_argument("--output-csv", default="performance_analysis.csv")
    args = ap.parse_args(argv)

    results = load_result_files(args.paths)
    rows = extract_rows(results)
    if not rows:
        print("no results found")
        return 1
    with open(args.output_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {len(rows)} rows to {args.output_csv}")
    for agg in aggregate(rows):
        print(json.dumps(agg))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
