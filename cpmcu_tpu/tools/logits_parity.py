"""Logits-parity harness — the correctness oracle across configurations.

Port of the reference's examples/logits_comparison_direct.py:33-120, which
monkey-patches ``prefill``/``decode`` to capture per-accepted-token logits
for cross-config comparison (fp16 vs W4A16, spec vs non-spec). Here the
engine's ``_forward`` seam is hooked cleanly instead, and comparison metrics
(max abs diff, top-1 agreement, KL) are computed in-process.

Usage::

    from cpmcu_tpu.tools.logits_parity import capture_logits, compare_captures
    cap_a = capture_logits(engine_a, prompts, generation_length=32)
    cap_b = capture_logits(engine_b, prompts, generation_length=32)
    report = compare_captures(cap_a, cap_b)
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class Capture:
    """Per-prompt: emitted token ids and the fp32 logits that produced them."""

    tokens: List[List[int]]
    logits: List[np.ndarray]  # per prompt: (n_emitted, V)
    config: Dict


def capture_logits(
    engine,
    prompts: Sequence[Sequence[int]],
    generation_length: int = 32,
    terminators: Sequence[int] = (),
) -> Capture:
    """Greedy-generate and record the logits row behind every emitted token.

    Works for both the plain Engine and SpecEngine: the hook wraps
    ``_forward``/the spec step outputs. For spec engines the recorded rows
    are the tree-decode logits of the *accepted* path — the quantity the
    reference compares (logits_comparison_direct.py:59-101).
    """
    all_tokens: List[List[int]] = []
    all_logits: List[np.ndarray] = []

    is_spec = hasattr(engine, "_spec_round")

    for ids in prompts:
        engine.reset()
        rows: List[np.ndarray] = []
        toks: List[int] = []

        if not is_spec:
            logits = engine.prefill(list(ids))
            rows.append(np.asarray(logits[-1], np.float32))
            tok = int(np.argmax(rows[-1]))
            toks.append(tok)
            pos = len(ids)
            for _ in range(generation_length - 1):
                if tok in terminators:
                    break
                logits = engine.decode([tok], [pos])
                engine.commit(1)
                rows.append(np.asarray(logits[-1], np.float32))
                tok = int(np.argmax(rows[-1]))
                toks.append(tok)
                pos += 1
        else:
            # spec path: the jitted spec step returns the accepted path's
            # fp32 logits rows (SpecEngine.last_path_logits) — exactly the
            # rows the reference captures per accepted token
            logits = engine.prefill(list(ids))
            rows.append(np.asarray(logits[-1], np.float32))
            tok = int(np.argmax(rows[-1]))
            toks.append(tok)
            while len(toks) < generation_length:
                emitted, n = engine._spec_round(tok)
                for j, t in enumerate(emitted):
                    toks.append(int(t))
                    rows.append(engine.last_path_logits[j])
                    if len(toks) >= generation_length:
                        break
                tok = toks[-1]
                if tok in terminators:
                    break
            rows = rows[:generation_length]
            toks = toks[:generation_length]

        all_tokens.append(toks)
        all_logits.append(np.stack(rows) if rows else np.zeros((0, 0)))

    return Capture(
        tokens=all_tokens,
        logits=all_logits,
        config={"cls": type(engine).__name__,
                "cfg": dataclasses.asdict(engine.cfg)},
    )


def compare_captures(a: Capture, b: Capture, top_k: int = 5) -> Dict:
    """Cross-config comparison report (the reference's pickle-diff step)."""
    assert len(a.tokens) == len(b.tokens), "prompt count mismatch"
    reports = []
    for i, (ta, tb) in enumerate(zip(a.tokens, b.tokens)):
        n = min(len(ta), len(tb))
        match = sum(1 for x, y in zip(ta[:n], tb[:n]) if x == y)
        r = {"prompt": i, "tokens_a": len(ta), "tokens_b": len(tb),
             "token_agreement": match / max(n, 1)}
        la, lb = a.logits[i], b.logits[i]
        m = min(len(la), len(lb))
        if m and la.shape[-1] == lb.shape[-1]:
            diff = np.abs(la[:m] - lb[:m])
            r["max_abs_diff"] = float(diff.max())
            r["mean_abs_diff"] = float(diff.mean())
            pa = _softmax(la[:m])
            pb = _softmax(lb[:m])
            r["mean_kl"] = float(
                np.mean(np.sum(pa * (np.log(pa + 1e-12) - np.log(pb + 1e-12)), -1))
            )
            r["top1_agreement"] = float(
                np.mean(np.argmax(la[:m], -1) == np.argmax(lb[:m], -1))
            )
            ka = np.argsort(-la[:m], axis=-1)[:, :top_k]
            kb = np.argsort(-lb[:m], axis=-1)[:, :top_k]
            r[f"top{top_k}_overlap"] = float(np.mean([
                len(set(x) & set(y)) / top_k for x, y in zip(ka, kb)
            ]))
        reports.append(r)

    summary = {
        "num_prompts": len(reports),
        "min_token_agreement": min(r["token_agreement"] for r in reports),
        "prompts": reports,
    }
    diffs = [r["max_abs_diff"] for r in reports if "max_abs_diff" in r]
    if diffs:
        summary["max_abs_diff"] = max(diffs)
    return summary


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(-1, keepdims=True)


def save_capture(cap: Capture, path: str):
    with open(path, "wb") as f:
        pickle.dump(cap, f)


def load_capture(path: str) -> Capture:
    with open(path, "rb") as f:
        return pickle.load(f)
