"""Prompt prefix caching (EngineConfig.prefix_cache): lossless reuse of KV
rows shared with the previous request. No reference counterpart (CPM.cu
re-prefills every request)."""

import dataclasses

import numpy as np
import pytest

import jax

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.engine.engine import Engine
from cpmcu_tpu.models import llama


def _cfg(sparse=False):
    kw = dict(
        vocab_size=512,
        num_layers=2,
        hidden_size=128,
        intermediate_size=256,
        num_heads=4,
        num_kv_heads=2,
        head_dim=32,
        rope=RopeConfig(theta=10000.0),
        scale_emb=12.0,
        scale_lmhead=0.25,
        scale_residual=1.4 / 2.0,
        dtype="float32",
    )
    if sparse:
        kw.update(apply_sparse=True, sparse_topk_k=2, block_window_size=2,
                  sparse_switch=0)
    return ModelConfig(**kw)


def _engines(sparse=False, seed=0):
    cfg = _cfg(sparse)
    params = llama.init_params(cfg, jax.random.PRNGKey(seed))
    eng_kw = dict(chunk_length=16, max_total_length=512,
                  decode_segment_size=4)
    warm = Engine(cfg, EngineConfig(prefix_cache=True, **eng_kw), params,
                  attn_impl="xla")
    cold = Engine(cfg, EngineConfig(**eng_kw), params, attn_impl="xla")
    return warm, cold


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_prefix_cache_lossless(sparse):
    warm, cold = _engines(sparse)
    p1 = list(range(1, 40))
    out1, _, _ = warm.generate(p1, generation_length=8)
    assert warm._last_prefill_cached == 0  # first request is cold

    # follow-up turn: previous prompt + previous reply + new question
    p2 = p1 + out1 + [7, 8, 9, 10]
    out2, _, _ = warm.generate(p2, generation_length=8)
    # reused at least the previous prompt's rows (reply rows may be
    # truncated by the final un-written sampled token)
    assert warm._last_prefill_cached >= len(p1)

    cold.reset()
    want2, _, _ = cold.generate(p2, generation_length=8)
    assert out2 == want2

    # diverging prompt: only the common prefix is reused
    p3 = p1[:20] + [99, 98] + list(range(200, 230))
    out3, _, _ = warm.generate(p3, generation_length=8)
    assert warm._last_prefill_cached == 20
    cold.reset()
    want3, _, _ = cold.generate(p3, generation_length=8)
    assert out3 == want3


def test_prefix_cache_identical_prompt_reuses_all_but_one():
    warm, cold = _engines()
    p = list(range(3, 60))
    out1, _, _ = warm.generate(p, generation_length=6)
    out2, _, _ = warm.generate(p, generation_length=6)
    assert warm._last_prefill_cached == len(p) - 1  # >=1 token re-run
    assert out1 == out2


# ---------------------------------------------------------------------------
# continuous batching: slot-granular prefix reuse
# ---------------------------------------------------------------------------


def _batch_engines(sparse=False, seed=0):
    from cpmcu_tpu.engine.batch_engine import ContinuousBatchingEngine

    cfg = _cfg(sparse)
    params = llama.init_params(cfg, jax.random.PRNGKey(seed))
    kw = dict(chunk_length=16, max_total_length=2048 if sparse else 1024,
              decode_segment_size=4)
    warm = ContinuousBatchingEngine(
        cfg, EngineConfig(prefix_cache=True, **kw), params, max_batch=2,
        attn_impl="xla")
    cold = ContinuousBatchingEngine(
        cfg, EngineConfig(**kw), params, max_batch=2, attn_impl="xla")
    return warm, cold


def _run_one(engine, prompt, n=6):
    rid = engine.submit(prompt, max_new_tokens=n)
    out = engine.run() if hasattr(engine, "run") else None
    if out is not None and rid in out:
        return out[rid]
    toks = []
    while engine.has_work:
        for ev in engine.step():
            if ev.request_id == rid:
                toks.append(ev.token)
    return toks


@pytest.mark.parametrize("sparse", [False, True], ids=["dense", "sparse"])
def test_batch_prefix_cache_lossless(sparse):
    warm, cold = _batch_engines(sparse)
    p1 = list(range(1, 40))
    out1 = _run_one(warm, p1)
    assert warm._last_admit_cached == 0

    p2 = p1 + out1 + [7, 8, 9]
    out2 = _run_one(warm, p2)
    assert warm._last_admit_cached > 0  # reused the shared prefix
    want2 = _run_one(cold, p2)
    assert out2 == want2

    # diverging prompt reuses only the common prefix
    p3 = p1[:12] + [101, 102] + list(range(150, 170))
    out3 = _run_one(warm, p3)
    assert warm._last_admit_cached <= 12
    want3 = _run_one(cold, p3)
    assert out3 == want3


def test_prefix_cache_survives_failed_prefill():
    """A prefill that raises before touching the cache must NOT poison the
    prefix record (review finding: the recording wrapper used to run its
    finally block and record the FAILED request's tokens)."""
    warm, cold = _engines()
    p1 = list(range(1, 40))
    warm.generate(p1, generation_length=6)

    too_long = list(range(1, 600))  # > max_total_length=512
    with pytest.raises(ValueError):
        warm.generate(too_long, generation_length=4)

    # p2 shares a prefix with the FAILED prompt beyond p1's length; reuse
    # must be capped at rows that are actually in the cache
    p2 = list(range(1, 60))
    out2, _, _ = warm.generate(p2, generation_length=6)
    cold.reset()
    want2, _, _ = cold.generate(p2, generation_length=6)
    assert out2 == want2


def test_forget_prefix():
    warm, _ = _engines()
    p = list(range(2, 50))
    warm.generate(p, generation_length=4)
    warm.forget_prefix()
    warm.generate(p, generation_length=4)
    assert warm._last_prefill_cached == 0
