"""Engine behavior: streaming, segments, terminators, cache bookkeeping."""

import numpy as np
import pytest

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.engine.engine import Engine
from cpmcu_tpu.models import llama

import jax


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        vocab_size=128,
        num_layers=2,
        hidden_size=32,
        intermediate_size=64,
        num_heads=4,
        num_kv_heads=2,
        head_dim=8,
        rope=RopeConfig(),
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _engine(tiny, **kw):
    cfg, params = tiny
    eng = EngineConfig(chunk_length=8, max_total_length=128, **kw)
    return Engine(cfg, eng, params, attn_impl="xla")


def test_generate_batch_mode(tiny):
    engine = _engine(tiny, decode_segment_size=4)
    tokens, decode_time, prefill_time = engine.generate(
        [1, 2, 3, 4, 5], generation_length=11
    )
    assert len(tokens) == 11
    assert all(0 <= t < 128 for t in tokens)
    # cache: 5 prompt + at least the 10 committed decode rows
    assert int(engine.cache.length) >= 5 + 10


def test_segment_size_does_not_change_output(tiny):
    outs = []
    for seg in (1, 3, 16):
        engine = _engine(tiny, decode_segment_size=seg)
        tokens, _, _ = engine.generate([1, 2, 3], generation_length=9)
        outs.append(tokens)
    assert outs[0] == outs[1] == outs[2]


def test_terminator_stops_stream(tiny):
    engine = _engine(tiny, decode_segment_size=4)
    # discover the greedy continuation, then use its 3rd token as terminator
    ref, _, _ = engine.generate([1, 2, 3], generation_length=8)
    term = ref[2]
    engine2 = _engine(tiny, decode_segment_size=4)
    items = list(
        engine2.generate([1, 2, 3], generation_length=8, use_stream=True,
                         terminators=[term])
    )
    assert items[-1]["is_finished"]
    assert items[-1]["token"] == term
    assert [i["token"] for i in items[:-1]] == ref[:2]


def test_sampling_reproducible(tiny):
    t1 = _engine(tiny, temperature=0.8, random_seed=7).generate([5, 6], generation_length=8)[0]
    t2 = _engine(tiny, temperature=0.8, random_seed=7).generate([5, 6], generation_length=8)[0]
    t3 = _engine(tiny, temperature=0.8, random_seed=8).generate([5, 6], generation_length=8)[0]
    assert t1 == t2
    assert t1 != t3  # overwhelmingly likely


def test_prefill_overflow_raises(tiny):
    engine = _engine(tiny)
    with pytest.raises(ValueError, match="exceeds maximum supported length"):
        engine.prefill(list(range(100)) * 3)


def test_generation_stops_at_cache_capacity():
    """ADVICE round-1: generation must stop before the cache tail so the
    clamped dynamic_update_slice in compact()/append is unreachable."""
    import jax

    from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.models import llama

    cfg = ModelConfig(
        vocab_size=64, num_layers=1, hidden_size=32, intermediate_size=64,
        num_heads=2, num_kv_heads=2, head_dim=16, rope=RopeConfig(),
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    eng = EngineConfig(chunk_length=8, max_total_length=24,
                       decode_segment_size=4)
    e = Engine(cfg, eng, params, attn_impl="xla")
    # KVCache.create rounds capacity up to >=512; shrink it so the guard
    # is reachable in a fast test
    from cpmcu_tpu.cache.kv import KVCache

    e.cache = KVCache(e.cache.k[:, :, :24], e.cache.v[:, :, :24],
                      e.cache.length)
    toks, _, _ = e.generate([1, 2, 3, 4], generation_length=100)
    assert e.host_len <= e.cache.max_length
    assert len(toks) < 100  # truncated by capacity, not by length limit


def test_spec_generation_stops_at_cache_capacity():
    import dataclasses

    import jax

    from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
    from cpmcu_tpu.engine.spec_engine import SpecEngine
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    cfg = ModelConfig(
        vocab_size=64, num_layers=1, hidden_size=32, intermediate_size=64,
        num_heads=2, num_kv_heads=2, head_dim=16, rope=RopeConfig(),
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    ecfg = EagleConfig(
        model=dataclasses.replace(cfg, num_layers=1),
        num_iter=2, topk_per_iter=3, tree_size=6,
    )
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    eng = EngineConfig(chunk_length=8, max_total_length=40,
                       spec_segment_size=2)
    e = SpecEngine(cfg, ecfg, eng, params, eparams, attn_impl="xla")
    from cpmcu_tpu.cache.kv import KVCache

    e.cache = KVCache(e.cache.k[:, :, :40], e.cache.v[:, :, :40],
                      e.cache.length)
    toks, _, _ = e.generate([1, 2, 3, 4], generation_length=200)
    assert e.host_len + ecfg.tree_size <= e.cache.max_length + ecfg.tree_size
    assert len(toks) < 200
