"""Sequence parallelism (parallel/seq.py): KV sharded over the S dim."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.engine.engine import Engine
from cpmcu_tpu.models import llama
from cpmcu_tpu.parallel.seq import (
    AXIS_SP,
    SeqParallelEngine,
    create_sp_mesh,
    sp_forward,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    cfg = ModelConfig(
        vocab_size=128, num_layers=2, hidden_size=64, intermediate_size=96,
        num_heads=4, num_kv_heads=2, head_dim=16, rope=RopeConfig(),
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_sp_forward_matches_unsharded(setup):
    """Chunked prefill logits through the S-sharded path must equal the
    single-device forward (the LSE combine is exact in f32)."""
    from cpmcu_tpu.cache.kv import KVCache
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params = setup
    mesh = create_sp_mesh(4)
    S = 2048  # 512 rows per slab
    rope = llama.make_rope(cfg, S + 8)

    rng = np.random.default_rng(0)
    toks1 = jnp.asarray(rng.integers(0, 128, size=16), jnp.int32)
    toks2 = jnp.asarray(rng.integers(0, 128, size=16), jnp.int32)

    # reference: plain forward, two chunks
    ref_cache = KVCache.create(cfg, S)
    ref1, ref_cache = llama.forward(
        cfg, params, rope, ref_cache, toks1, jnp.arange(16, dtype=jnp.int32),
        logits_mode="all", attn_impl="xla",
    )
    ref_cache = ref_cache.with_length(16)
    ref2, ref_cache = llama.forward(
        cfg, params, rope, ref_cache, toks2,
        16 + jnp.arange(16, dtype=jnp.int32),
        logits_mode="all", attn_impl="xla",
    )

    # sp: same two chunks over the sharded cache
    cache = KVCache.create(cfg, S)
    kv_sh = NamedSharding(mesh, P(None, None, AXIS_SP, None))
    cache = KVCache(
        k=jax.device_put(cache.k, kv_sh), v=jax.device_put(cache.v, kv_sh),
        length=jax.device_put(cache.length, NamedSharding(mesh, P())),
    )
    got1, cache = sp_forward(
        cfg, mesh, params, rope, cache, toks1,
        jnp.arange(16, dtype=jnp.int32), logits_mode="all", attn_impl="xla",
    )
    cache = cache.with_length(16)
    got2, cache = sp_forward(
        cfg, mesh, params, rope, cache, toks2,
        16 + jnp.arange(16, dtype=jnp.int32),
        logits_mode="all", attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(got1), np.asarray(ref1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-5)


def test_sp_crossing_slab_boundary(setup):
    """A chunk whose KV rows straddle two slabs must still match (the masked
    write splits it; partial causality shifts per slab)."""
    from cpmcu_tpu.cache.kv import KVCache
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, params = setup
    mesh = create_sp_mesh(4)
    S = 2048
    rope = llama.make_rope(cfg, S + 8)
    rng = np.random.default_rng(1)

    # commit 500 rows, then a 24-token chunk crossing the 512 boundary
    pre = jnp.asarray(rng.integers(0, 128, size=500), jnp.int32)
    toks = jnp.asarray(rng.integers(0, 128, size=24), jnp.int32)

    ref_cache = KVCache.create(cfg, S)
    _, ref_cache = llama.forward(
        cfg, params, rope, ref_cache, pre, jnp.arange(500, dtype=jnp.int32),
        logits_mode="none", attn_impl="xla",
    )
    ref_cache = ref_cache.with_length(500)
    ref, _ = llama.forward(
        cfg, params, rope, ref_cache, toks,
        500 + jnp.arange(24, dtype=jnp.int32),
        logits_mode="all", attn_impl="xla",
    )

    cache = KVCache.create(cfg, S)
    kv_sh = NamedSharding(mesh, P(None, None, AXIS_SP, None))
    cache = KVCache(
        k=jax.device_put(cache.k, kv_sh), v=jax.device_put(cache.v, kv_sh),
        length=jax.device_put(cache.length, NamedSharding(mesh, P())),
    )
    _, cache = sp_forward(
        cfg, mesh, params, rope, cache, pre,
        jnp.arange(500, dtype=jnp.int32), logits_mode="none",
        attn_impl="xla",
    )
    cache = cache.with_length(500)
    got, _ = sp_forward(
        cfg, mesh, params, rope, cache, toks,
        500 + jnp.arange(24, dtype=jnp.int32),
        logits_mode="all", attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sp_engine_greedy_matches_unsharded(setup):
    """End-to-end greedy generation through SeqParallelEngine equals the
    single-device Engine."""
    cfg, params = setup
    eng = EngineConfig(chunk_length=8, max_total_length=512,
                       decode_segment_size=4)

    want, _, _ = Engine(cfg, eng, params, attn_impl="xla").generate(
        [3, 14, 15, 9, 26, 5], generation_length=18
    )

    mesh = create_sp_mesh(4)
    sp = SeqParallelEngine(cfg, eng, params, attn_impl="xla", sp_mesh=mesh)
    assert sp.max_total_length >= 4 * 512  # budget scaled by sp
    got, _, _ = sp.generate([3, 14, 15, 9, 26, 5], generation_length=18)
    assert got == want

    sp.reset()
    again, _, _ = sp.generate([3, 14, 15, 9, 26, 5], generation_length=18)
    assert again == want
