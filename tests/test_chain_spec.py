"""Chain (sequential) speculative decoding — SpecMQuant analog."""

import dataclasses

import numpy as np
import pytest

import jax

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.engine.chain_engine import ChainSpecEngine
from cpmcu_tpu.engine.engine import Engine
from cpmcu_tpu.models import llama


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        vocab_size=128, num_layers=3, hidden_size=32, intermediate_size=64,
        num_heads=4, num_kv_heads=2, head_dim=8, rope=RopeConfig(),
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = dataclasses.replace(cfg, num_layers=1, intermediate_size=32)
    dparams = llama.init_params(draft_cfg, jax.random.PRNGKey(1))
    return cfg, params, draft_cfg, dparams


def test_chain_matches_plain_greedy(setup):
    cfg, params, draft_cfg, dparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=128, spec_num_iter=3)

    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=12)

    spec = ChainSpecEngine(cfg, draft_cfg, eng, params, dparams, attn_impl="xla")
    got, _, _ = spec.generate([1, 2, 3, 4, 5], generation_length=12)
    assert got == want
    assert spec.mean_accept_length() >= 1.0


def test_chain_self_draft_accepts_everything(setup):
    """Drafter == base model: every greedy draft must be accepted, so the
    mean accept length hits the ceiling num_iter+1 (the bonus token)."""
    cfg, params, _, _ = setup
    eng = EngineConfig(chunk_length=8, max_total_length=128, spec_num_iter=3)
    spec = ChainSpecEngine(cfg, cfg, eng, params, params, attn_impl="xla")
    toks, _, _ = spec.generate([1, 2, 3], generation_length=13)
    assert len(toks) == 13
    assert spec.mean_accept_length() == pytest.approx(4.0, abs=0.01)


def test_chain_reset_reproducible(setup):
    cfg, params, draft_cfg, dparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=128, spec_num_iter=2)
    spec = ChainSpecEngine(cfg, draft_cfg, eng, params, dparams, attn_impl="xla")
    a, _, _ = spec.generate([7, 8, 9], generation_length=9)
    spec.reset()
    b, _, _ = spec.generate([7, 8, 9], generation_length=9)
    assert a == b


def test_sharded_chain_engine_matches_unsharded(setup):
    from cpmcu_tpu.core.mesh import create_mesh

    cfg, params, draft_cfg, dparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=128, spec_num_iter=3)
    plain = ChainSpecEngine(cfg, draft_cfg, eng, params, dparams,
                            attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=10)

    mesh = create_mesh(tp_size=2, dp_size=4)
    sharded = ChainSpecEngine(cfg, draft_cfg, eng, params, dparams,
                              attn_impl="xla", mesh=mesh)
    got, _, _ = sharded.generate([1, 2, 3, 4, 5], generation_length=10)
    assert got == want


def test_chain_pipelined_segments_lossless(setup):
    """Multiple pipelined segments (device-chained drafter inputs) +
    drain-before-capacity + overshoot rollback must stay lossless."""
    cfg, params, draft_cfg, dparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=256,
                       spec_num_iter=3, spec_segment_size=2)

    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=40)

    spec = ChainSpecEngine(cfg, draft_cfg, eng, params, dparams,
                           attn_impl="xla")
    got, _, _ = spec.generate([1, 2, 3, 4, 5], generation_length=40)
    assert got == want
    spec.reset()
    again, _, _ = spec.generate([1, 2, 3, 4, 5], generation_length=40)
    assert again == want
