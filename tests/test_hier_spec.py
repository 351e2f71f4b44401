"""Hierarchical speculation: EAGLE -> small model -> chain -> big model."""

import dataclasses

import numpy as np
import pytest

import jax

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.engine.engine import Engine
from cpmcu_tpu.engine.hier_engine import HierSpecEngine
from cpmcu_tpu.models import llama
from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        vocab_size=128, num_layers=3, hidden_size=32, intermediate_size=64,
        num_heads=4, num_kv_heads=2, head_dim=8, rope=RopeConfig(),
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    draft_cfg = dataclasses.replace(cfg, num_layers=1)
    dparams = llama.init_params(draft_cfg, jax.random.PRNGKey(1))
    ecfg = EagleConfig(
        model=dataclasses.replace(draft_cfg, num_layers=1),
        num_iter=2, topk_per_iter=3, tree_size=6,
    )
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(2))
    return cfg, params, draft_cfg, dparams, ecfg, eparams


def test_hier_matches_plain_greedy(setup):
    cfg, params, draft_cfg, dparams, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=256)

    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=14)

    hier = HierSpecEngine(
        cfg, draft_cfg, ecfg, eng, params, dparams, eparams,
        attn_impl="xla", min_draft_length=4,
    )
    got, _, _ = hier.generate([1, 2, 3, 4, 5], generation_length=14)
    assert got == want
    assert hier.mean_accept_length() >= 1.0
    assert hier.mean_inner_accept_length() >= 1.0


def test_hier_reset_reproducible(setup):
    cfg, params, draft_cfg, dparams, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=256)
    hier = HierSpecEngine(
        cfg, draft_cfg, ecfg, eng, params, dparams, eparams,
        attn_impl="xla", min_draft_length=4,
    )
    a, _, _ = hier.generate([9, 8, 7], generation_length=10)
    hier.reset()
    b, _, _ = hier.generate([9, 8, 7], generation_length=10)
    assert a == b
