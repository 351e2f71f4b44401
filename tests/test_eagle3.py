"""EAGLE-3 drafter: layer semantics, tree expansion, engine correctness."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.engine.eagle3_engine import Eagle3Engine
from cpmcu_tpu.engine.engine import Engine
from cpmcu_tpu.models import llama
from cpmcu_tpu.spec.eagle3 import Eagle3Config, init_eagle3_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        vocab_size=128, num_layers=4, hidden_size=32, intermediate_size=64,
        num_heads=4, num_kv_heads=2, head_dim=8, rope=RopeConfig(),
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    draft = dataclasses.replace(cfg, num_layers=1, vocab_size=64)  # draft vocab
    ecfg = Eagle3Config(
        model=draft, num_iter=2, topk_per_iter=3, tree_size=6,
        tap_layers=(0, 1, 3),
    )
    eparams = init_eagle3_params(ecfg, jax.random.PRNGKey(1))
    return cfg, params, ecfg, eparams


def test_tap_layers_output(setup):
    """forward(tap_layers=...) returns the per-layer FFN sublayer outputs."""
    from cpmcu_tpu.cache.kv import KVCache

    cfg, params, ecfg, _ = setup
    cache = KVCache.create(cfg, 64)
    toks = jnp.asarray([1, 2, 3], jnp.int32)
    pos = jnp.arange(3, dtype=jnp.int32)
    logits, _, taps = llama.forward(
        cfg, params, llama.make_rope(cfg, 64), cache, toks, pos,
        logits_mode="all", attn_impl="xla", tap_layers=(0, 1, 3),
    )
    H = cfg.hidden_size
    assert taps.shape == (3, 3 * H)
    # tapping a single layer reproduces the corresponding slice
    _, _, t0 = llama.forward(
        cfg, params, llama.make_rope(cfg, 64), KVCache.create(cfg, 64),
        toks, pos, logits_mode="all", attn_impl="xla", tap_layers=(1,),
    )
    np.testing.assert_allclose(
        np.asarray(taps[:, H:2 * H]), np.asarray(t0), rtol=1e-6
    )
    # taps are not all zeros and differ between layers
    assert np.abs(np.asarray(taps[:, :H])).max() > 0
    assert not np.allclose(np.asarray(taps[:, :H]), np.asarray(taps[:, H:2 * H]))


def test_eagle3_draft_tree_shape(setup):
    from cpmcu_tpu.cache.kv import KVCache
    from cpmcu_tpu.spec.eagle3 import eagle3_draft

    cfg, params, ecfg, eparams = setup
    rope = llama.make_rope(cfg, 128)
    ekv = KVCache.create(ecfg.model, 128, 1)
    h_root = jnp.ones((cfg.hidden_size,), jnp.float32) * 0.1
    toks, pos, mask, parent, _ = eagle3_draft(
        ecfg, cfg, eparams, params, rope, ekv, h_root, jnp.asarray(10),
        attn_impl="xla",
    )
    S = ecfg.tree_size
    assert toks.shape == (S,) and mask.shape == (S, S)
    assert int(toks[0]) == -1  # root filled by caller
    # mapped ids are in the base vocab
    assert np.all((np.asarray(toks[1:]) >= 0) & (np.asarray(toks[1:]) < 128))
    # ancestor closure: every node's mask includes itself and its parent's mask
    m = np.asarray(mask)
    p = np.asarray(parent)
    for i in range(S):
        assert m[i, i]
        if i > 0:
            assert m[i, p[i]]
            assert np.all(m[p[i]] <= m[i])


def test_eagle3_matches_plain_greedy(setup):
    """Verification gate: EAGLE-3 speculation must not change greedy output
    (the drafter only proposes; gt always comes from the base model)."""
    cfg, params, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=128)

    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=10)

    spec = Eagle3Engine(cfg, ecfg, eng, params, eparams, attn_impl="xla")
    got, _, _ = spec.generate([1, 2, 3, 4, 5], generation_length=10)
    assert got == want
    assert spec.mean_accept_length() >= 1.0


def test_eagle3_multi_round_and_reset(setup):
    cfg, params, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=128)
    spec = Eagle3Engine(cfg, ecfg, eng, params, eparams, attn_impl="xla")
    a, _, _ = spec.generate([9, 8, 7], generation_length=12)
    spec.reset()
    b, _, _ = spec.generate([9, 8, 7], generation_length=12)
    assert a == b  # reset restores identical state


def test_eagle3_loader(tmp_path, setup):
    from safetensors.numpy import save_file

    from cpmcu_tpu.io.hf_loader import load_eagle3_params

    cfg, params, ecfg, _ = setup
    H, I = cfg.hidden_size, cfg.intermediate_size
    Hq, Hkv = cfg.q_size, cfg.kv_size
    Vd = ecfg.model.vocab_size
    rng = np.random.default_rng(0)

    def w(*s):
        return rng.normal(size=s).astype(np.float32) * 0.02

    t = {
        "fc.weight": w(H, 3 * H),
        "norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(Vd, H),
        "d2t": np.arange(Vd, dtype=np.int64) * 2,  # direct map
        "midlayer.self_attn.q_proj.weight": w(Hq, 2 * H),
        "midlayer.self_attn.k_proj.weight": w(Hkv, 2 * H),
        "midlayer.self_attn.v_proj.weight": w(Hkv, 2 * H),
        "midlayer.self_attn.o_proj.weight": w(H, Hq),
        "midlayer.input_layernorm.weight": np.ones(H, np.float32),
        "midlayer.hidden_norm.weight": np.ones(H, np.float32),
        "midlayer.post_attention_layernorm.weight": np.ones(H, np.float32),
        "midlayer.mlp.gate_proj.weight": w(I, H),
        "midlayer.mlp.up_proj.weight": w(I, H),
        "midlayer.mlp.down_proj.weight": w(H, I),
    }
    save_file(t, str(tmp_path / "model.safetensors"))
    ep = load_eagle3_params(str(tmp_path), cfg, ecfg)
    assert ep["fc"]["w"].shape == (3 * H, H)
    assert ep["wq"]["w"].shape == (2 * H, Hq)
    assert ep["lm_head"]["w"].shape == (H, Vd)
    np.testing.assert_array_equal(
        np.asarray(ep["d2t"]), np.arange(Vd) * 2
    )

    # loaded params must run end-to-end
    eng = EngineConfig(chunk_length=8, max_total_length=128)
    # d2t maps into even ids < 128 ✓
    spec = Eagle3Engine(cfg, ecfg, eng, llama.init_params(cfg, jax.random.PRNGKey(0)),
                        ep, attn_impl="xla")
    toks, _, _ = spec.generate([1, 2, 3], generation_length=6)
    assert len(toks) == 6


def test_sharded_eagle3_matches_unsharded(setup):
    from cpmcu_tpu.core.mesh import create_mesh
    from cpmcu_tpu.core.config import EngineConfig
    from cpmcu_tpu.engine.eagle3_engine import Eagle3Engine

    cfg, params, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=128)
    plain = Eagle3Engine(cfg, ecfg, eng, params, eparams, attn_impl="xla")
    want, _, _ = plain.generate([5, 6, 7, 8], generation_length=10)

    mesh = create_mesh(tp_size=2, dp_size=4)
    sharded = Eagle3Engine(cfg, ecfg, eng, params, eparams, attn_impl="xla",
                           mesh=mesh)
    got, _, _ = sharded.generate([5, 6, 7, 8], generation_length=10)
    assert got == want


def test_eagle3_pipelined_segments_lossless(setup):
    """Multiple pipelined segments (device-chained root) stay lossless."""
    cfg, params, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=256,
                       spec_segment_size=2)

    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=32)

    spec = Eagle3Engine(cfg, ecfg, eng, params, eparams, attn_impl="xla")
    got, _, _ = spec.generate([1, 2, 3, 4, 5], generation_length=32)
    assert got == want
