"""Numerics parity vs HF transformers (the oracle the reference never had as
unit tests — SURVEY.md §4 implication). Tiny random models, fp32, CPU."""

import dataclasses

import numpy as np
import pytest
import jax.numpy as jnp

from cpmcu_tpu.core.config import EngineConfig, ModelConfig
from cpmcu_tpu.engine.engine import Engine
from cpmcu_tpu.io.hf_loader import _torch_to_np, load_params


def _state_dict_tensors(model):
    for name, t in model.state_dict().items():
        yield name, _torch_to_np(t)


def _build(hf_config_cls, model_cls, **kw):
    import torch

    torch.manual_seed(0)
    hf_cfg = hf_config_cls(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
        **kw,
    )
    model = model_cls(hf_cfg)
    model.eval()
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict(), dtype="float32")
    params = load_params(_state_dict_tensors(model), cfg)
    return model, cfg, params


def _hf_logits(model, ids):
    import torch

    with torch.no_grad():
        return model(torch.tensor([ids])).logits[0].float().numpy()


CASES = ["llama", "qwen2_bias", "qwen3_qknorm", "llama3_rope"]


@pytest.mark.parametrize("case", CASES)
def test_prefill_logits_parity(case):
    import transformers

    if case == "llama":
        model, cfg, params = _build(
            transformers.LlamaConfig, transformers.LlamaForCausalLM
        )
    elif case == "qwen2_bias":
        model, cfg, params = _build(
            transformers.Qwen2Config, transformers.Qwen2ForCausalLM
        )
        assert cfg.use_attn_bias
    elif case == "qwen3_qknorm":
        model, cfg, params = _build(
            transformers.Qwen3Config, transformers.Qwen3ForCausalLM, head_dim=32
        )
        assert cfg.use_qk_norm
    elif case == "llama3_rope":
        model, cfg, params = _build(
            transformers.LlamaConfig,
            transformers.LlamaForCausalLM,
            rope_scaling={
                "rope_type": "llama3",
                "factor": 2.0,
                "low_freq_factor": 1.0,
                "high_freq_factor": 4.0,
                "original_max_position_embeddings": 64,
            },
        )

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=12).tolist()

    eng = EngineConfig(chunk_length=16, max_total_length=64)
    engine = Engine(cfg, eng, params, attn_impl="xla")
    logits = np.asarray(engine.decode(ids, list(range(len(ids)))))
    engine.commit(len(ids))

    ref = _hf_logits(model, ids)
    np.testing.assert_allclose(logits, ref, rtol=2e-4, atol=2e-4)


def test_decode_matches_prefill():
    """Step-by-step decode over the cache == full prefill logits."""
    import transformers

    model, cfg, params = _build(transformers.LlamaConfig, transformers.LlamaForCausalLM)
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=10).tolist()
    ref = _hf_logits(model, ids)

    eng = EngineConfig(chunk_length=4, max_total_length=64)
    engine = Engine(cfg, eng, params, attn_impl="xla")
    # chunked prefill of the first 6 (chunk=4 -> exercises partial chunks)
    engine.prefill(ids[:6])
    # decode the rest one-by-one
    for i in range(6, len(ids)):
        logits = np.asarray(engine.decode([ids[i]], [i]))
        engine.commit(1)
        np.testing.assert_allclose(logits[0], ref[i], rtol=3e-4, atol=3e-4)


def test_chunked_prefill_last_logits():
    import transformers

    model, cfg, params = _build(transformers.LlamaConfig, transformers.LlamaForCausalLM)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, size=11).tolist()
    ref = _hf_logits(model, ids)

    eng = EngineConfig(chunk_length=4, max_total_length=64)
    engine = Engine(cfg, eng, params, attn_impl="xla")
    logits = np.asarray(engine.prefill(ids))
    np.testing.assert_allclose(logits[0], ref[-1], rtol=3e-4, atol=3e-4)


def test_minicpm_scale_knobs():
    """MiniCPM scale_emb/scale_residual/scale_lmhead change logits the way a
    hand-scaled HF llama does (emulate by scaling HF weights)."""
    import torch
    import transformers

    model, cfg, params = _build(transformers.LlamaConfig, transformers.LlamaForCausalLM)
    import dataclasses

    scale_emb, scale_depth, dim_model_base = 2.0, 1.4, 32
    L = cfg.num_layers
    cfg2 = dataclasses.replace(
        cfg,
        scale_emb=scale_emb,
        scale_residual=scale_depth / np.sqrt(L),
        scale_lmhead=dim_model_base / cfg.hidden_size,
    )

    rng = np.random.default_rng(3)
    ids = rng.integers(0, cfg.vocab_size, size=8).tolist()

    eng = EngineConfig(chunk_length=8, max_total_length=32)
    engine = Engine(cfg2, eng, params, attn_impl="xla")
    ours = np.asarray(engine.decode(ids, list(range(len(ids)))))

    # emulate in torch: scale embedding, sublayer outputs, pre-lm_head hidden
    with torch.no_grad():
        m = model
        m.model.embed_tokens.weight *= scale_emb
        rs = scale_depth / np.sqrt(L)
        for layer in m.model.layers:
            layer.self_attn.o_proj.weight *= rs
            layer.mlp.down_proj.weight *= rs
        m.lm_head.weight *= dim_model_base / cfg.hidden_size
    ref = _hf_logits(model, ids)
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)


def test_forward_scan_layers_matches_unroll():
    """llama.forward(unroll="scan") — lax.scan over layers with dyn-layer
    kernels (scalar-prefetch layer index) — matches the unrolled path:
    exact on f32 dense; KV writes exact + logits close (bf16 reassociation)
    on a quantized model, with and without defer_kv_write."""
    import jax

    from cpmcu_tpu.cache.kv import KVCache
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.models.quantize import quantize_params

    def run(cfg, params, mode, defer):
        rope = llama.make_rope(cfg, 512)
        L = cfg.num_layers
        k = jax.random.normal(jax.random.PRNGKey(1),
                              (L, cfg.num_kv_heads, 512, cfg.head_dim),
                              cfg.jnp_dtype)
        v = jax.random.normal(jax.random.PRNGKey(2), k.shape, cfg.jnp_dtype)
        cache = KVCache(k, v, jnp.int32(37))
        toks = jnp.asarray([5, 9, 11], jnp.int32)
        pos = jnp.int32(37) + jnp.arange(3, dtype=jnp.int32)
        out = llama.forward(cfg, params, rope, cache, toks, pos,
                            logits_mode="all", attn_impl="auto",
                            unroll=mode, defer_kv_write=defer)
        if defer:
            lo, nc, (kp, vp) = out
            return np.asarray(lo), np.asarray(kp, np.float32), \
                np.asarray(vp, np.float32)
        lo, nc = out
        return np.asarray(lo), np.asarray(nc.k, np.float32), \
            np.asarray(nc.v, np.float32)

    # f32 dense: near-exact
    cfg = ModelConfig(num_layers=3, hidden_size=1024, intermediate_size=2048,
                      num_heads=8, num_kv_heads=2, head_dim=128,
                      vocab_size=128, dtype="float32")
    params = llama.fuse_projections(
        llama.init_params(cfg, jax.random.PRNGKey(0)))
    for defer in (False, True):
        a = run(cfg, params, True, defer)
        b = run(cfg, params, "scan", defer)
        np.testing.assert_allclose(a[0], b[0], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a[1], b[1], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(a[2], b[2], rtol=1e-5, atol=1e-5)

    # bf16 quant: KV writes exact; logits within bf16 reassociation noise
    qcfg = dataclasses.replace(cfg, dtype="bfloat16", quant=True)
    qparams = llama.fuse_projections(quantize_params(
        llama.init_params(dataclasses.replace(cfg, dtype="bfloat16"),
                          jax.random.PRNGKey(0)), qcfg))
    for defer in (False, True):
        a = run(qcfg, qparams, True, defer)
        b = run(qcfg, qparams, "scan", defer)
        np.testing.assert_allclose(a[0], b[0], rtol=0.05, atol=0.03)
        np.testing.assert_allclose(a[1], b[1], rtol=0.02, atol=0.02)
        np.testing.assert_allclose(a[2], b[2], rtol=0.02, atol=0.02)
