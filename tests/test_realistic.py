"""Correlated synthetic checkpoint (models/realistic.py): verify it puts
the engine in the realistic operating regime the VERDICT r2 asterisks are
about — non-saturated sparse selection unions and spec accept between the
random-weight (~1) and oracle (num_iter+1) endpoints — while staying
greedily lossless through the spec machinery."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.layers.modules import rms_norm
from cpmcu_tpu.layers.rotary import apply_rope, rope_tables
from cpmcu_tpu.models import llama
from cpmcu_tpu.models.realistic import (
    init_eagle_params_realistic, init_params_realistic,
)
from cpmcu_tpu.ops.sparse import bits_from_topk, select_blocks, stage1_scores


def _cfg(**kw):
    base = dict(
        vocab_size=1024, num_layers=2, hidden_size=256,
        intermediate_size=512, num_heads=4, num_kv_heads=2, head_dim=64,
        rope=RopeConfig(), dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def _union_fraction(cfg, params, T=4096, tile=128, topk=16):
    """Fraction of scored KV blocks visited by the UNION of a query tile's
    per-row top-k selections (layer-0 q/k math; the residual stream is
    embedding-dominated so deeper layers share the structure)."""
    rng = np.random.default_rng(7)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=T), jnp.int32)
    h = params["embed"][toks] * cfg.scale_emb
    x = rms_norm(h, params["layers"]["attn_norm"][0], cfg.rms_norm_eps)
    D, HD, KV = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    q = (x @ params["layers"]["wq"]["w"][0]).reshape(T, HD, D)
    k = (x @ params["layers"]["wk"]["w"][0]).reshape(T, KV, D)
    cos, sin = rope_tables(cfg.rope, D, T)
    pos = jnp.arange(T, dtype=jnp.int32)
    q, k = apply_rope(q, k, cos[pos], sin[pos], pos)

    kk = np.asarray(k, np.float32)  # (T, KV, D)
    S1 = ((T - 16) // 16) // 4 * 4  # select_blocks needs S1 % 4 == 0
    c1 = np.stack([kk[16 * j:16 * j + 32].mean(0) for j in range(S1)],
                  axis=0).transpose(1, 0, 2)  # (KV, S1, D)
    c2 = np.stack([kk[64 * j:64 * j + 128].mean(0)
                   for j in range((T - 64) // 64)],
                  axis=0).transpose(1, 0, 2)
    qs = q[-tile:]
    p = stage1_scores(qs, jnp.asarray(c1), jnp.asarray(c2),
                      jnp.asarray(c1.shape[1], jnp.int32),
                      jnp.asarray(c2.shape[1], jnp.int32))
    idx, valid, pooled = select_blocks(
        p, pos[-tile:], jnp.asarray(T - tile, jnp.int32), topk=topk,
    )
    nb = pooled.shape[-1]
    bits = bits_from_topk(idx, valid, nb)  # (KV, tile, NB)
    n_scored = (T - tile) // 64
    union = np.asarray(bits).any(axis=1)[:, :n_scored]  # (KV, scored)
    return float(union.sum(axis=1).mean()) / n_scored


def test_realistic_union_not_saturated():
    cfg = _cfg()
    real = init_params_realistic(cfg, seed=0)
    frac_real = _union_fraction(cfg, real)

    iid = llama.init_params(cfg, jax.random.PRNGKey(0))
    frac_iid = _union_fraction(cfg, iid)

    # i.i.d. weights saturate (the PERF.md sim's corr-0 endpoint); the
    # structured checkpoint must stay well below, and above the per-row
    # top-k floor (16 of 62 scored blocks ~ 0.26)
    assert frac_iid > 0.85, frac_iid
    assert frac_real < 0.55, frac_real
    assert frac_real < 0.6 * frac_iid, (frac_real, frac_iid)


def test_realistic_generation_not_degenerate():
    cfg = _cfg()
    params = init_params_realistic(cfg, seed=0)
    from cpmcu_tpu.engine.engine import Engine

    eng = EngineConfig(chunk_length=32, max_total_length=512)
    engine = Engine(cfg, eng, params, attn_impl="xla")
    toks, _, _ = engine.generate([1, 2, 3, 4, 5], generation_length=48)
    assert len(set(toks)) > 8, f"degenerate generation: {toks[:16]}"


def test_realistic_spec_accept_band_and_lossless():
    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.engine.spec_engine import SpecEngine
    from cpmcu_tpu.spec.eagle import EagleConfig

    cfg = _cfg()
    params = init_params_realistic(cfg, seed=0, fr_vocab=512)
    draft_cfg = dataclasses.replace(cfg, num_layers=1)
    ecfg = EagleConfig(model=draft_cfg, num_iter=2, topk_per_iter=4,
                       tree_size=8, frspec_vocab_size=512)
    eparams = init_eagle_params_realistic(ecfg, cfg, seed=0, fr_vocab=512)

    eng = EngineConfig(chunk_length=32, max_total_length=1024)
    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=96)

    spec = SpecEngine(cfg, ecfg, eng, params, eparams, attn_impl="xla")
    got, _, _ = spec.generate([1, 2, 3, 4, 5], generation_length=96)
    assert got == want  # lossless regardless of drafter quality

    acc = spec.mean_accept_length()
    # strictly between the random-weight (~1.0) and oracle (3.0) endpoints
    assert 1.25 < acc < 2.95, acc
