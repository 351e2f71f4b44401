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


def test_hier_min_draft_length_one(setup):
    """min_draft_length=1 is legal: one inner round's tree_size tokens is
    less than max_chain = 1 + tree_size, so the fused round must size its
    inner scan by ceil(max_chain / tree_size), not by min_draft_length
    (previously an AssertionError at trace time)."""
    cfg, params, draft_cfg, dparams, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=256)

    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3], generation_length=10)

    hier = HierSpecEngine(
        cfg, draft_cfg, ecfg, eng, params, dparams, eparams,
        attn_impl="xla", min_draft_length=1,
    )
    got, _, _ = hier.generate([1, 2, 3], generation_length=10)
    assert got == want


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


def test_hier_inner_cache_matches_clean_prefill(setup):
    """ADVICE round-1: after outer rounds, the inner draft-model cache rows
    must equal a clean draft-model prefill of prompt + accepted tokens —
    i.e. the catch-up/rollback bookkeeping never corrupts the drafter's
    history (the root row is written exactly once, at d_start; rollback
    keeps every accepted node's row)."""
    cfg, params, draft_cfg, dparams, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=256)
    hier = HierSpecEngine(
        cfg, draft_cfg, ecfg, eng, params, dparams, eparams,
        attn_impl="xla", min_draft_length=4,
    )
    prompt = [1, 2, 3, 4, 5]
    logits = hier.prefill(prompt)
    pending = int(np.argmax(np.asarray(logits)[-1]))

    committed = list(prompt)
    for _ in range(6):
        toks, n = hier._spec_round(pending)
        committed += [pending] + toks[: n - 1]
        pending = toks[-1]
        assert hier.inner.host_len == len(committed)

    clean = Engine(draft_cfg, eng, dparams, attn_impl="xla")
    clean.prefill(committed)
    L = len(committed)
    got_k = np.asarray(hier.inner.cache.k)[:, :, :L]
    want_k = np.asarray(clean.cache.k)[:, :, :L]
    np.testing.assert_allclose(got_k, want_k, rtol=2e-4, atol=2e-4)
    got_v = np.asarray(hier.inner.cache.v)[:, :, :L]
    want_v = np.asarray(clean.cache.v)[:, :, :L]
    np.testing.assert_allclose(got_v, want_v, rtol=2e-4, atol=2e-4)


def test_sharded_hier_matches_unsharded(setup):
    from cpmcu_tpu.core.mesh import create_mesh

    cfg, params, draft_cfg, dparams, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=256)
    plain = HierSpecEngine(cfg, draft_cfg, ecfg, eng, params, dparams,
                           eparams, attn_impl="xla", min_draft_length=4)
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=10)

    mesh = create_mesh(tp_size=2, dp_size=4)
    sharded = HierSpecEngine(cfg, draft_cfg, ecfg, eng, params, dparams,
                             eparams, attn_impl="xla", min_draft_length=4,
                             mesh=mesh)
    got, _, _ = sharded.generate([1, 2, 3, 4, 5], generation_length=10)
    assert got == want


def test_hier_rotation_variant_lossless(setup):
    """Rotation variant (extra rms_norm_rotation Linear on prev_hidden
    before fc2, hier_ea_w4a16_gm_rot_spec_w4a16_gm.cuh:294-310): still
    greedily lossless, and the loader maps the checkpoint name."""
    import jax.numpy as jnp
    import numpy as np

    from cpmcu_tpu.io.hf_loader import load_eagle_params
    from cpmcu_tpu.spec.eagle import init_eagle_params

    cfg, params, draft_cfg, dparams, _, _ = setup
    ecfg = EagleConfig(
        model=dataclasses.replace(cfg, num_layers=1),
        num_iter=2, topk_per_iter=3, tree_size=6, rotation=True,
    )
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(2))
    assert "rotation" in eparams

    eng = EngineConfig(chunk_length=8, max_total_length=256)
    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=12)

    hier = HierSpecEngine(
        cfg, draft_cfg, ecfg, eng, params, dparams, eparams,
        attn_impl="xla", min_draft_length=4,
    )
    got, _, _ = hier.generate([1, 2, 3, 4, 5], generation_length=12)
    assert got == want

    # loader maps eagle.rms_norm_rotation.weight -> rotation pack
    H = cfg.hidden_size
    rot = np.random.default_rng(0).standard_normal((H, H)).astype(np.float32)
    tensors = [("rms_norm_rotation.weight", rot),
               ("fc.weight", np.zeros((H, 2 * H), np.float32))]
    loaded = load_eagle_params(tensors, cfg, ecfg)
    np.testing.assert_allclose(np.asarray(loaded["rotation"]["w"]), rot.T,
                               rtol=1e-6, atol=1e-6)


def test_hier_pipelined_segments_match_plain(setup):
    """ADVICE r2: the two-inflight pipelined segment path (segment N+1
    dispatched off the device-chained root before N's readback) was only
    covered by the TPU bench — the default test capacity always forced a
    drain between dispatches. Size the cache so two segments are inflight
    at once and assert greedy parity with the plain engine, plus that the
    dispatch->dispatch adjacency actually happened."""
    cfg, params, draft_cfg, dparams, ecfg, eparams = setup
    eng = EngineConfig(chunk_length=8, max_total_length=1024,
                       spec_segment_size=2)

    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4, 5], generation_length=30)

    hier = HierSpecEngine(
        cfg, draft_cfg, ecfg, eng, params, dparams, eparams,
        attn_impl="xla", min_draft_length=4,
    )
    events = []
    orig_dispatch = hier._dispatch_rounds
    orig_consume = hier._consume_rounds

    def dispatch(root, k):
        events.append("d")
        return orig_dispatch(root, k)

    def consume(handle):
        events.append("c")
        return orig_consume(handle)

    hier._dispatch_rounds = dispatch
    hier._consume_rounds = consume
    got, _, _ = hier.generate([1, 2, 3, 4, 5], generation_length=30)
    assert got == want
    assert "dd" in "".join(events), f"pipeline never engaged: {events}"


def test_hier_oracle_triple_all_accept():
    """spec.oracle.oracle_hier_triple: base, chain-draft model and inner
    drafter greedy outputs coincide (tied self-token heads + zero layers),
    so every outer round accepts the full chain — the hier best-case
    bracket used by ``bench --spec-type hier --oracle-accept``."""
    import dataclasses

    import jax

    from cpmcu_tpu.core.config import EngineConfig, ModelConfig
    from cpmcu_tpu.engine.hier_engine import HierSpecEngine
    from cpmcu_tpu.spec.eagle import EagleConfig
    from cpmcu_tpu.spec.oracle import oracle_hier_triple

    cfg = ModelConfig(vocab_size=512, num_layers=2, hidden_size=1024,
                      intermediate_size=2048, num_heads=8, num_kv_heads=2,
                      head_dim=128, quant=True, quant_lmhead=True)
    draft_cfg = dataclasses.replace(cfg, num_layers=1, quant_lmhead=False)
    ecfg = EagleConfig(model=dataclasses.replace(draft_cfg, num_layers=1),
                       num_iter=2, topk_per_iter=4, tree_size=6)
    params, dparams, eparams = oracle_hier_triple(cfg, draft_cfg, ecfg)
    eng = EngineConfig(chunk_length=64, max_total_length=512)
    engine = HierSpecEngine(cfg, draft_cfg, ecfg, eng, params, dparams,
                            eparams, min_draft_length=4)
    toks, _, _ = engine.generate([3, 7, 11], generation_length=24)
    assert len(toks) == 24
    # after the first (host-driven) round, fused rounds accept everything
    assert engine.mean_accept_length() > 3.0, engine.accept_lengths
    assert max(engine.accept_lengths) == engine.max_chain + 1


@pytest.mark.slow
def test_hier_oracle_warmup_compiles_once():
    """bench_spec's oracle-hier harness fix (VERDICT r4 task 5): warming
    through round 1 + one full fused segment must leave ZERO compiles in
    the timed region (the r4e 2.42 tok/s "ceiling" row timed the
    hier_segment compile). Mirrors bench.py's warm/steps formula at
    quant-compatible tiny dims (oracle_hier_triple always packs W4:
    K multiple of 1024, N multiple of 128)."""
    import logging

    from cpmcu_tpu.spec.oracle import oracle_hier_triple

    cfg = ModelConfig(
        vocab_size=512, num_layers=2, hidden_size=1024,
        intermediate_size=1024, num_heads=8, num_kv_heads=2, head_dim=128,
        rope=RopeConfig(), dtype="float32",
    )
    draft_cfg = dataclasses.replace(cfg, num_layers=2)
    ecfg = EagleConfig(
        model=dataclasses.replace(draft_cfg, num_layers=1),
        num_iter=2, topk_per_iter=4, tree_size=12,
    )
    params, dparams, eparams = oracle_hier_triple(cfg, draft_cfg, ecfg)
    eng = EngineConfig(chunk_length=64, max_total_length=1536)
    engine = HierSpecEngine(cfg, draft_cfg, ecfg, eng, params, dparams,
                            eparams, min_draft_length=8, attn_impl="xla")
    prompt = list(range(2, 50))
    seg = eng.spec_segment_size
    per_round = engine.max_chain + 1
    warm = per_round + seg * per_round + 2
    steps = 1 + 2 * seg * per_round
    engine.generate(prompt, generation_length=warm)
    engine.reset()

    rec = []
    handler = logging.Handler()
    handler.emit = lambda r: rec.append(r.getMessage())
    jax.config.update("jax_log_compiles", True)
    loggers = [logging.getLogger("jax._src.dispatch"),
               logging.getLogger("jax._src.interpreters.pxla"),
               logging.getLogger("jax")]
    for lg in loggers:
        lg.addHandler(handler)
    try:
        toks, _, _ = engine.generate(prompt, generation_length=steps)
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg in loggers:
            lg.removeHandler(handler)
    compiles = [m for m in rec if "ompil" in m]
    assert len(toks) == steps
    assert engine.mean_accept_length() > per_round - 2  # oracle accepts
    assert not compiles, compiles[:3]
