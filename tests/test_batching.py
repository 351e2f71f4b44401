"""Continuous batching + mesh-sharded inference (BASELINE config 5 pieces)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # continuous-batching engine e2e (heavy tier, VERDICT r4 task 7)

import jax

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.engine.batch_engine import ContinuousBatchingEngine
from cpmcu_tpu.engine.engine import Engine
from cpmcu_tpu.models import llama


@pytest.fixture(scope="module")
def tiny():
    cfg = ModelConfig(
        vocab_size=128, num_layers=2, hidden_size=32, intermediate_size=64,
        num_heads=4, num_kv_heads=2, head_dim=8, rope=RopeConfig(),
        dtype="float32",
    )
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _batch_engine(tiny, **kw):
    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=512)
    return ContinuousBatchingEngine(cfg, eng, params, attn_impl="xla", **kw)


def test_batched_matches_single_engine(tiny):
    """Greedy: every batched request must reproduce the single-sequence
    engine's output exactly (lockstep batching is a pure layout change)."""
    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=128)
    prompts = [[1, 2, 3], [50, 60], [7, 8, 9, 10, 11]]

    want = {}
    single = Engine(cfg, eng, params, attn_impl="xla")
    for i, p in enumerate(prompts):
        single.reset()
        toks, _, _ = single.generate(p, generation_length=8)
        want[i] = toks

    be = _batch_engine(tiny, max_batch=4)
    ids = [be.submit(p, max_new_tokens=8) for p in prompts]
    got = be.run()
    for i, rid in enumerate(ids):
        assert got[rid] == want[i], f"request {i} diverged"


def test_more_requests_than_slots(tiny):
    be = _batch_engine(tiny, max_batch=2)
    ids = [be.submit([i + 1, i + 2], max_new_tokens=5) for i in range(5)]
    out = be.run()
    assert sorted(out.keys()) == sorted(ids)
    assert all(len(v) == 5 for v in out.values())


def test_terminator_frees_slot(tiny):
    be = _batch_engine(tiny, max_batch=2)
    # find the greedy second token, then use it as a terminator
    probe = be.submit([1, 2, 3], max_new_tokens=4)
    out = be.run()
    term = out[probe][1]
    rid = be.submit([1, 2, 3], max_new_tokens=10, terminators=[term])
    out = be.run()
    assert len(out[rid]) < 10
    assert term not in out[rid]
    assert len(be.free_slots) == 2


def test_pipelined_neighbor_finish_no_corruption(tiny):
    """run() pipelines segments (N+1 dispatched before N's readback). A
    slot finishing mid-flight leaves one chained garbage segment for its
    lane; the continuing neighbor's greedy output must be unaffected, and
    the finished slot must be freed with committed lengths reconciled."""
    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=128)
    single = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = single.generate([4, 5, 6], generation_length=40)

    be = _batch_engine(tiny, max_batch=2)
    short = be.submit([1, 2, 3], max_new_tokens=3)  # ends in segment 1
    long = be.submit([4, 5, 6], max_new_tokens=40)  # spans ~3 segments
    out = be.run()
    assert len(out[short]) == 3
    assert out[long] == want
    assert len(be.free_slots) == 2
    assert list(np.asarray(be.bcache.lengths)) == list(be._host_lengths)


def test_sparse_batched_matches_single_engine(tiny):
    """Sparse continuous batching (InfLLM-v2 selection per slot): every
    batched request must reproduce the single-sequence sparse engine's
    greedy output exactly, including with interleaved slot lengths and
    mid-flight finishes."""
    import dataclasses as dc

    cfg, params = tiny
    cfg = dc.replace(cfg, apply_sparse=True, sparse_topk_k=2,
                     block_window_size=2, sparse_switch=64)
    eng = EngineConfig(chunk_length=64, max_total_length=2048,
                       decode_segment_size=4)
    rng = np.random.default_rng(7)
    # 400 tokens > the complete-visibility horizon (topk+local+sink)*64 =
    # 320, so its selection genuinely drops blocks; 90 stays dense-complete
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (400, 150, 90)]

    want = {}
    single = Engine(cfg, eng, params, attn_impl="xla")
    engaged = []
    for i, p in enumerate(prompts):
        single.reset()
        toks, _, _ = single.generate(p, generation_length=10)
        want[i] = toks
        engaged.append(single.sparse_engaged())
    assert engaged[0]  # the 200-token prompt must exercise real selection

    be = ContinuousBatchingEngine(cfg, eng, params, attn_impl="xla",
                                  max_batch=4)
    ids = [be.submit(p, max_new_tokens=10) for p in prompts]
    got = be.run()
    for i, rid in enumerate(ids):
        assert got[rid] == want[i], f"sparse request {i} diverged"


def test_submit_overflow_raises(tiny):
    be = _batch_engine(tiny, max_batch=2)
    with pytest.raises(ValueError):
        be.submit(list(range(1000)), max_new_tokens=be.slot_budget)


def test_interleaved_submission(tiny):
    """Requests submitted while others are mid-decode join the batch."""
    be = _batch_engine(tiny, max_batch=4)
    a = be.submit([1, 2, 3], max_new_tokens=12)
    out = {a: []}
    for _ in range(4):
        for ev in be.step():
            out[ev.request_id].append(ev.token)
    b = be.submit([9, 8, 7], max_new_tokens=6)
    out[b] = []
    while be.has_work:
        for ev in be.step():
            out[ev.request_id].append(ev.token)
    assert len(out[a]) == 12 and len(out[b]) == 6

    # joining mid-flight must not change request a's output
    single = Engine(be.cfg, EngineConfig(chunk_length=16, max_total_length=128),
                    be.params, attn_impl="xla")
    want, _, _ = single.generate([1, 2, 3], generation_length=12)
    assert out[a] == want


def test_batch_chain_spec_lossless(tiny):
    """Batched chain speculation must emit exactly the plain batched
    engine's greedy tokens (speculation is lossless; a random drafter only
    changes accept lengths), with uneven per-slot accepts and a mid-flight
    finish."""
    import dataclasses as dc

    from cpmcu_tpu.engine.batch_chain_engine import BatchChainSpecEngine

    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=256,
                       spec_num_iter=3)
    prompts = [[1, 2, 3], [50, 60], [7, 8, 9, 10, 11]]

    plain = _batch_engine(tiny, max_batch=4)
    wids = [plain.submit(p, max_new_tokens=9) for p in prompts]
    want = plain.run()

    dcfg = dc.replace(cfg, num_layers=1)
    dparams = llama.init_params(dcfg, jax.random.PRNGKey(9))
    be = BatchChainSpecEngine(cfg, dcfg, eng, params, dparams,
                              max_batch=4, attn_impl="xla")
    ids = [be.submit(p, max_new_tokens=9) for p in prompts]
    out = be.run()
    for w, r in zip(wids, ids):
        assert out[r] == want[w], "chain-spec output diverged from plain"
    assert be.mean_accept_length() >= 1.0


def test_batch_chain_spec_oracle_accept(tiny):
    """Self-drafting (draft model == base model) must accept the full
    chain every round — the deterministic accept == num_iter+1 fixture —
    while staying lossless."""
    from cpmcu_tpu.engine.batch_chain_engine import BatchChainSpecEngine

    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=256,
                       spec_num_iter=3)
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11]]

    plain = _batch_engine(tiny, max_batch=2)
    wids = [plain.submit(p, max_new_tokens=12) for p in prompts]
    want = plain.run()

    be = BatchChainSpecEngine(cfg, cfg, eng, params, params,
                              max_batch=2, attn_impl="xla")
    ids = [be.submit(p, max_new_tokens=12) for p in prompts]
    out = be.run()
    for w, r in zip(wids, ids):
        assert out[r] == want[w]
    assert be.mean_accept_length() == eng.spec_num_iter + 1


def test_sparse_batch_chain_spec_lossless(tiny):
    """Sparse x speculation x batching (the full cube): batched chain
    rounds over sparse slot lanes must emit exactly the sparse batched
    engine's greedy tokens, with a prompt past the complete-visibility
    horizon (real block dropping) and per-round compression commits."""
    import dataclasses as dc

    from cpmcu_tpu.engine.batch_chain_engine import BatchChainSpecEngine

    cfg, params = tiny
    scfg = dc.replace(cfg, apply_sparse=True, sparse_topk_k=2,
                      block_window_size=2, sparse_switch=64)
    eng = EngineConfig(chunk_length=64, max_total_length=2048,
                       spec_num_iter=3, decode_segment_size=4)
    rng = np.random.default_rng(17)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (400, 90)]

    plain = ContinuousBatchingEngine(scfg, eng, params, attn_impl="xla",
                                     max_batch=2)
    wids = [plain.submit(p, max_new_tokens=10) for p in prompts]
    want = plain.run()

    # self-drafting dense drafter: high accept through the sparse verify
    dcfg = dc.replace(scfg, apply_sparse=False)
    be = BatchChainSpecEngine(scfg, dcfg, eng, params, params,
                              max_batch=2, attn_impl="xla")
    ids = [be.submit(p, max_new_tokens=10) for p in prompts]
    out = be.run()
    for w, r in zip(wids, ids):
        assert out[r] == want[w], "sparse chain-spec diverged"
    assert be.mean_accept_length() >= 1.0


def test_batch_forward_tokens_flash_matches_xla(tiny):
    """The multi-token slots forward folds T tokens into the flash-slots
    kernel's query rows on TPU; the interpret-mode kernel path must match
    the XLA fallback (this is the path the TPU chain/eagle benches take)."""
    import jax.numpy as jnp

    from cpmcu_tpu.engine.batch_engine import (
        BatchKVCache, batch_forward_tokens,
    )

    cfg, params = tiny
    B, T, S = 3, 4, 64
    bcache = BatchKVCache.create(cfg, B, S)
    rng = np.random.default_rng(3)
    # commit some history per slot first
    hist = jnp.asarray(rng.normal(size=(B, cfg.num_layers, cfg.num_kv_heads,
                                        S, cfg.head_dim)).astype(np.float32))
    lengths = jnp.asarray([10, 3, 7], jnp.int32)
    bcache = BatchKVCache(hist, hist * 0.5, lengths)
    rope = llama.make_rope(cfg, S)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(B, T)),
                         jnp.int32)

    outs = {}
    for impl in ("xla", "flash"):
        _, _, logits, hid = batch_forward_tokens(
            cfg, params, rope, bcache, tokens, attn_impl=impl,
            return_hidden=True,
        )
        outs[impl] = (np.asarray(logits), np.asarray(hid))
    np.testing.assert_allclose(outs["xla"][0], outs["flash"][0],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(outs["xla"][1], outs["flash"][1],
                               rtol=2e-4, atol=2e-4)


def test_batch_eagle_spec_lossless(tiny):
    """Batched EAGLE-2 tree speculation must emit exactly the plain batched
    engine's greedy tokens (a random drafter only changes accept lengths)."""
    import dataclasses as dc

    from cpmcu_tpu.engine.batch_spec_engine import BatchSpecEngine
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=256)
    prompts = [[1, 2, 3], [50, 60], [7, 8, 9, 10, 11]]

    plain = _batch_engine(tiny, max_batch=4)
    wids = [plain.submit(p, max_new_tokens=9) for p in prompts]
    want = plain.run()

    dcfg = dc.replace(cfg, num_layers=1)
    ecfg = EagleConfig(model=dcfg, num_iter=2, topk_per_iter=3, tree_size=6)
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(5))
    be = BatchSpecEngine(cfg, ecfg, eng, params, eparams,
                         max_batch=4, attn_impl="xla")
    ids = [be.submit(p, max_new_tokens=9) for p in prompts]
    out = be.run()
    for w, r in zip(wids, ids):
        assert out[r] == want[w], "batched eagle output diverged from plain"
    assert be.mean_accept_length() >= 1.0


def test_batch_eagle_spec_multichunk_prompt(tiny):
    """Admission prompts spanning several prefill chunks drive the lagged
    draft prefill (pend_embed/pend_hidden across chunk boundaries) on the
    slot lanes; output must stay lossless."""
    import dataclasses as dc

    from cpmcu_tpu.engine.batch_spec_engine import BatchSpecEngine
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=256)
    rng = np.random.default_rng(23)
    prompts = [rng.integers(0, 128, size=40).tolist(),
               rng.integers(0, 128, size=17).tolist()]

    plain = _batch_engine(tiny, max_batch=2)
    wids = [plain.submit(p, max_new_tokens=8) for p in prompts]
    want = plain.run()

    dcfg = dc.replace(cfg, num_layers=1)
    ecfg = EagleConfig(model=dcfg, num_iter=2, topk_per_iter=3, tree_size=6)
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(5))
    be = BatchSpecEngine(cfg, ecfg, eng, params, eparams,
                         max_batch=2, attn_impl="xla")
    ids = [be.submit(p, max_new_tokens=8) for p in prompts]
    out = be.run()
    for w, r in zip(wids, ids):
        assert out[r] == want[w], "multi-chunk admission diverged"


def test_batch_eagle_spec_oracle_accept(tiny):
    """Bigram-oracle drafter (test_spec fixture): every full round accepts
    the whole chain — drives the batched drafter catch-up, tree expansion,
    multi-token emit and per-slot compaction with accept_len > 1 — while
    staying lossless."""
    from test_spec import _bigram_base_and_oracle_drafter

    from cpmcu_tpu.engine.batch_spec_engine import BatchSpecEngine

    cfg, _ = tiny
    params, ecfg, eparams = _bigram_base_and_oracle_drafter(
        cfg, jax.random.PRNGKey(0)
    )
    eng = EngineConfig(chunk_length=16, max_total_length=256)
    prompts = [[3, 14, 15, 9], [1, 2]]

    plain = ContinuousBatchingEngine(cfg, eng, params, attn_impl="xla",
                                     max_batch=2)
    wids = [plain.submit(p, max_new_tokens=20) for p in prompts]
    want = plain.run()

    be = BatchSpecEngine(cfg, ecfg, eng, params, eparams,
                         max_batch=2, attn_impl="xla")
    ids = [be.submit(p, max_new_tokens=20) for p in prompts]
    out = be.run()
    for w, r in zip(wids, ids):
        assert out[r] == want[w]
    assert be.mean_accept_length() > 1.5
    assert max(be.accept_lengths) == ecfg.num_iter + 1


# ---------------------------------------------------------------------------
# mesh-sharded engines
# ---------------------------------------------------------------------------


def test_sharded_engine_matches_unsharded(tiny):
    from cpmcu_tpu.core.mesh import create_mesh

    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=128)
    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate([1, 2, 3, 4], generation_length=8)

    mesh = create_mesh(tp_size=2, dp_size=4)
    sharded = Engine(cfg, eng, params, attn_impl="xla", mesh=mesh)
    got, _, _ = sharded.generate([1, 2, 3, 4], generation_length=8)
    assert got == want


def test_sharded_batch_engine(tiny):
    from cpmcu_tpu.core.mesh import create_mesh

    mesh = create_mesh(tp_size=2, dp_size=4)
    be = _batch_engine(tiny, max_batch=4, mesh=mesh)
    prompts = [[1, 2, 3], [50, 60]]
    ids = [be.submit(p, max_new_tokens=6) for p in prompts]
    out = be.run()
    assert all(len(out[r]) == 6 for r in ids)

    plain = _batch_engine(tiny, max_batch=4)
    ids2 = [plain.submit(p, max_new_tokens=6) for p in prompts]
    out2 = plain.run()
    for r1, r2 in zip(ids, ids2):
        assert out[r1] == out2[r2]


def test_sharded_sparse_batch_engine(tiny):
    """Sparse continuous batching under a (dp, tp) mesh (slots over dp,
    heads + compressed mirrors over tp) must equal the unsharded engine."""
    import dataclasses

    from cpmcu_tpu.core.mesh import create_mesh

    cfg, params = tiny
    scfg = dataclasses.replace(
        cfg, apply_sparse=True, sparse_topk_k=2, block_window_size=2,
        sparse_switch=64,
    )
    eng = EngineConfig(chunk_length=64, max_total_length=2048,
                       decode_segment_size=4)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 128, size=n).tolist() for n in (400, 90)]

    mesh = create_mesh(tp_size=2, dp_size=4)
    be = ContinuousBatchingEngine(scfg, eng, params, attn_impl="xla",
                                  max_batch=4, mesh=mesh)
    ids = [be.submit(p, max_new_tokens=6) for p in prompts]
    out = be.run()

    plain = ContinuousBatchingEngine(scfg, eng, params, attn_impl="xla",
                                     max_batch=4)
    ids2 = [plain.submit(p, max_new_tokens=6) for p in prompts]
    out2 = plain.run()
    for r1, r2 in zip(ids, ids2):
        assert out[r1] == out2[r2]


def test_sharded_batch_chain_spec_engine(tiny):
    """Batched chain speculation under a (dp, tp) mesh must equal the
    unsharded engine's output."""
    import dataclasses as dc

    from cpmcu_tpu.core.mesh import create_mesh
    from cpmcu_tpu.engine.batch_chain_engine import BatchChainSpecEngine

    cfg, params = tiny
    eng = EngineConfig(chunk_length=16, max_total_length=256,
                       spec_num_iter=3)
    dcfg = dc.replace(cfg, num_layers=1)
    dparams = llama.init_params(dcfg, jax.random.PRNGKey(9))
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11]]

    plain = BatchChainSpecEngine(cfg, dcfg, eng, params, dparams,
                                 max_batch=4, attn_impl="xla")
    wids = [plain.submit(p, max_new_tokens=8) for p in prompts]
    want = plain.run()

    mesh = create_mesh(tp_size=2, dp_size=4)
    # slot axis shards over dp: max_batch must be divisible by dp
    be = BatchChainSpecEngine(cfg, dcfg, eng, params, dparams,
                              max_batch=4, attn_impl="xla", mesh=mesh)
    ids = [be.submit(p, max_new_tokens=8) for p in prompts]
    out = be.run()
    for w, r in zip(wids, ids):
        assert out[r] == want[w]


def test_sharded_sparse_engine(tiny):
    from cpmcu_tpu.core.mesh import create_mesh

    cfg, params = tiny
    import dataclasses

    scfg = dataclasses.replace(
        cfg, apply_sparse=True, sparse_topk_k=2, block_window_size=2,
        sparse_switch=64,
    )
    eng = EngineConfig(chunk_length=64, max_total_length=512)
    mesh = create_mesh(tp_size=2, dp_size=4)
    e = Engine(scfg, eng, params, attn_impl="xla", mesh=mesh)
    prompt = np.random.default_rng(0).integers(0, 128, size=200).tolist()
    toks, _, _ = e.generate(prompt, generation_length=6)
    assert len(toks) == 6

    plain = Engine(scfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate(prompt, generation_length=6)
    assert toks == want
