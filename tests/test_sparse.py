"""InfLLM-v2 sparse attention: compression, stage-1 scoring, block selection,
and end-to-end sparse generation (reference §2.5 semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
from cpmcu_tpu.ops import sparse as sp


# ---------------------------------------------------------------------------
# compression
# ---------------------------------------------------------------------------


def _np_pool(k, clen, stride):
    """Reference pooling: row j = mean(k[j*stride : j*stride + 2*stride])."""
    out = np.stack(
        [k[:, j * stride : j * stride + 2 * stride].mean(axis=1) for j in range(clen)],
        axis=1,
    ) if clen else np.zeros((k.shape[0], 0, k.shape[2]), k.dtype)
    return out


@pytest.mark.parametrize("stride", [16, 64])
def test_compress_matches_numpy(stride):
    rng = np.random.default_rng(0)
    KVH, S, D = 2, 512, 16
    k = rng.normal(size=(KVH, S, D)).astype(np.float32)
    c = jnp.zeros((KVH, S // stride, D), jnp.float32)

    # incremental commits: 0 -> 100 -> 230 -> 512
    prev = 0
    for new in (100, 230, 512):
        old_c = int(sp.c_len_of(prev, stride))
        new_c = int(sp.c_len_of(new, stride))
        c = sp.compress_incremental(
            jnp.asarray(k), c, old_c, new_c, stride=stride,
            max_new=(new - prev) // stride + 1,
        )
        prev = new

    clen = int(sp.c_len_of(512, stride))
    want = _np_pool(k, clen, stride)
    np.testing.assert_allclose(np.asarray(c)[:, :clen], want, rtol=1e-5, atol=1e-5)


def test_c_len_semantics():
    # a compressed row exists only once its full window is committed
    assert int(sp.c_len_of(0, 16)) == 0
    assert int(sp.c_len_of(31, 16)) == 0
    assert int(sp.c_len_of(32, 16)) == 1
    assert int(sp.c_len_of(47, 16)) == 1
    assert int(sp.c_len_of(48, 16)) == 2
    assert int(sp.c_len_of(128, 64)) == 1


# ---------------------------------------------------------------------------
# stage-1 scores
# ---------------------------------------------------------------------------


def test_stage1_scores_vs_naive():
    rng = np.random.default_rng(1)
    T, H, KVH, D = 5, 4, 2, 8
    S1, S2 = 32, 8
    c1_len, c2_len = 25, 6
    q = rng.normal(size=(T, H, D)).astype(np.float32)
    c1 = rng.normal(size=(KVH, S1, D)).astype(np.float32)
    c2 = rng.normal(size=(KVH, S2, D)).astype(np.float32)
    scale = 1.0 / np.sqrt(D)

    for use_lse in (False, True):
        got = np.asarray(
            sp.stage1_scores(
                jnp.asarray(q), jnp.asarray(c1), jnp.asarray(c2),
                c1_len, c2_len, use_lse=use_lse, bt=4,
            )
        )
        G = H // KVH
        want = np.zeros((KVH, T, S1), np.float32)
        for g in range(KVH):
            for t in range(T):
                for h in range(G):
                    qh = q[t, g * G + h]
                    s1 = (c1[g, :c1_len] @ qh) * scale
                    ref = (c2[g, :c2_len] @ qh) * scale if use_lse else s1
                    m = ref.max()
                    lse = m + np.log(np.exp(ref - m).sum())
                    want[g, t, :c1_len] += np.exp(s1 - lse)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        # masked region is exactly zero (maxpool relies on it)
        assert np.all(got[:, :, c1_len:] == 0.0)


# ---------------------------------------------------------------------------
# block selection
# ---------------------------------------------------------------------------


def test_select_blocks_forcing_and_topk():
    KVH, T, S1 = 1, 2, 64  # NB = 16 blocks
    NB = S1 // 4
    rng = np.random.default_rng(2)
    p = rng.uniform(0.0, 1.0, size=(KVH, T, S1)).astype(np.float32)
    history = 1024  # all 16 blocks scored
    positions = np.array([1024, 1025], np.int32)  # q_block = 16

    idx, keep, pooled = sp.select_blocks(
        jnp.asarray(p), jnp.asarray(positions), history,
        topk=4, init_blocks=1, local_blocks=8,
    )
    bits = np.asarray(sp.bits_from_topk(idx, keep, NB))
    pooled = np.asarray(pooled)

    # naive pooling: block b = max over c1 idx [4b-1, 4b+4)
    want_pool = np.full((KVH, T, NB), -np.inf, np.float32)
    for b in range(NB):
        lo, hi = max(4 * b - 1, 0), min(4 * b + 4, S1)
        want_pool[..., b] = p[..., lo:hi].max(-1)
    q_block = positions // 64
    for t in range(T):
        for b in range(NB):
            if b < 1:
                want_pool[:, t, b] = np.inf
            elif b > q_block[t] - 8:
                want_pool[:, t, b] = -np.inf
    sel = np.argsort(-want_pool, axis=-1, kind="stable")[..., :4]
    want_bits = np.zeros((KVH, T, NB), bool)
    for g in range(KVH):
        for t in range(T):
            for b in sel[g, t]:
                if want_pool[g, t, b] > -1e29:
                    want_bits[g, t, b] = True

    assert bits.sum(-1).max() <= 4
    np.testing.assert_array_equal(bits, want_bits)
    # sink block always selected; local/future blocks never
    assert bits[..., 0].all()
    assert not bits[..., 9:].any()  # blocks > 16-8=8 are forced out


def test_selection_finds_needle_block():
    """Semantic gate: a distant block whose keys align with the query must
    be selected even when every nearer block is noise (the point of
    InfLLM-v2: retrieval over compressed semantic kernels)."""
    rng = np.random.default_rng(42)
    KVH, D = 2, 16
    S = 64 * 64  # 64 blocks
    hist = S
    needle_block = 7
    k = rng.normal(0, 0.1, size=(KVH, S, D)).astype(np.float32)
    qvec = rng.normal(size=(D,)).astype(np.float32)
    qvec /= np.linalg.norm(qvec)
    # plant the needle: the whole block's keys point along q
    k[:, needle_block * 64 : needle_block * 64 + 64] = qvec * 3.0

    # compress c1/c2 (full recompute via the incremental op)
    c1 = jnp.zeros((KVH, S // 16, D), jnp.float32)
    c2 = jnp.zeros((KVH, S // 64, D), jnp.float32)
    c1 = sp.compress_incremental(jnp.asarray(k), c1, 0,
                                 int(sp.c_len_of(hist, 16)), stride=16,
                                 max_new=S // 16)
    c2 = sp.compress_incremental(jnp.asarray(k), c2, 0,
                                 int(sp.c_len_of(hist, 64)), stride=64,
                                 max_new=S // 64)

    q = jnp.asarray(np.tile(qvec, (1, 4, 1)), jnp.float32)  # (T=1, H=4, D)
    scores = sp.stage1_scores(
        q, c1, c2, sp.c_len_of(hist, 16), sp.c_len_of(hist, 64), use_lse=True
    )
    idx, keep, _ = sp.select_blocks(
        scores, jnp.asarray([hist], jnp.int32), hist,
        topk=4, init_blocks=1, local_blocks=8,
    )
    chosen = set(np.asarray(idx)[0, 0][np.asarray(keep)[0, 0]].tolist())
    assert needle_block in chosen, f"needle block missing from {chosen}"


def test_block_visibility_window():
    KVH, T, NB = 1, 1, 16
    bits = np.zeros((KVH, T, NB), bool)
    bits[0, 0, 2] = True
    vis = np.asarray(
        sp.block_visibility(jnp.asarray(bits), jnp.asarray([640]), local_blocks=8)
    )
    # q_block = 10: window grants blocks 3..15 (b > 10-8), plus selected 2
    want = np.zeros((KVH, T, NB), bool)
    want[0, 0, 2] = True
    want[0, 0, 3:] = True
    np.testing.assert_array_equal(vis, want)


# ---------------------------------------------------------------------------
# Pallas block-sparse kernel vs XLA oracle
# ---------------------------------------------------------------------------


def _rand_selection(rng, KVH, T, NB, k):
    idx = np.stack(
        [rng.choice(NB, size=k, replace=False) for _ in range(KVH * T)]
    ).reshape(KVH, T, k).astype(np.int32)
    valid = rng.uniform(size=(KVH, T, k)) > 0.2
    return idx, valid


@pytest.mark.parametrize("T,include_new", [(1, True), (7, True), (64, True), (16, False)])
def test_sparse_kernel_matches_oracle(T, include_new):
    from cpmcu_tpu.ops.attention import mha_xla
    from cpmcu_tpu.ops.sparse_flash import sparse_flash_mha

    rng = np.random.default_rng(7)
    H, KVH, D = 8, 2, 32
    S = 1024
    NB = S // 64
    prior = 700
    local = 3

    q = rng.normal(size=(T, H, D)).astype(np.float32)
    kc = rng.normal(size=(KVH, S, D)).astype(np.float32)
    vc = rng.normal(size=(KVH, S, D)).astype(np.float32)
    positions = np.arange(prior, prior + T, dtype=np.int32)
    idx, valid = _rand_selection(rng, KVH, T, NB, 4)

    got = sparse_flash_mha(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), prior,
        jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(positions),
        include_new=include_new, local_blocks=local, interpret=True,
        return_lse=not include_new,
    )
    if not include_new:
        got, _ = got

    bits = sp.bits_from_topk(jnp.asarray(idx), jnp.asarray(valid), NB)
    bm = sp.block_visibility(bits, jnp.asarray(positions), local_blocks=local)
    # an all-False tree mask hides the new rows -> history-only oracle
    tm = None if include_new else jnp.zeros((T, T), jnp.bool_)
    want = mha_xla(jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
                   prior, tm, bm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sparse_attention_block_flash_vs_xla():
    """Full sparse attention-block path: Pallas (interpret) == XLA oracle."""
    from cpmcu_tpu.cache.sparse_kv import SparseKVCache, commit_jit
    from cpmcu_tpu.models import llama

    cfg = _sparse_cfg(sparse_topk_k=3, block_window_size=2, sparse_switch=0)
    params = llama.init_params(cfg, jax.random.PRNGKey(2))
    budget = 512
    rope = llama.make_rope(cfg, budget)
    rng = np.random.default_rng(8)
    toks = jnp.asarray(rng.integers(0, 128, size=300), jnp.int32)
    pos = jnp.arange(300, dtype=jnp.int32)

    outs = {}
    for impl in ("xla", "flash"):
        cache = SparseKVCache.create(cfg, budget)
        _, cache = llama.forward(cfg, params, rope, cache, toks, pos,
                                 logits_mode="none", attn_impl=impl,
                                 sparse_select=True)
        cache = commit_jit(cache, 300, max_new=512)
        tok = jnp.asarray([5], jnp.int32)
        p1 = jnp.asarray([300], jnp.int32)
        logits, _ = llama.forward(cfg, params, rope, cache, tok, p1,
                                  logits_mode="all", attn_impl=impl,
                                  sparse_select=True)
        outs[impl] = np.asarray(logits)
    np.testing.assert_allclose(outs["xla"], outs["flash"], rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# end-to-end
# ---------------------------------------------------------------------------


def _sparse_cfg(**kw):
    base = dict(
        vocab_size=128,
        num_layers=2,
        hidden_size=32,
        intermediate_size=64,
        num_heads=4,
        num_kv_heads=2,
        head_dim=8,
        rope=RopeConfig(),
        dtype="float32",
        apply_sparse=True,
    )
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.slow
def test_sparse_forward_full_topk_matches_dense():
    """With top-k covering every block and history shorter than the local
    window, sparse visibility == dense causal -> logits must match."""
    from cpmcu_tpu.cache.kv import KVCache
    from cpmcu_tpu.cache.sparse_kv import SparseKVCache, commit_jit
    from cpmcu_tpu.models import llama

    cfg_d = _sparse_cfg(apply_sparse=False)
    cfg_s = _sparse_cfg(sparse_topk_k=64, block_window_size=64, sparse_switch=0)
    params = llama.init_params(cfg_d, jax.random.PRNGKey(0))
    budget = 512
    rope = llama.make_rope(cfg_d, budget)

    dense = KVCache.create(cfg_d, budget)
    sparse = SparseKVCache.create(cfg_s, budget)

    rng = np.random.default_rng(3)
    toks = jnp.asarray(rng.integers(0, 128, size=200), jnp.int32)

    # prefill 200 tokens in one chunk, then compare one decode step
    pos = jnp.arange(200, dtype=jnp.int32)
    _, dense = llama.forward(cfg_d, params, rope, dense, toks, pos,
                             logits_mode="none", attn_impl="xla")
    dense = dense.with_length(200)
    _, sparse = llama.forward(cfg_s, params, rope, sparse, toks, pos,
                              logits_mode="none", attn_impl="xla")
    sparse = commit_jit(sparse, 200, max_new=256)
    assert int(sparse.length) == 200

    tok = jnp.asarray([7], jnp.int32)
    p1 = jnp.asarray([200], jnp.int32)
    ld, _ = llama.forward(cfg_d, params, rope, dense, tok, p1,
                          logits_mode="all", attn_impl="xla")
    ls, _ = llama.forward(cfg_s, params, rope, sparse, tok, p1,
                          logits_mode="all", attn_impl="xla", sparse_select=True)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ls), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sparse_engine_generates():
    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.models import llama

    cfg = _sparse_cfg(sparse_topk_k=2, block_window_size=2, sparse_switch=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    eng = EngineConfig(chunk_length=64, max_total_length=512, decode_segment_size=4)
    engine = Engine(cfg, eng, params, attn_impl="xla")

    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 128, size=200).tolist()
    assert not engine.sparse_engaged()
    tokens, _, _ = engine.generate(prompt, generation_length=12)
    assert len(tokens) == 12
    assert engine.sparse_engaged()  # long history -> selection active
    assert int(engine.cache.length) >= 200 + 11


@pytest.mark.slow
def test_sparse_slots_kernel_matches_xla_fallback():
    """Batched-slot sparse decode kernel (sparse_flash_mha_slots, interpret
    mode) must equal the per-slot XLA materialized-mask fallback — output
    AND LSE (the caller merges the self token by LSE)."""
    from cpmcu_tpu.ops.sparse_flash import (
        mha_sparse_slots, sparse_flash_mha_slots,
    )

    rng = np.random.default_rng(21)
    B, L, H, KVH, D = 3, 2, 8, 2, 128
    S = 1024
    NB = S // 64
    layer = 1
    lengths = np.asarray([700, 130, 512], np.int32)

    q = rng.normal(size=(B, H, D)).astype(np.float32)
    kc = rng.normal(size=(B, L, KVH, S, D)).astype(np.float32)
    vc = rng.normal(size=(B, L, KVH, S, D)).astype(np.float32)
    idx = np.zeros((B, KVH, 1, 4), np.int32)
    valid = np.zeros((B, KVH, 1, 4), bool)
    for b in range(B):
        i, v = _rand_selection(rng, KVH, 1, NB, 4)
        idx[b], valid[b] = i, v

    got_o, got_l = sparse_flash_mha_slots(
        jnp.asarray(q)[:, None], jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(lengths), jnp.asarray(idx), jnp.asarray(valid),
        jnp.asarray(lengths)[:, None],
        layer=layer, local_blocks=3, interpret=True, bk=128,
    )
    got_o, got_l = got_o[:, 0], got_l[:, 0]
    want_o, want_l = mha_sparse_slots(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(lengths), jnp.asarray(idx), jnp.asarray(valid),
        layer=layer, local_blocks=3, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_sparse_slots_kernel_multitoken_matches_xla():
    """T>1 queries per slot (batched sparse chain rounds): kernel parity
    with the per-slot XLA fallback, per-token selections and positions."""
    from cpmcu_tpu.ops.sparse_flash import (
        mha_sparse_slots, sparse_flash_mha_slots,
    )

    rng = np.random.default_rng(31)
    B, L, T, H, KVH, D = 2, 2, 4, 8, 2, 128
    S = 1024
    NB = S // 64
    layer = 0
    lengths = np.asarray([700, 260], np.int32)
    positions = lengths[:, None] + np.arange(T, dtype=np.int32)[None]

    q = rng.normal(size=(B, T, H, D)).astype(np.float32)
    kc = rng.normal(size=(B, L, KVH, S, D)).astype(np.float32)
    vc = rng.normal(size=(B, L, KVH, S, D)).astype(np.float32)
    idx = np.zeros((B, T, KVH, 4), np.int32)
    valid = np.zeros((B, T, KVH, 4), bool)
    for b in range(B):
        for t in range(T):
            i, v = _rand_selection(rng, KVH, 1, NB, 4)
            idx[b, t], valid[b, t] = i[:, 0], v[:, 0]
    idx = idx.transpose(0, 2, 1, 3)  # (B, KVH, T, K)
    valid = valid.transpose(0, 2, 1, 3)

    args = (jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(lengths), jnp.asarray(idx), jnp.asarray(valid))
    got_o, got_l = sparse_flash_mha_slots(
        *args, jnp.asarray(positions),
        layer=layer, local_blocks=3, interpret=True, bk=128,
    )
    want_o, want_l = mha_sparse_slots(
        *args, jnp.asarray(positions), layer=layer, local_blocks=3,
        impl="xla",
    )
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=2e-4, atol=2e-4)


def test_oracle_union_collapses_visit_union():
    """The mechanism behind bench --oracle-union: broadcasting one query's
    stage-1 scores makes every query tile select the SAME blocks, so the
    per-tile visit union drops from ~saturated to ~topk."""
    from cpmcu_tpu.ops.sparse import select_blocks
    from cpmcu_tpu.ops.sparse_flash import build_visit_tables

    rng = np.random.default_rng(0)
    KVH, T, S1, topk = 1, 256, 512, 4
    scores = jnp.asarray(rng.random((KVH, T, S1)), jnp.float32)
    positions = jnp.arange(S1 * 64 - T, S1 * 64, dtype=jnp.int32)
    hist = jnp.asarray(S1 * 64 - T, jnp.int32)

    def visited_sum(sc):
        idx, valid, _ = select_blocks(sc, positions, hist, topk=topk,
                                      init_blocks=1, local_blocks=2)
        _, visited, _ = build_visit_tables(
            idx, valid, positions, hist, nb=S1, bt=128,
            local_blocks=2, bk=512,
        )
        return int(visited.sum())

    saturated = visited_sum(scores)
    collapsed = visited_sum(jnp.broadcast_to(scores[:, -1:], scores.shape))
    # at this tiny shape (2 query tiles) random scores give 33 visited vs 9
    # collapsed; at bench shapes the gap is the full saturation ratio
    assert collapsed <= saturated / 2, (collapsed, saturated)


@pytest.mark.slow
def test_sparse_oracle_union_engine_generates():
    """--oracle-union bracket (core.config sparse_oracle_union): one
    stage-1 selection per forward. Generation must still run end-to-end,
    and with top-k covering everything it must equal exact sparse (the
    broadcast only changes WHICH blocks are picked, never visibility
    masking)."""
    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.models import llama

    rng = np.random.default_rng(4)
    prompt = rng.integers(0, 128, size=200).tolist()

    cfg = _sparse_cfg(sparse_topk_k=2, block_window_size=2, sparse_switch=64,
                      sparse_oracle_union=True)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    eng = EngineConfig(chunk_length=64, max_total_length=512,
                       decode_segment_size=4)
    engine = Engine(cfg, eng, params, attn_impl="xla")
    tokens, _, _ = engine.generate(prompt, generation_length=12)
    assert len(tokens) == 12
    assert engine.sparse_engaged()

    # full-coverage case: selection identical regardless of which query's
    # scores are used -> oracle-union output == exact sparse output
    outs = []
    for ou in (False, True):
        cfg_f = _sparse_cfg(sparse_topk_k=64, block_window_size=64,
                            sparse_switch=0, sparse_oracle_union=ou)
        p_f = llama.init_params(cfg_f, jax.random.PRNGKey(1))
        e_f = Engine(cfg_f, eng, p_f, attn_impl="xla")
        toks, _, _ = e_f.generate(prompt, generation_length=8)
        outs.append(toks)
    assert outs[0] == outs[1]


@pytest.mark.slow
def test_sparse_spec_engine_generates():
    import dataclasses

    from cpmcu_tpu.engine.spec_engine import SpecEngine
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    cfg = _sparse_cfg(sparse_topk_k=2, block_window_size=2, sparse_switch=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    draft = dataclasses.replace(cfg, num_layers=1, apply_sparse=False)
    ecfg = EagleConfig(model=draft, num_iter=2, topk_per_iter=3, tree_size=6,
                       window=64)
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    eng = EngineConfig(chunk_length=64, max_total_length=512)
    engine = SpecEngine(cfg, ecfg, eng, params, eparams, attn_impl="xla")

    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 128, size=150).tolist()
    tokens, _, _ = engine.generate(prompt, generation_length=10)
    assert len(tokens) == 10
    assert engine.mean_accept_length() >= 1.0


@pytest.mark.slow
def test_sparse_spec_matches_plain_decode():
    """First tokens of greedy sparse spec == greedy sparse non-spec.

    Only the prefix is guaranteed: block selection inside a spec round is
    computed with the pre-round history (the reference's tree decode also
    scores against next_kv_length = orig, minicpm4_attn.cuh:227-265), so
    deeper accepted tokens may legitimately diverge from step-by-step decode
    once selection lag changes a top-k set."""
    import dataclasses

    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.engine.spec_engine import SpecEngine
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.spec.eagle import EagleConfig, init_eagle_params

    cfg = _sparse_cfg(sparse_topk_k=3, block_window_size=2, sparse_switch=64)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    eng = EngineConfig(chunk_length=64, max_total_length=512)

    rng = np.random.default_rng(6)
    prompt = rng.integers(0, 128, size=150).tolist()

    plain = Engine(cfg, eng, params, attn_impl="xla")
    want, _, _ = plain.generate(prompt, generation_length=10)

    draft = dataclasses.replace(cfg, num_layers=1, apply_sparse=False)
    ecfg = EagleConfig(model=draft, num_iter=2, topk_per_iter=3, tree_size=6,
                       window=64)
    eparams = init_eagle_params(ecfg, jax.random.PRNGKey(1))
    spec = SpecEngine(cfg, ecfg, eng, params, eparams, attn_impl="xla")
    got, _, _ = spec.generate(prompt, generation_length=10)
    assert got[:2] == want[:2]


# ---------------------------------------------------------------------------
# Pallas stage-1 scorer (prefill shapes)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("use_lse,T", [(True, 128), (False, 128), (True, 70)])
def test_stage1_pallas_matches_xla(use_lse, T):
    """stage1_scores_pallas == the XLA stage1_scores oracle."""
    import jax

    from cpmcu_tpu.ops.sparse import stage1_scores
    from cpmcu_tpu.ops.sparse_stage1 import stage1_scores_pallas

    rng = np.random.default_rng(11)
    KVH, G, D = 2, 4, 128
    H = KVH * G
    S1, S2 = 256, 64
    q = jnp.asarray(rng.standard_normal((T, H, D)).astype(np.float32))
    c1 = jnp.asarray(rng.standard_normal((KVH, S1, D)).astype(np.float32))
    c2 = jnp.asarray(rng.standard_normal((KVH, S2, D)).astype(np.float32))
    c1_len = jnp.asarray(200, jnp.int32)
    c2_len = jnp.asarray(50, jnp.int32)

    want = stage1_scores(q, c1, c2, c1_len, c2_len, use_lse=use_lse)
    got = stage1_scores_pallas(
        q, c1, c2, c1_len, c2_len, use_lse=use_lse, bt=32, bs=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)
    # masked columns must be exactly zero (max-pool relies on it)
    assert np.all(np.asarray(got)[:, :, 200:] == 0.0)


@pytest.mark.parametrize("gs,return_lse", [(2, False), (4, False), (2, True)])
def test_sparse_kernel_gsplit_matches_oracle(gs, return_lse):
    """g-split (query group split over grid rows so bt grows) must be
    numerically identical to the unsplit kernel / XLA oracle."""
    from cpmcu_tpu.ops.attention import mha_xla
    from cpmcu_tpu.ops.sparse_flash import sparse_flash_mha

    rng = np.random.default_rng(11)
    H, KVH, D = 8, 2, 32  # G = 4
    S = 1024
    NB = S // 64
    prior = 700
    local = 3
    T = 48
    include_new = not return_lse

    q = rng.normal(size=(T, H, D)).astype(np.float32)
    kc = rng.normal(size=(KVH, S, D)).astype(np.float32)
    vc = rng.normal(size=(KVH, S, D)).astype(np.float32)
    positions = np.arange(prior, prior + T, dtype=np.int32)
    idx, valid = _rand_selection(rng, KVH, T, NB, 4)

    got = sparse_flash_mha(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), prior,
        jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(positions),
        include_new=include_new, local_blocks=local, interpret=True,
        return_lse=return_lse, gs=gs, bt=16,
    )
    if return_lse:
        got, got_lse = got

    bits = sp.bits_from_topk(jnp.asarray(idx), jnp.asarray(valid), NB)
    bm = sp.block_visibility(bits, jnp.asarray(positions), local_blocks=local)
    tm = None if include_new else jnp.zeros((T, T), jnp.bool_)
    want = mha_xla(jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
                   prior, tm, bm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    if return_lse:
        ref, ref_lse = sparse_flash_mha(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), prior,
            jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(positions),
            include_new=include_new, local_blocks=local, interpret=True,
            return_lse=True, gs=1, bt=16,
        )
        np.testing.assert_allclose(np.asarray(got_lse), np.asarray(ref_lse),
                                   rtol=2e-4, atol=2e-4)


def test_sparse_kernel_decode_bk64_matches_oracle():
    """decode_bk=64 tiles (one selection block per tile) stay exact."""
    from cpmcu_tpu.ops.attention import mha_xla
    from cpmcu_tpu.ops.sparse_flash import sparse_flash_mha

    rng = np.random.default_rng(13)
    H, KVH, D = 8, 2, 32
    S = 1024
    NB = S // 64
    prior = 700
    T = 4

    q = rng.normal(size=(T, H, D)).astype(np.float32)
    kc = rng.normal(size=(KVH, S, D)).astype(np.float32)
    vc = rng.normal(size=(KVH, S, D)).astype(np.float32)
    positions = np.arange(prior, prior + T, dtype=np.int32)
    idx, valid = _rand_selection(rng, KVH, T, NB, 4)

    got = sparse_flash_mha(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), prior,
        jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(positions),
        include_new=True, local_blocks=3, interpret=True, bk=64,
    )
    bits = sp.bits_from_topk(jnp.asarray(idx), jnp.asarray(valid), NB)
    bm = sp.block_visibility(bits, jnp.asarray(positions), local_blocks=3)
    want = mha_xla(jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
                   prior, None, bm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("pair,T", [(1, 5), (2, 5), (4, 5), (4, 16),
                                    (2, 16), (3, 1)])
def test_sparse_kernel_pair_matches_oracle(pair, T):
    """pair sub-tiles per grid step stay exact — incl. pair=3 (ngrid
    padded to a pair multiple) and tree-shaped T=16, which takes the
    COARSE tree_pair branch (tree_bk-row sub-tiles; T<=8 takes the fine
    decode_pair branch)."""
    from cpmcu_tpu.ops.attention import mha_xla
    from cpmcu_tpu.ops import sparse_flash as sf

    rng = np.random.default_rng(17 + pair)
    H, KVH, D = 8, 2, 32
    S = 1024
    NB = S // 64
    prior = 700
    local = 3

    q = rng.normal(size=(T, H, D)).astype(np.float32)
    kc = rng.normal(size=(KVH, S, D)).astype(np.float32)
    vc = rng.normal(size=(KVH, S, D)).astype(np.float32)
    positions = np.arange(prior, prior + T, dtype=np.int32)
    idx, valid = _rand_selection(rng, KVH, T, NB, 4)

    old = dict(sf.TUNE)
    sf.TUNE["decode_pair"] = pair
    sf.TUNE["tree_pair"] = pair  # T>8 reads tree_pair (coarse sub-tiles)
    sf.TUNE["tree_bk"] = 256  # S=1024 -> 4 coarse tiles, pairing engages
    jax.clear_caches()  # TUNE is read at trace time (CLAUDE.md pjit-cache)
    try:
        got = sf.sparse_flash_mha(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), prior,
            jnp.asarray(idx), jnp.asarray(valid), jnp.asarray(positions),
            include_new=True, local_blocks=local, interpret=True,
        )
    finally:
        sf.TUNE.clear()
        sf.TUNE.update(old)
        jax.clear_caches()
    bits = sp.bits_from_topk(jnp.asarray(idx), jnp.asarray(valid), NB)
    bm = sp.block_visibility(bits, jnp.asarray(positions), local_blocks=local)
    want = mha_xla(jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
                   prior, None, bm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
