"""Pallas flash kernel vs the XLA attention oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpmcu_tpu.ops.attention import mha_xla
from cpmcu_tpu.ops.flash import flash_mha, merge_attn, mha_flash


def _mk(T, H, KVH, D, S, seed=0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(k1, (T, H, D), dtype)
    k = jax.random.normal(k2, (KVH, S, D), dtype)
    v = jax.random.normal(k3, (KVH, S, D), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "T,prior,window,sink",
    [
        (1, 50, 0, 0),      # vanilla decode
        (1, 0, 0, 0),       # decode on empty history (first token)
        (16, 37, 0, 0),     # chunk mid-prefill (unaligned prior)
        (35, 0, 0, 0),      # first chunk, T not multiple of tiles
        (16, 40, 24, 0),    # sliding window
        (16, 40, 24, 2),    # sliding window + sink tokens
        (64, 64, 0, 0),     # aligned
    ],
)
def test_flash_causal_matches_xla(T, prior, window, sink):
    H, KVH, D, S = 8, 2, 128, 128
    q, k, v = _mk(T, H, KVH, D, S)
    prior = jnp.asarray(prior, jnp.int32)

    ref = mha_xla(q, k, v, prior, window=window, sink=sink)
    out = flash_mha(
        q, k, v, prior, causal=True, window=window, sink=sink,
        bk=16, bqt=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_multi_qtile():
    # T spans several q tiles, multiple kv blocks
    H, KVH, D, S = 4, 4, 64, 256
    T, prior = 48, 100
    q, k, v = _mk(T, H, KVH, D, S, seed=3)
    prior = jnp.asarray(prior, jnp.int32)
    ref = mha_xla(q, k, v, prior)
    out = flash_mha(q, k, v, prior, bk=32, bqt=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_lse_merge_tree_mask():
    """History kernel + XLA tree block merged by LSE == oracle with tree mask."""
    H, KVH, D, S = 8, 2, 64, 128
    T, prior = 12, 55
    q, k, v = _mk(T, H, KVH, D, S, seed=1)
    prior_j = jnp.asarray(prior, jnp.int32)

    # a random tree: node i attends a random subset of ancestors + itself
    rng = np.random.default_rng(0)
    tm = np.tril(rng.integers(0, 2, size=(T, T)).astype(bool))
    np.fill_diagonal(tm, True)
    tm = jnp.asarray(tm)

    ref = mha_xla(q, k, v, prior_j, tm)

    from cpmcu_tpu.ops.flash import _tree_block_attn

    out_h, lse_h = flash_mha(
        q, k, v, prior_j, causal=False, return_lse=True,
        bk=16, bqt=8, interpret=True,
    )
    out_t, lse_t = _tree_block_attn(q, k, v, prior_j, tm, window=0, sink=0)
    out = merge_attn(out_h, lse_h, out_t, lse_t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_tree_merge_empty_history():
    """Tree decode immediately after empty prefill: history part must vanish."""
    H, KVH, D, S = 4, 2, 64, 64
    T = 8
    q, k, v = _mk(T, H, KVH, D, S, seed=2)
    prior = jnp.asarray(0, jnp.int32)
    tm = jnp.asarray(np.tril(np.ones((T, T), bool)))
    ref = mha_xla(q, k, v, prior, tm)

    from cpmcu_tpu.ops.flash import _tree_block_attn

    out_h, lse_h = flash_mha(
        q, k, v, prior, causal=False, return_lse=True, bk=16, bqt=8, interpret=True
    )
    out_t, lse_t = _tree_block_attn(q, k, v, prior, tm, window=0, sink=0)
    out = merge_attn(out_h, lse_h, out_t, lse_t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_mha_flash_dispatch_tree():
    H, KVH, D, S = 8, 2, 64, 128
    T, prior = 6, 30
    q, k, v = _mk(T, H, KVH, D, S, seed=4)
    prior_j = jnp.asarray(prior, jnp.int32)
    tm = jnp.asarray(np.tril(np.ones((T, T), bool)))
    ref = mha_xla(q, k, v, prior_j, tm)
    out = mha_flash(q, k, v, prior_j, tree_mask=tm)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_slots_matches_per_slot_xla():
    """Batched slot-decode kernel (continuous batching): each slot's single
    query over its own cache lane + LSE self-merge must equal the XLA
    oracle run per slot over history+self."""
    from cpmcu_tpu.ops.flash import flash_mha_slots, merge_attn

    B, L, H, KVH, D, S = 3, 2, 8, 2, 128, 96
    G = H // KVH
    rng = jax.random.PRNGKey(3)
    kq, kk, kv2, kn = jax.random.split(rng, 4)
    q = jax.random.normal(kq, (B, H, D), jnp.float32)
    kc = jax.random.normal(kk, (B, L, KVH, S, D), jnp.float32)
    vc = jax.random.normal(kv2, (B, L, KVH, S, D), jnp.float32)
    k_new = jax.random.normal(kn, (B, KVH, D), jnp.float32)
    v_new = jax.random.normal(jax.random.PRNGKey(9), (B, KVH, D), jnp.float32)
    lengths = jnp.asarray([0, 17, 64], jnp.int32)  # incl. empty history

    li = 1
    out_h, lse_h = flash_mha_slots(
        q, kc, vc, lengths, layer=li, bk=32, interpret=True
    )
    # self merge (lse of a single key = its score)
    kb = jnp.repeat(k_new, G, axis=1)
    vb = jnp.repeat(v_new, G, axis=1)
    s_self = jnp.sum(q * kb, axis=-1) / jnp.sqrt(jnp.float32(D))
    got = merge_attn(out_h, lse_h, vb, s_self)

    for b in range(B):
        # oracle: write the self row at lengths[b], attend [0, len+1)
        kf = kc[b, li].at[:, lengths[b]].set(k_new[b])
        vf = vc[b, li].at[:, lengths[b]].set(v_new[b])
        ref = mha_xla(q[b][None], kf, vf, lengths[b])
        np.testing.assert_allclose(
            np.asarray(got[b]), np.asarray(ref[0]), rtol=2e-5, atol=2e-5
        )


def test_flash_dyn_layer_matches_static():
    """Traced layer index (3rd prefetch scalar) == static layer BlockSpec,
    incl. under lax.scan (llama.forward unroll="scan")."""
    rng = np.random.default_rng(3)
    L, KVH, S, D, H, T = 3, 2, 1024, 128, 4, 2
    kc = jnp.asarray(rng.standard_normal((L, KVH, S, D)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, KVH, S, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((T, H, D)), jnp.float32)
    prior = jnp.int32(200)
    for li in range(L):
        a = flash_mha(q, kc, vc, prior, causal=False, return_lse=True,
                      layer=li, interpret=True)
        b = flash_mha(q, kc, vc, prior, jnp.int32(li), causal=False,
                      return_lse=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def body(c, li):
        o = flash_mha(q, kc, vc, prior, li, causal=True, interpret=True)
        return c + o, None

    tot, _ = jax.lax.scan(body, jnp.zeros((T, H, D), jnp.float32),
                          jnp.arange(L, dtype=jnp.int32))
    ref = sum(
        np.asarray(flash_mha(q, kc, vc, prior, causal=True, layer=i,
                             interpret=True))
        for i in range(L)
    )
    np.testing.assert_allclose(np.asarray(tot), ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("causal,prior,T", [
    (True, 3900, 4),    # decode deep into a long cache
    (False, 3900, 12),  # tree-history pass (drafter window path)
    (True, 60, 8),      # window only partially filled (lo_blk == 0)
])
def test_flash_window_grid_skip(causal, prior, T):
    """window>0 & sink==0 shrinks the KV grid to ~(window+bqt)/bk steps and
    offsets the block index (the 96K drafter otherwise walked the whole
    capacity, ~0.9 ms/round); results must match the XLA oracle exactly as
    before the skip."""
    H, KVH, D, S, W = 4, 2, 32, 4096, 100
    q, k, v = _mk(T, H, KVH, D, S, seed=7)
    got = flash_mha(q, k, v, jnp.int32(prior), causal=causal, window=W,
                    return_lse=not causal, interpret=True)
    if causal:
        ref = mha_xla(q, k, v, jnp.int32(prior), window=W)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
    else:
        tm0 = jnp.zeros((T, T), jnp.bool_)
        ref, lse_ref = mha_xla(q, k, v, jnp.int32(prior), tm0, window=W,
                               return_lse=True)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got[1]),
                                   np.asarray(lse_ref.T),
                                   rtol=2e-5, atol=2e-5)
