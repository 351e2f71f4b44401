"""Norm-fused dense decode matmul (ops/dense.py) vs the XLA reference."""

import numpy as np

import jax
import jax.numpy as jnp

from cpmcu_tpu.ops.dense import dense_matmul_norm


def _ref(x, w, nw, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = (xf * jax.lax.rsqrt(var + eps) * nw.astype(jnp.float32)).astype(
        x.dtype
    )
    return jnp.dot(xn, w, preferred_element_type=jnp.float32).astype(x.dtype)


def test_dense_matmul_norm_matches_xla():
    rng = np.random.default_rng(0)
    M, K, N = 4, 1024, 1536
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    nw = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))

    got = dense_matmul_norm(x, w, nw, norm_eps=1e-6, interpret=True)
    want = _ref(x, w, nw, 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_dense_matmul_norm_layer_indexed():
    """Stacked (L, K, N) weights read in place via the layer BlockSpec —
    the decode path must not slice-copy per layer (CLAUDE.md weight-copy
    trap)."""
    rng = np.random.default_rng(1)
    L, M, K, N = 3, 1, 512, 512
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, K, N)).astype(np.float32) * 0.05)
    nw = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))

    for li in range(L):
        got = dense_matmul_norm(x, w, nw, norm_eps=1e-6, layer=li,
                                interpret=True)
        want = _ref(x, w[li], nw, 1e-6)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_dense_matmul_norm_unaligned_bn():
    """N=1280 (the 0.5B qkv width): no ladder divisor, bn falls back to N —
    the dispatch gate in layers.modules only requires 128-alignment."""
    rng = np.random.default_rng(2)
    M, K, N = 2, 1024, 1280
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    nw = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))

    got = dense_matmul_norm(x, w, nw, norm_eps=1e-5, interpret=True)
    want = _ref(x, w, nw, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_dense_matmul_layer_indexed():
    """No-norm variant (decode wo / w_down): stacked weights in place."""
    from cpmcu_tpu.ops.dense import dense_matmul

    rng = np.random.default_rng(3)
    L, M, K, N = 3, 2, 1024, 512
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(L, K, N)).astype(np.float32) * 0.05)
    for li in range(L):
        got = dense_matmul(x, w, layer=li, interpret=True)
        want = jnp.dot(x, w[li], preferred_element_type=jnp.float32).astype(
            x.dtype
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)


def test_embedding_onehot_matches_take():
    """Decode-shaped embedding backends are EXACT row lookups: the
    one-hot MXU dot (single 1.0 per row, f32 accumulate) and the
    dynamic-slice unroll must both reproduce jnp.take bit-for-bit."""
    import cpmcu_tpu.layers.modules as M

    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((1000, 128)), jnp.bfloat16)
    ids = jnp.asarray([0, 999, 17, 17, 3], jnp.int32)
    # reference: exact bf16 row lookup, then the same bf16 scale multiply
    want = np.asarray(
        jnp.take(table, ids, axis=0) * jnp.bfloat16(1.5), np.float32)
    old = M.EMBED_DECODE_IMPL
    try:
        for impl in ("onehot", "unroll"):
            M.EMBED_DECODE_IMPL = impl
            got = M.embedding(table, ids, 1.5, jnp.bfloat16)
            np.testing.assert_array_equal(np.asarray(got, np.float32), want)
    finally:
        M.EMBED_DECODE_IMPL = old
