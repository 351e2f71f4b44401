"""W4A16 pack/repack/matmul correctness (CPU: XLA fallback + interpret kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpmcu_tpu.ops.quant import (
    GROUP_SIZE,
    dequantize,
    pack_rows,
    pack_weights,
    quant_matmul,
    quant_matmul_pallas,
    quantize_np,
    repack_gptq,
    unpack_rows,
)


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    q4 = rng.integers(0, 16, size=(2048, 96), dtype=np.int32)
    packed = pack_rows(q4)
    assert packed.shape == (256, 96)
    np.testing.assert_array_equal(unpack_rows(packed), q4)


def test_quantize_error_bound():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((1024, 64)).astype(np.float32)
    q4, s = quantize_np(w)
    deq = np.asarray(dequantize(jnp.asarray(pack_rows(q4)), jnp.asarray(s)))
    # max error within half a quantization step per group
    step = np.repeat(s, GROUP_SIZE, axis=0)
    assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-6)


def test_quant_matmul_xla_matches_dequant():
    rng = np.random.default_rng(2)
    K, N, M = 1024, 192, 4
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    pack = pack_weights(w)
    out = quant_matmul(x, pack["q"], pack["s"])
    ref = x @ dequantize(pack["q"], pack["s"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("M,K,N", [(1, 1024, 256), (16, 2048, 384), (70, 1024, 128)])
def test_quant_matmul_pallas_interpret(M, K, N):
    rng = np.random.default_rng(3)
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32), jnp.float32)
    pack = pack_weights(w)
    out = quant_matmul_pallas(x, pack["q"], pack["s"], bm=8, bn=128, interpret=True)
    # the decode kernel folds scale/zero past the dot (16*x·v - 24*sum(x),
    # v = 1 + nib/16): algebraically equal but not bit-identical in f32 —
    # cancellation leaves ~1e-4 absolute error at these magnitudes
    ref = x @ dequantize(pack["q"], pack["s"], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-2)


def test_repack_gptq_roundtrip():
    """Build a GPTQ-format checkpoint tensor set and verify repack."""
    rng = np.random.default_rng(4)
    K, N = 1024, 128
    q4 = rng.integers(0, 16, size=(K, N), dtype=np.int32)
    scales = rng.uniform(0.01, 0.1, size=(K // GROUP_SIZE, N)).astype(np.float16)
    # GPTQ packs 8 consecutive K rows per int32 word
    gptq_qw = np.zeros((K // 8, N), np.uint32)
    for j in range(8):
        gptq_qw |= q4[j::8].astype(np.uint32) << (4 * j)
    qzeros = np.full((K // GROUP_SIZE, N // 8), 0x88888888, np.uint32).astype(np.int32)
    g_idx = np.repeat(np.arange(K // GROUP_SIZE), GROUP_SIZE).astype(np.int32)

    pack = repack_gptq(gptq_qw.astype(np.int32), scales, qzeros, g_idx)
    np.testing.assert_array_equal(unpack_rows(np.asarray(pack["q"])), q4)
    ref = (q4.astype(np.float32) - 8.0) * np.repeat(
        scales.astype(np.float32), GROUP_SIZE, axis=0
    )
    # scales are stored as SCALE_DTYPE (bf16 by default: ~0.4% relative
    # rounding, an order below the int4 step — ops/quant.py SCALE_DTYPE)
    np.testing.assert_allclose(
        np.asarray(dequantize(pack["q"], pack["s"])), ref, rtol=5e-3, atol=1e-4
    )


def test_repack_gptq_rejects_act_order():
    K, N = 1024, 64
    qw = np.zeros((K // 8, N), np.int32)
    sc = np.ones((K // GROUP_SIZE, N), np.float16)
    bad_gidx = np.arange(K, dtype=np.int32) % (K // GROUP_SIZE)
    with pytest.raises(ValueError, match="act-order"):
        repack_gptq(qw, sc, None, bad_gidx)


def test_quantized_model_end_to_end():
    """Quantized tiny model == dense model with dequantized weights (exact on
    the XLA fallback path)."""
    import dataclasses

    from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.models.quantize import dequantize_params, quantize_params

    cfg = ModelConfig(
        vocab_size=256, num_layers=2, hidden_size=1024, intermediate_size=1024,
        num_heads=8, num_kv_heads=2, head_dim=128, rope=RopeConfig(),
        dtype="float32",
    )
    dense = llama.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    qcfg = dataclasses.replace(cfg, quant=True)
    qparams = quantize_params(dense, cfg)
    dparams = dequantize_params(qparams)

    eng = EngineConfig(chunk_length=8, max_total_length=64)
    e_q = Engine(qcfg, eng, qparams, attn_impl="xla")
    e_d = Engine(cfg, eng, dparams, attn_impl="xla")
    ids = [1, 2, 3, 4, 5, 6]
    lq = np.asarray(e_q.decode(ids, list(range(6))))
    ld = np.asarray(e_d.decode(ids, list(range(6))))
    np.testing.assert_allclose(lq, ld, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("M,K,N", [(1, 2048, 256), (8, 1024, 128)])
def test_quant_matmul_norm_fused_interpret(M, K, N):
    """Fused RMSNorm+matmul decode kernel == norm op then plain kernel."""
    rng = np.random.default_rng(5)
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    nw = jnp.asarray(rng.uniform(0.5, 1.5, size=(K,)).astype(np.float32))
    pack = pack_weights(w)
    out = quant_matmul_pallas(
        x, pack["q"], pack["s"], nw, norm_eps=1e-5, bm=8, bn=128,
        interpret=True,
    )
    from cpmcu_tpu.layers.modules import rms_norm

    xn = rms_norm(x, nw, 1e-5)
    ref = quant_matmul_pallas(xn, pack["q"], pack["s"], bm=8, bn=128,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-2)


def test_quant_matmul_norm_fused_prefill_path():
    """Prefill shapes (M > 64) apply the norm in XLA before the kernel."""
    rng = np.random.default_rng(6)
    M, K, N = 128, 1024, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    nw = jnp.asarray(rng.uniform(0.5, 1.5, size=(K,)).astype(np.float32))
    pack = pack_weights(w)
    out = quant_matmul(x, pack["q"], pack["s"], norm=(nw, 1e-5))
    from cpmcu_tpu.layers.modules import rms_norm

    ref = quant_matmul(rms_norm(x, nw, 1e-5), pack["q"], pack["s"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pack_weights_padded_zero_pad_columns():
    from cpmcu_tpu.ops.quant import pack_weights_padded

    rng = np.random.default_rng(7)
    K, N = 1024, 200
    w = rng.standard_normal((K, N)).astype(np.float32)
    pack = pack_weights_padded(w, n_align=512)
    assert pack["q"].shape == (K // 8, 512)
    deq = np.asarray(dequantize(pack["q"], pack["s"]))
    assert np.all(deq[:, N:] == 0)
    x = jnp.asarray(rng.standard_normal((2, K)).astype(np.float32))
    out = np.asarray(quant_matmul(x, pack["q"], pack["s"]))
    assert np.all(out[:, N:] == 0)


def test_quant_lmhead_end_to_end():
    """W4 lm_head (padded pack): logits match the dequantized-head oracle and
    the engine decode path slices back to the true vocab."""
    import dataclasses

    from cpmcu_tpu.core.config import EngineConfig, ModelConfig, RopeConfig
    from cpmcu_tpu.engine.engine import Engine
    from cpmcu_tpu.models import llama
    from cpmcu_tpu.models.quantize import quantize_params

    V = 250
    cfg = ModelConfig(
        vocab_size=V, num_layers=2, hidden_size=1024, intermediate_size=1024,
        num_heads=8, num_kv_heads=2, head_dim=128, rope=RopeConfig(),
        dtype="float32",
    )
    dense = llama.init_params(cfg, jax.random.PRNGKey(0), scale=0.05)
    qcfg = dataclasses.replace(cfg, quant=True, quant_lmhead=True)
    qparams = quantize_params(dense, qcfg)
    assert "q" in qparams["lm_head"]

    eng = EngineConfig(chunk_length=8, max_total_length=64)
    e_q = Engine(qcfg, eng, qparams, attn_impl="xla")
    ids = [1, 2, 3, 4, 5, 6]
    lq = np.asarray(e_q.decode(ids, list(range(6))))
    assert lq.shape == (6, V)

    # oracle: same body weights, lm_head replaced by its dequantized form
    oparams = dict(qparams)
    oparams["lm_head"] = {
        "w": dequantize(qparams["lm_head"]["q"], qparams["lm_head"]["s"])[:, :V]
    }
    e_o = Engine(dataclasses.replace(cfg, quant=True), eng, oparams,
                 attn_impl="xla")
    lo = np.asarray(e_o.decode(ids, list(range(6))))
    np.testing.assert_allclose(lq, lo, rtol=1e-4, atol=1e-4)

    # generation end-to-end (greedy) emits in-vocab tokens
    toks, _, _ = e_q.generate([1, 2, 3], generation_length=8)
    assert all(0 <= t < V for t in toks)


@pytest.mark.parametrize("ku", [1, 2, 4])
def test_quant_matmul_ku_unroll_interpret(ku):
    """k-unrolled decode kernel (TUNE['ku']) matches the ku=1 result."""
    import cpmcu_tpu.ops.quant as Q

    rng = np.random.default_rng(8)
    M, K, N = 4, 4096, 128
    w = rng.standard_normal((K, N)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    nw = jnp.asarray(rng.uniform(0.5, 1.5, size=(K,)).astype(np.float32))
    pack = pack_weights(w)
    old = dict(Q.TUNE)
    try:
        Q.TUNE["ku"] = ku
        out = quant_matmul_pallas(x, pack["q"], pack["s"], bm=8, bn=128,
                                  interpret=True)
        outn = quant_matmul_pallas(x, pack["q"], pack["s"], nw, bm=8, bn=128,
                                   interpret=True)
    finally:
        Q.TUNE.update(old)
    ref = x @ dequantize(pack["q"], pack["s"], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-2)
    from cpmcu_tpu.layers.modules import rms_norm

    refn = rms_norm(x, nw, 1e-6) @ dequantize(pack["q"], pack["s"],
                                              dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(outn), np.asarray(refn),
                               rtol=1e-3, atol=1e-2)


def test_quant_matmul_dyn_layer_matches_static():
    """Traced layer index (scalar prefetch; the scan-over-layers path) is
    bit-identical to the static layer BlockSpec path — incl. under lax.scan
    with the scan counter as the index (llama.forward unroll="scan")."""
    import jax

    import cpmcu_tpu.ops.quant as Q

    rng = np.random.default_rng(11)
    L, M, K, N = 3, 8, 2048, 1024
    qs = jnp.asarray(rng.integers(0, 2**31, (L, K // 8, N)), jnp.int32)
    ss = jnp.asarray(rng.standard_normal((L, K // 128, N)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    nw = jnp.asarray(rng.uniform(0.5, 1.5, (K,)), jnp.bfloat16)

    for li in range(L):
        for norm in (None, nw):
            a = quant_matmul_pallas(x, qs, ss, norm, layer=li, interpret=True)
            b = quant_matmul_pallas(x, qs, ss, norm, jnp.int32(li),
                                    interpret=True)
            np.testing.assert_array_equal(
                np.asarray(a, np.float32), np.asarray(b, np.float32))

    def body(carry, li):
        y = quant_matmul_pallas(x, qs, ss, nw, li, interpret=True)
        return carry + y.astype(jnp.float32), None

    tot, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.float32),
                          jnp.arange(L, dtype=jnp.int32))
    ref = sum(
        np.asarray(quant_matmul_pallas(x, qs, ss, nw, layer=i,
                                       interpret=True), np.float32)
        for i in range(L)
    )
    np.testing.assert_allclose(np.asarray(tot), ref, rtol=1e-6)


def test_quant_matmul_stacked_big_m_matches_sliced():
    """M>64 (tree-verify / batch-spec shapes) with a STATIC stacked layer
    reads the pack in place via the big-M kernel's layer BlockSpec; must
    be bit-identical to the unstacked call on the sliced layer (the old
    fallback COPIED the whole layer pack per call — r4e batch-spec
    trace, 27 x ~360us/round)."""
    rng = np.random.default_rng(13)
    L, M, K, N = 3, 96, 2048, 1024
    qs = jnp.asarray(rng.integers(0, 2**31, (L, K // 8, N)), jnp.int32)
    ss = jnp.asarray(rng.standard_normal((L, K // 128, N)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    for li in range(L):
        a = quant_matmul_pallas(x, qs, ss, layer=li, interpret=True)
        b = quant_matmul_pallas(x, qs[li], ss[li], interpret=True)
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))

    # ragged N exercises the bn-shrink path (N % 1024 != 0, still >= 128)
    N2 = 640
    qs2 = jnp.asarray(rng.integers(0, 2**31, (L, K // 8, N2)), jnp.int32)
    ss2 = jnp.asarray(rng.standard_normal((L, K // 128, N2)) * 0.1,
                      jnp.float32)
    a = quant_matmul_pallas(x, qs2, ss2, layer=1, interpret=True)
    b = quant_matmul_pallas(x, qs2[1], ss2[1], interpret=True)
    np.testing.assert_array_equal(
        np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_quant_matmul_stacked_big_m_dyn_layer():
    """M>64 with a TRACED layer (the batch-spec scan-over-layers path)
    rides scalar prefetch on the big-M kernel — bit-identical to the
    static-layer path, incl. under lax.scan."""
    import jax

    rng = np.random.default_rng(17)
    L, M, K, N = 3, 96, 2048, 1024
    qs = jnp.asarray(rng.integers(0, 2**31, (L, K // 8, N)), jnp.int32)
    ss = jnp.asarray(rng.standard_normal((L, K // 128, N)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

    for li in range(L):
        a = quant_matmul_pallas(x, qs, ss, layer=li, interpret=True)
        b = quant_matmul_pallas(x, qs, ss, None, jnp.int32(li),
                                interpret=True)
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32))

    def body(carry, li):
        y = quant_matmul_pallas(x, qs, ss, None, li, interpret=True)
        return carry + y.astype(jnp.float32), None

    tot, _ = jax.lax.scan(body, jnp.zeros((M, N), jnp.float32),
                          jnp.arange(L, dtype=jnp.int32))
    ref = sum(
        np.asarray(quant_matmul_pallas(x, qs, ss, layer=i, interpret=True),
                   np.float32)
        for i in range(L)
    )
    np.testing.assert_allclose(np.asarray(tot), ref, rtol=1e-6)
