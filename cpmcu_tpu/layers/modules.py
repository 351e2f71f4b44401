"""Functional building blocks: norm, linear (dense & quantized), FFN.

Each block is a pure function over a param sub-pytree. Reference parity:
  * RMSNorm / fused add+RMSNorm      — src/model/norm.cuh:7-154
  * Linear (fp32 accumulate)         — src/model/linear.cuh:8-105
  * LM head with pre-scale           — src/model/linear.cuh:95-105, llm.py:67
  * Gated SiLU FFN                   — src/model/ffn.cuh:18-89, activation.cuh
  * Embedding with scale_emb         — src/model/embedding.cuh:6-53

On TPU the fusions the reference hand-writes (add+norm, gated-silu epilogue)
are expressed as plain jnp and fused by XLA; matmuls run on the MXU in the
model dtype with fp32 accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float):
    """RMSNorm in fp32 (the reference kernel accumulates float, norm.cuh:20-40).

    (An MXU self-dot variance variant measured identically at decode —
    the VPU reduce is not a bottleneck.)"""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * weight.astype(jnp.float32)).astype(x.dtype)


def add_rms_norm(x, residual, weight, eps: float):
    """Fused residual-add + RMSNorm; returns (normed, new_residual).

    Mirrors ``add_and_rms_norm_kernel`` (norm.cuh:60-100) which writes the
    sum back into ``input`` and returns the normalized value.
    """
    s = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(s, weight, eps), s


def linear(p: dict, x, layer=None, norm=None):
    """Dense or W4A16 linear. ``p`` is {'w': (in,out)[, 'b': (out,)]} or a
    quantized pack {'q','s'} handled by ops.quant. With ``layer`` (static
    int OR traced scan counter), ``p`` holds stacked (L, ...) tensors read
    in place — the quant kernel indexes them via its BlockSpec (static) or
    scalar prefetch (traced) so no per-layer slice copy happens (the
    zero-copy decode path). A traced layer on DENSE weights falls back to
    a ``w[layer]`` slice copy — acceptable only for small drafters; quant
    packs are the scan-over-layers fast path. With ``norm=(weight, eps)``,
    ``x`` arrives UN-normed and ``rms_norm(x)*weight`` is fused into the
    quant decode kernel (applied as a separate op for dense weights)."""
    dyn = layer is not None and not isinstance(layer, int)
    if "q" in p:
        from ..ops.quant import quant_matmul

        y = quant_matmul(x, p["q"], p["s"], layer=layer, norm=norm)
    else:
        from ..ops.dense import decode_supported, dense_matmul, dense_matmul_norm

        K = x.shape[-1]
        N = p["w"].shape[-1]
        use_kernel = (
            jax.default_backend() == "tpu" and x.ndim == 2 and not dyn
            and (norm is not None or layer is not None)
            and decode_supported(x.shape[0], K, N)
        )
        if use_kernel and norm is not None:
            # decode-shaped dense: fuse the norm into the matmul kernel
            # (separate norm ops are dispatch-latency-bound — the bf16
            # analog of the quant kernel's fused-norm path; also reads
            # stacked (L, K, N) weights in place via the layer BlockSpec)
            y = dense_matmul_norm(x, p["w"], norm[0], norm_eps=norm[1],
                                  layer=layer)
        elif use_kernel:
            # layer-indexed wo / w_down: stacked weights read in place
            # (w[layer] slicing copies the weight every decode step)
            y = dense_matmul(x, p["w"], layer=layer)
        else:
            if norm is not None:
                x = rms_norm(x, norm[0], norm[1])
            w = p["w"] if layer is None else p["w"][layer]
            y = jnp.dot(x, w,
                        preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        b = p["b"] if layer is None else p["b"][layer]
        y = y + b
    return y


# decode-shaped embedding backend: "unroll" (static dynamic-slice
# unroll, ~2us/row, reads exactly T rows) or "onehot" (one iota-compare
# + one MXU dot — exact, 2 ops/call, but the dot STREAMS THE WHOLE
# (V, H) table: ~600 MB for the 8B vocab, ~0.7 ms/call — only viable
# for tiny vocabs; kept as a tested alternative, NOT the default).
# Both replace jnp.take, whose (V, H) gather lowers to a slow per-row
# loop (~3 ms/round in the spec engine).
EMBED_DECODE_IMPL = "unroll"


def embedding(embed_table, token_ids, scale_emb: float, dtype):
    ids = jnp.asarray(token_ids)
    if ids.ndim == 1 and ids.shape[0] <= 64:
        if EMBED_DECODE_IMPL == "onehot":
            V = embed_table.shape[0]
            oh = (ids[:, None] == jnp.arange(V, dtype=ids.dtype)[None, :])
            h = jax.lax.dot_general(
                oh.astype(embed_table.dtype), embed_table,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        else:
            rows = [
                jax.lax.dynamic_slice_in_dim(embed_table, ids[i], 1, axis=0)
                for i in range(ids.shape[0])
            ]
            h = (jnp.concatenate(rows, axis=0).astype(dtype)
                 if len(rows) > 1 else rows[0].astype(dtype))
    else:
        h = jnp.take(embed_table, ids, axis=0).astype(dtype)
    if scale_emb != 1.0:
        h = h * jnp.asarray(scale_emb, dtype)
    return h


def lm_head(p: dict, x, scale_lmhead: float, norm=None, n_out=None):
    """Final projection; MiniCPM pre-scales hidden by dim_model_base/hidden
    (llm.py:67, linear.cuh LMHead head_scale).

    ``norm=(final_norm_weight, eps)``: ``x`` arrives un-normed and the final
    RMSNorm (with the lm_head pre-scale folded into its weight) fuses into
    the quant decode kernel. ``n_out`` slices logits back to the true vocab
    when the W4 lm_head pack is N-padded (ops.quant.pack_weights_padded)."""
    if norm is not None and "q" in p:
        # fold the pre-scale into the f32 norm weight (one fewer bf16 round)
        w = norm[0].astype(jnp.float32) * scale_lmhead
        y = linear(p, x, norm=(w, norm[1]))
    else:
        if norm is not None:  # dense head: no kernel to fuse into — keep the
            x = rms_norm(x, norm[0], norm[1])  # exact legacy op order

        if scale_lmhead != 1.0:
            x = x * jnp.asarray(scale_lmhead, x.dtype)
        y = linear(p, x)
    if n_out is not None and y.shape[-1] != n_out:
        y = y[..., :n_out]
    return y


def gated_ffn(p: dict, x, layer=None, norm=None):
    """norm -> gate/up -> SiLU(gate)*up -> down (ffn.cuh:77-84). Supports a
    fused [gate|up] projection (the reference's gateup GEMM +
    gated_silu_interleaved, activation.cuh:5-40 — ours concatenates on N
    instead of interleaving). ``norm``: see ``linear`` (x arrives un-normed;
    with split gate/up the fused norm recomputes per projection — identical
    numerics, negligible VPU cost)."""
    if "w_gateup" in p:
        gu = linear(p["w_gateup"], x, layer, norm=norm)
        half = gu.shape[-1] // 2
        gate, up = gu[..., :half], gu[..., half:]
    else:
        gate = linear(p["w_gate"], x, layer, norm=norm)
        up = linear(p["w_up"], x, layer, norm=norm)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return linear(p["w_down"], act, layer)
