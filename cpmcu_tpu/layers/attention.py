"""Attention block: qkv projections, qk-norm, RoPE, cache write, MHA, o-proj.

Reference parity: ``Attention<T>::prefill/decode`` (src/model/attn.cuh:58-280)
— fused qkv GEMM, optional per-head q/k RMSNorm (Qwen3) and qkv bias (Qwen2),
non-interleaved RoPE, scatter into the KV cache at ``cache_length``, flash
attention over the cache, output projection. The sparse variant mirrors
``MiniCPM4Attention`` (src/model/minicpm4/minicpm4_attn.cuh:97-322): stage-1
scoring over the compressed caches -> max-pool -> top-k block selection ->
block-masked attention.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..cache.kv import append_layer
from ..core.config import ModelConfig
from ..ops.attention import mha
from ..ops.sparse import C1_STRIDE, C2_STRIDE, c_len_of
from .modules import linear, rms_norm
from .rotary import apply_rope


def attention_block(
    cfg: ModelConfig,
    p: dict,  # this layer's params
    x: jnp.ndarray,  # (T, H) already normed
    positions: jnp.ndarray,  # (T,) int32 absolute positions (rope)
    k_cache: jnp.ndarray,  # (S, KVH, D) this layer
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,  # scalar: history length; new kv written here
    rope_cos: jnp.ndarray,
    rope_sin: jnp.ndarray,
    tree_mask: Optional[jnp.ndarray] = None,
    window: int = 0,
    sink: int = 0,
    attn_impl: str = "auto",
    write_at=None,  # KV write offset; defaults to cache_len (they differ in
                    # the EAGLE tree-expansion loop where frontier slots for
                    # depth d live at cache_len + topk*(d-1))
    c1: Optional[jnp.ndarray] = None,  # (KVH, S/16, D) compressed keys
    c2: Optional[jnp.ndarray] = None,  # (KVH, S/64, D)
    sparse_select: bool = False,  # static: engage InfLLM-v2 block selection
):
    T = x.shape[0]
    if "wqkv" in p:
        # fused qkv projection (reference fuses too, attn.cuh:36; halves the
        # decode-kernel dispatch count and widens the N blocks)
        qkv = linear(p["wqkv"], x)
        q = qkv[:, : cfg.q_size].reshape(T, cfg.num_heads, cfg.head_dim)
        k = qkv[:, cfg.q_size : cfg.q_size + cfg.kv_size].reshape(
            T, cfg.num_kv_heads, cfg.head_dim
        )
        v = qkv[:, cfg.q_size + cfg.kv_size :].reshape(
            T, cfg.num_kv_heads, cfg.head_dim
        )
    else:
        q = linear(p["wq"], x).reshape(T, cfg.num_heads, cfg.head_dim)
        k = linear(p["wk"], x).reshape(T, cfg.num_kv_heads, cfg.head_dim)
        v = linear(p["wv"], x).reshape(T, cfg.num_kv_heads, cfg.head_dim)

    if cfg.use_qk_norm:
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)

    q, k = apply_rope(q, k, rope_cos, rope_sin, positions)

    k_cache, v_cache = append_layer(
        k_cache, v_cache, k, v, cache_len if write_at is None else write_at
    )

    if sparse_select:
        from ..ops.sparse import select_blocks, stage1_scores
        from ..ops.sparse_flash import mha_sparse

        scores = stage1_scores(
            q, c1, c2,
            c_len_of(cache_len, C1_STRIDE), c_len_of(cache_len, C2_STRIDE),
            use_lse=cfg.use_compress_lse,
        )
        topk_idx, topk_valid, _ = select_blocks(
            scores, positions, cache_len,
            topk=cfg.sparse_topk_k,
            init_blocks=cfg.sink_window_size,
            local_blocks=cfg.block_window_size,
        )
        out = mha_sparse(
            q, k_cache, v_cache, cache_len, topk_idx, topk_valid, positions,
            tree_mask=tree_mask, local_blocks=cfg.block_window_size,
            impl=attn_impl,
        )
    else:
        out = mha(
            q, k_cache, v_cache, cache_len,
            tree_mask=tree_mask, window=window, sink=sink, impl=attn_impl,
        )
    out = linear(p["wo"], out.reshape(T, cfg.num_heads * cfg.head_dim))
    return out, k_cache, v_cache
