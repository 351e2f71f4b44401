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
    rope_cos: jnp.ndarray,  # (T, D) pre-sliced at positions, or (S, D) table
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
    sp_axis: Optional[str] = None,  # sequence-parallel: this call runs
                    # inside shard_map with the KV cache sharded on S; the
                    # slab offset is axis_index * S_local, new rows write
                    # only into the owning slab, and the partial attention
                    # outputs LSE-combine across the axis (parallel/seq.py;
                    # no reference counterpart — the CUDA engine is
                    # single-GPU). Requires window == sink == 0, no tree
                    # mask, no sparse selection.
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

    # rope tables arrive pre-sliced (T, D): the gather is layer-invariant
    # and is hoisted out of the layer loop by every caller
    q, k = apply_rope(q, k, rope_cos, rope_sin)

    if sp_axis is not None:
        import jax

        assert tree_mask is None and window == 0 and sink == 0
        assert not sparse_select
        S_local = k_cache.shape[-2]
        off = (jax.lax.axis_index(sp_axis) * S_local).astype(jnp.int32)
        wa = jnp.asarray(cache_len if write_at is None else write_at,
                         jnp.int32)
        # masked write: only the slab(s) owning rows [wa, wa+T) take them
        rows = wa - off + jnp.arange(T, dtype=jnp.int32)
        rows = jnp.where((rows >= 0) & (rows < S_local), rows, S_local)
        k_cache = k_cache.at[:, rows].set(jnp.swapaxes(k, 0, 1), mode="drop")
        v_cache = v_cache.at[:, rows].set(jnp.swapaxes(v, 0, 1), mode="drop")
        # local partial attention (shift-invariant causality), then the
        # flash split-kv LSE combine across the axis
        out, lse = mha(
            q, k_cache, v_cache,
            jnp.asarray(cache_len, jnp.int32) - off,
            impl=attn_impl, return_lse=True,
        )
        m = jax.lax.pmax(lse, sp_axis)
        w = jnp.exp(lse - m)
        num = jax.lax.psum(out.astype(jnp.float32) * w[..., None], sp_axis)
        den = jax.lax.psum(w, sp_axis)
        out = (num / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)
        out = linear(p["wo"], out.reshape(T, cfg.num_heads * cfg.head_dim))
        return out, k_cache, v_cache

    k_cache, v_cache = append_layer(
        k_cache, v_cache, k, v, cache_len if write_at is None else write_at
    )

    if sparse_select:
        from ..ops.sparse import select_blocks, stage1_scores_auto
        from ..ops.sparse_flash import mha_sparse

        scores = stage1_scores_auto(
            q, c1, c2,
            c_len_of(cache_len, C1_STRIDE), c_len_of(cache_len, C2_STRIDE),
            use_lse=cfg.use_compress_lse,
        )
        if cfg.sparse_oracle_union:
            # best-case union bracket (core.config): tree/decode nodes
            # share the last node's selection; masks still per-query
            scores = jnp.broadcast_to(scores[:, -1:, :], scores.shape)
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


def attention_block_zerocopy(
    cfg: ModelConfig,
    p: dict,  # STACKED (L, ...) layer params; indexed by ``li`` in place
              # (the quant kernel reads them via its BlockSpec — slicing
              # stacked weights per layer copies them, ~12ms/token on 8B)
    x: jnp.ndarray,  # (T, H) already normed
    positions: jnp.ndarray,
    cache,  # full KVCache/SparseKVCache pytree (stacked, donated)
    li,  # layer index: static int (unrolled decode) or traced scan counter
         # (llama.forward unroll="scan" — the kernels take it via scalar
         # prefetch; sparse_select requires a static li)
    rope_cos, rope_sin,
    tree_mask=None,
    window: int = 0,
    sink: int = 0,
    attn_impl: str = "auto",
    sparse_select: bool = False,
    span: int = 0,  # static bucket bounding valid cache rows (engine
                    # kv_bucket); sizes the dense kernel's KV grid so big
                    # capacities cost no skipped grid steps
    norm=None,  # (attn_norm_weight, eps): x arrives UN-normed and the norm
                # fuses into the quant qkv kernel (layers.modules.linear)
):
    """Zero-copy decode attention: the history kernel reads the stacked
    cache in place (static ``layer`` BlockSpec index), the T new rows attend
    via an LSE-merged XLA block, and the caller scatters all layers' new
    rows into the cache once. Returns (out, k_new (T,KVH,D), v_new).

    This exists because funneling the cache through ``lax.scan`` (or
    slicing it per layer) moves span-sized cache bytes every step — at long
    context that dominates batch-1 decode."""
    import jax

    from ..ops.flash import merge_attn, new_block_attn

    T = x.shape[0]
    if "wqkv" in p:
        qkv = linear(p["wqkv"], x, li, norm=norm)
        q = qkv[:, : cfg.q_size].reshape(T, cfg.num_heads, cfg.head_dim)
        k = qkv[:, cfg.q_size : cfg.q_size + cfg.kv_size].reshape(
            T, cfg.num_kv_heads, cfg.head_dim
        )
        v = qkv[:, cfg.q_size + cfg.kv_size :].reshape(
            T, cfg.num_kv_heads, cfg.head_dim
        )
    else:
        q = linear(p["wq"], x, li, norm=norm).reshape(T, cfg.num_heads, cfg.head_dim)
        k = linear(p["wk"], x, li, norm=norm).reshape(T, cfg.num_kv_heads, cfg.head_dim)
        v = linear(p["wv"], x, li, norm=norm).reshape(T, cfg.num_kv_heads, cfg.head_dim)
    if cfg.use_qk_norm:
        q = rms_norm(q, p["q_norm"][li], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"][li], cfg.rms_norm_eps)
    q, k = apply_rope(q, k, rope_cos, rope_sin)  # pre-sliced (T, D)

    prior = cache.length
    use_kernel = (
        attn_impl in ("flash", "auto")
        and (attn_impl == "flash" or jax.default_backend() == "tpu")
    )
    dyn = not isinstance(li, int)

    if sparse_select:
        assert not dyn, "sparse_select needs a static layer index"
        from ..ops.sparse import select_blocks, stage1_scores_auto
        from ..ops.sparse_flash import BLOCK, sparse_flash_mha

        scores = stage1_scores_auto(
            q, cache.c1[li], cache.c2[li],
            c_len_of(prior, C1_STRIDE), c_len_of(prior, C2_STRIDE),
            use_lse=cfg.use_compress_lse,
        )
        if cfg.sparse_oracle_union:
            # best-case union bracket (core.config): every query selects
            # the last query's blocks; per-query causal/window masks still
            # apply downstream
            scores = jnp.broadcast_to(scores[:, -1:, :], scores.shape)
        topk_idx, topk_valid, _ = select_blocks(
            scores, positions, prior,
            topk=cfg.sparse_topk_k,
            init_blocks=cfg.sink_window_size,
            local_blocks=cfg.block_window_size,
        )
        d_ok = cfg.head_dim % 128 == 0 and cache.max_length % 512 == 0
        if use_kernel and (d_ok or jax.default_backend() != "tpu"):
            out_h, lse_h = sparse_flash_mha(
                q, cache.k, cache.v, prior, topk_idx, topk_valid, positions,
                include_new=False, local_blocks=cfg.block_window_size,
                return_lse=True, layer=li,
            )
        else:
            from ..ops.attention import mha_xla
            from ..ops.sparse import bits_from_topk, block_visibility

            nb = cache.max_length // BLOCK
            bits = bits_from_topk(topk_idx, topk_valid, nb)
            bm = block_visibility(bits, positions,
                                  local_blocks=cfg.block_window_size)
            tm0 = jnp.zeros((T, T), jnp.bool_)  # hide new rows: history only
            out_h, lse_h = mha_xla(
                q, cache.k[li], cache.v[li], prior, tm0, bm, return_lse=True
            )
            lse_h = lse_h.T  # (H, T) -> (T, H)
    else:
        if use_kernel:
            from ..ops.flash import flash_mha

            out_h, lse_h = flash_mha(
                q, cache.k, cache.v, prior,
                li if dyn else None,
                causal=False, window=window, sink=sink, return_lse=True,
                layer=None if dyn else li, span=span or None,
            )
        else:
            from ..ops.attention import mha_xla

            tm0 = jnp.zeros((T, T), jnp.bool_)
            out_h, lse_h = mha_xla(
                q, cache.k[li], cache.v[li], prior, tm0,
                window=window, sink=sink, return_lse=True,
            )
            lse_h = lse_h.T

    mask = tree_mask if tree_mask is not None else jnp.tril(
        jnp.ones((T, T), jnp.bool_)
    )
    out_n, lse_n = new_block_attn(q, k, v, mask)
    out = merge_attn(out_h, lse_h, out_n, lse_n)
    out = linear(p["wo"], out.reshape(T, cfg.num_heads * cfg.head_dim), li)
    return out, k, v
