"""Llama-family decoder (covers MiniCPM4 / Llama / Qwen2 / Qwen3 knobs).

The model is a pure function over a param pytree with layer weights stacked
on a leading L dim, executed with ``lax.scan`` so XLA traces one layer once
(fast compiles, constant code size in depth — the TPU-idiomatic counterpart
of the reference's per-layer C++ loop, src/model/model.cuh:150-159).

Param pytree::

    {
      "embed":      (V, H),
      "layers": {                      # every leaf stacked (L, ...)
        "attn_norm": (L, H),
        "wq": {"w": (L, H, Hq)[, "b"]}, "wk"/"wv": (L, H, Hkv)[, "b"],
        "wo": {"w": (L, Hq, H)},
        ["q_norm": (L, D), "k_norm": (L, D)]          # Qwen3
        "ffn_norm": (L, H),
        "w_gate"/"w_up": {"w": (L, H, I)}, "w_down": {"w": (L, I, H)},
      },
      "final_norm": (H,),
      "lm_head":    {"w": (H, V)},
    }

Quantized linears swap {"w"} for {"q","s"} packs (ops.quant).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cache.kv import KVCache
from ..core.config import ModelConfig
from ..layers.attention import attention_block
from ..layers.modules import embedding, gated_ffn, lm_head, rms_norm
from ..layers.rotary import rope_tables


def init_params(cfg: ModelConfig, key: jax.Array, scale: float = 0.02) -> dict:
    """Random params (tests/synthetic benchmarks)."""
    L, H, I, V = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    Hq, Hkv, D = cfg.q_size, cfg.kv_size, cfg.head_dim
    dt = cfg.jnp_dtype
    ks = iter(jax.random.split(key, 16))

    def w(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dt)

    layers = {
        "attn_norm": jnp.ones((L, H), dt),
        "ffn_norm": jnp.ones((L, H), dt),
        "wq": {"w": w(next(ks), (L, H, Hq))},
        "wk": {"w": w(next(ks), (L, H, Hkv))},
        "wv": {"w": w(next(ks), (L, H, Hkv))},
        "wo": {"w": w(next(ks), (L, Hq, H))},
        "w_gate": {"w": w(next(ks), (L, H, I))},
        "w_up": {"w": w(next(ks), (L, H, I))},
        "w_down": {"w": w(next(ks), (L, I, H))},
    }
    if cfg.use_attn_bias:
        for n in ("wq", "wk", "wv"):
            dim = Hq if n == "wq" else Hkv
            layers[n]["b"] = w(next(ks), (L, dim))
    if cfg.use_qk_norm:
        layers["q_norm"] = jnp.ones((L, D), dt)
        layers["k_norm"] = jnp.ones((L, D), dt)

    embed = w(next(ks), (V, H))
    return {
        "embed": embed,
        "layers": layers,
        "final_norm": jnp.ones((H,), dt),
        "lm_head": {"w": embed.T if cfg.tie_word_embeddings else w(next(ks), (H, V))},
    }


def fuse_projections(params: dict) -> dict:
    """Concatenate wq|wk|wv -> wqkv and w_gate|w_up -> w_gateup along N.

    The reference runs fused qkv and gate_up GEMMs (attn.cuh:36,
    ffn.cuh:24); on TPU the win is fewer kernel dispatches and wider
    N-blocks at decode. Only applied to unsharded params (a fused column
    dim would straddle TP shard boundaries); works for dense {'w'} and
    quantized {'q','s'} packs alike (both concatenate on the N axis).
    Biases concatenate the same way. Idempotent.
    """
    import copy

    def cat(parts, leaf):
        return jnp.concatenate([p[leaf] for p in parts], axis=-1)

    def fuse_group(layers, names, fused_name):
        parts = [layers[n] for n in names]
        kinds = [tuple(sorted(p.keys())) for p in parts]
        if len(set(kinds)) != 1:
            return  # mixed dense/quant: leave unfused
        fused = {}
        for leaf in parts[0]:
            fused[leaf] = cat(parts, leaf)
        layers[fused_name] = fused
        for n in names:
            del layers[n]

    out = dict(params)
    layers = dict(params["layers"])
    if "wq" in layers and "wqkv" not in layers:
        fuse_group(layers, ("wq", "wk", "wv"), "wqkv")
    if "w_gate" in layers and "w_gateup" not in layers:
        fuse_group(layers, ("w_gate", "w_up"), "w_gateup")
    out["layers"] = layers
    return out


def make_rope(cfg: ModelConfig, max_len: int):
    return rope_tables(cfg.rope, cfg.head_dim, max_len, seq_len=max_len)


def batch_layer_stack(cfg: ModelConfig, layers_params: dict, h: jax.Array,
                      rope_cos, rope_sin) -> jax.Array:
    """Apply a stack of decoder layers to (B, T, H) hidden states (cache-free
    causal attention). Shared by ``forward_batch`` and the pipeline-parallel
    stage (parallel/pipeline.py), which scans it over its LOCAL layer shard."""
    from ..layers.modules import linear
    from ..layers.rotary import apply_rope

    T = h.shape[1]
    positions = jnp.arange(T, dtype=jnp.int32)
    KVH, G, D = cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads, cfg.head_dim
    causal = jnp.tril(jnp.ones((T, T), jnp.bool_))

    def attn_one(p, x):  # x: (T, H) one batch element
        q = linear(p["wq"], x).reshape(T, cfg.num_heads, D)
        k = linear(p["wk"], x).reshape(T, KVH, D)
        v = linear(p["wv"], x).reshape(T, KVH, D)
        if cfg.use_qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
        q, k = apply_rope(q, k, rope_cos, rope_sin, positions)
        qf = q.reshape(T, KVH, G, D).astype(jnp.float32)
        scores = jnp.einsum("tkgd,skd->kgts", qf, k.astype(jnp.float32))
        scores = scores / jnp.sqrt(jnp.float32(D))
        scores = jnp.where(causal[None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("kgts,skd->tkgd", probs, v.astype(jnp.float32))
        return out.reshape(T, cfg.num_heads * D).astype(x.dtype)

    def body(hidden, p):
        normed = rms_norm(hidden, p["attn_norm"], cfg.rms_norm_eps)
        attn_out = jax.vmap(lambda x: attn_one(p, x))(normed)
        attn_out = jax.vmap(lambda a: linear(p["wo"], a))(attn_out)
        hidden = hidden + attn_out * jnp.asarray(cfg.scale_residual, hidden.dtype)
        normed = rms_norm(hidden, p["ffn_norm"], cfg.rms_norm_eps)
        ffn_out = gated_ffn(p, normed)
        hidden = hidden + ffn_out * jnp.asarray(cfg.scale_residual, hidden.dtype)
        return hidden, None

    h, _ = jax.lax.scan(body, h, layers_params)
    return h


def forward_batch(cfg: ModelConfig, params: dict, tokens: jax.Array) -> jax.Array:
    """Cache-free batched causal forward: (B, T) -> fp32 logits (B, T, V).

    Used for perplexity eval and the training step (the inference engine uses
    ``forward`` below). Same layer math as ``forward``; attention is plain
    causal over the batch.
    """
    B, T = tokens.shape
    rope_cos, rope_sin = rope_tables(cfg.rope, cfg.head_dim, T)
    h = embedding(params["embed"], tokens, cfg.scale_emb, cfg.jnp_dtype)
    h = batch_layer_stack(cfg, params["layers"], h, rope_cos, rope_sin)
    normed = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    logits = lm_head(params["lm_head"], normed, cfg.scale_lmhead,
                     n_out=cfg.vocab_size)
    return logits.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "logits_mode", "window", "sink", "attn_impl",
        "sparse_select", "return_hidden", "tap_layers", "kv_span", "unroll",
        "defer_kv_write", "sp_axis",
    ),
    donate_argnames=("cache",),
)
def forward(
    cfg: ModelConfig,
    params: dict,
    rope: Tuple[jax.Array, jax.Array],
    cache: KVCache,
    token_ids: jax.Array,  # (T,) int32
    positions: jax.Array,  # (T,) int32
    tree_mask: Optional[jax.Array] = None,  # (T, T) bool
    logits_idx: Optional[jax.Array] = None,  # scalar: only used for "index"
    *,
    logits_mode: str = "all",  # all | index | none
    window: int = 0,
    sink: int = 0,
    attn_impl: str = "auto",
    sparse_select: bool = False,  # engage InfLLM-v2 block selection (the
                                  # cache must be a SparseKVCache; the engine
                                  # flips this past cfg.sparse_switch like
                                  # the reference, minicpm4_attn.cuh:116,230)
    return_hidden: bool = False,  # also return post-final-norm hidden for
                                  # all T tokens (the EAGLE drafter input;
                                  # reference model.cuh:157 norms all tokens)
    tap_layers: Optional[Tuple[int, ...]] = None,  # EAGLE-3 feature taps:
                                  # collect these layers' FFN sublayer
                                  # outputs (model.cuh:50-52,186-194) and
                                  # return them concatenated (T, len*H)
    unroll: bool = False,  # layer-loop strategy:
                                  # False — lax.scan with the cache as scan
                                  #   xs/ys (moves span-sized cache bytes
                                  #   per step; short-context engines);
                                  # True — unrolled loop, zero cache-copy
                                  #   (static-layer kernels; bigger traces);
                                  # "scan" — lax.scan with DYN-LAYER kernels
                                  #   (scalar-prefetch layer index): zero
                                  #   cache/weight copies AND one trace for
                                  #   all layers. Built for the hier inner
                                  #   drafter, whose ~30 ops/layer x 24
                                  #   layers x ~5 forwards/round dominated
                                  #   the round (VERDICT r3 task 5). Quant
                                  #   packs only for the zero-copy property
                                  #   (dense weights fall back to a slice
                                  #   copy); no taps/sparse_select.
    defer_kv_write: bool = False,  # (unroll only) do NOT write the T new
                                  # rows into the cache; return them as an
                                  # extra (L, KVH, T, D) pair instead. Spec
                                  # verify writes the permuted ACCEPTED rows
                                  # once — the write-at-length + in-place
                                  # permute pattern forced a read-after-
                                  # write on the carry and XLA copied the
                                  # whole cache every fused spec round
                                  # (~3.5ms at 32K; round-2 profiling)
    sp_axis: Optional[str] = None,  # sequence-parallel shard_map axis: the
                                  # cache arrays are per-device S-slabs and
                                  # attention LSE-combines across the axis
                                  # (layers.attention sp path; scan layers
                                  # only — no unroll/sparse/tree/span)
    kv_span: Optional[int] = None,  # static attention-span bucket: only the
                                  # first kv_span cache rows flow through the
                                  # layer scan and kernels, so per-step cost
                                  # scales with the live context instead of
                                  # the allocated capacity (the engine picks
                                  # the bucket host-side — the analog of the
                                  # reference's 128-padded graph recapture,
                                  # entry.cu:540-562, at coarser buckets)
):
    """One forward pass of T tokens against the cache.

    New K/V rows are written at ``cache.length``; the returned cache has the
    same ``length`` (commit is the engine's job — mirrors the reference's
    temporary ``cache_length += n`` trick, llm.py:244-254).

    Returns (logits | hidden, new_cache, hidden_last).
    """
    import dataclasses

    if sp_axis is not None:
        assert not unroll and not sparse_select and not defer_kv_write
        assert tree_mask is None and kv_span is None and window == 0

    rope_cos, rope_sin = rope
    # hoist the layer-invariant rope table gather out of the layer loop
    # (done per layer it profiled at ~1ms/token on the 8B)
    rope_cos = rope_cos[positions]
    rope_sin = rope_sin[positions]
    h = embedding(params["embed"], token_ids, cfg.scale_emb, cfg.jnp_dtype)
    is_sparse = hasattr(cache, "c1")
    T = token_ids.shape[0]
    n_taps = len(tap_layers) if tap_layers else 0
    taps0 = jnp.zeros((max(n_taps, 1), T, cfg.hidden_size), cfg.jnp_dtype)

    def body(carry, xs):
        hidden, taps = carry
        if is_sparse:
            p, k_c, v_c, c1_c, c2_c, li = xs
        else:
            p, k_c, v_c, li = xs
            c1_c = c2_c = None
        normed = rms_norm(hidden, p["attn_norm"], cfg.rms_norm_eps)
        attn_out, k_c, v_c = attention_block(
            cfg, p, normed, positions, k_c, v_c, cache.length,
            rope_cos, rope_sin, tree_mask, window, sink, attn_impl,
            c1=c1_c, c2=c2_c, sparse_select=sparse_select, sp_axis=sp_axis,
        )
        hidden = hidden + attn_out * jnp.asarray(cfg.scale_residual, hidden.dtype)
        normed = rms_norm(hidden, p["ffn_norm"], cfg.rms_norm_eps)
        ffn_out = gated_ffn(p, normed)
        if tap_layers:
            # the reference taps the raw (unscaled) FFN sublayer output of
            # each save layer (layer.cuh output chaining; model.cuh:186-194)
            for t, idx in enumerate(tap_layers):
                taps = taps.at[t].set(
                    jnp.where(li == idx, ffn_out, taps[t])
                )
        hidden = hidden + ffn_out * jnp.asarray(cfg.scale_residual, hidden.dtype)
        return (hidden, taps), (k_c, v_c)

    idxs = jnp.arange(cfg.num_layers, dtype=jnp.int32)
    span = kv_span if kv_span and kv_span < cache.max_length else None

    if unroll == "scan":
        # scan-over-layers, zero-copy: the quant/flash kernels take the
        # scan counter via scalar prefetch and index the stacked donated
        # weight/cache buffers in place. The per-layer KV write is a tiny
        # (1, KVH, T, D) dynamic_update_slice on the scan-carried cache —
        # the classic jax decode pattern; XLA keeps the donated carry in
        # place (unlike the full-cache xs/ys stacking of the scan path
        # below, or the per-layer weight slice copies it would need).
        from ..layers.attention import attention_block_zerocopy

        assert not tap_layers and not sparse_select
        lp = params["layers"]
        scale_res = jnp.asarray(cfg.scale_residual, h.dtype)
        start = jnp.asarray(cache.length, jnp.int32)

        def scan_body(carry, li):
            hh, ck, cv = carry
            if is_sparse:
                cc = dataclasses.replace(cache, k=ck, v=cv)
            else:
                cc = KVCache(ck, cv, cache.length)
            attn_out, k_li, v_li = attention_block_zerocopy(
                cfg, lp, hh, positions, cc, li,
                rope_cos, rope_sin, tree_mask, window, sink, attn_impl,
                span=span or 0,
                norm=(lp["attn_norm"][li], cfg.rms_norm_eps),
            )
            hh = hh + attn_out * scale_res
            ffn_out = gated_ffn(
                lp, hh, layer=li, norm=(lp["ffn_norm"][li], cfg.rms_norm_eps)
            )
            hh = hh + ffn_out * scale_res
            if defer_kv_write:
                return (hh, ck, cv), (k_li, v_li)
            kl = jnp.swapaxes(k_li, 0, 1)[None]  # (1, KVH, T, D)
            vl = jnp.swapaxes(v_li, 0, 1)[None]
            ck = jax.lax.dynamic_update_slice(
                ck, kl.astype(ck.dtype), (li, 0, start, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, vl.astype(cv.dtype), (li, 0, start, 0))
            return (hh, ck, cv), None

        (h, new_k, new_v), ys = jax.lax.scan(
            scan_body, (h, cache.k, cache.v), idxs)
        taps = taps0
        if defer_kv_write:
            ks_y, vs_y = ys  # (L, T, KVH, D)
            kv_pending = (ks_y.transpose(0, 2, 1, 3),
                          vs_y.transpose(0, 2, 1, 3))
    elif unroll:
        # zero-copy decode: per-layer history kernels read the stacked
        # donated cache IN PLACE (static layer BlockSpec index); the T new
        # rows attend via an LSE-merged XLA block; all layers' new rows
        # scatter into the cache in one dynamic_update_slice at the end.
        # No span/capacity cache bytes move per step — the scan path stacks
        # the whole scanned cache through xs/ys. Costs ~L x trace size; the
        # engine picks this for decode-shaped calls on big caches.
        from ..layers.attention import attention_block_zerocopy

        taps = taps0
        ks_new, vs_new = [], []
        lp = params["layers"]  # stacked; the big tensors are read in place
        # by the layer-indexed kernels (slicing them per layer — tree.map
        # x[li] — copies every weight each step: 12ms/token on the 8B)
        for li in range(cfg.num_layers):
            # the pre-attention / pre-FFN RMSNorms fuse into the quant qkv /
            # gate-up kernels (un-normed h goes in; ops/quant norm fusion)
            attn_out, k_li, v_li = attention_block_zerocopy(
                cfg, lp, h, positions, cache, li,
                rope_cos, rope_sin, tree_mask, window, sink, attn_impl,
                sparse_select=sparse_select, span=span or 0,
                norm=(lp["attn_norm"][li], cfg.rms_norm_eps),
            )
            h = h + attn_out * jnp.asarray(cfg.scale_residual, h.dtype)
            ffn_out = gated_ffn(
                lp, h, layer=li, norm=(lp["ffn_norm"][li], cfg.rms_norm_eps)
            )
            if tap_layers and li in tap_layers:
                taps = taps.at[tap_layers.index(li)].set(ffn_out)
            h = h + ffn_out * jnp.asarray(cfg.scale_residual, h.dtype)
            ks_new.append(k_li)
            vs_new.append(v_li)
        if defer_kv_write:
            kv_pending = (
                jnp.stack([jnp.swapaxes(k, 0, 1) for k in ks_new]),
                jnp.stack([jnp.swapaxes(v, 0, 1) for v in vs_new]),
            )  # (L, KVH, T, D) small; caller writes post-verify
            new_k, new_v = cache.k, cache.v
        else:
            # per-layer in-place writes at length. NOT one stacked
            # dynamic_update_slice: the (L, KVH, T, D) stack+transpose
            # operand made XLA's layout assignment flip the WHOLE cache to
            # the stack's layout and back around the fused copy+DUS —
            # 4 x 1.7ms full-cache relayout copies per spec round at 32K
            # (round-2 profiler finding). 2L tiny DUS on the donated buffer
            # stay in place with no layout pressure.
            start = jnp.asarray(cache.length, jnp.int32)
            new_k, new_v = cache.k, cache.v
            for li in range(cfg.num_layers):
                k_li = jnp.swapaxes(ks_new[li], 0, 1)[None]  # (1, KVH, T, D)
                v_li = jnp.swapaxes(vs_new[li], 0, 1)[None]
                new_k = jax.lax.dynamic_update_slice(
                    new_k, k_li.astype(new_k.dtype), (li, 0, start, 0)
                )
                new_v = jax.lax.dynamic_update_slice(
                    new_v, v_li.astype(new_v.dtype), (li, 0, start, 0)
                )
    else:
        ck, cv = cache.k, cache.v
        if span is not None:
            ck = jax.lax.slice_in_dim(ck, 0, span, axis=2)
            cv = jax.lax.slice_in_dim(cv, 0, span, axis=2)
        if is_sparse:
            c1x, c2x = cache.c1, cache.c2
            if span is not None:
                c1x = jax.lax.slice_in_dim(c1x, 0, span // 16, axis=2)
                c2x = jax.lax.slice_in_dim(c2x, 0, span // 64, axis=2)
            xs = (params["layers"], ck, cv, c1x, c2x, idxs)
        else:
            xs = (params["layers"], ck, cv, idxs)
        (h, taps), (new_k, new_v) = jax.lax.scan(body, (h, taps0), xs)
        if span is not None:
            # splice the span back into the full-capacity cache (in-place
            # under donation; only span-sized bytes ever move per step)
            new_k = jax.lax.dynamic_update_slice(cache.k, new_k, (0, 0, 0, 0))
            new_v = jax.lax.dynamic_update_slice(cache.v, new_v, (0, 0, 0, 0))
    if is_sparse:
        new_cache = dataclasses.replace(cache, k=new_k, v=new_v)
    else:
        new_cache = KVCache(new_k, new_v, cache.length)

    # taps: (n, T, H) -> (T, n*H), concatenation order = tap_layers order
    # (the reference's multi_layer_concat, tools_ealge3.cuh:11-43)
    extras = ()
    if tap_layers:
        extras = (taps.transpose(1, 0, 2).reshape(T, n_taps * cfg.hidden_size),)
    if defer_kv_write:
        assert unroll, "defer_kv_write requires the unrolled layer path"
        extras = extras + (kv_pending,)

    if logits_mode == "none" and not return_hidden:
        return (h, new_cache) + extras

    fnorm = (params["final_norm"], cfg.rms_norm_eps)
    if return_hidden:
        normed_all = rms_norm(h, *fnorm)

    if logits_mode == "none":
        return (h, new_cache, normed_all) + extras
    if logits_mode == "index":
        idx = jnp.asarray(0 if logits_idx is None else logits_idx, jnp.int32)
        h_sel = jax.lax.dynamic_slice_in_dim(h, idx, 1, axis=0)
        # final norm (+ lm_head pre-scale) fuses into the quant lm_head kernel
        logits = lm_head(params["lm_head"], h_sel, cfg.scale_lmhead,
                         norm=fnorm, n_out=cfg.vocab_size)
    elif return_hidden:
        logits = lm_head(params["lm_head"], normed_all, cfg.scale_lmhead,
                         n_out=cfg.vocab_size)
    else:
        logits = lm_head(params["lm_head"], h, cfg.scale_lmhead,
                         norm=fnorm, n_out=cfg.vocab_size)
    if return_hidden:
        return (logits.astype(jnp.float32), new_cache, normed_all) + extras
    return (logits.astype(jnp.float32), new_cache) + extras
