"""Continuous batching: multi-sequence KV cache, batched decode, scheduler.

No reference counterpart — CPM.cu is strictly batch-size-1 with a single
global model and serialized server requests (SURVEY.md §2.9, server.py:34).
This is the TPU-native scale-out layer from BASELINE config 5: a static
(B, L, KVH, S, D) KV arena (one slot per in-flight sequence), a jitted
batched decode step (all active slots advance together on the MXU), and a
continuous-batching scheduler that admits/evicts requests between steps.

Design notes (TPU-first):
  * all shapes static: B = max_batch slots, S = per-slot budget; slot
    admission/eviction never reallocates or recompiles;
  * per-slot ``lengths`` is a device vector; inactive slots run the same
    program with a zero attention span and a masked commit (lockstep SPMD
    beats host-side divergence);
  * prefill fills one slot at a time through the chunked single-sequence
    path (a new request's prefill is the reference's chunked prefill,
    llm.py:209-221), writing into the slot's cache lane;
  * under a (dp, tp) mesh the slot axis shards over dp and heads over tp —
    the batched arrays carry those shardings from creation;
  * with cfg.apply_sparse the arena is a BatchSparseKVCache: every slot
    runs InfLLM-v2 selection over its own compressed mirrors and attends
    through the slot-indexed block-sparse kernel
    (ops.sparse_flash.mha_sparse_slots); compression commits once per
    drained segment (cache.batch_sparse_kv).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cache.kv import KVCache
from ..core.config import EngineConfig, ModelConfig
from ..core.memory import solve_kv_budget
from ..models import llama
from ..ops.sampling import sample, sample_per_row
from .engine import chunk_width


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchKVCache:
    k: jax.Array  # (B, L, KVH, S, D)
    v: jax.Array  # (B, L, KVH, S, D)
    lengths: jax.Array  # (B,) int32 committed tokens per slot

    @property
    def num_slots(self) -> int:
        return self.k.shape[0]

    @property
    def max_length(self) -> int:
        return self.k.shape[3]

    @staticmethod
    def create(cfg: ModelConfig, num_slots: int, budget: int) -> "BatchKVCache":
        shape = (num_slots, cfg.num_layers, cfg.num_kv_heads, budget, cfg.head_dim)
        return BatchKVCache(
            k=jnp.zeros(shape, cfg.jnp_dtype),
            v=jnp.zeros(shape, cfg.jnp_dtype),
            lengths=jnp.zeros((num_slots,), jnp.int32),
        )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "temperature", "top_k", "top_p", "attn_impl"),
    donate_argnames=("bcache",),
)
def batch_decode_step(
    cfg: ModelConfig,
    params: dict,
    rope,
    bcache: BatchKVCache,
    tokens: jax.Array,  # (B,) int32 last token per slot
    active: jax.Array,  # (B,) bool
    key: jax.Array,
    sampling=None,  # optional traced (temps (B,), top_ks (B,), top_ps (B,)):
    # per-slot sampling params so requests with different temperatures batch
    # together (ops.sampling.sample_per_row); None = engine-global statics
    *,
    temperature: float,
    top_k: int,
    top_p: float,
    attn_impl: str,
):
    """One lockstep decode step across all slots.

    Returns (bcache, next_tokens (B,), key). Inactive slots compute too
    (static shapes; their commit is masked) — the SPMD analog of running a
    partially-filled batch.

    The whole batch runs as ONE forward with M=B rows: weights stream from
    HBM once per step regardless of B (the old per-slot vmap of the
    single-sequence forward re-paid weight traffic per slot and measured
    79.8 aggregate tok/s at B=8 vs 135 single-stream). Attention reads
    each slot's cache lane in place via the slot/layer-indexed kernel
    (ops.flash.flash_mha_slots); the self token is merged by LSE.
    """
    import math

    from ..layers.modules import (
        embedding, gated_ffn, linear, lm_head, rms_norm,
    )
    from ..layers.rotary import apply_rope
    from ..ops.flash import flash_mha_slots, merge_attn

    B = tokens.shape[0]
    keys = jax.random.split(key, 2)
    rope_cos, rope_sin = rope
    pos = bcache.lengths
    rc = rope_cos[pos]
    rs = rope_sin[pos]
    h = embedding(params["embed"], tokens, cfg.scale_emb, cfg.jnp_dtype)
    lp = params["layers"]
    KVH, G, D = cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads, cfg.head_dim
    scale = 1.0 / math.sqrt(D)
    res = jnp.asarray(cfg.scale_residual, h.dtype)
    ks_new, vs_new = [], []

    for li in range(cfg.num_layers):
        # norms fuse into the quant decode kernels (layers.modules.linear)
        nrm = (lp["attn_norm"][li], cfg.rms_norm_eps)
        if "wqkv" in lp:
            qkv = linear(lp["wqkv"], h, li, norm=nrm)
            q = qkv[:, : cfg.q_size].reshape(B, cfg.num_heads, D)
            k = qkv[:, cfg.q_size : cfg.q_size + cfg.kv_size].reshape(B, KVH, D)
            v = qkv[:, cfg.q_size + cfg.kv_size :].reshape(B, KVH, D)
        else:
            q = linear(lp["wq"], h, li, norm=nrm).reshape(B, cfg.num_heads, D)
            k = linear(lp["wk"], h, li, norm=nrm).reshape(B, KVH, D)
            v = linear(lp["wv"], h, li, norm=nrm).reshape(B, KVH, D)
        if cfg.use_qk_norm:
            q = rms_norm(q, lp["q_norm"][li], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"][li], cfg.rms_norm_eps)
        q, k = apply_rope(q, k, rc, rs)

        if cfg.apply_sparse:
            # per-slot InfLLM-v2 selection (stage-1 + top-k are ~free at
            # decode shapes) + slot-indexed block-sparse kernel; history
            # only, self token merged below exactly like the dense path.
            # Unlike the single engine (host-gated sparse_engaged), slots
            # run selection unconditionally: below the engagement horizon
            # the forced sink + local window covers every feasible block
            # (horizon (topk+local+sink)*64 tokens >> the switch), so
            # short slots still compute exact dense attention.
            from ..ops.sparse import (
                C1_STRIDE, C2_STRIDE, c_len_of, select_blocks, stage1_scores,
            )
            from ..ops.sparse_flash import mha_sparse_slots

            def sel(qb, c1b, c2b, lb):
                sc = stage1_scores(
                    qb[None], c1b, c2b,
                    c_len_of(lb, C1_STRIDE), c_len_of(lb, C2_STRIDE),
                    use_lse=cfg.use_compress_lse,
                )
                idx, valid, _ = select_blocks(
                    sc, lb[None], lb, topk=cfg.sparse_topk_k,
                    init_blocks=cfg.sink_window_size,
                    local_blocks=cfg.block_window_size,
                )
                return idx, valid

            tki, tkv = jax.vmap(sel)(
                q, bcache.c1[:, li], bcache.c2[:, li], bcache.lengths
            )
            out_h, lse_h = mha_sparse_slots(
                q, bcache.k, bcache.v, pos, tki, tkv, layer=li,
                local_blocks=cfg.block_window_size, impl=attn_impl,
            )
        else:
            out_h, lse_h = flash_mha_slots(
                q, bcache.k, bcache.v, pos, layer=li, scale=scale
            )
        # self-token merge: one key => lse = score
        kb = jnp.repeat(k, G, axis=1)  # (B, H, D)
        vb = jnp.repeat(v, G, axis=1)
        s_self = jnp.sum(
            q.astype(jnp.float32) * kb.astype(jnp.float32), axis=-1
        ) * scale  # (B, H)
        out = merge_attn(out_h, lse_h, vb.astype(out_h.dtype), s_self)

        attn = linear(lp["wo"], out.reshape(B, cfg.q_size), li)
        h = h + attn * res
        h = h + gated_ffn(lp, h, layer=li,
                          norm=(lp["ffn_norm"][li], cfg.rms_norm_eps)) * res
        ks_new.append(k)
        vs_new.append(v)

    # one batched scatter of all layers' new rows at each slot's length
    k_stack = jnp.stack(ks_new).transpose(1, 0, 2, 3)  # (B, L, KVH, D)
    v_stack = jnp.stack(vs_new).transpose(1, 0, 2, 3)

    def write_slot(kslot, vslot, kn, vn, p):
        kn = kn[:, :, None, :].astype(kslot.dtype)  # (L, KVH, 1, D)
        vn = vn[:, :, None, :].astype(vslot.dtype)
        return (
            jax.lax.dynamic_update_slice(kslot, kn, (0, 0, p, 0)),
            jax.lax.dynamic_update_slice(vslot, vn, (0, 0, p, 0)),
        )

    new_k, new_v = jax.vmap(write_slot)(
        bcache.k, bcache.v, k_stack, v_stack, pos
    )

    # final norm + pre-scale fuse into the quant lm_head kernel (M=B rows)
    logits = lm_head(params["lm_head"], h, cfg.scale_lmhead,
                     norm=(params["final_norm"], cfg.rms_norm_eps),
                     n_out=cfg.vocab_size).astype(jnp.float32)
    if sampling is None:
        nxt = sample(logits, keys[1], temperature=temperature,
                     top_k=top_k, top_p=top_p)
    else:
        nxt = sample_per_row(logits, keys[1], *sampling)
    new_lengths = jnp.where(active, bcache.lengths + 1, bcache.lengths)
    return (
        dataclasses.replace(bcache, k=new_k, v=new_v, lengths=new_lengths),
        nxt, keys[0],
    )


def batch_forward_tokens(
    cfg: ModelConfig,
    params: dict,
    rope,
    bcache,  # BatchKVCache (dense arena)
    tokens: jax.Array,  # (B, T) int32 — T lockstep tokens per slot
    *,
    attn_impl: str,
    positions: Optional[jax.Array] = None,  # (B, T) rope/absolute positions
    # (default lengths+arange — tree decode passes per-slot depth positions)
    tree_mask: Optional[jax.Array] = None,  # (B, T, T) per-slot visibility
    # among the T new rows (default: causal, shared across slots)
    return_hidden: bool = False,  # also return the post-final-norm hidden
    # (B, T, H) — the EAGLE drafter input rows
):
    """T-token lockstep forward over slot lanes (the multi-token analog of
    batch_decode_step's body, used by batched chain speculation): each
    slot's T rows sit at [len_b, len_b+T), attend its full history plus a
    causal intra-chunk block (LSE-merged like ops.flash.mha_flash), and
    are written to the slot's lane. Returns (new_k, new_v,
    logits (B, T, V) fp32) — lengths are NOT advanced; the caller commits
    per-slot (catch-up commits num_prev, verify commits accept_len).

    All matmuls run at M = B*T rows (weights stream from HBM once per
    call); the history attention reuses the slot-indexed flash kernel by
    folding the T tokens into the per-KV-group query rows (every chunk
    token sees the same [0, len_b) span — intra-chunk causality lives in
    the merged XLA block)."""
    import math

    from ..layers.modules import (
        embedding, gated_ffn, linear, lm_head, rms_norm,
    )
    from ..layers.rotary import apply_rope
    from ..ops.flash import flash_mha_slots, merge_attn

    B, T = tokens.shape
    rope_cos, rope_sin = rope
    KVH, G, D = cfg.num_kv_heads, cfg.num_heads // cfg.num_kv_heads, cfg.head_dim
    H = cfg.num_heads
    scale = 1.0 / math.sqrt(D)
    if positions is None:
        pos = bcache.lengths[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
    else:
        pos = jnp.asarray(positions, jnp.int32)
    rc = rope_cos[pos].reshape(B * T, -1)
    rs = rope_sin[pos].reshape(B * T, -1)
    h = embedding(
        params["embed"], tokens.reshape(-1), cfg.scale_emb, cfg.jnp_dtype
    )  # (B*T, Hid)
    lp = params["layers"]
    res = jnp.asarray(cfg.scale_residual, h.dtype)
    causal = jnp.tril(jnp.ones((T, T), jnp.bool_))
    ks_new, vs_new = [], []

    for li in range(cfg.num_layers):
        nrm = (lp["attn_norm"][li], cfg.rms_norm_eps)
        if "wqkv" in lp:
            qkv = linear(lp["wqkv"], h, li, norm=nrm)
            q = qkv[:, : cfg.q_size].reshape(B * T, H, D)
            k = qkv[:, cfg.q_size : cfg.q_size + cfg.kv_size].reshape(B * T, KVH, D)
            v = qkv[:, cfg.q_size + cfg.kv_size :].reshape(B * T, KVH, D)
        else:
            q = linear(lp["wq"], h, li, norm=nrm).reshape(B * T, H, D)
            k = linear(lp["wk"], h, li, norm=nrm).reshape(B * T, KVH, D)
            v = linear(lp["wv"], h, li, norm=nrm).reshape(B * T, KVH, D)
        if cfg.use_qk_norm:
            q = rms_norm(q, lp["q_norm"][li], cfg.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"][li], cfg.rms_norm_eps)
        q, k = apply_rope(q, k, rc, rs)
        qb = q.reshape(B, T, H, D)
        kb = k.reshape(B, T, KVH, D)
        vb = v.reshape(B, T, KVH, D)

        if cfg.apply_sparse:
            # per-slot, per-token InfLLM-v2 selection over the committed
            # compressed mirrors + the T-token sparse slots kernel
            from ..ops.sparse import (
                C1_STRIDE, C2_STRIDE, c_len_of, select_blocks, stage1_scores,
            )
            from ..ops.sparse_flash import mha_sparse_slots

            def sel(qs, c1b, c2b, lb, pb):
                sc = stage1_scores(
                    qs, c1b, c2b,
                    c_len_of(lb, C1_STRIDE), c_len_of(lb, C2_STRIDE),
                    use_lse=cfg.use_compress_lse,
                )
                if cfg.sparse_oracle_union:
                    sc = jnp.broadcast_to(sc[:, -1:, :], sc.shape)
                idx, vld, _ = select_blocks(
                    sc, pb, lb, topk=cfg.sparse_topk_k,
                    init_blocks=cfg.sink_window_size,
                    local_blocks=cfg.block_window_size,
                )
                return idx, vld

            tki, tkv = jax.vmap(sel)(
                qb, bcache.c1[:, li], bcache.c2[:, li], bcache.lengths, pos
            )
            out_h, lse_h = mha_sparse_slots(
                qb, bcache.k, bcache.v, bcache.lengths, tki, tkv, pos,
                layer=li, local_blocks=cfg.block_window_size,
                impl=attn_impl,
            )
        else:
            # history: fold T tokens into the query rows of the slots
            # kernel (row order (KVH, T, G) keeps groups per-kv-head)
            q_fold = (
                qb.reshape(B, T, KVH, G, D)
                .transpose(0, 2, 1, 3, 4)
                .reshape(B, KVH * T * G, D)
            )
            if attn_impl in ("flash", "auto") and (
                attn_impl == "flash" or jax.default_backend() == "tpu"
            ):
                out_h, lse_h = flash_mha_slots(
                    q_fold, bcache.k, bcache.v, bcache.lengths, layer=li,
                    scale=scale,
                )
            else:
                from ..ops.attention import mha_xla

                # per-slot: all H' folded rows act as one-token queries
                # over the slot's history (all-False mask hides new rows)
                def hist(qs, ks, vs, lb):
                    o, l = mha_xla(
                        qs[None], ks[li], vs[li], lb,
                        jnp.zeros((1, 1), jnp.bool_), None, return_lse=True,
                    )
                    return o[0], l[:, 0]

                out_h, lse_h = jax.vmap(hist)(
                    q_fold, bcache.k, bcache.v, bcache.lengths
                )
            # unfold back to (B, T, H, ...)
            out_h = (
                out_h.reshape(B, KVH, T, G, D).transpose(0, 2, 1, 3, 4)
                .reshape(B, T, H, D)
            )
            lse_h = (
                lse_h.reshape(B, KVH, T, G).transpose(0, 2, 1, 3)
                .reshape(B, T, H)
            )

        # intra-chunk masked block (tiny: T x T per slot), fp32 + LSE
        qf = qb.reshape(B, T, KVH, G, D).astype(jnp.float32)
        kf = kb.astype(jnp.float32)
        sc = jnp.einsum("btkgd,bskd->bkgts", qf, kf) * scale
        if tree_mask is None:
            sc = jnp.where(causal[None, None, None], sc, float("-inf"))
        else:
            sc = jnp.where(tree_mask[:, None, None], sc, float("-inf"))
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.exp(sc - m)
        den = jnp.sum(e, axis=-1, keepdims=True)
        out_c = jnp.einsum(
            "bkgts,bskd->btkgd", e / den, vb.astype(jnp.float32)
        ).reshape(B, T, H, D)
        lse_c = (
            (m + jnp.log(den)).squeeze(-1).transpose(0, 3, 1, 2)
            .reshape(B, T, H)
        )
        out = merge_attn(
            out_h.astype(jnp.float32), lse_h, out_c, lse_c
        ).astype(h.dtype)

        attn = linear(lp["wo"], out.reshape(B * T, cfg.q_size), li)
        h = h + attn * res
        h = h + gated_ffn(lp, h, layer=li,
                          norm=(lp["ffn_norm"][li], cfg.rms_norm_eps)) * res
        ks_new.append(kb)
        vs_new.append(vb)

    # one batched scatter: (B, L, KVH, T, D) rows at each slot's length
    k_stack = jnp.stack(ks_new, axis=1).transpose(0, 1, 3, 2, 4)
    v_stack = jnp.stack(vs_new, axis=1).transpose(0, 1, 3, 2, 4)

    def write_slot(kslot, vslot, kn, vn, p):
        return (
            jax.lax.dynamic_update_slice(
                kslot, kn.astype(kslot.dtype), (0, 0, p, 0)),
            jax.lax.dynamic_update_slice(
                vslot, vn.astype(vslot.dtype), (0, 0, p, 0)),
        )

    new_k, new_v = jax.vmap(write_slot)(
        bcache.k, bcache.v, k_stack, v_stack, bcache.lengths
    )
    logits = lm_head(
        params["lm_head"], h, cfg.scale_lmhead,
        norm=(params["final_norm"], cfg.rms_norm_eps),
        n_out=cfg.vocab_size,
    ).astype(jnp.float32).reshape(B, T, -1)
    if return_hidden:
        normed = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
        return new_k, new_v, logits, normed.reshape(B, T, -1)
    return new_k, new_v, logits


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "temperature", "top_k", "top_p", "attn_impl"),
    donate_argnames=("bcache",),
)
def batch_decode_segment(
    cfg: ModelConfig,
    params: dict,
    rope,
    bcache: BatchKVCache,
    tokens: jax.Array,  # (B,)
    active: jax.Array,  # (B,)
    key: jax.Array,
    sampling=None,  # see batch_decode_step
    *,
    k: int,
    temperature: float,
    top_k: int,
    top_p: float,
    attn_impl: str,
):
    """K lockstep decode steps in one device program (the batched analog of
    engine.decode_segment): one host sync per K*B tokens instead of per
    step — on a tunneled device the readback dominates otherwise.
    Returns (bcache, tokens (k, B), key)."""

    def body(carry, _):
        bcache, toks, key = carry
        bcache, nxt, key = batch_decode_step(
            cfg, params, rope, bcache, toks, active, key, sampling,
            temperature=temperature, top_k=top_k, top_p=top_p,
            attn_impl=attn_impl,
        )
        return (bcache, nxt, key), nxt

    (bcache, _, key), out = jax.lax.scan(
        body, (bcache, tokens, key), None, length=k
    )
    return bcache, out, key


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl"),
    donate_argnames=("bcache",),
)
def prefill_slot_chunk(
    cfg: ModelConfig,
    params: dict,
    rope,
    bcache: BatchKVCache,
    slot: jax.Array,  # int32 scalar
    chunk_tokens: jax.Array,  # (C,) int32, zero-padded
    positions: jax.Array,  # (C,)
    n_valid: jax.Array,  # int32
    *,
    attn_impl: str,
):
    """One prefill chunk into one slot's cache lane. Returns
    (bcache, last-token logits (V,))."""
    k_slot = jnp.squeeze(
        jax.lax.dynamic_slice_in_dim(bcache.k, slot, 1, axis=0), 0
    )
    v_slot = jnp.squeeze(
        jax.lax.dynamic_slice_in_dim(bcache.v, slot, 1, axis=0), 0
    )
    length = bcache.lengths[slot]
    cache = KVCache(k_slot, v_slot, length)
    logits, cache = llama.forward(
        cfg, params, rope, cache, chunk_tokens, positions,
        logits_idx=n_valid - 1, logits_mode="index", attn_impl=attn_impl,
    )
    new_k = jax.lax.dynamic_update_slice_in_dim(
        bcache.k, cache.k[None], slot, axis=0
    )
    new_v = jax.lax.dynamic_update_slice_in_dim(
        bcache.v, cache.v[None], slot, axis=0
    )
    new_lengths = bcache.lengths.at[slot].add(n_valid)
    return BatchKVCache(new_k, new_v, new_lengths), logits[0]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "attn_impl", "sparse_select"),
    donate_argnames=("bcache",),
)
def prefill_slot_chunk_sparse(
    cfg: ModelConfig,
    params: dict,
    rope,
    bcache,  # BatchSparseKVCache
    slot: jax.Array,  # int32 scalar
    chunk_tokens: jax.Array,  # (C,) int32, zero-padded
    positions: jax.Array,  # (C,)
    n_valid: jax.Array,  # int32
    *,
    attn_impl: str,
    sparse_select: bool,  # host-decided per chunk (Engine.sparse_engaged)
):
    """Sparse analog of prefill_slot_chunk: run the chunk through the
    single-sequence sparse forward on the slot's lane view, commit its
    compressed mirrors (cache.sparse_kv.commit), and write the lanes
    back. Returns (bcache, last-token logits (V,))."""
    from ..cache.sparse_kv import SparseKVCache, commit

    def lane(a):
        return jnp.squeeze(jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=0), 0)

    cache = SparseKVCache(
        lane(bcache.k), lane(bcache.v), lane(bcache.c1), lane(bcache.c2),
        bcache.lengths[slot],
    )
    logits, cache = llama.forward(
        cfg, params, rope, cache, chunk_tokens, positions,
        logits_idx=n_valid - 1, logits_mode="index", attn_impl=attn_impl,
        sparse_select=sparse_select,
    )
    cache = commit(cache, n_valid, max_new=chunk_tokens.shape[0])

    def put(a, x):
        return jax.lax.dynamic_update_slice_in_dim(a, x[None], slot, axis=0)

    new = dataclasses.replace(
        bcache,
        k=put(bcache.k, cache.k), v=put(bcache.v, cache.v),
        c1=put(bcache.c1, cache.c1), c2=put(bcache.c2, cache.c2),
        lengths=bcache.lengths.at[slot].add(n_valid),
    )
    return new, logits[0]


# ---------------------------------------------------------------------------
# scheduler
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Request:
    request_id: int
    prompt_ids: List[int]
    max_new_tokens: int = 256
    terminators: Tuple[int, ...] = ()
    # per-request sampling (None = engine defaults; serve layer maps the
    # OpenAI temperature/top_p fields here)
    temperature: Optional[float] = None
    top_k: Optional[int] = None
    top_p: Optional[float] = None
    # filled by the scheduler
    slot: int = -1
    emitted: int = 0
    done: bool = False
    submit_time: float = 0.0
    first_token_time: float = 0.0


@dataclasses.dataclass
class StepEvent:
    request_id: int
    token: int
    finished: bool


class ContinuousBatchingEngine:
    """Iteration-level scheduler over the batched decode step.

    ``submit()`` enqueues requests; each ``step()`` admits waiting requests
    into free slots (running their chunked prefill), advances all active
    slots by one token, and retires finished sequences — the vLLM-style
    loop the reference lacks entirely.
    """

    def __init__(
        self,
        cfg: ModelConfig,
        eng: EngineConfig = EngineConfig(),
        params: Optional[dict] = None,
        *,
        max_batch: int = 8,
        attn_impl: str = "auto",
        mesh=None,  # (dp, tp) mesh: slots over dp, heads over tp
    ):
        self.cfg = cfg
        self.eng = eng
        self.params = params
        self.attn_impl = attn_impl
        self.max_batch = max_batch
        total = solve_kv_budget(cfg, eng)
        if cfg.apply_sparse:
            # 512-aligned slots (compressed-mirror strides + kernel tiling)
            from ..cache.batch_sparse_kv import BatchSparseKVCache

            self.slot_budget = max(512, (total // max_batch) // 512 * 512)
            self.bcache = BatchSparseKVCache.create(
                cfg, max_batch, self.slot_budget
            )
        else:
            self.slot_budget = max(128, (total // max_batch) // 128 * 128)
            self.bcache = BatchKVCache.create(cfg, max_batch, self.slot_budget)
        self.rope = llama.make_rope(cfg, self.slot_budget)
        if mesh is not None:
            from ..parallel.pspecs import shard_cache, shard_params

            if params is not None:
                self.params = shard_params(params, cfg, mesh)
            self.bcache = shard_cache(self.bcache, mesh)
        self.key = jax.random.PRNGKey(eng.random_seed)

        self.waiting: deque[Request] = deque()
        self.active: Dict[int, Request] = {}  # slot -> request
        self.free_slots = list(range(max_batch))
        self._next_id = 0
        self._tokens = np.zeros((max_batch,), np.int32)  # last token per slot
        self._host_lengths = np.zeros((max_batch,), np.int32)  # length mirror
        # sparse: per-slot compressed-mirror high-water mark (compression
        # runs once per drained segment, cache.batch_sparse_kv discipline)
        self._compressed_lengths = np.zeros((max_batch,), np.int32)
        self._requests: Dict[int, Request] = {}  # all submitted, by id
        # prefix cache (eng.prefix_cache): per-slot prompt whose KV rows
        # [0, n) are still valid from the slot's previous request
        self._slot_tokens: Dict[int, np.ndarray] = {}
        self._last_admit_cached = 0  # observability: rows reused

    # -- API -----------------------------------------------------------------

    def submit(self, prompt_ids: Sequence[int], max_new_tokens: int = 256,
               terminators: Sequence[int] = (), temperature: Optional[float] = None,
               top_k: Optional[int] = None, top_p: Optional[float] = None) -> int:
        rid = self._next_id
        self._next_id += 1
        if len(prompt_ids) + max_new_tokens > self.slot_budget:
            raise ValueError(
                f"request needs {len(prompt_ids) + max_new_tokens} tokens; "
                f"slot budget is {self.slot_budget}"
            )
        req = Request(
            request_id=rid,
            prompt_ids=list(prompt_ids),
            max_new_tokens=max_new_tokens,
            terminators=tuple(terminators),
            temperature=temperature,
            top_k=top_k,
            top_p=top_p,
            submit_time=time.time(),
        )
        self.waiting.append(req)
        self._requests[rid] = req
        return rid

    @property
    def has_work(self) -> bool:
        return bool(self.waiting or self.active)

    def cancel(self, request_id: int) -> None:
        """Retire a request early (client disconnect or a server-side
        ``stop``-string match). Waiting requests are dropped; an active
        slot is freed and its KV rows are overwritten by the next
        admission. Call between steps (under the serving lock) — not
        while a pipelined segment is in flight for the slot."""
        self.waiting = deque(
            r for r in self.waiting if r.request_id != request_id
        )
        for slot, req in list(self.active.items()):
            if req.request_id == request_id:
                req.done = True
                del self.active[slot]
                self.free_slots.append(slot)

    def _req_sampling(self, req: Request):
        return (
            self.eng.temperature if req.temperature is None else req.temperature,
            self.eng.top_k if req.top_k is None else req.top_k,
            self.eng.top_p if req.top_p is None else req.top_p,
        )

    def _sampling_arrays(self):
        """Per-slot (temps, top_ks, top_ps) device vectors, or None when
        every active request uses the engine defaults — the None fast path
        keeps all-greedy batches free of the (B, V) sampling sort."""
        if not any(
            r.temperature is not None or r.top_k is not None
            or r.top_p is not None
            for r in self.active.values()
        ):
            return None
        temps = np.full((self.max_batch,), self.eng.temperature, np.float32)
        tks = np.full((self.max_batch,), self.eng.top_k, np.int32)
        tps = np.full((self.max_batch,), self.eng.top_p, np.float32)
        for slot, r in self.active.items():
            temps[slot], tks[slot], tps[slot] = self._req_sampling(r)
        return (jnp.asarray(temps), jnp.asarray(tks), jnp.asarray(tps))

    def step(self) -> List[StepEvent]:
        """Admit + decode one token for every active slot."""
        events: List[StepEvent] = []
        self._compress_uncommitted()
        self._admit(events)
        if not self.active:
            return events

        active_mask = np.zeros((self.max_batch,), bool)
        for slot in self.active:
            active_mask[slot] = True
        self.bcache, nxt, self.key = batch_decode_step(
            self.cfg, self.params, self.rope, self.bcache,
            jnp.asarray(self._tokens), jnp.asarray(active_mask), self.key,
            self._sampling_arrays(),
            temperature=self.eng.temperature, top_k=self.eng.top_k,
            top_p=self.eng.top_p, attn_impl=self.attn_impl,
        )
        nxt = np.asarray(nxt)
        self._host_lengths[active_mask] += 1

        finished_slots = []
        for slot, req in self.active.items():
            tok = int(nxt[slot])
            self._tokens[slot] = tok
            req.emitted += 1
            done = (
                tok in req.terminators or req.emitted >= req.max_new_tokens
            )
            events.append(StepEvent(req.request_id, tok, done))
            if done:
                req.done = True
                finished_slots.append(slot)
        for slot in finished_slots:
            del self.active[slot]
            self.free_slots.append(slot)
        return events

    def step_segment(self, k: int) -> List[StepEvent]:
        """Advance all active slots by up to ``k`` tokens with a single
        host sync. Tokens decoded past a slot's terminator/limit are
        discarded and its cache length rolled back (the overshoot is the
        price of batching the readback; admission happens between
        segments)."""
        events: List[StepEvent] = []
        self._compress_uncommitted()
        self._admit(events)
        if not self.active or k <= 1:
            return events + (self.step() if self.active and k == 1 else [])

        active_mask = np.zeros((self.max_batch,), bool)
        for slot in self.active:
            active_mask[slot] = True
        len0 = self._host_lengths.copy()  # host mirror: a device fetch of
        # lengths here costs a full tunnel round trip per segment
        self.bcache, toks, self.key = batch_decode_segment(
            self.cfg, self.params, self.rope, self.bcache,
            jnp.asarray(self._tokens), jnp.asarray(active_mask), self.key,
            self._sampling_arrays(),
            k=k, temperature=self.eng.temperature, top_k=self.eng.top_k,
            top_p=self.eng.top_p, attn_impl=self.attn_impl,
        )
        toks = np.asarray(toks)  # (k, B) — the one sync

        new_lengths = self._host_lengths.copy()
        new_lengths[active_mask] = len0[active_mask] + k
        finished_slots = []
        for slot, req in self.active.items():
            kept = 0
            for j in range(k):
                tok = int(toks[j, slot])
                self._tokens[slot] = tok
                req.emitted += 1
                kept = j + 1
                done = (tok in req.terminators
                        or req.emitted >= req.max_new_tokens)
                events.append(StepEvent(req.request_id, tok, done))
                if done:
                    req.done = True
                    finished_slots.append(slot)
                    break
            # roll back overshoot: only ``kept`` tokens were committed
            new_lengths[slot] = len0[slot] + kept
        self._host_lengths = new_lengths
        self.bcache = dataclasses.replace(
            self.bcache, lengths=jnp.asarray(new_lengths)
        )
        for slot in finished_slots:
            del self.active[slot]
            self.free_slots.append(slot)
        return events

    def _dispatch_segment(self, k: int, tokens_dev=None):
        """Dispatch one k-step segment WITHOUT fetching its tokens.

        ``tokens_dev`` chains the previous (still unfetched) segment's last
        tokens on device, letting the host dispatch segment N+1 before
        reading segment N — the tunnel readback RTT then overlaps segment
        N+1's device execution (same pattern as spec_engine's pipelined
        rounds). Returns an opaque handle for ``_process_segment``."""
        active_mask = np.zeros((self.max_batch,), bool)
        for slot in self.active:
            active_mask[slot] = True
        toks_in = jnp.asarray(self._tokens) if tokens_dev is None else tokens_dev
        self.bcache, toks, self.key = batch_decode_segment(
            self.cfg, self.params, self.rope, self.bcache,
            toks_in, jnp.asarray(active_mask), self.key,
            self._sampling_arrays(),
            k=k, temperature=self.eng.temperature, top_k=self.eng.top_k,
            top_p=self.eng.top_p, attn_impl=self.attn_impl,
        )
        return {"toks": toks, "slots": dict(self.active), "k": k}

    def _process_segment(self, handle, events: List[StepEvent]):
        """Fetch a dispatched segment (the one host sync) and commit its
        kept tokens. ``self._host_lengths`` holds each slot's committed
        length at this segment's start (processing happens in dispatch
        order), so no length snapshot is needed at dispatch time."""
        toks = np.asarray(handle["toks"])  # (k, B) — the sync
        finished_slots = []
        for slot, req in handle["slots"].items():
            if req.done:
                continue  # finished in an earlier in-flight segment:
                # this segment's rows for the slot are overshoot garbage
            kept = 0
            for j in range(handle["k"]):
                tok = int(toks[j, slot])
                self._tokens[slot] = tok
                req.emitted += 1
                kept = j + 1
                done = (tok in req.terminators
                        or req.emitted >= req.max_new_tokens)
                events.append(StepEvent(req.request_id, tok, done))
                if done:
                    req.done = True
                    finished_slots.append(slot)
                    break
            self._host_lengths[slot] += kept
        for slot in finished_slots:
            if slot in self.active:
                del self.active[slot]
            self.free_slots.append(slot)

    def _reconcile_lengths(self):
        """Reset device cache lengths to the committed host mirror. Only
        valid with no segment in flight (the device otherwise runs ahead
        of the mirror by the in-flight rows)."""
        self.bcache = dataclasses.replace(
            self.bcache, lengths=jnp.asarray(self._host_lengths)
        )

    def _compress_uncommitted(self):
        """Sparse only: advance every slot's c1/c2 mirrors over the rows
        committed since the last compression (once per drained segment —
        never inside the decode scan, PERF.md item 4). Selection inside a
        segment reads mirrors <= segment tokens stale, covered by the
        local window like the single-sequence engine."""
        if not self.cfg.apply_sparse:
            return
        from ..cache.batch_sparse_kv import compress_slots

        committed = self._host_lengths
        # rollback can leave compressed > committed on freed slots: clamp
        # to an empty span (their mirrors are rebuilt at readmission)
        old = np.minimum(self._compressed_lengths, committed)
        span = int((committed - old).max(initial=0))
        if span <= 0:
            return
        # static span bound (compress_incremental recomputes at most
        # max_new rows — a larger real span would silently leave zero
        # mirror rows, so fail loudly instead). Engines that commit more
        # rows per drain override _compress_span_bound().
        bound = self._compress_span_bound()
        assert span <= bound, (
            f"uncompressed span {span} exceeds the engine's per-drain "
            f"bound {bound}: compression must run every drain"
        )
        self.bcache = compress_slots(
            self.bcache, jnp.asarray(old), jnp.asarray(committed),
            max_new=bound,
        )
        self._compressed_lengths = committed.copy()

    def _compress_span_bound(self) -> int:
        """Static upper bound on rows committed per slot between
        _compress_uncommitted calls (one decode segment here)."""
        return max(1, self.eng.decode_segment_size)

    def run(self) -> Dict[int, List[int]]:
        """Drain the queue; returns request_id -> emitted tokens.

        Pipelined: segment N+1 is dispatched (input tokens chained on
        device) before segment N's readback, hiding the tunnel RTT under
        device execution. Admission and device-length reconciliation only
        happen with the pipeline drained; a slot that finishes mid-flight
        costs one discarded overshoot segment, exactly like the in-segment
        overshoot ``step_segment`` already accepts."""
        out: Dict[int, List[int]] = {}
        seg = max(1, self.eng.decode_segment_size)

        def note(events):
            for ev in events:
                out.setdefault(ev.request_id, [])
                if ev.token not in self._terminators_of(ev.request_id):
                    out[ev.request_id].append(ev.token)

        if seg <= 1:
            while self.has_work:
                note(self.step())
            return out

        pend = None
        while self.has_work or pend is not None:
            events: List[StepEvent] = []
            if pend is None:
                self._reconcile_lengths()
                self._compress_uncommitted()
                self._admit(events)
                note(events)
                if self.active:
                    pend = self._dispatch_segment(seg)
                continue
            # chain unless an admission is actually possible now — a
            # waiting request with no free slot can't be admitted, so
            # draining for it would only stall the pipeline. Sparse slots
            # drain every segment: the compression commit must land
            # between segments (max one segment of mirror staleness).
            chain = (self.active and not (self.waiting and self.free_slots)
                     and not self.cfg.apply_sparse)
            nxt = (self._dispatch_segment(seg, tokens_dev=pend["toks"][-1])
                   if chain else None)
            self._process_segment(pend, events)  # overlaps nxt on device
            note(events)
            pend = nxt
        self._reconcile_lengths()
        return out

    # -- internals -------------------------------------------------------------

    def _terminators_of(self, rid: int) -> Tuple[int, ...]:
        req = self._requests.get(rid)
        return req.terminators if req else ()

    def _on_admitted(self, req: Request, slot: int, prompt_ids, first_token: int):
        """Hook: called once per admitted request after its prefill and
        first-token sample (subclasses add drafter state — see
        batch_chain_engine)."""

    def _chunk_sparse_engaged(self, hist: int) -> bool:
        """Host-side InfLLM-v2 engagement for a chunk starting at history
        ``hist`` (Engine.sparse_engaged, evaluated per admission chunk)."""
        cfg = self.cfg
        if not cfg.apply_sparse:
            return False
        stride = 64 if cfg.use_compress_lse else 16
        clen = max((hist - stride) // stride, 0)
        return clen * stride > cfg.sparse_switch

    def _pick_slot(self, ids: np.ndarray):
        """(free-slot list index, shared prefix rows): with eng.prefix_cache,
        prefer the free slot whose previous prompt shares the longest token
        prefix with ``ids`` — those KV rows are deterministic in the tokens
        and can be kept (the slot-granular analog of Engine's prefix cache;
        no reference counterpart)."""
        if not self.eng.prefix_cache:
            return 0, 0
        best_i, best_n = 0, 0
        for si, s in enumerate(self.free_slots):
            prev = self._slot_tokens.get(s)
            if prev is None:
                continue
            n = min(prev.size, ids.size - 1)  # keep >= 1 token for logits
            if n <= 0:
                continue
            if self.cfg.apply_sparse:
                # compressed mirrors may lag the rows (compression runs per
                # drained segment); only rows with mirrors are reusable
                n = min(n, int(self._compressed_lengths[s]))
            eq = prev[:n] == ids[:n]
            shared = n if eq.all() else int(np.argmin(eq))
            if shared > best_n:
                best_i, best_n = si, shared
        if best_n == 0:
            # cold request: overwrite the LEAST valuable cached prefix (an
            # empty slot if any) instead of free_slots[0], which may hold a
            # long conversation another turn is about to reuse
            best_i = min(
                range(len(self.free_slots)),
                key=lambda si: self._slot_tokens.get(
                    self.free_slots[si], np.zeros((0,), np.int32)
                ).size,
            )
        return best_i, best_n

    def _admit(self, events: List[StepEvent]):
        C = self.eng.chunk_length
        while self.waiting and self.free_slots:
            req = self.waiting.popleft()
            ids = np.asarray(req.prompt_ids, np.int32)
            slot_i, start = self._pick_slot(ids)
            slot = self.free_slots.pop(slot_i)
            req.slot = slot
            self._slot_tokens[slot] = ids  # rows valid once prefill lands
            self._last_admit_cached = start
            # set the slot's length to the reused prefix (0 when cold) and
            # chunk-prefill the rest of the prompt
            self.bcache = dataclasses.replace(
                self.bcache,
                lengths=self.bcache.lengths.at[slot].set(start),
            )
            self._compressed_lengths[slot] = start
            logits = None
            i = start
            while i < len(ids):
                n = min(len(ids) - i, C)
                cw = chunk_width(n, C)
                chunk = np.zeros((cw,), np.int32)
                chunk[:n] = ids[i : i + n]
                pos = np.arange(i, i + cw, dtype=np.int32)
                if self.cfg.apply_sparse:
                    self.bcache, logits = prefill_slot_chunk_sparse(
                        self.cfg, self.params, self.rope, self.bcache,
                        jnp.asarray(slot, jnp.int32),
                        jnp.asarray(chunk), jnp.asarray(pos),
                        jnp.asarray(n, jnp.int32), attn_impl=self.attn_impl,
                        sparse_select=self._chunk_sparse_engaged(i),
                    )
                else:
                    self.bcache, logits = prefill_slot_chunk(
                        self.cfg, self.params, self.rope, self.bcache,
                        jnp.asarray(slot, jnp.int32),
                        jnp.asarray(chunk), jnp.asarray(pos),
                        jnp.asarray(n, jnp.int32), attn_impl=self.attn_impl,
                    )
                i += n
            self._host_lengths[slot] = len(ids)
            self._compressed_lengths[slot] = len(ids)
            self.key, sub = jax.random.split(self.key)
            t, tk, tp = self._req_sampling(req)
            # traced per-row params: arbitrary HTTP temperatures must not
            # recompile the (static-arg) sample()
            tok = int(sample_per_row(
                logits[None].astype(jnp.float32), sub,
                jnp.asarray([t], jnp.float32), jnp.asarray([tk], jnp.int32),
                jnp.asarray([tp], jnp.float32),
            )[0])
            req.first_token_time = time.time()
            self._tokens[slot] = tok
            req.emitted = 1
            self._on_admitted(req, slot, ids, tok)
            done = tok in req.terminators or req.max_new_tokens <= 1
            events.append(StepEvent(req.request_id, tok, done))
            if done:
                req.done = True
                self.free_slots.append(slot)
            else:
                self.active[slot] = req
