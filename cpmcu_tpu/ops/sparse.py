"""InfLLM-v2 block-sparse attention ops (the MiniCPM4 long-context path).

TPU-native re-design of the reference's sparse pipeline
(src/model/minicpm4/minicpm4_kvcache.cuh, minicpm4_attn.cuh, SURVEY.md §2.5):

  1. **Semantic-kernel compression** — overlapping mean pools of the key
     cache: c1 = window 32 / stride 16, c2 = window 128 / stride 64
     (meanpooling_16/64 kernels, minicpm4_kvcache.cuh:6-62). Incremental:
     only rows covering newly committed tokens are recomputed.
  2. **Stage-1 scoring** — for each (kv head g, query t):
     ``p[g,t,j] = sum_{h in group g} exp(scale*q[t,h]·c1[g,j] - lse_ref[t,h])``
     where ``lse_ref`` is the online-softmax LSE over the *c2* scores when
     ``use_compress_lse`` (the reference's two-pass kernel: stats pass over
     c2 via softmax_rescale_simple, prob pass over c1 via softmax_rescale_gt,
     16-query-head sum via hdim16_reduce — flash_fwd_kernel.h:1760-2265), or
     over the c1 scores themselves otherwise.
  3. **Max-pool block scoring** — kernel 5 / stride 4 / pad 1 over the c1
     probs gives one score per 64-token block; the first ``init_blocks``
     (sink) blocks are forced +inf and blocks within ``local_blocks`` of the
     query are forced −inf (maxpooling_kernel, minicpm4_kvcache.cuh:64-108).
  4. **Top-k block selection** per (kv head, query) → boolean block mask.
  5. **Stage-2 visibility**: causal AND (selected-block OR local-window OR
     within the current chunk). Deviation from the reference, by design: the
     CUDA fork's runtime window is ``block_window_size`` cuda-blocks of 32
     tokens (flash_blockmask.h:30) while its top-k exclusion assumes 64-token
     blocks — leaving tokens in (w·32, w·64] neither selected nor windowed.
     We use 64-token blocks everywhere (the InfLLM-v2 paper semantics), so
     the window exactly complements the top-k exclusion.

Block geometry is fixed: BLOCK=64 tokens per selectable block, c1 stride 16
(4 c1 rows per block), c2 stride 64 (1 row per block).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30
BLOCK = 64
C1_STRIDE, C1_WINDOW = 16, 32
C2_STRIDE, C2_WINDOW = 64, 128


def c_len_of(length, stride: int):
    """Number of valid compressed rows for a committed token count
    (minicpm4_kvcache.cuh:246,250: ``max((len - stride)/stride, 0)``) —
    a row is valid only when its full window is committed."""
    length = jnp.asarray(length, jnp.int32)
    return jnp.maximum((length - stride) // stride, 0)


# ---------------------------------------------------------------------------
# 1. compression
# ---------------------------------------------------------------------------


def compress_incremental(
    k_cache: jax.Array,  # (KVH, S, D) committed keys (post-RoPE)
    c_cache: jax.Array,  # (KVH, SC, D) compressed mirror
    old_clen,  # int32 scalar: rows already valid
    new_clen,  # int32 scalar: rows valid after this call
    *,
    stride: int,
    max_new: int,  # static bound on rows recomputed per call
) -> jax.Array:
    """Recompute compressed rows [old_clen, old_clen+max_new).

    Row j = mean(k_cache[:, j*stride : j*stride + 2*stride]). Rows beyond
    ``new_clen`` get garbage (their source tokens aren't committed yet) but
    are rewritten by a later call before they become readable — the same
    contract as the reference's incremental ``compress()``
    (minicpm4_kvcache.cuh:243-254). Monotonic ``old_clen`` across calls is
    the caller's responsibility (the engine derives it from cache length).
    """
    KVH, S, D = k_cache.shape
    window = 2 * stride
    old_clen = jnp.asarray(old_clen, jnp.int32)
    span = max_new * stride + stride  # tokens feeding max_new overlapping rows

    # one contiguous dynamic_slice instead of jnp.take: XLA lowers the
    # gather to a per-index loop (profiled ~1ms/token at 96K). Near the
    # capacity end the start clamps back and a roll realigns: the last
    # (start - clamped) rows become wrapped garbage, which only lands in
    # rows beyond new_clen (droppable by the module contract).
    start = old_clen * stride
    sc = jnp.minimum(start, S - min(span, S))
    rows = jax.lax.dynamic_slice(
        k_cache, (jnp.int32(0), sc, jnp.int32(0)), (KVH, min(span, S), D)
    )
    rows = jnp.roll(rows, sc - start, axis=1)
    if span > S:
        rows = jnp.pad(rows, ((0, 0), (0, span - S), (0, 0)))
    a = rows[:, : max_new * stride].reshape(KVH, max_new, stride, D)
    b = rows[:, stride : stride + max_new * stride].reshape(KVH, max_new, stride, D)
    pooled = (a.astype(jnp.float32).sum(2) + b.astype(jnp.float32).sum(2)) / window

    wr_idx = old_clen + jnp.arange(max_new, dtype=jnp.int32)
    return c_cache.at[:, wr_idx, :].set(
        pooled.astype(c_cache.dtype), mode="drop", unique_indices=True
    )


# ---------------------------------------------------------------------------
# 2. stage-1 scoring
# ---------------------------------------------------------------------------


def _lse(scores: jax.Array, valid: jax.Array) -> jax.Array:
    """logsumexp over the last axis with a validity mask; NEG_INF when none
    valid (reference softmax normalize: sum==0 -> inf lse, flash semantics)."""
    s = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    z = jnp.sum(jnp.exp(s - m), axis=-1, keepdims=True)
    return jnp.where(z == 0.0, NEG_INF, m + jnp.log(jnp.where(z == 0.0, 1.0, z)))


@functools.partial(jax.jit, static_argnames=("use_lse", "scale", "bt"))
def stage1_scores(
    q: jax.Array,  # (T, H, D)
    c1: jax.Array,  # (KVH, S1, D)
    c2: jax.Array,  # (KVH, S2, D)
    c1_len,  # int32 scalar
    c2_len,  # int32 scalar
    *,
    use_lse: bool = True,
    scale: Optional[float] = None,
    bt: int = 128,  # query-chunk size bounding the (KVH,bt,G,S1) temporary
) -> jax.Array:
    """Head-group-summed normalized attention probs over c1: (KVH, T, S1) f32.

    Entries at j >= c1_len are exactly 0 (the CUDA kernel writes exp(-inf)=0
    for masked columns), which the max-pool relies on.
    """
    T, H, D = q.shape
    KVH, S1, _ = c1.shape
    G = H // KVH
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    bt = min(bt, (T + 7) // 8 * 8)  # decode: don't pad 1 query to 128
    Tp = (T + bt - 1) // bt * bt
    qp = jnp.pad(q, ((0, Tp - T), (0, 0), (0, 0))) if Tp != T else q
    # keep the dots in the cache dtype (bf16 on TPU): the MXU multiplies
    # bf16 pairs exactly as f32 casts would, accumulating in f32
    # (preferred_element_type) — the old f32 upcast halved MXU throughput
    # for identical products (r4a prefill trace: stage-1 fusions were
    # 126 ms of an 876 ms late chunk at 96K)
    qg = qp.reshape(Tp // bt, bt, KVH, G, D)
    valid1 = (jnp.arange(S1, dtype=jnp.int32) < c1_len)[None, None, None, :]
    valid2 = (jnp.arange(c2.shape[1], dtype=jnp.int32) < c2_len)[None, None, None, :]

    def one(qc):  # (bt, KVH, G, D) -> (KVH, bt, S1)
        s1 = jnp.einsum("tkgd,ksd->ktgs", qc, c1,
                        preferred_element_type=jnp.float32) * scale
        if use_lse:
            s2 = jnp.einsum("tkgd,ksd->ktgs", qc, c2,
                            preferred_element_type=jnp.float32) * scale
            lse = _lse(s2, valid2)
        else:
            lse = _lse(s1, valid1)
        if STAGE1_P_DTYPE == "bf16" and use_lse:
            # halve the dominant prefill stage-1 cost: the (KVH,bt,G,S1)
            # exp/where temporaries are HBM-bound f32 passes (~223 ms of a
            # 1.03 s late 96K chunk, r4g_profile_postfix §A). Casting the
            # einsum output to bf16 (a convert XLA fuses into the matmul
            # write) halves the bytes of the materialized scores AND of
            # the fused exp/where/sum consumer pass. Scores are a
            # selection heuristic (max-pool -> top-k); bf16's ~1% exp
            # error only flips already-marginal block picks. lse stays
            # f32 (computed over the small c2 set).
            s1b = (s1 - lse).astype(jnp.bfloat16)
            pb = jnp.where(valid1, jnp.exp(s1b), jnp.bfloat16(0.0))
            return jnp.sum(pb, axis=2, dtype=jnp.float32)
        p = jnp.where(valid1, jnp.exp(s1 - lse), 0.0)
        return jnp.sum(p, axis=2)  # sum over G (hdim16_reduce analog)

    p = jax.lax.map(one, qg)  # (Tp//bt, KVH, bt, S1)
    return p.transpose(1, 0, 2, 3).reshape(KVH, Tp, S1)[:, :T]


# prefill stage-1 backend: "xla" | "pallas". Measured at ~96K synthetic
# context the engine-level chunk time is within noise (XLA 1459ms vs
# Pallas 1500ms — stage-2 attention dominates under the synthetic
# union-saturation caveat, PERF.md), so the simpler XLA path is the
# default; the Pallas two-pass scorer (ops/sparse_stage1.py) avoids the
# (KVH, bt, G, S1) temporaries and is the candidate when real checkpoints
# shrink stage-2 (benchmark/exp_stage1_ab.py re-measures).
STAGE1_PREFILL_IMPL = "xla"
# stage-1 score temporaries dtype: "f32" (default, bit-stable) or "bf16"
# (halves the HBM-bound exp/where/sum passes at prefill; A/B variant
# stage1_bf16 in benchmark/exp_r4g_prefill_ab.py). Read at trace time.
STAGE1_P_DTYPE = "f32"


def stage1_scores_auto(q, c1, c2, c1_len, c2_len, *, use_lse: bool = True):
    """Dispatch between the XLA scorer and the Pallas two-pass scorer
    (prefill shapes on TPU only; decode selection math is ~free in XLA)."""
    T = q.shape[0]
    if (STAGE1_PREFILL_IMPL == "pallas" and T >= 64
            and q.shape[-1] % 128 == 0 and jax.default_backend() == "tpu"):
        from .sparse_stage1 import stage1_scores_pallas

        return stage1_scores_pallas(q, c1, c2, c1_len, c2_len,
                                    use_lse=use_lse)
    return stage1_scores(q, c1, c2, c1_len, c2_len, use_lse=use_lse)


# ---------------------------------------------------------------------------
# 3+4. max-pool block scoring + top-k selection
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("topk", "init_blocks", "local_blocks"))
def select_blocks(
    p: jax.Array,  # (KVH, T, S1) stage-1 probs
    positions: jax.Array,  # (T,) absolute positions of the queries
    history_len,  # int32 scalar: committed tokens (blocks beyond are unscored)
    *,
    topk: int,
    init_blocks: int = 1,
    local_blocks: int = 8,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Block scores -> per-(kv head, query) top-k block selection.

    Returns (topk_idx (KVH, T, k) int32 block ids, topk_valid (KVH, T, k)
    bool — False where the pick was a forced-out filler (the reference's
    idx==-1 skip, minicpm4_kvcache.cuh:133), pooled (KVH, T, NB) f32).
    NB = S1 // 4 (64-token blocks). Mirrors maxpooling_kernel + TopK
    (minicpm4_kvcache.cuh:64-141): kernel 5 / stride 4 / pad 1 max-pool,
    sink blocks forced +inf, blocks within ``local_blocks`` of the query's
    block (or future) forced −inf, then top-k.
    """
    KVH, T, S1 = p.shape
    NB = S1 // 4
    # window for block b = c1 rows [4b-1, 4b+4): base[b] rows + predecessor's last
    base = p.reshape(KVH, T, NB, 4)
    prev_last = jnp.pad(base[..., :-1, 3], ((0, 0), (0, 0), (1, 0)))  # (KVH,T,NB)
    pooled = jnp.maximum(jnp.max(base, axis=-1), prev_last)

    b = jnp.arange(NB, dtype=jnp.int32)[None, None, :]
    q_block = (jnp.asarray(positions, jnp.int32) // BLOCK)[None, :, None]
    n_scored = (jnp.asarray(history_len, jnp.int32) + BLOCK - 1) // BLOCK
    pooled = jnp.where(b >= n_scored, NEG_INF, pooled)
    pooled = jnp.where(b > q_block - local_blocks, NEG_INF, pooled)
    pooled = jnp.where(b < init_blocks, jnp.float32(jnp.inf), pooled)

    k = min(topk, NB)
    # top-k backend by shape, both exact:
    #  * prefill (T >= 1024): chunked topk_wide — lax.top_k's full-width
    #    sort was ~1 ms per layer at NB=1536 (r4a prefill trace);
    #  * decode/tree (T small): plain lax.top_k — the chunked variant's
    #    many narrow sorts REGRESSED these shapes 4x (r4g decode trace:
    #    41 ms vs 10 per 12-round segment, +2.6 ms/round at 96K).
    if T >= 1024:
        from .topk import topk_wide

        vals, idx = topk_wide(pooled, k, chunk=256)  # (KVH, T, k)
    else:
        vals, idx = jax.lax.top_k(pooled, k)
    keep = vals > NEG_INF / 2  # drop forced-out picks (reference idx==-1 skip)
    return idx.astype(jnp.int32), keep, pooled


def bits_from_topk(topk_idx: jax.Array, topk_valid: jax.Array, nb: int) -> jax.Array:
    """Scatter top-k indices to a boolean block mask (KVH, T, NB) — the
    reference's topk_to_uint64 bitmap, as booleans."""
    KVH, T, _ = topk_idx.shape
    onehot = jnp.zeros((KVH, T, nb), jnp.int32)
    return onehot.at[
        jnp.arange(KVH)[:, None, None],
        jnp.arange(T)[None, :, None],
        jnp.clip(topk_idx, 0, nb - 1),
    ].max(topk_valid.astype(jnp.int32)).astype(jnp.bool_)


def block_visibility(
    block_bits: jax.Array,  # (KVH, T, NB) top-k selections
    positions: jax.Array,  # (T,)
    *,
    local_blocks: int = 8,
) -> jax.Array:
    """Final stage-2 block mask: selected OR within the local block window
    (the complement of select_blocks' −inf forcing; see module docstring on
    the 64-token-block window deviation). Causality and the current chunk's
    own tokens are handled by the attention op's causal mask."""
    KVH, T, NB = block_bits.shape
    b = jnp.arange(NB, dtype=jnp.int32)[None, None, :]
    q_block = (jnp.asarray(positions, jnp.int32) // BLOCK)[None, :, None]
    window = b > q_block - local_blocks
    return block_bits | window
