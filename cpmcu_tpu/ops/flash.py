"""Pallas TPU flash attention over the static KV cache.

TPU-native re-design of the reference's modified FlashAttention-2 fork
(src/flash_attn/flash_api.hpp:294-394 and SURVEY.md §2.3). One kernel family
covers:

  * chunked **prefill** (T up to chunk_length queries, causal over
    ``prior + T`` cache rows),
  * **decode** (T in {1..64} queries),
  * **sliding window** + **sink** tokens (``block_window_size`` /
    ``sink_window_size`` analogs),
  * dynamic cache length: the kv-block grid is sized for the static cache
    budget, and blocks beyond ``ceil(limit/BK)`` are elided — their
    BlockSpec index_map clamps to the previous block (Pallas skips the DMA
    when the mapped block doesn't change) and ``pl.when`` skips the compute.
    This replaces the CUDA fork's ``seqlens_k`` handling; no recompilation
    when the context grows (the CUDA version re-captures its graph every 128
    tokens, entry.cu:540-562).
  * optional **LSE output** so a ≤64-token tree/new block computed in XLA
    can be merged outside the kernel (softmax-merge, the split-kv combine
    trick) — how tree speculation attends without putting gather-heavy mask
    logic in the hot loop.
  * **block-sparse** KV iteration from a top-k block bitmap (InfLLM-v2,
    flash_blockmask.h analog): see ``ops.sparse_flash`` (M4).

GQA layout: the G query heads of each KV head are folded into the row axis
(rows = G*T), so each KV block is streamed from HBM exactly once per query
tile — the same bandwidth-saving motivation as the reference's
"fold 16 q-heads into the head dim" trick (flash_api.hpp:326-328), done the
TPU way.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Default tiles. BK = KV rows per block; BQT = query tokens per tile.
DEFAULT_BK = 512
DEFAULT_BQT = 256


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def is_supported(q, k_cache) -> bool:
    """Static (trace-time) dispatch predicate for impl="auto"."""
    T, H, D = q.shape
    KVH = k_cache.shape[0]
    return (
        D <= 256
        and H % KVH == 0
        and jax.default_backend() == "tpu"  # interpret mode is for tests only
    )


def _flash_kernel(
    # scalar prefetch
    limit_ref,  # (1,) int32: number of valid cache rows overall
    prior_ref,  # (1,) int32: history length (queries start here)
    # inputs
    q_ref,  # (1, ROWS, D)
    k_ref,  # (1, BK, D)
    v_ref,  # (1, BK, D)
    # outputs
    o_ref,  # (1, ROWS, D)
    lse_ref,  # (1, ROWS, 128) broadcast lse (lane-padded)
    # scratch
    m_scr,  # (ROWS, 128) f32
    l_scr,  # (ROWS, 128) f32
    acc_scr,  # (ROWS, D) f32
    *,
    scale: float,
    bk: int,
    bqt: int,
    g: int,
    causal: bool,
    window: int,
    sink: int,
    emit_lse: bool,
):
    qi = pl.program_id(1)
    b = pl.program_id(2)
    nb_total = pl.num_programs(2)

    rows = q_ref.shape[1]
    limit = limit_ref[0]
    prior = prior_ref[0]

    @pl.when(b == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # sliding window without sink: grid step b maps block lo_blk + b, so
    # the (static-size) grid covers only ~(window+bqt)/bk blocks instead of
    # the whole capacity. The EAGLE drafter (window=1024) at 96K otherwise
    # walked 192 mostly-masked steps per call — ~0.9 ms/round of the
    # full-stack decode (r4a trace); the caller shrinks nb_max to match.
    if window > 0 and sink == 0:
        lo_blk = jnp.maximum(prior + qi * bqt - (window - 1), 0) // bk
    else:
        lo_blk = 0
    blk = b + lo_blk

    # which kv blocks can this q tile see at all?
    if causal:
        hi = jnp.minimum(limit, prior + (qi + 1) * bqt)  # exclusive
    else:
        hi = limit
    nb = jnp.maximum(pl.cdiv(hi, bk), 0)

    # fully-visible tile: every key < every query's horizon — skip the
    # per-entry mask construction (iota+compares+select are ~40% of the
    # kernel's VPU work, which is on par with its MXU work at prefill)
    lo = prior + qi * bqt if causal else limit
    if window > 0 and sink == 0:
        # also require every key inside the window of the LAST query row
        full = (
            ((blk + 1) * bk <= lo) & ((blk + 1) * bk <= limit)
            & (blk * bk >= prior + (qi + 1) * bqt - window)
        )
    elif window > 0:
        full = jnp.bool_(False)
    else:
        full = ((blk + 1) * bk <= lo) & ((blk + 1) * bk <= limit)

    @pl.when(blk < nb)
    def _compute():
        q = q_ref[0]
        k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (rows, bk)

        def masked(s):
            # absolute query token index per row: rows are (g, t) ordered
            row_t = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0) % bqt
            q_pos = prior + qi * bqt + row_t  # (rows, bk)
            key_j = blk * bk + jax.lax.broadcasted_iota(
                jnp.int32, (rows, bk), 1)
            mask = key_j < hi
            if causal:
                mask &= key_j <= q_pos
            if window > 0:
                in_window = key_j > q_pos - window
                if sink > 0:
                    in_window |= key_j < sink
                mask &= in_window
            return jnp.where(mask, s, NEG_INF)

        s = jax.lax.cond(full, lambda s: s, masked, s)

        m_prev = m_scr[:, :1]  # (rows, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (rows, bk)
        l_cur = jnp.sum(p, axis=1, keepdims=True)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :1] * alpha + l_cur
        v = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(b == nb_total - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        if emit_lse:
            lse = jnp.where(l == 0.0, NEG_INF, m_scr[:, :1] + jnp.log(l_safe))
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "window", "sink", "scale", "bk", "bqt", "return_lse",
        "layer", "interpret", "span",
    ),
)
def flash_mha(
    q: jax.Array,  # (T, H, D)
    k_cache: jax.Array,  # (KVH, S, D) — or (L, KVH, S, D) with ``layer``
    v_cache: jax.Array,  # same
    prior_len: jax.Array,  # scalar int32
    layer_dyn: Optional[jax.Array] = None,  # TRACED layer index into a
                                  # stacked 4D cache (scalar prefetch) — the
                                  # scan-over-layers forward's counterpart
                                  # of the static ``layer`` path
    *,
    causal: bool = True,
    window: int = 0,
    sink: int = 0,
    scale: Optional[float] = None,
    bk: int = DEFAULT_BK,
    bqt: int = DEFAULT_BQT,
    return_lse: bool = False,
    layer: Optional[int] = None,  # static layer index into a stacked 4D
                                  # cache: the kernel reads the big donated
                                  # buffer directly (no per-layer slice copy
                                  # — the zero-copy decode path)
    interpret: Optional[bool] = None,
    span: Optional[int] = None,  # static upper bound on valid cache rows
                                  # (engine kv bucket): sizes the KV grid so
                                  # a big capacity costs no skipped grid
                                  # steps. Caller guarantees limit <= span.
):
    """Flash attention of T new queries over the cache.

    With ``causal=True`` attends over rows [0, prior+T) with causality inside
    the new block (prefill / vanilla decode; new K/V already scattered in).
    With ``causal=False`` attends over history rows [0, prior) only — the
    tree/new block is merged outside via the returned LSE (``merge_attn``).
    """
    if interpret is None:
        interpret = _interpret_default()
    T, H, D = q.shape
    KVH, S, _ = k_cache.shape[-3:]
    G = H // KVH
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    # cap the row tile (G*bqt) so q/acc/m/l scratch fits comfortably in
    # VMEM. (A per-op microbenchmark preferred rows=256, but in-engine
    # prefill measured 299ms/4-chunks at rows=1024 vs 346ms at 256 —
    # engine numbers win; the tunnel's non-donated-input tax skews
    # standalone kernel sweeps.)
    rows_cap = 1024
    bqt = min(bqt, _round_up(T, 8), max(8, rows_cap // G))
    bk = min(bk, S)
    nq = pl.cdiv(T, bqt)
    nb_max = pl.cdiv(min(span, S) if span else S, bk)
    if window > 0 and sink == 0:
        # the kernel offsets grid step b by the window's first block, so
        # only ~(window+bqt)/bk steps are ever needed (see _flash_kernel)
        nb_max = min(nb_max, pl.cdiv(window + bqt, bk) + 1)
    rows = G * bqt

    # (T, H, D) -> (KVH, G*nq*bqt, D) grouped rows, padded T to nq*bqt
    Tp = nq * bqt
    if Tp != T:
        q = jnp.pad(q, ((0, Tp - T), (0, 0), (0, 0)))
    qg = (
        q.reshape(Tp, KVH, G, D)
        .transpose(1, 2, 0, 3)  # (KVH, G, Tp, D)
        .reshape(KVH, G, nq, bqt, D)
        .swapaxes(1, 2)  # (KVH, nq, G, bqt, D)
        .reshape(KVH, nq * G * bqt, D)
    )

    prior = jnp.asarray(prior_len, jnp.int32).reshape(1)
    limit = prior + (T if causal else 0)

    grid = (KVH, nq, nb_max)
    assert layer is None or layer_dyn is None

    def q_index(h, qi, b, limit_ref, prior_ref, *_):
        return (h, qi, 0)

    def _nb_hi(qi, b, limit_ref, prior_ref):
        if causal:
            hi = jnp.minimum(limit_ref[0], prior_ref[0] + (qi + 1) * bqt)
        else:
            hi = limit_ref[0]
        nb = jnp.maximum(pl.cdiv(hi, bk), 1)
        if window > 0 and sink == 0:
            b = b + jnp.maximum(
                prior_ref[0] + qi * bqt - (window - 1), 0) // bk
        return jnp.minimum(b, nb - 1)

    if layer_dyn is not None:
        def kv_index(h, qi, b, limit_ref, prior_ref, layer_ref):
            return (layer_ref[0], h, _nb_hi(qi, b, limit_ref, prior_ref), 0)

        kv_block = (1, 1, bk, D)
    elif layer is None:
        def kv_index(h, qi, b, limit_ref, prior_ref):
            return (h, _nb_hi(qi, b, limit_ref, prior_ref), 0)

        kv_block = (1, bk, D)
    else:
        def kv_index(h, qi, b, limit_ref, prior_ref):
            return (layer, h, _nb_hi(qi, b, limit_ref, prior_ref), 0)

        kv_block = (1, 1, bk, D)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale, bk=bk, bqt=bqt, g=G,
        causal=causal, window=window, sink=sink, emit_lse=return_lse,
    )

    if return_lse:
        lse_spec = pl.BlockSpec((1, rows, 128), q_index)
        lse_shape = jax.ShapeDtypeStruct((KVH, nq * rows, 128), jnp.float32)
    else:
        # dummy 1-tile output; kernel never writes it
        lse_spec = pl.BlockSpec((1, 8, 128), lambda h, qi, b, *_: (0, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((1, 8, 128), jnp.float32)

    if layer_dyn is not None:
        # the layer index rides as a third prefetch scalar; the kernel body
        # never reads it (only the kv index maps do)
        n_scalars = 3
        scalar_ops = (limit, prior,
                      jnp.asarray(layer_dyn, jnp.int32).reshape(1))
        body = lambda lim, pri, lay, *rest: kernel(lim, pri, *rest)
    else:
        n_scalars = 2
        scalar_ops = (limit, prior)
        body = kernel

    out, lse = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalars,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, rows, D), q_index),
                pl.BlockSpec(kv_block, kv_index),
                pl.BlockSpec(kv_block, kv_index),
            ],
            out_specs=[
                pl.BlockSpec((1, rows, D), q_index),
                lse_spec,
            ],
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((KVH, nq * rows, D), q.dtype),
            lse_shape,
        ],
        interpret=interpret,
    )(*scalar_ops, qg, k_cache, v_cache)

    # (KVH, nq*G*bqt, D) -> (T, H, D)
    out = (
        out.reshape(KVH, nq, G, bqt, D)
        .swapaxes(1, 2)  # (KVH, G, nq, bqt, D)
        .reshape(KVH, G, Tp, D)
        .transpose(2, 0, 1, 3)
        .reshape(Tp, H, D)[:T]
    )
    if not return_lse:
        return out
    lse = (
        lse[..., 0]
        .reshape(KVH, nq, G, bqt)
        .swapaxes(1, 2)
        .reshape(KVH, G, Tp)
        .transpose(2, 0, 1)
        .reshape(Tp, H)[:T]
    )
    return out, lse


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _slots_kernel(
    len_ref,  # (B,) int32 history lengths (scalar prefetch)
    q_ref,  # (1, 1, G, D)
    k_ref,  # (1, 1, 1, BK, D)
    v_ref,  # (1, 1, 1, BK, D)
    o_ref,  # (1, 1, G, D)
    lse_ref,  # (1, 1, G, 128)
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    bk: int,
):
    b = pl.program_id(0)
    t = pl.program_id(2)
    nb_total = pl.num_programs(2)
    limit = len_ref[b]

    @pl.when(t == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    nb = pl.cdiv(limit, bk)

    @pl.when(t < nb)
    def _compute():
        q = q_ref[0, 0]  # (G, D)
        k = k_ref[...].reshape(k_ref.shape[-2], k_ref.shape[-1])
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (G, bk)
        j = t * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(j < limit, s, NEG_INF)
        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = jnp.broadcast_to(
            l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True),
            l_scr.shape,
        )
        v = v_ref[...].reshape(v_ref.shape[-2], v_ref.shape[-1])
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)

    @pl.when(t == nb_total - 1)
    def _finalize():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, NEG_INF, m_scr[:, :1] + jnp.log(l_safe))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(
    jax.jit, static_argnames=("layer", "scale", "bk", "interpret")
)
def flash_mha_slots(
    q: jax.Array,  # (B, H, D) — ONE query token per slot
    k_cache: jax.Array,  # (B, L, KVH, S, D) slot arena
    v_cache: jax.Array,
    lengths: jax.Array,  # (B,) history rows per slot
    *,
    layer: int,
    scale: Optional[float] = None,
    bk: int = DEFAULT_BK,
    interpret: Optional[bool] = None,
):
    """Batched decode attention over per-slot cache lanes (continuous
    batching): each slot's single query attends its own history [0, len_b)
    in place (static ``layer`` BlockSpec index — no per-slot/per-layer
    slice copies). The freshly projected self token is merged outside via
    the returned LSE (``merge_attn``). Returns (out (B,H,D), lse (B,H))."""
    if interpret is None:
        interpret = _interpret_default()
    B, H, D = q.shape
    KVH, S = k_cache.shape[2], k_cache.shape[3]
    G = H // KVH
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    bk = min(bk, S)
    nb = pl.cdiv(S, bk)
    qg = q.reshape(B, KVH, G, D)

    def q_index(b, h, t, len_ref):
        return (b, h, 0, 0)

    def kv_index(b, h, t, len_ref):
        valid = jnp.maximum(pl.cdiv(len_ref[b], bk), 1)
        return (b, layer, h, jnp.minimum(t, valid - 1), 0)

    out, lse = pl.pallas_call(
        functools.partial(_slots_kernel, scale=scale, bk=bk),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, KVH, nb),
            in_specs=[
                pl.BlockSpec((1, 1, G, D), q_index),
                pl.BlockSpec((1, 1, 1, bk, D), kv_index),
                pl.BlockSpec((1, 1, 1, bk, D), kv_index),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, G, D), q_index),
                pl.BlockSpec((1, 1, G, 128), q_index),
            ],
            scratch_shapes=[
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, 128), jnp.float32),
                pltpu.VMEM((G, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, KVH, G, D), q.dtype),
            jax.ShapeDtypeStruct((B, KVH, G, 128), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray(lengths, jnp.int32), qg, k_cache, v_cache)

    return out.reshape(B, H, D), lse[..., 0].reshape(B, H)


def merge_attn(out_a, lse_a, out_b, lse_b):
    """Softmax-merge two partial attention results over disjoint key sets.

    The split-kv combine (reference flash_api.hpp:385-391 num_splits path):
    out = (exp(lse_a-m)*... ) with m = max(lse_a, lse_b), all fp32.
    Shapes: out (T, H, D), lse (T, H).
    """
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)[..., None]
    wb = jnp.exp(lse_b - m)[..., None]
    den = wa + wb
    out = (out_a.astype(jnp.float32) * wa + out_b.astype(jnp.float32) * wb) / den
    return out.astype(out_a.dtype)


def mha_flash(
    q, k_cache, v_cache, prior_len,
    tree_mask=None, block_mask=None, *, window: int = 0, sink: int = 0,
):
    """Full dispatch entry matching ops.attention.mha semantics.

    * No tree mask: single causal kernel pass over [0, prior+T).
    * Tree mask: kernel pass over history [0, prior) + XLA attention over the
      T(≤64) new tokens with the tree mask, merged by LSE. This keeps the
      tree structure out of the bandwidth-bound kernel loop (the reference
      instead threads uint64 mask rows through its CUDA kernel,
      flash_fwd_kernel.h:921).
    """
    if block_mask is not None:
        from .attention import mha_xla  # sparse kernel lands with M4

        return mha_xla(
            q, k_cache, v_cache, prior_len, tree_mask, block_mask,
            window=window, sink=sink,
        )

    T, H, D = q.shape
    if tree_mask is None:
        return flash_mha(
            q, k_cache, v_cache, prior_len,
            causal=True, window=window, sink=sink,
        )

    # history part (kernel) + tree part (XLA) merged
    out_h, lse_h = flash_mha(
        q, k_cache, v_cache, prior_len,
        causal=False, window=window, sink=sink, return_lse=True,
    )
    out_t, lse_t = _tree_block_attn(
        q, k_cache, v_cache, prior_len, tree_mask, window=window, sink=sink
    )
    return merge_attn(out_h, lse_h, out_t, lse_t)


def new_block_attn(q, k_new, v_new, mask):
    """Attention of T queries against the Km new keys (explicit (Km,KVH,D)
    projection-layout k/v, not yet in the cache), masked by the (T, Km)
    tree/causal mask. Returns (out (T,H,D), lse (T,H)) for ``merge_attn``
    with a history pass — the zero-copy decode building block."""
    T, H, D = q.shape
    Km, KVH, _ = k_new.shape
    G = H // KVH

    qf = q.reshape(T, KVH, G, D).astype(jnp.float32)
    s = jnp.einsum("tkgd,skd->kgts", qf, k_new.astype(jnp.float32))
    s = s / jnp.sqrt(jnp.float32(D))
    s = jnp.where(mask.astype(jnp.bool_)[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    lsafe = jnp.where(l == 0.0, 1.0, l)
    out = jnp.einsum("kgts,skd->tkgd", e / lsafe, v_new.astype(jnp.float32))
    lse = jnp.where(l == 0.0, NEG_INF, m + jnp.log(lsafe)).squeeze(-1)
    out = out.reshape(T, H, D).astype(q.dtype)
    lse = lse.transpose(2, 0, 1).reshape(T, H)
    return out, lse


def _tree_block_attn(q, k_cache, v_cache, prior_len, tree_mask, *, window, sink):
    """Attention of the T new queries against the Km masked keys at
    [prior, prior+Km), masked by the (T, Km) tree/ancestor mask. Km == T for
    base-model tree verification; Km = topk*d > T in the EAGLE expansion."""
    Km = tree_mask.shape[1]
    prior = jnp.asarray(prior_len, jnp.int32)
    k_new = jax.lax.dynamic_slice_in_dim(k_cache, prior, Km, axis=1)  # (KVH,Km,D)
    v_new = jax.lax.dynamic_slice_in_dim(v_cache, prior, Km, axis=1)
    return new_block_attn(
        q, jnp.swapaxes(k_new, 0, 1), jnp.swapaxes(v_new, 0, 1), tree_mask
    )
