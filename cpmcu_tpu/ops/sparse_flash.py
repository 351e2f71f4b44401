"""Pallas block-sparse flash attention (InfLLM-v2 stage 2).

TPU-native replacement for the reference's blockmask-driven FlashAttention
main loop (src/flash_attn/src/flash_blockmask.h:5-110 skip-scan +
flash_fwd_kernel.h headlevel kernels): instead of bit-scanning a uint64
bitmap inside the kernel, the host-side XLA prologue compacts each
(kv-head, query-tile)'s visible 64-token blocks into an ascending **visit
list**, and the kernel walks exactly ``nvisit`` entries with manually
double-buffered HBM->VMEM DMA — true dynamic skipping (work ∝ selected
blocks, not context length), which a static Pallas grid cannot express.

Per-token exactness: a key block on the visit list is the *union* over the
tile's tokens; each token's own visibility is re-derived in-kernel from its
top-k index row (membership test) OR the local block window — the same
per-token granularity as the reference's per-16-row bitmap
(minicpm4_attn.cuh:162-199), without shipping bitmaps to SMEM.

Query tiling folds the G = H/KVH query heads of a KV group into MXU rows
(rows = G * BT), so each visited block is streamed exactly once per tile.
BT defaults to 128/G rows -> full-width MXU tiles even at tiny decode T.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse import BLOCK, NEG_INF


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# visit-list prologue (XLA)
# ---------------------------------------------------------------------------


def build_visit_lists(
    topk_idx: jax.Array,  # (KVH, T, K) selected block ids (top-k per token)
    topk_valid: jax.Array,  # (KVH, T, K) bool: selection not forced out
    positions: jax.Array,  # (T,) absolute query positions
    limit,  # int32 scalar: exclusive bound on visible cache rows
    nb: int,  # static: number of 64-token blocks in the cache
    bt: int,  # static: query tokens per tile
    *,
    local_blocks: int,
):
    """Compact per-tile visit lists.

    Returns (visit (KVH, nq, NB) int32 ascending block ids — entries beyond
    nvisit are the invalid-block pad, nvisit (KVH, nq) int32).
    """
    from .sparse import bits_from_topk

    KVH, T, K = topk_idx.shape
    nq = (T + bt - 1) // bt
    Tp = nq * bt

    bits = bits_from_topk(topk_idx, topk_valid, nb)

    b = jnp.arange(nb, dtype=jnp.int32)[None, None, :]
    pos = jnp.asarray(positions, jnp.int32)
    q_block = (pos // BLOCK)[None, :, None]
    vis = bits | (b > q_block - local_blocks)  # selection ∪ local window
    vis = vis & (b * BLOCK < jnp.asarray(limit, jnp.int32))  # feasible rows
    vis = vis & (b <= q_block)  # no fully-future blocks (causal)

    if Tp != T:
        vis = jnp.pad(vis, ((0, 0), (0, Tp - T), (0, 0)))
    union = vis.reshape(KVH, nq, bt, nb).any(axis=2)  # (KVH, nq, NB)

    bb = jnp.arange(nb, dtype=jnp.int32)
    key = jnp.where(union, bb, nb + bb)
    visit = jnp.argsort(key, axis=-1).astype(jnp.int32)  # set bits first, asc
    nvisit = union.sum(axis=-1).astype(jnp.int32)
    # pad the lane dim to 128 so the per-tile row DMA is a whole, tiling-
    # aligned slice (Mosaic rejects partial lane slices)
    nb_pad = _round_up(nb, 128)
    if nb_pad != nb:
        visit = jnp.pad(visit, ((0, 0), (0, 0), (0, nb_pad - nb)))
    # (KVH, nq, 1, NB): each row is its own (1, NB) tile so the per-tile
    # row DMA stays sublane-aligned for any nq (Mosaic rejects slicing a
    # single row out of an (nq, NB) tile when nq > 1)
    return visit.reshape(visit.shape[0], visit.shape[1], 1, nb_pad), nvisit


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _sparse_kernel(
    # scalar prefetch
    nvisit_ref,  # (KVH*nq,) int32 SMEM
    prior_ref,  # (1,) int32
    limit_ref,  # (1,) int32
    # inputs
    q_ref,  # (1, 1, rows, D) VMEM
    visit_hbm,  # (KVH, nq, 1, NB) int32 ANY/HBM
    topk_ref,  # (1, 1, BT, K) int32 VMEM
    pos_ref,  # (1, 1, BT) int32 VMEM
    k_hbm,  # (KVH, S, D) ANY/HBM
    v_hbm,  # (KVH, S, D) ANY/HBM
    # outputs
    o_ref,  # (1, 1, rows, D)
    lse_ref,  # (1, 1, rows, 128)
    # scratch
    visit_smem,  # (1, NB) int32 SMEM — this tile's visit list
    kbuf,  # (2, BLOCK, D) VMEM
    vbuf,  # (2, BLOCK, D) VMEM
    vlsem,  # visit-list DMA semaphore
    ksem, vsem,  # DMA semaphores (2,)
    *,
    scale: float,
    g: int,
    bt: int,
    local_blocks: int,
    emit_lse: bool,
):
    h = pl.program_id(0)
    qi = pl.program_id(1)
    nq = pl.num_programs(1)
    rows, D = q_ref.shape[2], q_ref.shape[3]
    n = nvisit_ref[h * nq + qi]
    limit = limit_ref[0]

    q = q_ref[0, 0]  # (rows, D)
    pos_bt = pos_ref[0, 0]  # (BT,)
    topk = topk_ref[0, 0]  # (BT, K)

    def get_dma(buf, sem, hbm, slot, i):
        blk = visit_smem[0, i]
        return pltpu.make_async_copy(
            hbm.at[h, pl.ds(blk * BLOCK, BLOCK), :],
            buf.at[slot],
            sem.at[slot],
        )

    @pl.when(n > 0)
    def _run():
        # pull this tile's block index list into SMEM (the reference reads
        # its uint64 bitmap directly from gmem per skip-scan step,
        # flash_blockmask.h:68; one 16KB DMA up front is the TPU way)
        vl = pltpu.make_async_copy(visit_hbm.at[h, qi], visit_smem, vlsem)
        vl.start()
        vl.wait()
        get_dma(kbuf, ksem, k_hbm, 0, 0).start()
        get_dma(vbuf, vsem, v_hbm, 0, 0).start()

        def body(i, carry):
            m_prev, l_prev, acc = carry
            slot = jax.lax.rem(i, 2)
            nxt = jax.lax.rem(i + 1, 2)

            @pl.when(i + 1 < n)
            def _prefetch():
                get_dma(kbuf, ksem, k_hbm, nxt, i + 1).start()
                get_dma(vbuf, vsem, v_hbm, nxt, i + 1).start()

            get_dma(kbuf, ksem, k_hbm, slot, i).wait()
            get_dma(vbuf, vsem, v_hbm, slot, i).wait()

            blk = visit_smem[0, i]
            k = kbuf[slot]  # (BLOCK, D)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (rows, BLOCK)

            # per-token visibility, built in (G, BT, BLOCK) space
            j = blk * BLOCK + jax.lax.broadcasted_iota(
                jnp.int32, (bt, BLOCK), 1
            )  # (BT, BLOCK) absolute key positions
            qpos = pos_bt[:, None]  # (BT, 1)
            member = jnp.any(topk == blk, axis=-1, keepdims=True)  # (BT, 1)
            windowed = blk > qpos // BLOCK - local_blocks
            ok = (j <= qpos) & (j < limit) & (member | windowed)  # (BT, BLOCK)
            ok = jnp.broadcast_to(ok[None], (g, bt, BLOCK)).reshape(rows, BLOCK)
            s = jnp.where(ok, s, NEG_INF)

            m_cur = jnp.max(s, axis=1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(
                p, axis=1, keepdims=True
            )
            acc = acc * jnp.exp(m_prev - m_new) + jax.lax.dot_general(
                p.astype(vbuf.dtype), vbuf[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((rows, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((rows, 1), jnp.float32)
        a0 = jnp.zeros((rows, D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n, body, (m0, l0, a0))

        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
        if emit_lse:
            lse = jnp.where(l == 0.0, NEG_INF, m + jnp.log(l_safe))
            lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])

    @pl.when(n == 0)
    def _empty():
        o_ref[0, 0] = jnp.zeros_like(o_ref[0, 0])
        if emit_lse:
            lse_ref[0, 0] = jnp.full(lse_ref.shape[2:], NEG_INF, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "include_new", "local_blocks", "return_lse", "scale", "bt", "interpret"
    ),
)
def sparse_flash_mha(
    q: jax.Array,  # (T, H, D)
    k_cache: jax.Array,  # (KVH, S, D)
    v_cache: jax.Array,  # (KVH, S, D)
    prior_len: jax.Array,  # scalar int32 history length
    topk_idx: jax.Array,  # (KVH, T, K) selected block ids
    topk_valid: jax.Array,  # (KVH, T, K) bool
    positions: jax.Array,  # (T,) absolute query positions
    *,
    include_new: bool,  # True: attend [0, prior+T) causal (prefill/decode);
                        # False: history [0, prior) only (tree-merge path)
    local_blocks: int,
    return_lse: bool = False,
    scale: Optional[float] = None,
    bt: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    if interpret is None:
        interpret = _interpret_default()
    T, H, D = q.shape
    KVH, S, _ = k_cache.shape
    G = H // KVH
    NB = S // BLOCK
    K = topk_idx.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if bt is None:
        bt = max(8, 128 // G)
    bt = min(bt, _round_up(T, 8))
    nq = pl.cdiv(T, bt)
    Tp = nq * bt
    rows = G * bt

    prior = jnp.asarray(prior_len, jnp.int32)
    limit = prior + (T if include_new else 0)

    visit, nvisit = build_visit_lists(
        topk_idx, topk_valid, positions, limit, NB, bt,
        local_blocks=local_blocks,
    )

    # fold query heads into tile rows: (T, H, D) -> (KVH, nq, G*bt, D)
    if Tp != T:
        q = jnp.pad(q, ((0, Tp - T), (0, 0), (0, 0)))
    qg = (
        q.reshape(nq, bt, KVH, G, D)
        .transpose(2, 0, 3, 1, 4)  # (KVH, nq, G, bt, D)
        .reshape(KVH, nq, rows, D)
    )
    pos_p = jnp.asarray(positions, jnp.int32)
    if Tp != T:
        pos_p = jnp.pad(pos_p, (0, Tp - T), constant_values=0)
    pos_tiled = pos_p.reshape(nq, 1, bt)
    # invalid picks become -1 so the kernel's membership test skips them
    # (the reference's idx==-1 skip, minicpm4_kvcache.cuh:133)
    tk = jnp.where(topk_valid, topk_idx, -1)
    if Tp != T:
        tk = jnp.pad(tk, ((0, 0), (0, Tp - T), (0, 0)), constant_values=-1)
    tk_tiled = tk.reshape(KVH, nq, bt, K)

    grid = (KVH, nq)

    kernel = functools.partial(
        _sparse_kernel,
        scale=scale, g=G, bt=bt, local_blocks=local_blocks,
        emit_lse=return_lse,
    )

    if return_lse:
        lse_spec = pl.BlockSpec((1, 1, rows, 128), lambda h, qi, *_: (h, qi, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((KVH, nq, rows, 128), jnp.float32)
    else:
        lse_spec = pl.BlockSpec((1, 1, 8, 128), lambda h, qi, *_: (0, 0, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((1, 1, 8, 128), jnp.float32)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, rows, D), lambda h, qi, *_: (h, qi, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 1, bt, K), lambda h, qi, *_: (h, qi, 0, 0)),
                pl.BlockSpec((1, 1, bt), lambda h, qi, *_: (qi, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, rows, D), lambda h, qi, *_: (h, qi, 0, 0)),
                lse_spec,
            ],
            scratch_shapes=[
                pltpu.SMEM((1, _round_up(NB, 128)), jnp.int32),
                pltpu.VMEM((2, BLOCK, D), k_cache.dtype),
                pltpu.VMEM((2, BLOCK, D), v_cache.dtype),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((KVH, nq, rows, D), q.dtype),
            lse_shape,
        ],
        interpret=interpret,
    )(
        nvisit.reshape(-1), prior.reshape(1), limit.reshape(1),
        qg, visit, tk_tiled, pos_tiled, k_cache, v_cache,
    )

    out = (
        out.reshape(KVH, nq, G, bt, D)
        .transpose(1, 3, 0, 2, 4)  # (nq, bt, KVH, G, D)
        .reshape(Tp, H, D)[:T]
    )
    if not return_lse:
        return out
    lse = (
        lse[..., 0]
        .reshape(KVH, nq, G, bt)
        .transpose(1, 3, 0, 2)
        .reshape(Tp, H)[:T]
    )
    return out, lse


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def mha_sparse(
    q, k_cache, v_cache, prior_len,
    topk_idx, topk_valid, positions,
    tree_mask=None, *, local_blocks: int, impl: str = "auto",
):
    """Sparse-attention entry used by layers.attention on the selection path.

    * Pallas path (TPU): one visit-list kernel pass for prefill/decode; for
      tree decode, a history-only pass merged with the XLA tree block by LSE
      (the split-kv combine, like ops.flash.mha_flash).
    * XLA path (tests / non-TPU): materialized block mask via ops.attention.
    """
    # Mosaic's manual-DMA slices require a 128-aligned lane dim, so the
    # kernel path needs head_dim % 128 == 0 (MiniCPM4-8B's D=128 headline
    # shape); other head dims take the XLA path until the K-block layout is
    # re-tiled (TODO: (S*D/128, 128) cache view for D=64).
    d_ok = q.shape[-1] % 128 == 0
    use_pallas = impl in ("flash", "auto") and (
        (impl == "flash" and jax.default_backend() != "tpu")  # interpret test
        or (jax.default_backend() == "tpu" and d_ok)
    )
    if not use_pallas:
        from .attention import mha_xla
        from .sparse import bits_from_topk, block_visibility

        NB = k_cache.shape[1] // BLOCK
        bits = bits_from_topk(topk_idx, topk_valid, NB)
        bm = block_visibility(bits, positions, local_blocks=local_blocks)
        return mha_xla(q, k_cache, v_cache, prior_len, tree_mask, bm)

    if tree_mask is None:
        return sparse_flash_mha(
            q, k_cache, v_cache, prior_len, topk_idx, topk_valid, positions,
            include_new=True, local_blocks=local_blocks,
        )

    from .flash import _tree_block_attn, merge_attn

    out_h, lse_h = sparse_flash_mha(
        q, k_cache, v_cache, prior_len, topk_idx, topk_valid, positions,
        include_new=False, local_blocks=local_blocks, return_lse=True,
    )
    out_t, lse_t = _tree_block_attn(
        q, k_cache, v_cache, prior_len, tree_mask, window=0, sink=0
    )
    return merge_attn(out_h, lse_h, out_t, lse_t)
