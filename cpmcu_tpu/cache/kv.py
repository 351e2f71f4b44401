"""Static KV cache as a functional pytree.

TPU-native equivalent of the reference's contiguous per-layer K/V arenas
(src/model/kvcache.cuh:7-65): one statically-shaped (L, S_max, KVH, D) pair
allocated up front at the solved budget (core.memory), updated functionally
with ``lax.dynamic_update_slice`` (XLA turns this into an in-place write when
the cache buffer is donated). ``length`` is a device scalar — the analog of
the reference's ``cache_length`` device tensor (llm.py:244-245).

Tree-speculation KV fixup (``fix_kv_cache``, src/model/tree_drafter.cuh:48-101)
is the gather+scatter ``compact`` below.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k: jax.Array  # (L, KVH, S, D) — per-head streams contiguous for kernel DMA
    v: jax.Array  # (L, KVH, S, D)
    length: jax.Array  # int32 scalar: tokens currently committed

    @property
    def max_length(self) -> int:
        return self.k.shape[2]

    @staticmethod
    def create(cfg: ModelConfig, budget: int, num_layers: Optional[int] = None) -> "KVCache":
        L = num_layers if num_layers is not None else cfg.num_layers
        budget = max(512, (budget + 511) // 512 * 512)
        shape = (L, cfg.num_kv_heads, budget, cfg.head_dim)
        return KVCache(
            k=jnp.zeros(shape, cfg.jnp_dtype),
            v=jnp.zeros(shape, cfg.jnp_dtype),
            length=jnp.zeros((), jnp.int32),
        )

    def with_length(self, length) -> "KVCache":
        return KVCache(self.k, self.v, jnp.asarray(length, jnp.int32))


def append_layer(k_cache, v_cache, new_k, new_v, start):
    """Write T new rows into one layer's (KVH, S, D) cache at ``start``.

    ``new_k``/``new_v`` come in projection layout (T, KVH, D).
    The reference writes k/v directly into the cache inside the qkv GEMM
    during prefill (attn.cuh:180-187) and via ``copy_to_kvcache`` in decode
    (attn.cuh:236-246); under XLA both are this dynamic-update-slice.
    """
    start = jnp.asarray(start, jnp.int32)
    new_k = jnp.swapaxes(new_k, 0, 1)  # (KVH, T, D)
    new_v = jnp.swapaxes(new_v, 0, 1)
    k_cache = jax.lax.dynamic_update_slice(k_cache, new_k, (0, start, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, new_v, (0, start, 0))
    return k_cache, v_cache


def accept_perm(accept_pos, accept_len, dtype):
    """One-hot accepted-path permutation matrix (n, n) in ``dtype``.

    ``perm @ rows`` moves row ``accept_pos[i]`` to row ``i`` for
    i < accept_len and leaves later rows in place. A MATMUL, not
    ``jnp.take``: the gather's output got layout {3,0,1,2} and XLA's
    layout assignment then relayout-copied the ENTIRE cache around the
    update to match the tiny operand (2 x 1.7 ms per spec round at 32K;
    round-2 profiler finding). The dot output keeps the default layout,
    and one-hot x rows is exact in any dtype. Shared by compact() and
    commit_tree_rows() so the trap can't be re-introduced in one copy."""
    n = accept_pos.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    src = jnp.where(idx < accept_len, accept_pos, idx)  # tree-local indices
    return (src[:, None] == idx[None, :]).astype(dtype)


def compact(cache: KVCache, accept_pos, accept_len, base_len) -> KVCache:
    """Move accepted tree slots to the contiguous cache front.

    Equivalent of the reference's two-phase gather/scatter through
    ``tmp_kvcache`` over every layer (tree_drafter.cuh:48-101): rows
    ``base_len + accept_pos[i]`` move to ``base_len + i`` for
    i < accept_len; new length = base_len + accept_len.

    ``accept_pos`` is a fixed-size int32 vector (tree_size); entries beyond
    ``accept_len`` are ignored by clamping their destination to themselves.
    """
    n = accept_pos.shape[0]

    def fix(arr):  # (L, KVH, S, D)
        # Slice the n-row tree window FIRST, gather inside it, splice back:
        #  * gathering the full cache (arr[:, :, global_src]) made XLA pick
        #    a different layout for the gather operand and relayout-copy
        #    the ENTIRE cache there and back — 4 x 14ms per 8-round spec
        #    segment at 32K ctx (round-2 profiler finding);
        #  * the contiguous dynamic_update_slice destination stays in place
        #    on the donated buffer (an index-array scatter defeated the
        #    aliasing analysis — ~1ms/round at a 4K-cap 8B).
        win = jax.lax.dynamic_slice(
            arr,
            (jnp.int32(0), jnp.int32(0), base_len, jnp.int32(0)),
            (arr.shape[0], arr.shape[1], n, arr.shape[3]),
        )
        rows = jnp.einsum(
            "ij,lkjd->lkid", accept_perm(accept_pos, accept_len, arr.dtype),
            win,
        )
        return jax.lax.dynamic_update_slice(
            arr, rows, (jnp.int32(0), jnp.int32(0), base_len, jnp.int32(0))
        )

    return KVCache(
        k=fix(cache.k),
        v=fix(cache.v),
        length=(base_len + accept_len).astype(jnp.int32),
    )


def commit_tree_rows(
    cache, k_rows, v_rows, accept_pos, accept_len, base_len,
    defer_compress: bool = False,
):
    """Write a verified tree's K/V rows (llama.forward defer_kv_write
    output, (L, KVH, T, D)) permuted by the accepted path, in ONE in-place
    update per buffer at ``base_len``.

    Equivalent to the write-at-length-then-``compact`` sequence but with no
    read-after-write on the cache inside fused segments — that pattern made
    XLA copy the whole carry cache every spec round (~3.5ms at 32K ctx;
    round-2 profiling). Handles both cache flavors; sparse mirrors advance
    like cache.sparse_kv.compact_sparse (or defer to the segment caller).
    """
    n = accept_pos.shape[0]
    perm = accept_perm(accept_pos, accept_len, k_rows.dtype)

    def wr(big, rows):  # rows (L, KVH, n, D)
        sel = jnp.einsum("ij,lkjd->lkid", perm, rows)
        return jax.lax.dynamic_update_slice(
            big, sel.astype(big.dtype),
            (jnp.int32(0), jnp.int32(0), base_len, jnp.int32(0)),
        )

    base_len = jnp.asarray(base_len, jnp.int32)
    new_len = base_len + jnp.asarray(accept_len, jnp.int32)
    if hasattr(cache, "c1"):
        import dataclasses as _dc

        from .sparse_kv import commit

        moved = _dc.replace(
            cache, k=wr(cache.k, k_rows), v=wr(cache.v, v_rows),
            length=base_len,
        )
        if defer_compress:
            return moved.with_length(new_len)
        return commit(moved, accept_len, max_new=n)
    return KVCache(wr(cache.k, k_rows), wr(cache.v, v_rows), new_len)
