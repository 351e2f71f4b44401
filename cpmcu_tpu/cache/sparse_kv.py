"""MiniCPM4 sparse KV cache: dense K/V + compressed c1/c2 mirrors.

Functional analog of ``MiniCPM4KVCache`` (reference
src/model/minicpm4/minicpm4_kvcache.cuh:205-316): per layer, alongside the
dense (S, KVH, D) K/V streams, two mean-pooled "semantic kernel" caches of
the keys — c1 (window 32, stride 16) and c2 (window 128, stride 64, used
when ``use_compress_lse``). Compressed lengths are pure functions of the
committed ``length`` (ops.sparse.c_len_of), so no extra state is carried:
``commit`` advances the length and incrementally recomputes exactly the
compressed rows whose source windows newly committed. The reference's
64:4:1 budget split (kvcache.cuh:296-298) becomes capacity ratios
S1 = S/16, S2 = S/64 by construction.

Speculative decoding invariant (the reference's ``next_kv_length`` +
``add_length`` bookkeeping, minicpm4_eagle.cuh:418-420): compression only
ever covers the committed prefix — tree rows live at [length, length+tree)
and are compacted by verify *before* the post-accept commit, so c1/c2 never
see speculative keys.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..ops.sparse import C1_STRIDE, C2_STRIDE, c_len_of, compress_incremental
from .kv import KVCache


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseKVCache:
    k: jax.Array  # (L, KVH, S, D)
    v: jax.Array  # (L, KVH, S, D)
    c1: jax.Array  # (L, KVH, S/16, D) mean-pooled keys, stride 16
    c2: jax.Array  # (L, KVH, S/64, D) mean-pooled keys, stride 64
    length: jax.Array  # int32 scalar: committed tokens

    @property
    def max_length(self) -> int:
        return self.k.shape[2]

    @staticmethod
    def create(cfg: ModelConfig, budget: int, num_layers: Optional[int] = None) -> "SparseKVCache":
        L = num_layers if num_layers is not None else cfg.num_layers
        budget = max(512, (budget // 512) * 512)
        shape = (L, cfg.num_kv_heads, budget, cfg.head_dim)
        dt = cfg.jnp_dtype
        return SparseKVCache(
            k=jnp.zeros(shape, dt),
            v=jnp.zeros(shape, dt),
            c1=jnp.zeros((L, cfg.num_kv_heads, budget // 16, cfg.head_dim), dt),
            c2=jnp.zeros((L, cfg.num_kv_heads, budget // 64, cfg.head_dim), dt),
            length=jnp.zeros((), jnp.int32),
        )

    def with_length(self, length) -> "SparseKVCache":
        return dataclasses.replace(self, length=jnp.asarray(length, jnp.int32))

    def dense_view(self) -> KVCache:
        return KVCache(self.k, self.v, self.length)


def compress_span(cache: SparseKVCache, old_len, *, max_new: int) -> SparseKVCache:
    """Recompute the compressed rows whose source windows committed in
    (old_len, cache.length]; ``max_new`` is the static bound on the token
    span. Runs OUTSIDE any per-token scan: a compress inside a scan body
    defeats XLA's in-place carry analysis and ping-pongs the whole cache
    (profiled at 10.3ms/token at 96K — k+v+c1+c2 copied every step)."""
    new_len = cache.length

    def per_layer(k_layer, c1_layer, c2_layer):
        c1n = compress_incremental(
            k_layer, c1_layer,
            c_len_of(old_len, C1_STRIDE), c_len_of(new_len, C1_STRIDE),
            stride=C1_STRIDE, max_new=max_new // C1_STRIDE + 1,
        )
        c2n = compress_incremental(
            k_layer, c2_layer,
            c_len_of(old_len, C2_STRIDE), c_len_of(new_len, C2_STRIDE),
            stride=C2_STRIDE, max_new=max_new // C2_STRIDE + 1,
        )
        return c1n, c2n

    c1, c2 = jax.vmap(per_layer)(cache.k, cache.c1, cache.c2)
    return SparseKVCache(cache.k, cache.v, c1, c2, new_len)


def commit(cache: SparseKVCache, n, *, max_new: int) -> SparseKVCache:
    """Commit ``n`` new tokens (K/V rows already appended by the forward
    pass at [length, length+n)) and advance the compressed mirrors.

    ``max_new`` is the static bound on n (chunk length for prefill, tree
    size for spec decode). The dense engine's plain ``with_length`` commit
    is replaced by this for sparse models.
    """
    adv = cache.with_length(cache.length + jnp.asarray(n, jnp.int32))
    return compress_span(adv, cache.length, max_new=max_new)


commit_jit = jax.jit(
    commit, static_argnames=("max_new",), donate_argnums=(0,)
)


def commit_any(cache, n, *, max_new: int):
    """Commit ``n`` tokens on either cache flavor (host-side helper)."""
    if isinstance(cache, SparseKVCache):
        return commit_jit(cache, n, max_new=max_new)
    return cache.with_length(cache.length + jnp.asarray(n, jnp.int32))


def compact_sparse(
    cache: SparseKVCache, accept_pos, accept_len, base_len,
    defer_compress: bool = False,
) -> SparseKVCache:
    """Tree-verify KV fixup + commit of the accepted rows.

    Dense rows move exactly like cache.kv.compact (tree_drafter.cuh:48-101);
    the compressed mirrors then advance over the newly committed span. The
    tree region is bounded by accept_pos.shape[0] (= tree_size). With
    ``defer_compress`` only the length advances — fused-segment callers
    compress once after their scan (see spec.verify.fix_kv)."""
    from .kv import compact as dense_compact

    tree_size = accept_pos.shape[0]
    dense = dense_compact(cache.dense_view(), accept_pos, accept_len, base_len)
    moved = SparseKVCache(dense.k, dense.v, cache.c1, cache.c2, base_len)
    if defer_compress:
        return moved.with_length(base_len + jnp.asarray(accept_len, jnp.int32))
    return commit(moved, accept_len, max_new=tree_size)
