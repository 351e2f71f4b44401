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
    idx = jnp.arange(n, dtype=jnp.int32)
    src = base_len + accept_pos  # (n,)
    dst = base_len + idx
    # Rows where i >= accept_len: make the move a no-op (src = dst).
    src = jnp.where(idx < accept_len, src, dst)

    def fix(arr):  # (L, KVH, S, D)
        rows = arr[:, :, src]  # gather first (functional two-phase move)
        # contiguous destination -> dynamic_update_slice, which XLA keeps
        # in place on the donated buffer (a scatter with an index array
        # defeated the aliasing analysis and copied the whole cache each
        # spec round — ~1ms/round at a 4K-cap 8B)
        return jax.lax.dynamic_update_slice(
            arr, rows, (jnp.int32(0), jnp.int32(0), base_len, jnp.int32(0))
        )

    return KVCache(
        k=fix(cache.k),
        v=fix(cache.v),
        length=(base_len + accept_len).astype(jnp.int32),
    )
