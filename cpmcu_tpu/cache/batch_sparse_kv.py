"""Batched MiniCPM4 sparse KV arena: per-slot dense K/V + c1/c2 mirrors.

The continuous-batching analog of cache.sparse_kv.SparseKVCache (reference
src/model/minicpm4/minicpm4_kvcache.cuh:205-316 — the reference itself has
no batched variant; its engine serves one sequence). Every slot owns a lane
of the dense K/V arena plus lanes of the two mean-pooled compressed caches;
compressed lengths stay pure functions of each slot's committed length
(ops.sparse.c_len_of), so ``lengths`` is the only bookkeeping state.

Compression follows the single-sequence engine's segment discipline: the
decode scan never touches c1/c2 (an in-scan commit ping-pongs the whole
arena, PERF.md item 4); ``compress_slots`` runs once per drained segment
with each slot's pre-segment committed length. Selection inside a segment
reads mirrors that lag by <= segment tokens, covered by the 8-block local
window exactly like the single engine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..ops.sparse import C1_STRIDE, C2_STRIDE
from .sparse_kv import SparseKVCache, compress_span


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BatchSparseKVCache:
    k: jax.Array  # (B, L, KVH, S, D)
    v: jax.Array  # (B, L, KVH, S, D)
    c1: jax.Array  # (B, L, KVH, S/16, D) mean-pooled keys, stride 16
    c2: jax.Array  # (B, L, KVH, S/64, D) mean-pooled keys, stride 64
    lengths: jax.Array  # (B,) int32 committed tokens per slot

    @property
    def num_slots(self) -> int:
        return self.k.shape[0]

    @property
    def max_length(self) -> int:
        return self.k.shape[3]

    @staticmethod
    def create(
        cfg: ModelConfig, num_slots: int, budget: int
    ) -> "BatchSparseKVCache":
        budget = max(512, (budget // 512) * 512)
        L = cfg.num_layers
        shape = (num_slots, L, cfg.num_kv_heads, budget, cfg.head_dim)
        dt = cfg.jnp_dtype
        return BatchSparseKVCache(
            k=jnp.zeros(shape, dt),
            v=jnp.zeros(shape, dt),
            c1=jnp.zeros(
                (num_slots, L, cfg.num_kv_heads, budget // C1_STRIDE,
                 cfg.head_dim), dt,
            ),
            c2=jnp.zeros(
                (num_slots, L, cfg.num_kv_heads, budget // C2_STRIDE,
                 cfg.head_dim), dt,
            ),
            lengths=jnp.zeros((num_slots,), jnp.int32),
        )


@functools.partial(
    jax.jit, static_argnames=("max_new",), donate_argnames=("bcache",)
)
def compress_slots(
    bcache: BatchSparseKVCache,
    old_lengths: jax.Array,  # (B,) committed length at the span start
    new_lengths: jax.Array,  # (B,) committed length after the span
    *,
    max_new: int,  # static bound on (new - old) per slot
) -> BatchSparseKVCache:
    """Advance every slot's compressed mirrors over its newly committed
    rows — one vmapped cache.sparse_kv.compress_span per slot."""

    def one(k, v, c1, c2, old, new):
        c = compress_span(
            SparseKVCache(k, v, c1, c2, jnp.asarray(new, jnp.int32)),
            jnp.asarray(old, jnp.int32), max_new=max_new,
        )
        return c.c1, c.c2

    c1, c2 = jax.vmap(one)(
        bcache.k, bcache.v, bcache.c1, bcache.c2,
        jnp.asarray(old_lengths, jnp.int32),
        jnp.asarray(new_lengths, jnp.int32),
    )
    return dataclasses.replace(bcache, c1=c1, c2=c2)
