"""Tree verification + KV fixup (functional).

Replaces the reference's 64-thread verify kernel + two-phase KV fixup
(src/model/tree_drafter.cuh:5-101) with vectorized XLA ops:

  * node i is correct iff its token matches the base model's prediction at
    its parent (pred[i] == gt[parent[i]]);
  * node i is accepted iff its whole ancestor chain is correct
    ((correct_mask & attn_mask[i]) == attn_mask[i]);
  * the accepted path is the deepest accepted node's ancestor chain; its
    nodes' KV rows are compacted to the cache front (cache.compact);
  * emitted tokens are the gt values along the path (the last one is the
    "bonus" token).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..cache.kv import KVCache, compact


def verify_tree(
    pred: jax.Array,  # (S,) draft token ids (node tokens)
    gt: jax.Array,  # (S,) base-model sampled/argmax token per node
    positions: jax.Array,  # (S,) absolute positions (prior + depth)
    tree_mask: jax.Array,  # (S, S) bool ancestor masks (incl. self)
    tree_parent: jax.Array,  # (S,) int32
    prior: jax.Array,  # scalar int32: base length before the tree
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (accept_len, accept_pos (S,), emitted (S,)).

    accept_pos[j] = tree node index at path depth j (valid for j < accept_len);
    emitted[j] = gt[accept_pos[j]] — the tokens to emit.
    """
    S = pred.shape[0]
    idx = jnp.arange(S, dtype=jnp.int32)

    correct = (idx == 0) | (pred == gt[tree_parent])  # (S,)
    ok = ~jnp.any(tree_mask & ~correct[None, :], axis=1)  # whole chain correct

    depth = positions - prior + 1  # root = 1
    score = jnp.where(ok, depth, 1)
    best = jnp.argmax(score).astype(jnp.int32)  # first max — matches kernel
    accept_len = score[best]

    # path slots: nodes on best's chain land at slot depth-1 (unique by
    # construction); everyone else is dropped out-of-bounds
    on_path = tree_mask[best]  # (S,) bool
    slots = jnp.where(on_path, depth - 1, S)
    accept_pos = jnp.zeros((S,), jnp.int32).at[slots].set(idx, mode="drop")

    emitted = gt[accept_pos]
    return accept_len.astype(jnp.int32), accept_pos, emitted


def fix_kv(cache, accept_pos, accept_len, prior, defer_compress=False):
    """Move the accepted nodes' KV rows (prior + accept_pos[j]) to
    (prior + j) across all layers and set length = prior + accept_len
    (tree_drafter.cuh:48-101). Sparse caches also advance their compressed
    mirrors over the newly committed span — unless ``defer_compress``: a
    compress inside a fused-segment scan body defeats XLA's in-place carry
    analysis and ping-pongs the whole cache (see engine.decode_segment);
    segment callers run ONE compress_span after the scan instead. The
    extra c1/c2 lag (<= segment_rounds * tree_size tokens) stays inside
    the forced local selection window."""
    prior = jnp.asarray(prior, jnp.int32)
    if hasattr(cache, "c1"):
        from ..cache.sparse_kv import compact_sparse

        return compact_sparse(
            cache, accept_pos, accept_len, prior,
            defer_compress=defer_compress,
        )
    return compact(cache, accept_pos, accept_len, prior)
