"""Attention ops — XLA reference implementation + dispatch.

Semantics mirror the reference's single ``mha_fwd_kvcache`` entry point
(src/flash_attn/flash_api.hpp:294-394): T new query tokens attend over a
static KV cache whose rows [0, prior_len) are committed history and rows
[prior_len, prior_len+T) are the new tokens (already scattered in), with

  * causal masking within the new block (prefill / vanilla decode),
  * an optional boolean tree mask over the new block (tree speculation;
    the reference packs it as uint64 rows, src/model/mask.cuh:5-18),
  * an optional sliding window (``block_window_size`` analog),
  * optional block-sparse KV masking from a top-k block bitmap (InfLLM-v2).

This module holds the O(T·S) materialized-scores XLA version — the numerics
oracle for the Pallas flash kernels in ``ops.flash`` and the fallback for
tiny shapes. Dispatch picks the implementation.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _visibility_mask(
    T: int,
    S: int,
    prior_len,
    tree_mask: Optional[jax.Array],
    window: int,
    sink: int = 0,
):
    """(T, S) bool: query i may attend key j."""
    j = jax.lax.broadcasted_iota(jnp.int32, (T, S), 1)
    i = jax.lax.broadcasted_iota(jnp.int32, (T, S), 0)
    prior = jnp.asarray(prior_len, jnp.int32)

    hist = j < prior
    new_rel = j - prior
    if tree_mask is None:
        new_vis = (new_rel >= 0) & (new_rel <= i)
    else:
        tm = tree_mask.astype(jnp.bool_)  # (T, T_tree)
        idx = jnp.clip(new_rel, 0, tm.shape[1] - 1)
        gathered = jnp.take_along_axis(tm, idx, axis=1)
        new_vis = (new_rel >= 0) & (new_rel < tm.shape[1]) & gathered
    vis = hist | new_vis
    if window > 0:
        # query i sits at absolute cache slot prior + i; keep the last
        # ``window`` keys plus ``sink`` leading sink tokens.
        lo = prior + i + 1 - window
        vis = vis & ((j >= lo) | (j < sink))
    return vis


@functools.partial(
    jax.jit, static_argnames=("window", "sink", "scale", "return_lse")
)
def mha_xla(
    q: jax.Array,  # (T, H, D)
    k_cache: jax.Array,  # (KVH, S, D)
    v_cache: jax.Array,  # (KVH, S, D)
    prior_len: jax.Array,  # scalar int32: history length (new rows already at [prior, prior+T))
    tree_mask: Optional[jax.Array] = None,  # (T, T) bool
    block_mask: Optional[jax.Array] = None,  # (num_kv_blocks,) or (T, num_kv_blocks) bool
    *,
    window: int = 0,
    sink: int = 0,
    scale: Optional[float] = None,
    return_lse: bool = False,
):
    T, H, D = q.shape
    KVH, S, _ = k_cache.shape
    G = H // KVH
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    qf = q.reshape(T, KVH, G, D).astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    scores = jnp.einsum("tkgd,ksd->kgts", qf, kf) * scale  # (KVH,G,T,S)

    vis = _visibility_mask(T, S, prior_len, tree_mask, window, sink)
    vis = vis[None, None]  # (1, 1, T, S) broadcast over (KVH, G)
    if block_mask is not None:
        # (NB,) | (T, NB) | (KVH, T, NB) boolean block masks. The mask is
        # ANDed with the causal/tree visibility — like the reference, where
        # only selected blocks and the local window are visited at all
        # (flash_blockmask.h:37-98), including within the current chunk
        # (chunk blocks are never scored/selected, so intra-chunk reach is
        # the local window — minicpm4_attn.cuh:143-170 out_len covers
        # history only).
        nb = block_mask.shape[-1]
        block_size = S // nb
        bm = jnp.repeat(block_mask.astype(jnp.bool_), block_size, axis=-1)
        if bm.ndim == 1:
            bm = bm[None, None, None, :]
        elif bm.ndim == 2:
            bm = bm[None, None, :, :]
        else:  # (KVH, T, S)
            bm = bm[:, None, :, :]
        vis = vis & bm

    scores = jnp.where(vis, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / denom
    out = jnp.einsum("kgts,ksd->tkgd", probs, v_cache.astype(jnp.float32))
    out = out.reshape(T, H, D).astype(q.dtype)
    if return_lse:
        lse = (m + jnp.log(denom)).squeeze(-1)  # (KVH, G, T)
        return out, lse.reshape(H, T)
    return out


def mha(q, k_cache, v_cache, prior_len, tree_mask=None, block_mask=None,
        *, window: int = 0, sink: int = 0, impl: str = "auto",
        return_lse: bool = False):
    """Dispatch between the XLA oracle and the Pallas flash kernels.

    ``return_lse`` (causal, no tree/block mask) also returns the per-(token,
    head) log-sum-exp (T, H) f32 — the sequence-parallel partial-attention
    path combines shards with it (parallel/seq.py)."""
    if return_lse:
        assert tree_mask is None and block_mask is None
        if impl in ("flash", "auto"):
            try:
                from . import flash

                if impl == "flash" or flash.is_supported(q, k_cache):
                    return flash.flash_mha(
                        q, k_cache, v_cache, prior_len,
                        causal=True, window=window, sink=sink,
                        return_lse=True,
                    )
            except ImportError:
                pass
        out, lse = mha_xla(q, k_cache, v_cache, prior_len, None, None,
                           window=window, sink=sink, return_lse=True)
        return out, lse.T  # mha_xla emits (H, T); flash emits (T, H)
    if impl in ("flash", "auto"):
        try:
            from . import flash  # noqa: F401

            if impl == "flash" or flash.is_supported(q, k_cache):
                return flash.mha_flash(
                    q, k_cache, v_cache, prior_len,
                    tree_mask=tree_mask, block_mask=block_mask,
                    window=window, sink=sink,
                )
        except ImportError:
            pass
    return mha_xla(
        q, k_cache, v_cache, prior_len, tree_mask, block_mask,
        window=window, sink=sink,
    )
