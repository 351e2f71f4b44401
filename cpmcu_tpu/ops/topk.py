"""Chunked exact top-k (shared by the spec drafters and block selection).

``lax.top_k`` lowers to a full-width variadic sort on TPU; any global top-k
element is necessarily in its chunk's top-k, so chunk-local top-k (cheap
narrow sorts) followed by a top-k over the k*nchunks candidates is exact
and much cheaper — the TPU-native replacement for the reference's bitonic
TopK kernel (src/utils.cuh topk, SURVEY.md §2.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_wide(x, k: int, chunk: int = 128):
    """Exact top-k over a wide last dim via two chunked selections.

    Returns (values, indices); indices are always < x.shape[-1] even for
    rows with fewer than k finite entries (pad-slot clamp)."""
    V = x.shape[-1]
    if V <= 4 * chunk or k > chunk:
        return jax.lax.top_k(x, k)
    V0 = V
    if V % chunk:  # pad to a chunk multiple with -inf (never selected)
        pad = chunk - V % chunk
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
                    constant_values=-jnp.inf)
        V += pad
    nc = V // chunk
    xc = x.reshape(x.shape[:-1] + (nc, chunk))
    if k * chunk * 4 <= V:
        # hierarchical max-filter (very wide rows, e.g. the 32K FR draft
        # head): sorting every chunk is still O(V log chunk) — 3.4 ms per
        # batched draft top-k in the r4e batch-spec trace. Any entry of
        # the true top-k lives in a chunk whose max is >= the k-th value,
        # and at most k chunks can contain top-k entries, so the top-k
        # chunks BY MAX (cheap reduce, no sort of the wide axis) provably
        # cover the answer; one narrow exact top-k over those k*chunk
        # candidates finishes. cidx is re-sorted ascending so candidate
        # order == global index order and lax.top_k's lowest-index
        # tie-break is preserved exactly.
        cmax = jnp.max(xc, axis=-1)  # (..., nc)
        _, cidx = jax.lax.top_k(cmax, k)  # ties -> lowest chunk first
        cidx = jnp.sort(cidx, axis=-1)
        sel = jnp.take_along_axis(xc, cidx[..., None], axis=-2)
        v, pos = jax.lax.top_k(sel.reshape(x.shape[:-1] + (k * chunk,)), k)
        idx = (jnp.take_along_axis(cidx, pos // chunk, axis=-1) * chunk
               + pos % chunk)
        return v, jnp.minimum(idx, V0 - 1)
    cv, ci = jax.lax.top_k(xc, k)  # (..., nc, k)
    base = (jnp.arange(nc, dtype=jnp.int32) * chunk)[..., :, None]
    cand_v = cv.reshape(x.shape[:-1] + (nc * k,))
    cand_i = (ci + base).reshape(x.shape[:-1] + (nc * k,))
    v, pos = jax.lax.top_k(cand_v, k)
    idx = jnp.take_along_axis(cand_i, pos, axis=-1)
    # a row with fewer than k finite entries could select a -inf pad slot;
    # clamp so indices are always < the true vocab (ADVICE r3)
    return v, jnp.minimum(idx, V0 - 1)
