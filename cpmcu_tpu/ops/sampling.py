"""Token sampling: greedy, temperature, top-k, top-p — all on device.

Reference parity: cpmcu/llm.py:274-277 and 313-316 (greedy argmax vs
``torch.multinomial`` over temperature-scaled softmax). Top-k/top-p filters
are additions (the reference CLI exposes only temperature).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _top_p_threshold(sorted_desc, top_p):
    """Smallest kept logit under nucleus filtering of descending-sorted
    rows, always keeping top-1. ``top_p`` may be a static scalar or a
    traced (B, 1) vector — ONE copy of the cutoff/tie semantics for both
    the static sampler and the per-row batched sampler."""
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep top-1)
    cutoff = jnp.where(cum - probs > top_p, -jnp.inf, sorted_desc)
    return jnp.min(
        jnp.where(jnp.isneginf(cutoff), jnp.inf, cutoff), axis=-1,
        keepdims=True,
    )


@functools.partial(jax.jit, static_argnames=("temperature", "top_k", "top_p"))
def sample(
    logits: jax.Array,  # (..., V) fp32
    key: jax.Array,
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jax.Array:
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / temperature
    if top_k > 0 and top_k < logits.shape[-1]:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        threshold = _top_p_threshold(sorted_logits, top_p)
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


@jax.jit
def sample_per_row(
    logits: jax.Array,  # (B, V) fp32
    key: jax.Array,
    temps: jax.Array,  # (B,) f32; 0 => greedy for that row
    top_ks: jax.Array,  # (B,) int32; 0 => no top-k filter
    top_ps: jax.Array,  # (B,) f32; 1.0 => no top-p filter
) -> jax.Array:
    """Per-row sampling parameters as TRACED vectors: requests with
    different temperatures batch into one program (no recompile per
    distinct value — ``sample`` above specializes on static scalars).
    Semantics per row match ``sample`` (top-k filter, then top-p over the
    survivors, always keeping top-1)."""
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    t = jnp.maximum(temps, 1e-6)[:, None]
    l = logits / t
    sorted_l = jnp.sort(l, axis=-1)[:, ::-1]
    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]
    k_eff = jnp.where(top_ks > 0, jnp.clip(top_ks, 1, V), V)[:, None]
    sorted_l = jnp.where(ranks >= k_eff, -jnp.inf, sorted_l)  # top-k first
    threshold = _top_p_threshold(sorted_l, top_ps[:, None])
    l = jnp.where(l < threshold, -jnp.inf, l)
    sampled = jax.random.categorical(key, l, axis=-1).astype(jnp.int32)
    return jnp.where(temps == 0.0, greedy, sampled)
