"""Token sampling: greedy, temperature, top-k, top-p — all on device.

Reference parity: cpmcu/llm.py:274-277 and 313-316 (greedy argmax vs
``torch.multinomial`` over temperature-scaled softmax). Top-k/top-p filters
are additions (the reference CLI exposes only temperature).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


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
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        cutoff_mask = cum - probs > top_p
        cutoff = jnp.where(cutoff_mask, -jnp.inf, sorted_logits)
        threshold = jnp.min(
            jnp.where(jnp.isneginf(cutoff), jnp.inf, cutoff), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)
