"""Rotary position embeddings.

Native implementations of the three rope init functions the reference uses
through HF ``ROPE_INIT_FUNCTIONS`` (cpmcu/llm.py:181-192): "default",
"llama3" and "longrope" (YARN-style, long_factor==short_factor assumed, as
the reference's TODO notes). Application is the non-interleaved half-rotate
(src/model/rotary.cuh:5-68), done in fp32 for parity with the fp32
``inv_freq`` table the reference keeps.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import RopeConfig


def compute_inv_freq(rope: RopeConfig, head_dim: int, seq_len: int = 0) -> Tuple[np.ndarray, float]:
    """Return (inv_freq[head_dim//2] fp32, attention_scaling)."""
    inv_freq = 1.0 / (
        rope.theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    scaling = 1.0

    if rope.rope_type == "default":
        pass
    elif rope.rope_type == "llama3":
        low_wavelen = rope.original_max_position_embeddings / rope.low_freq_factor
        high_wavelen = rope.original_max_position_embeddings / rope.high_freq_factor
        wavelen = 2 * math.pi / inv_freq
        inv_freq_llama = np.where(wavelen > low_wavelen, inv_freq / rope.factor, inv_freq)
        smooth = (rope.original_max_position_embeddings / wavelen - rope.low_freq_factor) / (
            rope.high_freq_factor - rope.low_freq_factor
        )
        smoothed = (1 - smooth) / rope.factor * inv_freq + smooth * inv_freq
        is_medium = ~(wavelen < high_wavelen) & ~(wavelen > low_wavelen)
        inv_freq = np.where(is_medium, smoothed, inv_freq_llama)
    elif rope.rope_type == "longrope":
        orig_max = rope.original_max_position_embeddings or rope.max_position_embeddings
        factor = rope.factor
        if rope.max_position_embeddings and orig_max:
            factor = max(factor, rope.max_position_embeddings / orig_max)
        use_long = seq_len and orig_max and seq_len > orig_max
        ext = np.asarray(
            (rope.long_factor if use_long else rope.short_factor)
            or [1.0] * (head_dim // 2),
            dtype=np.float64,
        )
        inv_freq = inv_freq / ext
        if factor > 1.0 and orig_max:
            scaling = math.sqrt(1 + math.log(factor) / math.log(orig_max))
    else:
        raise ValueError(f"unsupported rope_type {rope.rope_type!r}")

    return inv_freq.astype(np.float32), float(scaling)


def rope_tables(rope: RopeConfig, head_dim: int, max_len: int, seq_len: int = 0):
    """Precompute cos/sin tables (max_len, head_dim) fp32."""
    inv_freq, scaling = compute_inv_freq(rope, head_dim, seq_len or max_len)
    t = np.arange(max_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # (S, D/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    cos = (np.cos(emb) * scaling).astype(np.float32)
    sin = (np.sin(emb) * scaling).astype(np.float32)
    return jnp.asarray(cos), jnp.asarray(sin)


def rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q, k, cos, sin, positions=None):
    """Apply rope to q,k of shape (T, H, D).

    ``positions=None`` means cos/sin are already position-sliced (T, D) —
    callers inside a per-layer loop hoist the table gather out of the loop
    (the gather is layer-invariant; done per layer it profiled at
    ~1ms/token on the 8B). With ``positions`` (int32 [T]) cos/sin are the
    full (S, D) tables. Computed in fp32 (the reference kernel reads the
    fp32 inv_freq table and does fp32 sin/cos, src/model/rotary.cuh:24-50),
    cast back to input dtype.
    """
    if positions is not None:
        cos = cos[positions]
        sin = sin[positions]
    # elementwise on half-slices with ONE trailing concat per tensor:
    # the old `qf * c + rotate_half(qf) * s` materialized the
    # rotate_half concat BEFORE the multiply-add (XLA lowers concatenate
    # to copies that break fusion — 962 copy ops / 50 ms per 96K prefill
    # chunk at layers/rotary.py, r4g_profile_postfix §A). Per output
    # element the operations and their order are IDENTICAL (cos/sin
    # tables duplicate their halves: emb = [freqs, freqs]), so this is
    # bit-exact vs the concat-first form.
    half = q.shape[-1] // 2
    c = cos[:, None, :half]  # (T, 1, D/2); cos[..., half:] is identical
    s = sin[:, None, :half]

    def rot(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :half], xf[..., half:]
        return jnp.concatenate(
            [x1 * c + (-x2) * s, x2 * c + x1 * s], axis=-1
        ).astype(x.dtype)

    return rot(q), rot(k)
