"""HBM accounting: static KV-cache budget solver.

TPU-native analog of the reference's "one cudaMalloc, all remaining bytes
become KV cache" policy (src/model/memory.cuh:12-174, kvcache.cuh:47-64):
we can't hand-place bytes under XLA, but we can solve the same budget
equation — weights + bounded activations + KV(budget) <= memory_limit * HBM —
and allocate the KV cache at that static size up front. Buffer donation keeps
the cache update in-place, so the plan stays accurate at runtime.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import EngineConfig, ModelConfig


def device_memory_bytes(device=None) -> int:
    """Total HBM on the target device; falls back to 16 GiB (v5e) when the
    backend doesn't report memory stats (e.g. CPU simulation)."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 1024**3


def dtype_bytes(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def param_bytes(cfg: ModelConfig) -> int:
    """Model weight footprint in bytes (quantization-aware)."""
    h, i, v = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    qs, kvs = cfg.q_size, cfg.kv_size
    per_layer_mm = h * qs + 2 * h * kvs + qs * h + 2 * h * i + i * h
    per_layer_vec = 2 * h + (2 * cfg.head_dim if cfg.use_qk_norm else 0)
    if cfg.quant:
        g = cfg.quant_group_size
        # int4 packed weights + fp16/bf16 group scales
        mm_bytes = per_layer_mm // 2 + (per_layer_mm // g) * 2
    else:
        mm_bytes = per_layer_mm * dtype_bytes(cfg.jnp_dtype)
    emb = v * h * dtype_bytes(cfg.jnp_dtype) * (1 if cfg.tie_word_embeddings else 2)
    return cfg.num_layers * (mm_bytes + per_layer_vec * dtype_bytes(cfg.jnp_dtype)) + emb


def activation_bytes(cfg: ModelConfig, chunk_length: int) -> int:
    """Bound on live activations for one chunk through one layer — XLA reuses
    buffers across layers, so only the widest layer's working set counts,
    times a safety factor for fusion temporaries."""
    h, i = cfg.hidden_size, cfg.intermediate_size
    b = dtype_bytes(cfg.jnp_dtype)
    widest = chunk_length * max(2 * i, cfg.q_size + 2 * cfg.kv_size + h) * b
    logits = 64 * cfg.vocab_size * b
    return 3 * widest + logits


def solve_kv_budget(
    cfg: ModelConfig,
    eng: EngineConfig,
    hbm_bytes: int | None = None,
) -> int:
    """Max KV-cache length (tokens) that fits — the reference's
    ``max_total_length`` (kvcache.cuh:50-64, llm.py:115-116).

    For MiniCPM4 sparse attention the compressed c1/c2 mirrors consume an
    extra (1/16 + 1/64) of the dense KV bytes; fold that into the per-token
    cost the same way the reference's 64:4:1 split does
    (minicpm4_kvcache.cuh:296-298).
    """
    if eng.max_total_length:
        return eng.max_total_length
    if hbm_bytes is None:
        hbm_bytes = device_memory_bytes()
    budget_bytes = int(hbm_bytes * eng.memory_limit)
    budget_bytes -= param_bytes(cfg)
    budget_bytes -= activation_bytes(cfg, eng.chunk_length)
    per_tok = cfg.num_layers * 2 * cfg.kv_size * dtype_bytes(cfg.jnp_dtype)
    if cfg.apply_sparse:
        per_tok = int(per_tok * (1 + 1 / 16 + 1 / 64))
    if budget_bytes <= per_tok:
        raise MemoryError(
            f"model weights ({param_bytes(cfg) / 1e9:.2f} GB) leave no room for "
            f"KV cache within memory_limit={eng.memory_limit}"
        )
    n = budget_bytes // per_tok - 1
    # round down to a 512 multiple: KV-kernel tile friendly (ops.flash BK /
    # ops.sparse_flash BK = 512; the reference pads decode lengths to 128,
    # llm.py:244-245)
    return int(max(512, (n // 512) * 512))
