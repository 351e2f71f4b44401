"""PartitionSpecs for the param/cache/activation pytrees.

Tensor-parallel layout (Megatron-style; collectives ride ICI under pjit):
  * wq/wk/wv:   column-sharded over heads   (L, H, out) -> P(None, None, tp)
  * wo:         row-sharded                 (L, Hq, H)  -> P(None, tp, None)
  * w_gate/up:  column-sharded              (L, H, I)   -> P(None, None, tp)
  * w_down:     row-sharded                 (L, I, H)   -> P(None, tp, None)
  * lm_head.w:  vocab column-sharded        (H, V)      -> P(None, tp)
  * embed:      replicated (gather is tiny; vocab-sharding it would turn the
                gather into a collective on every step)
  * KV cache:   head-sharded                (L, KVH, S, D) -> P(None, tp, None, None)

XLA inserts the psum after wo / w_down contractions automatically when the
inputs carry these shardings — the TPU-native replacement for the NCCL
all-reduce a CUDA TP implementation would hand-write (SURVEY.md §5.8).

This module has no reference counterpart: the CUDA engine is single-GPU
(SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ModelConfig
from ..core.mesh import AXIS_DP, AXIS_TP


def param_pspecs(cfg: ModelConfig) -> dict:
    tp = AXIS_TP
    col = P(None, None, tp)
    row = P(None, tp, None)
    vec = P(None, None)

    def lin(spec, bias_spec=None, has_bias=False):
        d = {"w": spec} if not cfg.quant else {"q": spec, "s": spec}
        if has_bias:
            d["b"] = bias_spec
        return d

    layers = {
        "attn_norm": vec,
        "ffn_norm": vec,
        "wq": lin(col, P(None, tp), cfg.use_attn_bias),
        "wk": lin(col, P(None, tp), cfg.use_attn_bias),
        "wv": lin(col, P(None, tp), cfg.use_attn_bias),
        "wo": lin(row),
        "w_gate": lin(col),
        "w_up": lin(col),
        "w_down": lin(row),
    }
    if cfg.use_qk_norm:
        layers["q_norm"] = vec
        layers["k_norm"] = vec
    lm = {"w": P(None, tp)} if not cfg.quant_lmhead else {
        "q": P(None, tp), "s": P(None, tp)  # pack sharded on the vocab axis
    }
    return {
        "embed": P(None, None),
        "layers": layers,
        "final_norm": P(None),
        "lm_head": lm,
    }


def kv_pspec():
    from ..cache.kv import KVCache

    return KVCache(
        k=P(None, AXIS_TP, None, None),
        v=P(None, AXIS_TP, None, None),
        length=P(),
    )


def sparse_kv_pspec():
    """MiniCPM4 sparse cache: compressed mirrors shard like the dense keys
    (head axis over tp); block selection then happens per local head shard
    with no cross-chip reduction (each kv head's scores are independent)."""
    from ..cache.sparse_kv import SparseKVCache

    h = P(None, AXIS_TP, None, None)
    return SparseKVCache(k=h, v=h, c1=h, c2=h, length=P())


def batch_kv_pspec():
    """Continuous-batching arena: slots over dp, heads over tp."""
    from ..engine.batch_engine import BatchKVCache

    return BatchKVCache(
        k=P(AXIS_DP, None, AXIS_TP, None, None),
        v=P(AXIS_DP, None, AXIS_TP, None, None),
        lengths=P(AXIS_DP),
    )


def batch_sparse_kv_pspec():
    """Sparse continuous-batching arena: slots over dp, heads over tp
    (compressed mirrors shard like the dense keys — selection stays
    per-local-head with no cross-chip reduction, as in sparse_kv_pspec)."""
    from ..cache.batch_sparse_kv import BatchSparseKVCache

    h = P(AXIS_DP, None, AXIS_TP, None, None)
    return BatchSparseKVCache(k=h, v=h, c1=h, c2=h, lengths=P(AXIS_DP))


def cache_pspec_for(cache):
    if hasattr(cache, "lengths") and hasattr(cache, "c1"):
        return batch_sparse_kv_pspec()
    if hasattr(cache, "lengths"):
        return batch_kv_pspec()
    if hasattr(cache, "c1"):
        return sparse_kv_pspec()
    return kv_pspec()


def shard_cache(cache, mesh: Mesh):
    specs = cache_pspec_for(cache)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), cache, specs
    )


def shard_params(params: dict, cfg: ModelConfig, mesh: Mesh) -> dict:
    specs = param_pspecs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def batch_pspec():
    return P(AXIS_DP, None)
